"""
kraken_tpu.pretrain.model
~~~~~~~~~~~~~~~~~~~~~~~~~

Wav2Vec2-style masked contrastive pretraining of recognition backbones
(reference: kraken/lib/pretrain/model.py, after Vogler et al.'s lacuna
reconstruction): the network is split into a feature extractor (conv stack)
and context encoder (recurrent stack) around the first RNN; random feature
spans are replaced with a learned mask embedding, and the encoder output at
masked positions is scored against the projected unmasked features plus
sampled negatives with a cosine-similarity cross entropy.

Unlike the reference's host-side dynamic mask sampling, masking here samples
a fixed number of spans per row inside the jitted loss (static shapes for
XLA); spans are uniform over the padded feature width, matching the
reference's behaviour of masking anywhere in the padded region.
"""
import logging
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.nn import layers as L

logger = logging.getLogger(__name__)

__all__ = ['RecognitionPretrainModel']


class RecognitionPretrainModel:
    """Unsupervised pretraining module for recognition backbones."""

    def __init__(self, config, net=None):
        self.config = config
        self.net = net
        self.trainer = None

    @classmethod
    def load_from_weights(cls, config, path):
        from kraken_tpu.models import load_models
        models = [m for m in load_models(path) if 'recognition' in m.model_type]
        if not models:
            raise ValueError(f'No recognition model found in {path}')
        return cls(config, net=models[0])

    def setup(self, stage, datamodule):
        cfg = self.config
        if self.net is None:
            from kraken_tpu.models import create_model
            spec = cfg.spec.strip()
            # strip an explicit W block from the spec: masking is handled here
            spec = re.sub(r'\s*W\{?\w*\}?[\d.,]+', '', spec)
            self.net = create_model('TorchVGSLModel',
                                    model_type=['recognition'],
                                    vgsl=spec)
        # ensure a linear output layer exists (dummy codec domain), with a
        # single-glyph dummy codec so fine-tuning with --resize union/new can
        # negotiate against it (reference: lib/pretrain/model.py:104,260-261)
        if not isinstance(self.net.net.layers[-1], L.LinSoftmax):
            self.net.append(len(self.net.net.layers), '[O1c2]')
        if self.net.codec is None:
            from kraken_tpu.codec import Codec
            self.net.add_codec(Codec(' '))
        # split around the first recurrent layer
        split_idx = None
        for idx, layer in enumerate(self.net.net.layers):
            if isinstance(layer, L.TransposedSummarizingRNN):
                split_idx = idx
                break
        if split_idx is None:
            raise ValueError('Pretraining requires a network with at least one recurrent layer.')
        features = L.Series(layers=self.net.net.layers[:split_idx],
                            names=self.net.net.names[:split_idx])
        encoder = L.Series(layers=self.net.net.layers[split_idx:-1],
                           names=self.net.net.names[split_idx:-1])
        # the masked sequence flattens channels x height at the RNN boundary
        # (loss_fn reshapes (N, C, H, W) -> (N, W, C*H)), so the mask
        # embedding / projection input dim is C*H, not C
        feat_shape = features.get_shape(self.net.input)
        feat_dim = feat_shape[1] * max(1, feat_shape[2])
        # encoder output dim: channels of the layer before the output
        enc_out_dim = encoder.get_shape(feat_shape)[1]

        # wire input transforms to the datasets
        if datamodule is not None:
            from kraken_tpu.dataset import ImageInputTransforms
            batch, channels, height, width = self.net.input
            transforms = ImageInputTransforms(batch, height, width, channels,
                                              pad=(16, 0), valid_norm=False)
            for subset in (datamodule.train_set, datamodule.val_set):
                if subset is not None:
                    ds = subset.dataset if hasattr(subset, 'dataset') else subset
                    ds.transforms = transforms

        mask_width = cfg.mask_width
        mask_prob = cfg.mask_prob
        num_negatives = cfg.num_negatives
        logit_temp = cfg.logit_temp

        # learnable mask embedding + target projection parameters
        rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        from kraken_tpu.nn.layers import _xavier_uniform
        self.pretrain_params = {
            'mask_emb': jax.random.normal(k1, (feat_dim,)) * 0.02,
            'project_q.weight': _xavier_uniform(k2, (enc_out_dim, feat_dim)),
            'project_q.bias': jnp.zeros((enc_out_dim,), jnp.float32),
        }
        # merge into the model param tree under a reserved name
        self.net.params['__pretrain__'] = self.pretrain_params

        def loss_fn(params, batch, rng):
            pre = params['__pretrain__']
            net_params = {k: v for k, v in params.items() if k != '__pretrain__'}
            feats, seq_lens = features.apply(net_params, batch['image'],
                                             batch.get('seq_lens'), train=True, rng=rng)
            N, C, H, W = feats.shape
            # features as (N, W, C) sequence (H must be 1 after the conv stack)
            seq = feats.squeeze(2).transpose(0, 2, 1) if H == 1 else \
                feats.reshape(N, C * H, W).transpose(0, 2, 1)
            K = max(1, int(mask_prob * W / mask_width))
            k_mask, k_neg = jax.random.split(jax.random.fold_in(rng, 1))
            starts = jax.random.randint(k_mask, (N, K), 0, max(1, W - mask_width))
            if seq_lens is not None:
                # keep spans inside each row's valid frames: spans over padded
                # positions yield exact-zero encoder outputs whose cosine-norm
                # gradient is NaN, and carry no training signal anyway
                limit = jnp.maximum(seq_lens - mask_width, 1)[:, None]
                starts = starts % limit
            span = starts[..., None] + jnp.arange(mask_width)[None, None, :]  # (N, K, mw)
            mask = jnp.zeros((N, W), bool)
            mask = mask.at[jnp.arange(N)[:, None, None], span].set(True)
            # replace masked positions with the mask embedding
            masked_seq = jnp.where(mask[..., None], pre['mask_emb'].astype(seq.dtype), seq)
            masked_feats = masked_seq.transpose(0, 2, 1)[:, :, None, :]
            enc_out, _ = encoder.apply(net_params, masked_feats.reshape(N, C, H, W),
                                       seq_lens, train=True, rng=jax.random.fold_in(rng, 2))
            Ne, Ce, He, We = enc_out.shape
            enc_seq = enc_out.transpose(0, 3, 2, 1).reshape(N, We, Ce)
            # positives: projected unmasked features at span starts
            pos_feats = jnp.take_along_axis(seq, starts[..., None], axis=1)  # (N, K, C)
            y = pos_feats @ pre['project_q.weight'].T + pre['project_q.bias']  # (N, K, Ce)
            # encoder outputs at the same positions (feature and encoder
            # widths match: recurrent layers preserve W)
            x = jnp.take_along_axis(enc_seq, starts[..., None], axis=1)  # (N, K, Ce)
            # negatives: other masked positions of the same row
            neg_idx = jax.random.randint(k_neg, (num_negatives, N, K), 0, max(1, K - 1))
            self_idx = jnp.arange(K)[None, None, :]
            neg_idx = jnp.where(neg_idx >= self_idx, neg_idx + 1, neg_idx) % K
            negatives = y[jnp.arange(N)[None, :, None], neg_idx]  # (neg, N, K, Ce)
            candidates = jnp.concatenate([y[None], negatives], axis=0)  # (1+neg, N, K, Ce)
            # norms via sqrt(sumsq + eps): jnp.linalg.norm has a NaN gradient
            # at exactly-zero vectors (masked/padded positions)
            x_n = x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
            c_n = candidates * jax.lax.rsqrt(
                jnp.sum(candidates * candidates, axis=-1, keepdims=True) + 1e-12)
            logits = (x_n[None] * c_n).sum(-1) / logit_temp  # (1+neg, N, K)
            log_probs = jax.nn.log_softmax(logits, axis=0)
            return -log_probs[0].mean()

        self.loss_fn = loss_fn

    def validate(self, params, datamodule) -> dict:
        losses = []
        rng = jax.random.PRNGKey(0)
        for batch in datamodule.val_dataloader():
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                      if not isinstance(v, (list, str))}
            losses.append(float(self.loss_fn(params, jbatch, rng)))
        ce = float(np.mean(losses)) if losses else 0.0
        return {'val_ce': ce, 'val_metric': -ce}

    def test(self, params, datamodule) -> dict:
        return self.validate(params, datamodule)

    def checkpoint_extras(self) -> dict:
        return {'pretrain': True}
