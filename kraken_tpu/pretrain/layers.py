"""
kraken_tpu.pretrain.layers
~~~~~~~~~~~~~~~~~~~~~~~~~~

Wav2Vec2-style masking layer for contrastive pretraining of recognition
backbones (reference: /root/reference/kraken/lib/pretrain/layers.py). Placed
between the feature extractor and the recurrent context encoder; during
pretraining its apply() returns a dict with the masked features, projected
unmasked targets, and negative samples.
"""
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from kraken_tpu.nn.layers import Layer, _xavier_uniform

__all__ = ['Wav2Vec2Mask']


def compute_mask_indices(rng, shape: tuple[int, int], mask_prob: float,
                         mask_width: int) -> jnp.ndarray:
    """
    Samples non-overlapping span masks: each timestep is a span start with
    probability mask_prob / mask_width; spans extend mask_width steps.
    All rows are padded/trimmed to the same number of masked steps for a
    static shape (spans may overlap after trimming adjustment, matching the
    behaviour of the reference's numpy sampler closely enough for training).
    """
    N, W = shape
    starts = jax.random.uniform(rng, (N, W)) < (mask_prob / mask_width)
    # dilate starts to spans of mask_width
    mask = jnp.zeros((N, W), bool)
    for off in range(mask_width):
        mask = mask | jnp.roll(starts, off, axis=1)
    return mask


@dataclass(frozen=True)
class Wav2Vec2Mask(Layer):
    """
    Wav2Vec2 masking: replaces random spans of the (N, C, 1, W) feature map
    with a learned mask embedding and emits projected unmasked targets plus
    negative samples for the contrastive loss.
    """
    context_encoder_input_dim: int
    final_dim: int
    mask_width: int
    mask_prob: float
    num_negatives: int

    model_type = ('pretrain',)
    _kraken_min_version = '5.0.0'

    def init(self, rng):
        k1, k2 = jax.random.split(rng)
        C, F = self.context_encoder_input_dim, self.final_dim
        return {'mask_emb.weight': jax.random.normal(k1, (1, C)) * 0.02,
                'project_q.weight': _xavier_uniform(k2, (F, C)),
                'project_q.bias': jnp.zeros((F,), jnp.float32)}

    def apply(self, params, x, seq_len=None, output_shape=None, train=False, rng=None):
        if not train or rng is None:
            # inference: masking is a no-op passthrough
            return x, seq_len
        N, C, H, W = x.shape
        if H != 1:
            raise ValueError(f'Height has to be 1, not {H} for the wav2vec2-style masking layer.')
        feats = jnp.transpose(x, (0, 3, 2, 1)).reshape(N, W, C)
        k1, k2 = jax.random.split(rng)
        mask = compute_mask_indices(k1, (N, W), self.mask_prob, self.mask_width)
        masked = jnp.where(mask[..., None], params['mask_emb.weight'][0].astype(x.dtype), feats)
        projected = feats @ params['project_q.weight'].T.astype(x.dtype) + params['project_q.bias'].astype(x.dtype)
        out = jnp.transpose(masked, (0, 2, 1))[:, :, None, :]
        return {'output': out,
                'unmasked_features': projected,
                'mask': mask,
                'seq_len': seq_len,
                'num_negatives': self.num_negatives}, seq_len

    def get_shape(self, input):
        return input

    def get_spec(self, name) -> str:
        return (f'[1,{self.final_dim},0,{self.context_encoder_input_dim} '
                f'W{{{name}}}{self.final_dim},{self.mask_width},{self.mask_prob},{self.num_negatives}]')
