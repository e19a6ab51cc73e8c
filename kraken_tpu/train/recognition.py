"""
kraken_tpu.train.recognition
~~~~~~~~~~~~~~~~~~~~~~~~~~~~

Text recognition training (functional equivalent of the reference's
VGSLRecognitionModel/DataModule, kraken/train/vgsl.py): CTC loss over
bucketed padded line batches, codec/alphabet negotiation with
fail/union/new resize semantics, validation CER/WER via greedy decoding,
and test reporting with global alignment + per-script confusions.
"""
import logging
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.codec import Codec
from kraken_tpu.dataset import ImageInputTransforms
from kraken_tpu.dataset.loader import DataLoader, bucket_collate
from kraken_tpu.dataset.recognition import (ArrowIPCRecognitionDataset,
                                            GroundTruthDataset,
                                            PolygonGTDataset)
from kraken_tpu.exceptions import KrakenEncodeException, KrakenInputException
from kraken_tpu.lib.util import make_printable, parse_gt_path
from kraken_tpu.ops.ctc import greedy_decoder
from kraken_tpu.train.losses import ctc_loss
from kraken_tpu.train.metrics import CharErrorRate, WordErrorRate

logger = logging.getLogger(__name__)

__all__ = ['RecognitionModel', 'RecognitionDataModule']


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


class RecognitionDataModule:
    """
    Builds train/validation recognition datasets from XML pages, path pairs,
    or binary Arrow files, with an automatic partition split when no explicit
    evaluation data is given.
    """

    def __init__(self, config):
        self.config = config
        self.use_legacy_polygons = False
        self.train_set = None
        self.val_set = None
        self.test_set = None

    def _make_dataset(self, split_filter=None):
        cfg = self.config
        kwargs = dict(normalization=getattr(cfg, 'normalization', None),
                      whitespace_normalization=getattr(cfg, 'normalize_whitespace', True),
                      reorder=getattr(cfg, 'reorder', True),
                      augmentation=cfg.augment)
        if cfg.format_type == 'binary':
            return ArrowIPCRecognitionDataset(split_filter=split_filter, **kwargs)
        if cfg.format_type in ('xml', 'alto', 'page'):
            # the extraction method must follow the configured flag — models
            # trained/evaluated with --legacy-polygons really extract with
            # the legacy warper (reference: train/vgsl.py wires
            # legacy_polygons into PolygonGTDataset)
            return PolygonGTDataset(legacy_polygons=getattr(cfg, 'legacy_polygons', False),
                                    **kwargs)
        if cfg.format_type == 'path':
            return GroundTruthDataset(**kwargs)
        raise ValueError(f'Invalid format type {cfg.format_type}')

    def _fill(self, dataset, files, split_filter=None):
        from kraken_tpu.xml import XMLPage
        cfg = self.config
        for f in files:
            try:
                if cfg.format_type == 'binary':
                    dataset.add(f)
                elif cfg.format_type in ('xml', 'alto', 'page'):
                    page = XMLPage(f, filetype=cfg.format_type,
                                   linetype=getattr(cfg, 'linetype', None) or 'baselines').to_container()
                    dataset.add(page=page)
                elif cfg.format_type == 'path':
                    dataset.add(line=parse_gt_path(f))
            except (ValueError, KrakenInputException) as e:
                logger.warning(f'Invalid input file {f}: {e}')
        if cfg.format_type == 'binary' and (getattr(cfg, 'normalization', None)
                                            or getattr(cfg, 'normalize_whitespace', True)
                                            or getattr(cfg, 'reorder', True)):
            # binary metadata alphabets are pre-transform; recompute through
            # the text transform stack (reference: train/vgsl.py:174-176)
            dataset.rebuild_alphabet()
        return dataset

    def setup(self, stage: Optional[str] = None):
        cfg = self.config
        if stage in (None, 'fit'):
            if cfg.evaluation_data:
                train_ds = self._fill(self._make_dataset('train' if cfg.format_type == 'binary' and
                                                         getattr(cfg, 'binary_dataset_split', False) else None),
                                      cfg.training_data)
                val_ds = self._fill(self._make_dataset('validation' if cfg.format_type == 'binary' and
                                                       getattr(cfg, 'binary_dataset_split', False) else None),
                                    cfg.evaluation_data)
                self.train_set = _Subset(train_ds, range(len(train_ds)))
                self.val_set = _Subset(val_ds, range(len(val_ds)))
            elif cfg.format_type == 'binary' and getattr(cfg, 'binary_dataset_split', False):
                train_ds = self._fill(self._make_dataset('train'), cfg.training_data)
                val_ds = self._fill(self._make_dataset('validation'), cfg.training_data)
                self.train_set = _Subset(train_ds, range(len(train_ds)))
                self.val_set = _Subset(val_ds, range(len(val_ds)))
            else:
                ds = self._fill(self._make_dataset(), cfg.training_data)
                n = len(ds)
                indices = np.random.RandomState(42).permutation(n)
                cut = int(n * cfg.partition)
                self.train_set = _Subset(ds, indices[:cut])
                val_ds = self._fill(self._make_dataset(), cfg.training_data)
                self.val_set = _Subset(val_ds, indices[cut:])
            if isinstance(self.train_set.dataset, PolygonGTDataset):
                self.use_legacy_polygons = getattr(cfg, 'legacy_polygons', False)
            elif isinstance(self.train_set.dataset, ArrowIPCRecognitionDataset):
                # the arrow file's recorded extraction status prevails over
                # the requested flag (reference: train/vgsl.py:209-223):
                # lines were extracted at compile time, so the request can't
                # change them — warn when they disagree
                status = self.train_set.dataset.legacy_polygons_status
                val_status = getattr(self.val_set.dataset, 'legacy_polygons_status', status)
                if val_status != status:
                    logger.warning('Legacy polygon status differs between train and validation '
                                   f'sets ({status} vs {val_status}); keeping the '
                                   'train set status.')
                if status == 'mixed':
                    logger.warning('Training data mixes legacy and new polygon extraction; '
                                   'recompiling the dataset is recommended.')
                    status = False
                if status != getattr(cfg, 'legacy_polygons', False):
                    logger.warning(f'Dataset legacy-polygon mode resolved to {status} '
                                   'from the training set (overriding the request).')
                else:
                    logger.info(f'Dataset legacy-polygon mode resolved to {status} '
                                'from the training set.')
                self.use_legacy_polygons = bool(status)
            if not len(self.train_set):
                raise ValueError('No valid training data provided.')
        elif stage == 'test':
            test_ds = self._fill(self._make_dataset('test' if cfg.format_type == 'binary' and
                                                    getattr(cfg, 'binary_dataset_split', False) else None),
                                 cfg.test_data or cfg.evaluation_data)
            self.test_set = _Subset(test_ds, range(len(test_ds)))

    def _loader(self, subset, shuffle):
        batch_size = self.config.batch_size
        if shuffle and len(subset) and len(subset) < batch_size:
            # drop_last with batch_size > dataset size would otherwise train
            # zero steps per epoch (common with tiny fine-tuning corpora)
            logger.warning(f'Batch size {batch_size} exceeds training set size '
                           f'{len(subset)}; clamping to one full-set batch.')
            batch_size = len(subset)
        return DataLoader(subset, batch_size=batch_size,
                          shuffle=shuffle, drop_last=shuffle,
                          collate_fn=bucket_collate,
                          num_workers=self.config.num_workers)

    def train_dataloader(self):
        return self._loader(self.train_set, True)

    def val_dataloader(self):
        return self._loader(self.val_set, False)

    def test_dataloader(self):
        return self._loader(self.test_set, False)


class RecognitionModel:
    """
    CTC recognition training module with codec negotiation.
    """

    def __init__(self, config, net=None):
        self.config = config
        self.net = net
        self._loaded_model = net is not None
        self.trainer = None

    @classmethod
    def load_from_weights(cls, config, path):
        from kraken_tpu.models import load_models
        models = [m for m in load_models(path) if 'recognition' in m.model_type]
        if not models:
            raise ValueError(f'No recognition model found in {path}')
        return cls(config, net=models[0])

    # ------------------------------------------------------------- setup
    def setup(self, stage, datamodule):
        if stage == 'test':
            if self.net is None:
                raise ValueError('Testing requires a loaded model.')
            self._build_fns()
            return
        cfg = self.config
        train_set = datamodule.train_set.dataset
        val_set = datamodule.val_set.dataset

        data_codec = getattr(datamodule.config, 'codec', None)
        if data_codec is not None and not isinstance(data_codec, Codec):
            data_codec = Codec(data_codec)

        if self.net:
            if cfg.resize == 'new' and data_codec is not None:
                codec = data_codec
            elif self.net.codec is not None:
                codec = self.net.codec
            else:
                raise ValueError('Loaded model carries no usable codec.')
            codec.strict = True
            try:
                train_set.encode(codec)
            except KrakenEncodeException:
                alpha_diff = set(train_set.alphabet).difference(set(codec.c2l.keys()))
                if cfg.resize == 'fail':
                    raise ValueError(f'Model codec does not cover the training alphabet: {alpha_diff}')
                if cfg.resize == 'union':
                    logger.info(f'Growing codec with {len(alpha_diff)} new code points.')
                    codec = codec.add_labels(alpha_diff)
                    self.net.add_codec(codec)
                    self.net.resize_output(codec.max_label + 1)
                    train_set.encode(codec)
                elif cfg.resize == 'new':
                    logger.info(f'Resizing network to {len(train_set.alphabet)} code sequences')
                    train_set.encode(None)
                    codec, del_labels = codec.merge(train_set.codec)
                    self.net.add_codec(codec)
                    self.net.resize_output(codec.max_label + 1, del_labels)
                    train_set.encode(codec)
                else:
                    raise ValueError(f'Unknown codec resize mode {cfg.resize}')
            codec.strict = False
            self.net.add_codec(codec)
            cfg.spec = self.net.spec
        else:
            train_set.encode(data_codec)
            vgsl = cfg.spec.strip()
            cfg.spec = f'[{vgsl[1:-1]} O1c{train_set.codec.max_label + 1}]'
            logger.info(f'Creating new model {cfg.spec} with '
                        f'{train_set.codec.max_label + 1} outputs')
            from kraken_tpu.models import create_model
            self.net = create_model('TorchVGSLModel',
                                    model_type=['recognition'],
                                    vgsl=cfg.spec)
            self.net.add_codec(train_set.codec)
        for k, v in self.net.codec.c2l.items():
            char = make_printable(k)
            if char == k:
                char = '\t' + char
            logger.debug(f'{char}\t{v}')

        # validation codec with dummy labels for unseen code points
        val_diff = set(val_set.alphabet).difference(set(train_set.codec.c2l.keys()))
        logger.info(f'Adding {len(val_diff)} placeholder labels to the validation codec.')
        self._val_codec = self.net.codec.add_labels(val_diff)
        val_set.encode(self._val_codec)

        # wire input transforms from the network spec
        batch, channels, height, width = self.net.input
        valid_norm = self.net.seg_type != 'baselines' if self.net.seg_type else True
        pad = getattr(datamodule.config, 'pad', 16)
        for ds in (train_set, val_set):
            ds.transforms = ImageInputTransforms(batch, height, width, channels,
                                                 pad=(pad, 0), valid_norm=valid_norm)

        if self.net.one_channel_mode and train_set.im_mode != self.net.one_channel_mode:
            logger.warning(f'Model trained on mode {self.net.one_channel_mode} images while '
                           f'the training set is mode {train_set.im_mode}.')
        self.net.user_metadata['metrics'] = []
        self.net.model_type = ['recognition']
        if not self.net.seg_type:
            self.net.seg_type = train_set.seg_type
        # legacy-polygon flag negotiation (reference decision table,
        # train/vgsl.py:565-593): for binary data the dataset's recorded
        # status wins (the requested flag can't re-extract compiled lines);
        # for on-the-fly extraction the requested flag wins
        data_cfg = datamodule.config
        use_legacy = datamodule.use_legacy_polygons
        force_legacy = getattr(data_cfg, 'legacy_polygons', False)
        is_binary = getattr(data_cfg, 'format_type', None) == 'binary'
        desired_legacy = (not is_binary and force_legacy) or use_legacy
        if not self._loaded_model:
            if not is_binary and force_legacy:
                logger.warning('trained model will be marked legacy-polygon')
            elif is_binary:
                if force_legacy and not use_legacy:
                    logger.warning('trained model will be marked new-polygon')
                elif not force_legacy and use_legacy:
                    logger.warning('trained model will be marked legacy-polygon')
        if self._loaded_model and not force_legacy and \
                getattr(self.net, 'use_legacy_polygons', False) and not desired_legacy:
            logger.warning('loaded legacy-polygon model will be re-marked new-polygon')
        self.net.use_legacy_polygons = desired_legacy
        # recorded into checkpoints after samples have been seen (reference:
        # KrakenSetOneChannelMode, kraken/train/utils.py:232)
        self._train_set = train_set

        self._build_fns()

    def _build_fns(self):
        net = self.net.net
        apply = net.apply
        if getattr(self.config, 'remat', False):
            def apply(params, image, seq_lens, train=True, rng=None):
                def _fwd(p, im, sl, r):
                    return net.apply(p, im, sl, train=train, rng=r)
                return jax.checkpoint(_fwd)(params, image, seq_lens, rng)

        def loss_fn(params, batch, rng):
            logits, olens = apply(params, batch['image'], batch['seq_lens'],
                                  train=True, rng=rng)
            total = ctc_loss(logits, olens, batch['target'], batch['target_lens'])
            return total / batch['image'].shape[0]
        self.loss_fn = loss_fn

        @jax.jit
        def fwd(params, x, lens):
            logits, olens = net.apply(params, x, lens)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1).squeeze(2)
            return probs, olens
        self._fwd = fwd

    # -------------------------------------------------------- validation
    def _decode_batch(self, params, batch, codec):
        probs, olens = self._fwd(params, jnp.asarray(batch['image']),
                                 jnp.asarray(batch['seq_lens']))
        probs = np.asarray(probs)
        olens = np.asarray(olens)
        preds = []
        for i, runs in enumerate(greedy_decoder(probs, olens)):
            preds.append(''.join(x[0] for x in codec.decode(runs)))
        return preds

    def _decode_targets(self, batch, codec):
        texts = []
        mat = np.asarray(batch['target'])
        for row, length in zip(mat, np.asarray(batch['target_lens'])):
            labels = row[:int(length)]
            texts.append(''.join(x[0] for x in codec.decode(
                [(int(lab), 0, 0, 1.0) for lab in labels])))
        return texts

    def validate(self, params, datamodule) -> dict:
        cer = CharErrorRate()
        wer = WordErrorRate()
        codec = self._val_codec
        for batch in datamodule.val_dataloader():
            preds = self._decode_batch(params, batch, codec)
            targets = self._decode_targets(batch, codec)
            for p, t in zip(preds, targets):
                cer.update(p, t)
                wer.update(p, t)
        return {'val_accuracy': 1 - cer.compute(),
                'val_word_accuracy': 1 - wer.compute(),
                'val_metric': 1 - cer.compute()}

    def test(self, params, datamodule) -> dict:
        from collections import Counter
        from kraken_tpu.dataset.utils import compute_confusions, global_align
        test_set = datamodule.test_set.dataset
        batch_, channels, height, width = self.net.input
        valid_norm = self.net.seg_type != 'baselines' if self.net.seg_type else True
        pad = getattr(datamodule.config, 'pad', 16)
        test_set.transforms = ImageInputTransforms(batch_, height, width, channels,
                                                   pad=(pad, 0), valid_norm=valid_norm)
        test_diff = set(test_set.alphabet).difference(set(self.net.codec.c2l.keys()))
        codec = self.net.codec.add_labels(test_diff)
        test_set.encode(codec)
        cer = CharErrorRate()
        cer_ci = CharErrorRate()
        wer = WordErrorRate()
        confusions = Counter()
        scripts = Counter()
        ins = 0
        dels = Counter()
        subs = Counter()
        for batch in datamodule.test_dataloader():
            preds = self._decode_batch(params, batch, codec)
            targets = self._decode_targets(batch, codec)
            for p, t in zip(preds, targets):
                cer.update(p, t)
                cer_ci.update(p.lower(), t.lower())
                wer.update(p, t)
                _, algn_gt, algn_pred = global_align(t, p)
                c, s, i, d, sb = compute_confusions(algn_gt, algn_pred)
                confusions += c
                scripts += s
                ins += i
                dels += d
                subs += sb
        return {'accuracy': 1 - cer.compute(),
                'case_insensitive_accuracy': 1 - cer_ci.compute(),
                'word_accuracy': 1 - wer.compute(),
                'chars': cer.total,
                'errors': cer.errors,
                'confusions': confusions,
                'scripts': scripts,
                'insertions': ins,
                'deletions': dels,
                'substitutions': subs}

    def checkpoint_extras(self) -> dict:
        # single-channel nets record the observed training image mode so
        # inference picks the matching transform (reference: train/utils.py:232)
        train_set = getattr(self, '_train_set', None)
        if (self.net.one_channel_mode is None and train_set is not None
                and self.net.input[1] == 1
                and getattr(train_set, 'im_mode', None) in ('1', 'L')):
            self.net.one_channel_mode = train_set.im_mode
        return {'_seg_type': self.net.seg_type,
                '_one_channel_mode': self.net.one_channel_mode}
