"""
kraken_tpu.train.segmentation
~~~~~~~~~~~~~~~~~~~~~~~~~~~~~

Baseline segmentation training (functional equivalent of the reference's
BLLASegmentationModel/DataModule, kraken/train/blla.py): BCE + soft Dice
loss on rasterized heatmap targets, pixel metrics plus baseline-detection
P/R/F1 by running the full vectorizer on predicted heatmaps during
validation, and class-mapping resize with fail/union/new semantics.
"""
import logging
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.dataset import ImageInputTransforms
from kraken_tpu.dataset.loader import DataLoader
from kraken_tpu.dataset.segmentation import BaselineSet
from kraken_tpu.train.losses import segmentation_loss
from kraken_tpu.train.metrics import MultilabelAccuracy, MultilabelJaccard

logger = logging.getLogger(__name__)

__all__ = ['SegmentationModel', 'SegmentationDataModule']


def _seg_collate(batch):
    images = np.stack([b['image'] for b in batch])
    targets = np.stack([b['target'] for b in batch])
    return {'image': images, 'target': targets,
            'baselines': [b['baselines'] for b in batch]}


class SegmentationDataModule:
    """Builds BaselineSet train/val datasets from XML pages."""

    def __init__(self, config):
        self.config = config
        self.train_set = None
        self.val_set = None
        self.test_set = None

    def _build(self, files):
        from kraken_tpu.xml import XMLPage
        cfg = self.config
        class_mapping = {'aux': {'_start_separator': 0, '_end_separator': 1},
                         'baselines': cfg.line_class_mapping,
                         'regions': cfg.region_class_mapping}
        # CLI --pad is (left/right, top/bottom); BaselineSet pads (rows, cols)
        lr, tb = getattr(cfg, 'padding', (0, 0))
        ds = BaselineSet(class_mapping=class_mapping, augmentation=cfg.augment,
                         line_width=getattr(cfg, 'line_width', 4),
                         padding=(tb, lr))
        for f in files:
            try:
                ds.add(XMLPage(f, filetype=cfg.format_type
                               if cfg.format_type in ('alto', 'page', 'xml') else 'xml').to_container())
            except (ValueError, KeyError) as e:
                logger.warning(f'Invalid input file {f}: {e}')
        # freeze auto-assigned mappings into plain dicts
        ds.class_mapping = {k: dict(v) for k, v in ds.class_mapping.items()}
        return ds

    def setup(self, stage: Optional[str] = None):
        cfg = self.config
        if stage in (None, 'fit'):
            if cfg.evaluation_data:
                self.train_set = self._build(cfg.training_data)
                self.val_set = self._build(cfg.evaluation_data)
            else:
                full = self._build(cfg.training_data)
                n = len(full)
                idx = np.random.RandomState(42).permutation(n)
                cut = max(1, int(n * cfg.partition))
                val = self._build(cfg.training_data)
                self.train_set = _SubsetSeg(full, idx[:cut])
                self.val_set = _SubsetSeg(val, idx[cut:] if n > 1 else idx[:1])
            if not len(self.train_set):
                raise ValueError('No valid training data provided.')
        elif stage == 'test':
            self.test_set = self._build(cfg.test_data or cfg.evaluation_data)

    def train_dataloader(self):
        batch_size = min(self.config.batch_size, max(1, len(self.train_set)))
        if batch_size < self.config.batch_size:
            logger.warning(f'Batch size {self.config.batch_size} exceeds training '
                           f'set size {len(self.train_set)}; clamping.')
        return DataLoader(self.train_set, batch_size=batch_size,
                          shuffle=True, drop_last=True, collate_fn=_seg_collate,
                          num_workers=self.config.num_workers)

    def val_dataloader(self):
        return DataLoader(self.val_set, batch_size=1, collate_fn=_seg_collate)

    def test_dataloader(self):
        return DataLoader(self.test_set, batch_size=1, collate_fn=_seg_collate)


class _SubsetSeg:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __getattr__(self, name):
        return getattr(self.dataset, name)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


class SegmentationModel:
    """BCE+Dice segmentation training module."""

    def __init__(self, config, net=None):
        self.config = config
        self.net = net
        self.trainer = None

    @classmethod
    def load_from_weights(cls, config, path):
        from kraken_tpu.models import load_models
        models = [m for m in load_models(path) if 'segmentation' in m.model_type]
        if not models:
            raise ValueError(f'No segmentation model found in {path}')
        return cls(config, net=models[0])

    def setup(self, stage, datamodule):
        if stage == 'test':
            if self.net is None:
                raise ValueError('Testing requires a loaded model.')
            self._build_fns()
            batch, channels, height, width = self.net.input
            transforms = ImageInputTransforms(batch, height, width, channels, 0,
                                              valid_norm=False)
            for ds in (datamodule.test_set, datamodule.val_set):
                if ds is not None:
                    target = ds.dataset if hasattr(ds, 'dataset') else ds
                    target.transforms = transforms
            return
        cfg = self.config
        train_set = datamodule.train_set.dataset if hasattr(datamodule.train_set, 'dataset') else datamodule.train_set
        class_mapping = train_set.class_mapping
        num_classes = train_set.num_classes

        if self.net is None:
            spec = cfg.spec.strip()
            cfg.spec = f'[{spec[1:-1]} O2l{num_classes}]'
            from kraken_tpu.models import create_model
            self.net = create_model('TorchVGSLModel',
                                    model_type=['segmentation'],
                                    vgsl=cfg.spec)
        else:
            existing = self.net.user_metadata.get('class_mapping', {})
            existing_classes = {k for d in existing.values() for k in d}
            new_classes = {k for d in class_mapping.values() for k in d}
            diff = new_classes - existing_classes
            if diff:
                if cfg.resize == 'fail':
                    raise ValueError(f'Training data and model class mappings mismatch: {diff}')
                logger.info(f'Resizing output layer for {len(diff)} new classes.')
                self.net.resize_output(num_classes)
        self.net.model_type = ['segmentation']
        self.net.seg_type = 'baselines'
        self.net.user_metadata['class_mapping'] = class_mapping
        self.net.user_metadata['topline'] = getattr(cfg, 'topline', False)

        batch, channels, height, width = self.net.input
        transforms = ImageInputTransforms(batch, height, width, channels, 0,
                                          valid_norm=False)
        for ds in (datamodule.train_set, datamodule.val_set):
            target = ds.dataset if hasattr(ds, 'dataset') else ds
            target.transforms = transforms

        self._build_fns()

    def _build_fns(self):
        net = self.net.net
        apply = net.apply
        if getattr(self.config, 'remat', False):
            def apply(params, image, seq_lens, train=True, rng=None):
                def _fwd(p, im, r):
                    return net.apply(p, im, seq_lens, train=train, rng=r)
                return jax.checkpoint(_fwd)(params, image, rng)

        dice_weight = getattr(self.config, 'dice_weight', 0.5)

        def loss_fn(params, batch, rng):
            logits, _ = apply(params, batch['image'], None, train=True, rng=rng)
            # the network output is at reduced stride; upsample to the
            # target resolution before the loss (reference: train/blla.py:292)
            target = batch['target']
            logits = jax.image.resize(logits, (logits.shape[0], logits.shape[1],
                                               target.shape[2], target.shape[3]),
                                      method='bilinear')
            return segmentation_loss(logits, target, dice_weight=dice_weight)
        self.loss_fn = loss_fn

        @jax.jit
        def fwd(params, x):
            logits, _ = net.apply(params, x, None)
            return jax.nn.sigmoid(logits.astype(jnp.float32))
        self._fwd = fwd

    def validate(self, params, datamodule, bl_tol: Optional[float] = None) -> dict:
        if bl_tol is None:
            bl_tol = getattr(self.config, 'bl_tol', 25.0)
        from kraken_tpu.lib.segmentation_metrics import (aggregate_detection_metrics,
                                                         compute_detection_metrics,
                                                         interpolate_polyline)
        from kraken_tpu.lib.vectorization import vectorize_lines

        acc = MultilabelAccuracy()
        iou = MultilabelJaccard()
        cls_map = self.net.user_metadata.get('class_mapping', {})
        start_idx = cls_map.get('aux', {}).get('_start_separator', 0)
        end_idx = cls_map.get('aux', {}).get('_end_separator', 1)
        bl_idxs = sorted(set(cls_map.get('baselines', {}).values()))
        bl_metrics = []
        for batch in datamodule.val_dataloader():
            probs = np.asarray(self._fwd(params, jnp.asarray(batch['image'])))
            t = batch['target']
            target_h, target_w = t.shape[2], t.shape[3]
            if probs.shape[2:] != t.shape[2:]:
                probs_r = jax.image.resize(jnp.asarray(probs), t.shape, method='bilinear')
                probs_full = np.asarray(probs_r)
            else:
                probs_full = probs
            acc.update(probs_full, t)
            iou.update(probs_full, t)
            # baseline-detection P/R/F1 by running the full vectorizer on the
            # predicted heatmaps (reference: train/blla.py:321-348)
            if bl_idxs and batch['image'].shape[0] == 1 and batch.get('baselines'):
                gt_baselines = batch['baselines'][0]
                pred_np = probs_full[0]
                pred_polylines = []
                gt_polylines = []
                for cls_idx in bl_idxs:
                    stack = np.stack([pred_np[start_idx], pred_np[end_idx],
                                      pred_np[cls_idx]])
                    for pl in vectorize_lines(stack):
                        pred_polylines.append(interpolate_polyline(np.asarray(pl, float)))
                    for bl in gt_baselines.get(cls_idx, []):
                        gt_polylines.append(interpolate_polyline(np.asarray(bl, float)))
                bl_metrics.append(compute_detection_metrics(pred_polylines,
                                                            gt_polylines, bl_tol))
        result = {'val_accuracy': acc.compute(),
                  'val_mean_iu': iou.compute(),
                  'val_metric': iou.compute()}
        if bl_metrics:
            agg = aggregate_detection_metrics(bl_metrics)
            result.update({'val_bl_precision': agg['precision'],
                           'val_bl_recall': agg['recall'],
                           'val_bl_f1': agg['f1']})
        return result

    def test(self, params, datamodule) -> dict:
        return self.validate(params, datamodule)

    def checkpoint_extras(self) -> dict:
        return {'_seg_type': 'baselines',
                'class_mapping': self.net.user_metadata.get('class_mapping')}
