"""
kraken_tpu.train.ro
~~~~~~~~~~~~~~~~~~~

Reading-order model training (functional equivalent of the reference's
ROModel, kraken/lib/ro/model.py): BCE on pairwise order probabilities,
validation via greedy order decoding + Spearman footrule distance.
"""
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from kraken_tpu.dataset.loader import DataLoader
from kraken_tpu.dataset.ro import PageWiseROSet, PairWiseROSet
from kraken_tpu.lib.geometry import greedy_order_decode
from kraken_tpu.ro.layers import ROMLP
from kraken_tpu.train.losses import bce_logits_loss

logger = logging.getLogger(__name__)

__all__ = ['ROModel', 'RODataModule']


def _ro_collate(batch):
    return {'sample': np.stack([b['sample'] for b in batch]).astype(np.float32),
            'target': np.stack([b['target'] for b in batch]).astype(np.float32)}


class RODataModule:
    """Pairwise RO training data over XML pages."""

    def __init__(self, config, class_mapping: dict[str, int], level: str = 'baselines'):
        self.config = config
        self.class_mapping = class_mapping
        self.level = level
        self.train_set = None
        self.val_set = None

    def setup(self, stage: Optional[str] = None):
        cfg = self.config
        if stage in (None, 'fit'):
            if cfg.evaluation_data:
                train_files = cfg.training_data
                val_files = cfg.evaluation_data
            else:
                files = list(cfg.training_data)
                cut = max(1, int(len(files) * cfg.partition))
                train_files, val_files = files[:cut], files[cut:] or files[:1]
            self.train_set = PairWiseROSet(train_files, class_mapping=self.class_mapping,
                                           mode=getattr(cfg, 'format_type', 'xml') or 'xml',
                                           level=self.level,
                                           ro_id=getattr(cfg, 'reading_order', None))
            self.val_set = PageWiseROSet(val_files, class_mapping=self.class_mapping,
                                         mode=getattr(cfg, 'format_type', 'xml') or 'xml',
                                         level=self.level,
                                         ro_id=getattr(cfg, 'reading_order', None))
            if not len(self.train_set):
                raise ValueError('No valid training data provided.')

    def train_dataloader(self):
        batch_size = min(self.config.batch_size, max(1, len(self.train_set)))
        if batch_size < self.config.batch_size:
            logger.warning(f'Batch size {self.config.batch_size} exceeds training '
                           f'set size {len(self.train_set)}; clamping.')
        return DataLoader(self.train_set, batch_size=batch_size,
                          shuffle=True, drop_last=True, collate_fn=_ro_collate)

    def val_dataloader(self):
        return DataLoader(self.val_set, batch_size=1,
                          collate_fn=lambda b: b[0])


class ROModel:
    """Pairwise reading-order MLP training module."""

    def __init__(self, config, net: Optional[ROMLP] = None,
                 class_mapping: Optional[dict] = None, level: str = 'baselines'):
        self.config = config
        self.level = level
        self.class_mapping = class_mapping
        self.net = net
        self.trainer = None

    @classmethod
    def load_from_weights(cls, config, path, level: str = 'baselines'):
        """Warm-starts from a weights file containing an ROMLP (reference:
        --load/-i on rotrain)."""
        from kraken_tpu.models import load_models
        nets = [m for m in load_models(path)
                if 'reading_order' in getattr(m, 'model_type', [])
                or isinstance(m, ROMLP)]
        if not nets:
            raise ValueError(f'No reading-order model found in {path}.')
        return cls(config, net=nets[0],
                   class_mapping=getattr(nets[0], 'class_mapping', None),
                   level=level)

    def setup(self, stage, datamodule):
        if self.net is None:
            self.net = ROMLP(class_mapping=datamodule.class_mapping,
                             level=self.level)
        mlp = self.net

        def loss_fn(params, batch, rng):
            logits = mlp.apply(params, batch['sample']).squeeze(-1)
            return bce_logits_loss(logits, batch['target'])
        self.loss_fn = loss_fn

    def validate(self, params, datamodule) -> dict:
        """Greedy-decodes each validation page and measures the normalized
        Spearman footrule distance to the true order."""
        distances = []
        losses = []
        for page in datamodule.val_dataloader():
            x = jnp.asarray(page['sample'], jnp.float32)
            y = np.asarray(page['target'], np.float32)
            logits = np.asarray(self.net.apply(params, x)).squeeze(-1)
            losses.append(float(np.mean(np.maximum(logits, 0) - logits * y +
                                        np.log1p(np.exp(-np.abs(logits))))))
            n = page['num_lines']
            probs = 1 / (1 + np.exp(-logits))
            order_mat = np.zeros((n, n))
            k = 0
            for i in range(n):
                for j in range(n):
                    if i == j and n != 1:
                        continue
                    order_mat[i, j] = probs[k]
                    k += 1
            path = greedy_order_decode(order_mat)
            # true order is 0..n-1; footrule distance normalized by worst case
            d = sum(abs(pos - true) for true, pos in enumerate(path))
            worst = (n * n - (n % 2)) / 2 or 1
            distances.append(1 - d / worst)
        score = float(np.mean(distances)) if distances else 0.0
        return {'val_spearman': score,
                'val_loss': float(np.mean(losses)) if losses else 0.0,
                'val_metric': score}

    def test(self, params, datamodule) -> dict:
        return self.validate(params, datamodule)

    def checkpoint_extras(self) -> dict:
        return {'level': self.level}
