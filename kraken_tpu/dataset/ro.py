"""
kraken_tpu.dataset.ro
~~~~~~~~~~~~~~~~~~~~~

Reading-order training datasets (reference: kraken/lib/dataset/ro.py):
`PairWiseROSet` samples random ordered line/region pairs from each page for
training, `PageWiseROSet` returns all pairs of a page for validation.
Features are one-hot class + normalized center/start/end coordinates.
"""
import logging
from collections import defaultdict
from math import factorial
from typing import Literal, Optional, Sequence, Union

import numpy as np

from kraken_tpu.dataset.utils import _get_type
from kraken_tpu.exceptions import KrakenInputException
from kraken_tpu.ro.features import element_features

logger = logging.getLogger(__name__)

__all__ = ['PairWiseROSet', 'PageWiseROSet']


def _num_classes_from_mapping(class_mapping: dict[str, int]) -> int:
    if not class_mapping:
        return 1
    return max(0, *class_mapping.values()) + 1


class _ROSetBase:
    def __init__(self, files: Sequence, class_mapping: dict[str, int],
                 mode: Optional[Literal['alto', 'page', 'xml']] = 'xml',
                 level: Literal['regions', 'baselines'] = 'baselines',
                 ro_id: Optional[str] = None):
        from kraken_tpu.xml import XMLPage
        if mode not in ('alto', 'page', 'xml'):
            raise Exception('invalid dataset mode')
        self.class_mapping = class_mapping
        self.class_stats = defaultdict(int)
        self.failed_samples: list = []
        self.data: list = []
        self._rng = np.random.RandomState()
        num_classes = _num_classes_from_mapping(class_mapping)
        for file in files:
            try:
                doc = XMLPage(file, filetype=mode)
                if level == 'baselines':
                    order = doc.get_sorted_lines(ro_id or 'line_implicit')
                elif level == 'regions':
                    order = doc.get_sorted_regions(ro_id or 'region_implicit')
                else:
                    raise ValueError(f'Invalid RO type {level}')
            except (KrakenInputException, ValueError) as e:
                logger.warning(e)
                continue
            elements = []
            for el in order:
                tag = _get_type(el.tags)
                if tag in class_mapping:
                    _, feats = element_features(el, doc.image_size, class_mapping, num_classes)
                    elements.append({'type': tag, 'features': feats})
                    self.class_stats[tag] += 1
            if len(elements) > 1:
                self.data.append(elements)
            else:
                logger.info(f'Page {file} has less than 2 elements. Skipping')

    @property
    def num_classes(self) -> int:
        return _num_classes_from_mapping(self.class_mapping)

    @property
    def canonical_class_mapping(self) -> dict[str, int]:
        seen = set()
        canonical = {}
        for key, idx in self.class_mapping.items():
            if idx not in seen:
                seen.add(idx)
                canonical[key] = idx
        return canonical

    @property
    def merged_classes(self) -> dict[str, list[str]]:
        by_idx = defaultdict(list)
        for key, idx in self.class_mapping.items():
            by_idx[idx].append(key)
        return {names[0]: names[1:] for names in by_idx.values() if len(names) > 1}

    def get_feature_dim(self) -> int:
        return 2 * self.num_classes + 12


class PairWiseROSet(_ROSetBase):
    """Random ordered element pairs per page (training)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._num_pairs = sum(int(factorial(len(p)) / factorial(len(p) - 2))
                              for p in self.data)

    def __getitem__(self, idx: int) -> dict:
        page = self.data[self._rng.randint(len(self.data))]
        idx0 = idx1 = 0
        while idx0 == idx1:
            idx0, idx1 = self._rng.randint(len(page), size=2)
        x = np.concatenate([page[idx0]['features'], page[idx1]['features']])
        y = np.float32(0 if idx0 >= idx1 else 1)
        return {'sample': x, 'target': y}

    def __len__(self) -> int:
        return self._num_pairs


class PageWiseROSet(_ROSetBase):
    """All ordered element pairs of one page per item (validation)."""

    def __getitem__(self, idx: int) -> dict:
        page = self.data[idx]
        xs = []
        ys = []
        n = len(page)
        for i in range(n):
            for j in range(n):
                if i == j and n != 1:
                    continue
                xs.append(np.concatenate([page[i]['features'], page[j]['features']]))
                ys.append(np.float32(0 if i >= j else 1))
        return {'sample': np.stack(xs), 'target': np.stack(ys), 'num_lines': n}

    def __len__(self) -> int:
        return len(self.data)
