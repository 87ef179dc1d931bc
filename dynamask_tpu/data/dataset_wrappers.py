"""Dataset composition wrappers.

Rebuild of the reference wrappers (reference: mmdet/datasets/
dataset_wrappers.py): ConcatDataset, RepeatDataset, and
ClassBalancedDataset's per-LVIS-paper oversampling (:99-).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import List, Sequence

import numpy as np

from ..utils.registry import DATASETS


@DATASETS.register_module()
class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.cumulative = np.cumsum([len(d) for d in self.datasets])
        self.CLASSES = getattr(self.datasets[0], 'CLASSES', ())
        self.flags = np.concatenate([
            getattr(d, 'flags', np.zeros(len(d), np.int64))
            for d in self.datasets])

    def __len__(self):
        return int(self.cumulative[-1])

    def __getitem__(self, idx):
        ds = int(np.searchsorted(self.cumulative, idx, side='right'))
        base = 0 if ds == 0 else int(self.cumulative[ds - 1])
        return self.datasets[ds][idx - base]


@DATASETS.register_module()
class RepeatDataset:
    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times
        self.CLASSES = getattr(dataset, 'CLASSES', ())
        self.flags = np.tile(getattr(dataset, 'flags',
                                     np.zeros(len(dataset), np.int64)), times)

    def __len__(self):
        return self.times * len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]


@DATASETS.register_module()
class ClassBalancedDataset:
    """Oversample images containing rare categories (reference
    dataset_wrappers.py:99-, LVIS paper eq. (1): repeat factor
    r(I) = max_c max(1, sqrt(t / f(c))))."""

    def __init__(self, dataset, oversample_thr: float):
        self.dataset = dataset
        self.CLASSES = getattr(dataset, 'CLASSES', ())

        # category frequency over images
        num_images = len(dataset)
        cat_img_count = defaultdict(int)
        img_cats: List[set] = []
        for idx in range(num_images):
            ann = dataset.get_ann_info(idx)
            cats = set(int(c) for c in ann['labels'])
            img_cats.append(cats)
            for c in cats:
                cat_img_count[c] += 1
        cat_freq = {c: n / num_images for c, n in cat_img_count.items()}
        cat_repeat = {c: max(1.0, math.sqrt(oversample_thr / f))
                      for c, f in cat_freq.items()}

        indices = []
        for idx, cats in enumerate(img_cats):
            r = max((cat_repeat[c] for c in cats), default=1.0)
            indices.extend([idx] * int(math.ceil(r)))
        self.indices = np.asarray(indices, np.int64)
        base_flags = getattr(dataset, 'flags',
                             np.zeros(num_images, np.int64))
        self.flags = base_flags[self.indices]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[int(self.indices[idx])]


def wrap_dataset(cfg: dict, build_fn):
    """Dispatch composition configs (reference datasets/builder.py:49-66)."""
    t = cfg.get('type')
    if t == 'RepeatDataset':
        return RepeatDataset(build_fn(cfg['dataset']), cfg['times'])
    if t == 'ClassBalancedDataset':
        return ClassBalancedDataset(build_fn(cfg['dataset']),
                                    cfg['oversample_thr'])
    if t == 'ConcatDataset':
        return ConcatDataset([build_fn(c) for c in cfg['datasets']])
    return build_fn(cfg)
