"""Batched data loading with orientation bucketing and prefetch.

Rebuild of the reference loader stack (reference: mmdet/datasets/builder.py:
69-130 build_dataloader + samplers/group_sampler.py): the GroupSampler's
aspect-ratio grouping becomes orientation buckets (one static canvas per
bucket, so each bucket hits one compiled program); DistributedGroupSampler's
rank sharding becomes per-host slicing; workers become a thread pool (cv2 and
numpy release the GIL for the heavy parts).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Dict, Iterator, List, Optional

import numpy as np

from .formatting import collate


class GroupedBatchSampler:
    """Epoch-seeded shuffled batches, grouped by dataset.flags
    (reference samplers/group_sampler.py:GroupSampler/DistributedGroupSampler)."""

    def __init__(self, flags: np.ndarray, batch_size: int,
                 shuffle: bool = True, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 drop_last: bool = True):
        self.flags = np.asarray(flags)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """DistSamplerSeedHook equivalent (reference apis/train.py:110)."""
        self.epoch = epoch

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.RandomState(self.seed + self.epoch)
        batches = []
        for flag in np.unique(self.flags):
            idxs = np.nonzero(self.flags == flag)[0]
            if self.shuffle:
                rng.shuffle(idxs)
            # pad to a multiple of global batch (reference GroupSampler pads
            # each group to batch-size multiples)
            total = self.batch_size * self.num_shards
            pad = (-len(idxs)) % total
            if pad and not self.drop_last:
                # tile (np.resize wraps as many times as needed) so groups
                # smaller than the global batch still pad to a full multiple
                # — a wrap-slice `idxs[:pad]` would fall short and silently
                # drop the group's tail chunk downstream
                idxs = np.resize(idxs, len(idxs) + pad)
            elif self.drop_last:
                idxs = idxs[:len(idxs) - (len(idxs) % total)]
            for s in range(0, len(idxs), total):
                chunk = idxs[s:s + total]
                if len(chunk) == total:
                    shard = chunk[self.shard_index::self.num_shards]
                    batches.append(list(shard))
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return iter(batches)

    def __len__(self) -> int:
        n = 0
        total = self.batch_size * self.num_shards
        for flag in np.unique(self.flags):
            c = int((self.flags == flag).sum())
            n += (c // total) if self.drop_last else -(-c // total)
        return n


class DataLoader:
    """Thread-pool prefetching loader yielding collated numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0,
                 drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        flags = getattr(dataset, 'flags',
                        np.zeros(len(dataset), np.int64))
        self.sampler = GroupedBatchSampler(
            flags, batch_size, shuffle=shuffle, seed=seed,
            num_shards=num_shards, shard_index=shard_index,
            drop_last=drop_last)

    def set_epoch(self, epoch: int) -> None:
        self.sampler.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.sampler)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = list(iter(self.sampler))
        if not batches:
            return iter(())

        def load_batch(idxs):
            return collate([self.dataset[i] for i in idxs])

        def gen():
            with ThreadPoolExecutor(self.num_workers) as pool:
                depth = max(2, self.num_workers)
                futures = [pool.submit(load_batch, b)
                           for b in batches[:depth]]
                nxt = depth
                for i in range(len(batches)):
                    batch = futures[i % depth].result()
                    if nxt < len(batches):
                        futures[nxt % depth] = pool.submit(
                            load_batch, batches[nxt])
                        nxt += 1
                    yield batch

        return gen()


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 4,
                     dist: bool = False, num_shards: int = 1,
                     shard_index: int = 0, shuffle: bool = True,
                     seed: int = 0, drop_last: Optional[bool] = None):
    """reference datasets/builder.py:build_dataloader equivalent."""
    if drop_last is None:
        drop_last = shuffle  # train drops ragged tails; eval keeps all
    return DataLoader(dataset, samples_per_gpu, shuffle=shuffle,
                      num_workers=workers_per_gpu, seed=seed,
                      num_shards=num_shards, shard_index=shard_index,
                      drop_last=drop_last)
