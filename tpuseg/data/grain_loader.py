"""Grain-backed input pipeline (optional alternative to BatchLoader).

Multiprocess prefetching via Google Grain — decode/augment runs in worker
PROCESSES (no GIL), matching the "Grain/tf.data host pipeline feeding
HBM-resident NHWC batches" design target. The class-uniform epoch remix
(reference: uniform.py:278-324) maps onto Grain by treating each epoch as
one Grain epoch over a dataset view whose crop list was rebuilt via
``build_epoch`` — the map-style dataset stays the single source of truth.

Use when host-side augmentation is the bottleneck (e.g. RandAugment +
bilateral blur at 1024x2048); the threaded BatchLoader is lighter-weight
for IO-bound loads.
"""
from __future__ import annotations

from typing import Any, Optional

import numpy as np


class _GrainSource:
    """RandomAccessDataSource view over a tpuseg dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int):
        return self._dataset[int(idx)]


class _Collate:
    """grain BatchOperation replacement: stack sample dicts."""

    def __call__(self, samples):
        from tpuseg.data.loader import collate

        return collate(list(samples))


class GrainLoader:
    """Drop-in for BatchLoader built on grain.python.DataLoader.

    Args mirror BatchLoader; ``num_workers`` here means worker PROCESSES.
    Note: grain batches within each worker, so with ``drop_last`` up to
    ``num_workers - 1`` partial batches per epoch are dropped (vs exactly
    one for BatchLoader). Worker processes re-import the package — run
    under a real ``__main__`` (scripts/pytest), not stdin.
    """

    def __init__(self, dataset, batch_size: int, num_shards: int = 1,
                 shard: int = 0, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4,
                 seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_shards = num_shards
        self.shard = shard
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        per_shard = len(self.dataset) // self.num_shards
        return per_shard // self.batch_size if self.drop_last else \
            -(-per_shard // self.batch_size)

    def __iter__(self):
        import grain.python as gp

        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shard_options=gp.ShardOptions(
                shard_index=self.shard, shard_count=self.num_shards,
                drop_remainder=True),
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self.epoch,
        )
        loader = gp.DataLoader(
            data_source=_GrainSource(self.dataset),
            sampler=sampler,
            operations=[gp.Batch(batch_size=self.batch_size,
                                 drop_remainder=self.drop_last)],
            worker_count=self.num_workers,
        )
        from tpuseg.data.loader import collate

        for batch in loader:
            # grain's Batch stacks arrays already when shapes agree; dict
            # batches of numpy arrive stacked — normalize to our contract
            if isinstance(batch, dict):
                yield batch
            else:
                yield collate(list(batch))
