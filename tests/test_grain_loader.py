"""Grain-backed pipeline (multiprocess workers)."""
import numpy as np
import pytest

pytest.importorskip("grain")

from tpuseg.data.grain_loader import GrainLoader
from tpuseg.data.synthetic import SyntheticDataset


def test_grain_loader_batches():
    ds = SyntheticDataset((32, 32), 19, length=20)
    loader = GrainLoader(ds, 4, shuffle=True, drop_last=True, num_workers=2)
    batches = list(loader)
    # grain batches within each worker process, so with drop_last up to
    # (num_workers - 1) partial batches are dropped: 20/4 -> 4..5 batches
    assert len(batches) in (4, 5)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["label"].shape == (4, 32, 32)

    loader.set_epoch(1)
    b2 = list(loader)
    differs = any((np.asarray(a["label"]) != np.asarray(b["label"])).any()
                  for a, b in zip(batches, b2))
    assert differs  # epoch-seeded reshuffle


def test_grain_loader_sharding():
    ds = SyntheticDataset((16, 16), 19, length=16)
    seen = []
    for shard in range(2):
        loader = GrainLoader(ds, 2, num_shards=2, shard=shard,
                             num_workers=0)
        for batch in loader:
            seen.extend(batch["name"])
    assert len(seen) == 16
    assert len(set(seen)) == 16  # disjoint shards cover everything
