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


def test_setup_data_selects_grain(tmp_path):
    """dataset.loader='grain' routes the TRAIN loader through GrainLoader
    end-to-end (real dataset, real transforms) — no dark code."""
    import os

    from PIL import Image

    from tpuseg.config import make_config
    from tpuseg.data.setup import setup_data

    root = tmp_path / "cs"
    rng = np.random.RandomState(0)
    for split, city in [("train", "aachen"), ("val", "lindau")]:
        img_dir = root / "leftImg8bit_trainvaltest/leftImg8bit" / split / city
        msk_dir = root / "gtFine_trainvaltest/gtFine" / split / city
        img_dir.mkdir(parents=True)
        msk_dir.mkdir(parents=True)
        for i in range(4):
            base = f"{city}_{i:06d}_000019"
            Image.fromarray(rng.randint(0, 255, (64, 64, 3),
                                        dtype=np.uint8)).save(
                img_dir / f"{base}_leftImg8bit.png")
            Image.fromarray((np.ones((64, 64)) * 7).astype(np.uint8)).save(
                msk_dir / f"{base}_gtFine_labelIds.png")

    cfg = make_config({
        "dataset.name": "cityscapes",
        "dataset.cityscapes_dir": str(root),
        "dataset.centroid_root": os.path.join(str(tmp_path), "centroids"),
        "dataset.crop_size": (32, 32),
        "dataset.class_uniform_tile": 32,
        "dataset.loader": "grain",
        "dataset.num_workers": 2,
        "dataset.gblur": False,
        "dataset.color_aug": 0.0,
        "train.batch_size": 2,
    })
    train_loader, _, _ = setup_data(cfg)
    from tpuseg.data.grain_loader import GrainLoader

    assert isinstance(train_loader, GrainLoader)
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 32, 32, 3)
    assert batch["label"].shape == (2, 32, 32)
