"""The SOTA pseudo-label loop (SURVEY §3.5): auto-labelling dumps ->
custom-coarse dataset with confidence thresholding -> coarse-boost training.
"""
import os

import numpy as np
import pytest
from PIL import Image

from tpuseg.config import make_config

H, W = 64, 128


@pytest.fixture()
def fake_tree(tmp_path):
    """Fine train/val + coarse extra cities + auto-labelled masks."""
    root = tmp_path / "cs"
    rng = np.random.RandomState(0)

    def write_city(img_dir, msk_dir, city, n, mask_suffix, mask_dir2=None):
        img_dir.mkdir(parents=True, exist_ok=True)
        msk_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            base = f"{city}_{i:06d}_000019"
            Image.fromarray(rng.randint(0, 255, (H, W, 3),
                                        dtype=np.uint8)).save(
                img_dir / f"{base}_leftImg8bit.png")
            mask = np.zeros((H, W), np.uint8)
            mask[H // 2:, :] = 7
            mask[:H // 4, :] = 23
            Image.fromarray(mask).save(msk_dir / f"{base}_{mask_suffix}.png")

    lv = "leftImg8bit_trainvaltest/leftImg8bit"
    write_city(root / lv / "train/aachen",
               root / "gtFine_trainvaltest/gtFine/train/aachen",
               "aachen", 2, "gtFine_labelIds")
    write_city(root / lv / "val/lindau",
               root / "gtFine_trainvaltest/gtFine/val/lindau",
               "lindau", 1, "gtFine_labelIds")

    # coarse extra city with AUTO-LABELLED (trainId) masks + prob maps
    cc = root / "autolabelled"
    extra_img = root / "leftImg8bit_trainextra/leftImg8bit/train_extra/aug"
    extra_img.mkdir(parents=True)
    (cc / "train_extra/aug").mkdir(parents=True)
    for i in range(2):
        base = f"aug_{i:06d}_000019"
        Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(
            extra_img / f"{base}_leftImg8bit.png")
        # auto-labels are saved in RAW LABEL ID space (reference:
        # misc.py:316-324): car=26, road=7
        pl = np.full((H, W), 26, np.uint8)
        pl[:, : W // 2] = 7
        if i == 0:
            # one vegetation (21) pixel so the dropout-merge presence
            # guard fires for image 0 only; placed inside the
            # low-confidence strip so it never survives thresholding
            pl[0, 0] = 21
        Image.fromarray(pl).save(cc / "train_extra/aug" /
                                 f"{base}_leftImg8bit.png")
        prob = np.full((H, W), 230, np.uint8)
        prob[:8, :] = 10                     # low-confidence strip
        Image.fromarray(prob).save(cc / "train_extra/aug" /
                                   f"{base}_leftImg8bit_prob.png")
        # human gtCoarse companion: vegetation (labelId 21) in the right
        # half, unlabeled (0) elsewhere
        gtc_dir = root / "gtCoarse/gtCoarse/train_extra/aug"
        gtc_dir.mkdir(parents=True, exist_ok=True)
        gtc = np.zeros((H, W), np.uint8)
        gtc[:, W // 2:] = 21
        Image.fromarray(gtc).save(gtc_dir / f"{base}_gtCoarse_labelIds.png")
    return str(root), str(cc)


def test_custom_coarse_thresholding(fake_tree):
    """Low-confidence pseudo-label pixels become ignore
    (reference: base_loader.py:216-224)."""
    root, cc = fake_tree
    cfg = make_config({
        "dataset.cityscapes_dir": root,
        "dataset.cityscapes_customcoarse": cc,
        "dataset.custom_coarse_prob": 0.5,
        "dataset.class_uniform_pct": 0.0,
        "dataset.coarse_boost_classes": (13,),
        "dataset.crop_size": (H, W),
        "dataset.scale_min": 1.0,
        "dataset.scale_max": 1.0,
        "dataset.color_aug": 0.0,
    })
    from tpuseg.data.cityscapes import Cityscapes

    ds = Cityscapes(cfg.dataset, mode="train")
    # with class_uniform off, coarse images are appended to all_imgs
    assert len(ds.all_imgs) == 4  # 2 fine + 2 coarse
    coarse_idx = next(i for i, rec in enumerate(ds.imgs)
                      if "autolabelled" in rec[1])
    sample = ds[coarse_idx]
    label = sample["label"]
    # low-confidence strip -> ignore (threshold at custom_coarse_prob)
    assert (label[:8, :] == 255).all()
    # labelId-space pseudo labels correctly remapped: road 7->0, car 26->13
    vals = set(np.unique(label[8:, :]).tolist())
    assert vals == {0, 13}, vals


def test_custom_coarse_dropout_classes(fake_tree):
    """For dropout classes, the human gtCoarse annotation is unioned into
    the auto-labelled mask before the trainId remap and before the
    confidence threshold (reference --custom_coarse_dropout_classes ->
    DROPOUT_COARSE_BOOST_CLASSES: config.py:351-354,
    base_loader.py:177-183)."""
    root, cc = fake_tree
    over = {
        "dataset.cityscapes_dir": root,
        "dataset.cityscapes_customcoarse": cc,
        "dataset.custom_coarse_prob": 0.5,
        "dataset.class_uniform_pct": 0.0,
        "dataset.coarse_boost_classes": (13,),
        "dataset.crop_size": (H, W),
        "dataset.scale_min": 1.0,
        "dataset.scale_max": 1.0,
        "dataset.color_aug": 0.0,
    }
    from tpuseg.data.cityscapes import Cityscapes

    # vegetation = labelId 21 -> trainId 8
    cfg = make_config({**over,
                       "dataset.custom_coarse_dropout_classes": (8,)})
    ds = Cityscapes(cfg.dataset, mode="train")
    idx0 = next(i for i, rec in enumerate(ds.imgs)
                if "autolabelled" in rec[1] and "aug_000000" in rec[1])
    label = ds[idx0]["label"]
    # gtCoarse vegetation (right half) overrides pseudo car/road ... except
    # inside the low-confidence strip, which the threshold still drops
    assert (label[8:, W // 2:] == 8).all()
    assert (label[:8, :] == 255).all()
    # left half untouched: road 7->0
    assert (label[8:, : W // 2] == 0).all()

    # image 1's pseudo mask contains NO vegetation pixel, so the merge
    # must not fire (reference presence guard, base_loader.py:179)
    idx1 = next(i for i, rec in enumerate(ds.imgs)
                if "autolabelled" in rec[1] and "aug_000001" in rec[1])
    label1 = ds[idx1]["label"]
    assert set(np.unique(label1[8:, W // 2:]).tolist()) == {13}

    # without the knob the right half keeps the pseudo labels
    ds0 = Cityscapes(make_config(over).dataset, mode="train")
    label0 = ds0[idx0]["label"]
    assert set(np.unique(label0[8:, W // 2:]).tolist()) == {13}


def test_only_coarse_and_disable_coarse(fake_tree, tmp_path):
    """only_coarse pins the coarse centroid set; disable_coarse falls back
    to fine-only (reference: cityscapes.py:169-180, train.py:433-445)."""
    root, cc = fake_tree
    cfg = make_config({
        "dataset.cityscapes_dir": root,
        "dataset.cityscapes_customcoarse": cc,
        "dataset.custom_coarse_prob": 0.5,
        "dataset.class_uniform_pct": 0.5,
        "dataset.class_uniform_tile": 64,
        "dataset.coarse_boost_classes": (13,),
        "dataset.centroid_root": str(tmp_path / "centroids"),
        "dataset.crop_size": (H, W),
    })
    from tpuseg.data.cityscapes import Cityscapes

    ds = Cityscapes(cfg.dataset, mode="train")
    ds.only_coarse()
    assert all("autolabelled" in rec[1]
               for recs in ds.centroids.values() for rec in recs)
    ds.disable_coarse()
    assert all("autolabelled" not in rec[1]
               for recs in ds.centroids.values() for rec in recs)

    # only_coarse without a coarse set is a config error
    plain = Cityscapes(make_config({
        "dataset.cityscapes_dir": root,
        "dataset.class_uniform_pct": 0.5,
        "dataset.class_uniform_tile": 64,
        "dataset.centroid_root": str(tmp_path / "centroids2"),
        "dataset.crop_size": (H, W),
    }).dataset, mode="train")
    with pytest.raises(ValueError, match="only_coarse"):
        plain.only_coarse()


def test_coarse_boost_centroids(fake_tree, tmp_path):
    """coarse_boost_classes merges custom-coarse centroids for the boosted
    class only (reference: cityscapes.py:154-163)."""
    root, cc = fake_tree
    cfg = make_config({
        "dataset.cityscapes_dir": root,
        "dataset.cityscapes_customcoarse": cc,
        "dataset.custom_coarse_prob": 0.5,
        "dataset.class_uniform_pct": 0.5,
        "dataset.class_uniform_tile": 64,
        "dataset.coarse_boost_classes": (13,),
        "dataset.centroid_root": str(tmp_path / "centroids"),
        "dataset.crop_size": (H, W),
    })
    from tpuseg.data.cityscapes import Cityscapes

    ds = Cityscapes(cfg.dataset, mode="train")
    # class 13 (car) has centroids from the auto-labelled tiles
    assert any("autolabelled" in rec[1] for rec in ds.centroids.get(13, []))
    # non-boosted classes only from fine data
    assert all("autolabelled" not in rec[1]
               for rec in ds.centroids.get(0, []))
