"""Host data pipeline: fake on-disk Cityscapes tree -> batches."""
import json
import os
import random

import numpy as np
import pytest
from PIL import Image

from tpuseg.config import make_config
from tpuseg.data.joint_transforms import (
    JointCompose,
    RandomHorizontallyFlip,
    RandomSizeAndCrop,
    Scale,
)
from tpuseg.data.randaugment import RandAugment
from tpuseg.data.relaxed_labels import find_boundaries_thick, relaxed_onehot
from tpuseg.data.sampler import ShardedEpochSampler
from tpuseg.data.setup import setup_data
from tpuseg.data.uniform import build_epoch, class_centroids_image

H, W = 128, 256


@pytest.fixture(scope="module")
def fake_cityscapes(tmp_path_factory):
    """leftImg8bit/gtFine tree: 2 train cities x 2 images, 1 val city."""
    root = tmp_path_factory.mktemp("cs")
    rng = np.random.RandomState(0)
    for split, cities in [("train", ["aachen", "bochum"]), ("val", ["lindau"])]:
        for city in cities:
            img_dir = root / "leftImg8bit_trainvaltest/leftImg8bit" / split / city
            msk_dir = root / "gtFine_trainvaltest/gtFine" / split / city
            img_dir.mkdir(parents=True, exist_ok=True)
            msk_dir.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                base = f"{city}_{i:06d}_000019"
                img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
                Image.fromarray(img).save(
                    img_dir / f"{base}_leftImg8bit.png")
                # raw label ids: road(7), car(26), sky(23), void(0)
                mask = np.zeros((H, W), np.uint8)
                mask[H // 2:, :] = 7
                mask[:H // 4, :] = 23
                mask[60:90, 100:180] = 26
                Image.fromarray(mask).save(
                    msk_dir / f"{base}_gtFine_labelIds.png")
    return str(root)


def _cfg(fake_root, tmp, **over):
    base = {
        "dataset.cityscapes_dir": fake_root,
        "dataset.centroid_root": os.path.join(tmp, "centroids"),
        "dataset.crop_size": (64, 64),
        "dataset.class_uniform_tile": 64,
        "dataset.num_workers": 2,
        "train.batch_size": 2,
    }
    base.update(over)
    return make_config(base)


def test_train_pipeline_end_to_end(fake_cityscapes, tmp_path):
    cfg = _cfg(fake_cityscapes, str(tmp_path))
    train_loader, val_loader, train_set = setup_data(cfg)
    assert len(train_set) == 4  # 2 cities x 2 imgs
    batch = next(iter(train_loader))
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["image"].dtype == np.float32
    assert batch["label"].shape == (2, 64, 64)
    # labels are remapped to trainIds: road=0, sky=10, car=13, void=255
    vals = set(np.unique(batch["label"]).tolist())
    assert vals <= {0, 10, 13, 255}, vals
    # centroid json cached on disk
    files = os.listdir(os.path.join(str(tmp_path), "centroids"))
    assert any("cityscapes_cv0" in f for f in files)


def test_val_pipeline_full_res(fake_cityscapes, tmp_path):
    cfg = _cfg(fake_cityscapes, str(tmp_path))
    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    batch = next(iter(val_loader))
    assert batch["image"].shape == (1, H, W, 3)
    assert batch["label"].shape == (1, H, W)
    assert isinstance(batch["name"][0], str)


def test_epoch_rebuild_changes_crop_list(fake_cityscapes, tmp_path):
    cfg = _cfg(fake_cityscapes, str(tmp_path))
    _, _, train_set = setup_data(cfg)
    train_set.build_epoch(0)
    epoch0 = list(train_set.imgs)
    train_set.build_epoch(1)
    epoch1 = list(train_set.imgs)
    assert len(epoch0) == len(epoch1)
    assert epoch0 != epoch1  # epoch-seeded remix

    # mixing ratio at realistic scale: 100 imgs, 4 classes, pct=0.5
    imgs = [(f"i{k}.png", f"m{k}.png") for k in range(100)]
    cents = {c: [(f"i{c}.png", f"m{c}.png", (1, 1), c)] for c in range(4)}
    epoch = build_epoch(imgs, cents, num_classes=4, class_uniform_pct=0.5,
                        rng=np.random.default_rng(0))
    n_centroid = sum(1 for r in epoch if len(r) == 4)
    assert len(epoch) == 100 and n_centroid == 4 * int(100 * 0.5 / 4)


def test_centroid_extraction_math(tmp_path):
    mask = np.full((64, 64), 7, np.uint8)   # road everywhere
    mask[:, :32] = 26                        # car on left half
    fn = str(tmp_path / "m.png")
    Image.fromarray(mask).save(fn)
    from tpuseg.data.cityscapes_labels import label2trainid
    cents = class_centroids_image(("img.png", fn), tile_size=64,
                                  num_classes=19, id2trainid=label2trainid)
    # car -> trainId 13 centered in left half
    (img_fn, label_fn, (cx, cy), cid), = cents[13]
    assert cid == 13 and 0 <= cx < 32 and 28 <= cy <= 34


def test_random_size_and_crop_centroid_contained():
    img = Image.new("RGB", (W, H))
    mask = Image.new("L", (W, H), 255)
    mask.putpixel((200, 100), 7)  # marker AT the centroid
    t = RandomSizeAndCrop((64, 64), nopad=False, scale_min=1.0,
                          scale_max=1.0)
    for seed in range(20):
        r = random.Random(seed)
        _, m, scale = t(img, mask, r, centroid=(200, 100))
        assert m.size == (64, 64)
        assert scale == 1.0
        # the named property: the centroid pixel is inside every crop
        # (class-uniform sampling exists to guarantee exactly this)
        assert (np.array(m) == 7).any(), seed


def test_hflip_pairs():
    img = Image.fromarray(
        np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
    mask = Image.fromarray(np.array([[1, 2], [3, 4]], np.uint8))
    flipped = False
    for seed in range(10):
        r = random.Random(seed)
        i2, m2 = RandomHorizontallyFlip()(img, mask, r)
        if np.array(m2)[0, 0] == 2:
            flipped = True
            assert np.array(i2)[0, 0, 0] == 3  # image flipped in lockstep
    assert flipped


def test_randaugment_mask_stays_discrete():
    rng = random.Random(3)
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (64, 64, 3), dtype=np.uint8))
    mask = Image.fromarray(np.random.RandomState(1).randint(
        0, 19, (64, 64)).astype(np.uint8))
    ra = RandAugment(n=4, m=15)
    for _ in range(5):
        img2, mask2 = ra(img, mask, rng)
        vals = set(np.unique(np.array(mask2)).tolist())
        assert vals <= set(range(19)) | {255}  # NEAREST + ignore fill only


def test_relaxed_onehot_semantics():
    labels = np.zeros((8, 8), np.int64)
    labels[:, 4:] = 1
    oh = relaxed_onehot(labels, num_classes=3, border=1)
    assert oh.shape == (8, 8, 4)
    # interior pixels far from the boundary: single-hot
    assert oh[2, 1].tolist() == [1, 0, 0, 0]
    assert oh[2, 6].tolist() == [0, 1, 0, 0]
    # image-edge pixels pick up the out-of-bounds (ignore) channel, exactly
    # like the reference's shift(cval=num_classes) (transforms.py:109)
    assert oh[0, 0].tolist() == [1, 0, 0, 1]
    # boundary columns 3/4: both classes acceptable
    assert oh[2, 3].tolist() == [1, 1, 0, 0]
    assert oh[2, 4].tolist() == [1, 1, 0, 0]
    # ignore pixels become the extra channel
    labels[0, 0] = 255
    oh = relaxed_onehot(labels, num_classes=3, border=1)
    assert oh[0, 0, 3] == 1


def test_relaxed_onehot_reduce_border():
    labels = np.zeros((8, 8), np.int64)
    labels[:, 4:] = 1
    oh = relaxed_onehot(labels, num_classes=3, border=1, reduce_border=True)
    # border halved to 0 -> single-hot, but boundary pixels weighted 2x
    assert oh[2, 3].tolist() == [2, 0, 0, 0]
    assert oh[2, 4].tolist() == [0, 2, 0, 0]
    assert oh[2, 0].tolist() == [1, 0, 0, 0]
    b = find_boundaries_thick(labels)
    assert b[2, 3] and b[2, 4] and not b[2, 0]


def test_relaxed_label_transform_carries_config_knobs():
    """setup.relaxed_label_transform threads border_window /
    strict_border_classes / reduce_border from config into relaxed_onehot
    (regression: the partial used to pass only num_classes/ignore_label,
    leaving the knobs dead)."""
    from tpuseg.config import make_config
    from tpuseg.data.setup import relaxed_label_transform

    labels = np.zeros((10, 10), np.int64)
    labels[:, 5:] = 1

    cfg = make_config({"dataset.num_classes": 3, "loss.border_window": 2})
    oh = relaxed_label_transform(cfg, ignore_label=255)(labels)
    # window 2: column 3 is within 2px of the boundary -> both classes
    assert oh[5, 3].tolist()[:2] == [1, 1]
    cfg1 = make_config({"dataset.num_classes": 3, "loss.border_window": 1})
    oh1 = relaxed_label_transform(cfg1, ignore_label=255)(labels)
    assert oh1[5, 3].tolist()[:2] == [1, 0]

    # strict classes pin hard labels at their pixels
    cfg_s = make_config({"dataset.num_classes": 3, "loss.border_window": 1,
                         "loss.strict_border_classes": (1,)})
    ohs = relaxed_label_transform(cfg_s, ignore_label=255)(labels)
    assert ohs[5, 5].tolist()[:2] == [0, 1]

    # reduce_border variant (what the Trainer swaps in after
    # REDUCE_BORDER_EPOCH): halved window + 2x boundary weights
    ohr = relaxed_label_transform(cfg1, 255, reduce_border=True)(labels)
    assert ohr[5, 4].tolist()[:2] == [2, 0]


def test_setup_data_rejects_indivisible_batch(tmp_path):
    from tpuseg.config import make_config
    from tpuseg.data.setup import setup_data

    cfg = make_config({"dataset.name": "cityscapes",
                       "train.batch_size": 8})
    with pytest.raises(ValueError, match="divisible"):
        setup_data(cfg, num_shards=3, shard=0, seed=0)


def test_sharded_sampler():
    shards = [list(ShardedEpochSampler(10, num_shards=4, shard=s, seed=1))
              for s in range(4)]
    assert all(len(s) == 3 for s in shards)  # ceil(10/4) with pad
    flat = sorted(i for s in shards for i in s)
    # padded shards must collectively COVER the dataset (not merely stay
    # in range): a sampler that drops indices starves training silently
    assert set(flat) == set(range(10))
    # epoch changes the permutation
    s0 = ShardedEpochSampler(10, 4, 0, seed=1)
    e0 = list(s0)
    s0.set_epoch(1)
    assert list(s0) != e0


def test_dump_augmentation_images(fake_cityscapes, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = _cfg(fake_cityscapes, str(tmp_path), **{"dataset.dump_images": True})
    _, _, train_set = setup_data(cfg)
    train_set[0]
    out = tmp_path / "dump_augmentation_images_train"
    files = list(out.iterdir())
    assert any(f.name.endswith("_mask.png") for f in files)
    assert any(f.name.endswith("_mask_raw.png") for f in files)


def test_device_normalize_bitwise():
    """uint8 wire: on-device normalization of raw bytes is bit-identical
    to the host path (the claim pinned by tpuseg/ops/normalize.py —
    same input bits, same f32 op sequence)."""
    import jax
    import jax.numpy as jnp

    from tpuseg.data.transforms import to_normalized_array, to_uint8_array
    from tpuseg.ops import device_label, device_normalize

    img = Image.fromarray(np.random.RandomState(7).randint(
        0, 256, (33, 47, 3), dtype=np.uint8))
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    host = to_normalized_array(img, mean, std)
    dev = np.asarray(device_normalize(
        jnp.asarray(to_uint8_array(img)), mean, std))
    assert host.dtype == dev.dtype == np.float32
    np.testing.assert_array_equal(host, dev)  # bitwise

    # ... and UNDER JIT: XLA fast-math re-rounds re-derived arithmetic
    # (measured ~260 ulp), which is why device_normalize gathers from a
    # host-computed constant table instead of recomputing (x/255-m)/s
    jdev = np.asarray(jax.jit(
        lambda x: device_normalize(x, mean, std))(
            jnp.asarray(to_uint8_array(img))))
    np.testing.assert_array_equal(host, jdev)

    # float batches pass through untouched (host-normalized loaders)
    x = jnp.asarray(host)
    assert device_normalize(x, mean, std) is x
    # uint8 labels cast to the int32 the loss/metric ops expect
    lab = np.random.RandomState(1).randint(0, 256, (33, 47)).astype(np.uint8)
    out = device_label(jnp.asarray(lab))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), lab)


def test_transfer_uint8_pipeline(fake_cityscapes, tmp_path):
    """dataset.transfer_uint8 end to end: train AND val loaders ship raw
    uint8 pixels + uint8 labels (1 B/px each vs 12+4 B/px on the f32
    wire), and the device-side normalize/cast reproduces the float-wire
    batch bitwise. Same (seed, epoch, index) => identical augmentations,
    so the two wire formats are comparable sample for sample."""
    import jax.numpy as jnp

    from tpuseg.ops import device_label, device_normalize

    cfg8 = _cfg(fake_cityscapes, str(tmp_path),
                **{"dataset.transfer_uint8": True})
    cfgf = _cfg(fake_cityscapes, str(tmp_path))
    tl8, vl8, _ = setup_data(cfg8)
    tlf, vlf, _ = setup_data(cfgf)

    b8, bf = next(iter(tl8)), next(iter(tlf))
    assert b8["image"].dtype == np.uint8
    # the train label wire engages too (round-4 gap: labels stayed int32)
    assert b8["label"].dtype == np.uint8
    norm = np.asarray(device_normalize(
        jnp.asarray(b8["image"]), cfg8.dataset.mean, cfg8.dataset.std))
    np.testing.assert_array_equal(norm, bf["image"])
    np.testing.assert_array_equal(
        np.asarray(device_label(jnp.asarray(b8["label"]))), bf["label"])

    v8, vf = next(iter(vl8)), next(iter(vlf))
    assert v8["image"].dtype == np.uint8 and v8["label"].dtype == np.uint8
    np.testing.assert_array_equal(
        np.asarray(device_normalize(
            jnp.asarray(v8["image"]), cfg8.dataset.mean, cfg8.dataset.std)),
        vf["image"])
    np.testing.assert_array_equal(v8["label"].astype(np.int32), vf["label"])

    # relaxed-label training keeps its multi-hot label tensor even on the
    # uint8 wire (only the image rides the byte path)
    cfgr = _cfg(fake_cityscapes, str(tmp_path),
                **{"dataset.transfer_uint8": True,
                   "dataset.jointwtborder": True})
    tlr, _, _ = setup_data(cfgr)
    br = next(iter(tlr))
    assert br["image"].dtype == np.uint8
    assert br["label"].ndim == 4  # (B, H, W, C+1) relaxed multi-hot


def test_device_normalize_non_uint8_integer():
    """Contract guard: only uint8 rides the table gather (jnp.take clips,
    so out-of-range values in a wider dtype would alias into a
    NEIGHBORING channel's table segment) — non-uint8 integers take the
    plain arithmetic path and normalize correctly for ANY value."""
    import jax.numpy as jnp

    from tpuseg.ops import device_normalize

    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    # values far outside 0..255, incl. negatives
    img = np.asarray([[[-40, 300, 70]]], np.int32)
    got = np.asarray(device_normalize(jnp.asarray(img), mean, std))
    want = ((img.astype(np.float32) / np.float32(255.0)
             - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # the in-range byte path stays bitwise vs the LUT
    img8 = np.asarray([[[0, 128, 255]]], np.uint8)
    np.testing.assert_array_equal(
        np.asarray(device_normalize(jnp.asarray(img8), mean, std)),
        np.asarray(device_normalize(jnp.asarray(img8.astype(np.int32)),
                                    mean, std)))


def test_padded_eval_bitwise_across_wires():
    """pad_multiple x transfer_uint8 (the eval_mapillary.yaml combination):
    EvalRunner's shape-bucketing zero-pad must not make the two wire
    formats diverge. A raw uint8 zero-pad normalizes to ~-2.1 sigma black
    while the f32 wire's zero-pad IS normalized-space 0.0 — the jitted
    forward therefore masks the padded border to 0.0 after on-device
    normalization (make_eval_forward ``valid_hw``), making padded batches
    bitwise-identical across wires. The probe model spatially mixes a
    5x5 neighborhood, so border content bleeds into valid pixels and a
    wire-dependent pad value WOULD move predictions and max-softmax."""
    import jax
    import jax.numpy as jnp

    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.ops import device_normalize

    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    rng = np.random.RandomState(11)
    raw = rng.randint(0, 256, (1, 12, 20, 3)).astype(np.uint8)
    lab = rng.randint(0, 7, (1, 12, 20))
    host = ((raw.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
            / np.asarray(std, np.float32))
    # the hazard this test pins: zero-padded raw bytes do NOT normalize
    # to the f32 wire's zero-padded border
    np.testing.assert_raises(
        AssertionError, np.testing.assert_array_equal,
        np.asarray(device_normalize(
            jnp.asarray(np.pad(raw, ((0, 0), (0, 4), (0, 4), (0, 0)))),
            mean, std)),
        np.pad(host, ((0, 0), (0, 4), (0, 4), (0, 0))))

    ker = jnp.asarray(rng.randn(5, 5, 3, 7).astype(np.float32))

    class _BoxMix:
        def apply(self, variables, x, train=False):
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), ker, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return {"pred": y}

    outs = {}
    for wire, img, label in (("f32", host, lab.astype(np.int32)),
                             ("u8", raw, lab.astype(np.uint8))):
        runner = EvalRunner(_BoxMix(), 7, scales=(1.0,), is_mscale=True,
                            pad_multiple=8, mean=mean, std=std)
        out, hist, _ = runner.run_batch({}, {"image": img, "label": label})
        outs[wire] = (out, hist)
    np.testing.assert_array_equal(outs["f32"][0]["predictions"],
                                  outs["u8"][0]["predictions"])
    # max-softmax agreement pins the LOGITS across wires, not just argmax
    np.testing.assert_array_equal(outs["f32"][0]["prob_mask"],
                                  outs["u8"][0]["prob_mask"])
    np.testing.assert_array_equal(outs["f32"][1], outs["u8"][1])
    assert outs["f32"][0]["predictions"].shape == (1, 12, 20)  # cropped
