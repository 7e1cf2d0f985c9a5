"""End-to-end engine tests: Trainer.fit on fake data, eval runner,
checkpoint round trip, dumper outputs. CPU, tiny model."""
import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from tpuseg.config import make_config

H, W = 64, 128


@pytest.fixture(scope="module")
def fake_cityscapes(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs")
    rng = np.random.RandomState(0)
    for split, cities in [("train", ["aachen"]), ("val", ["lindau"])]:
        for city in cities:
            img_dir = root / "leftImg8bit_trainvaltest/leftImg8bit" / split / city
            msk_dir = root / "gtFine_trainvaltest/gtFine" / split / city
            img_dir.mkdir(parents=True)
            msk_dir.mkdir(parents=True)
            for i in range(2):
                base = f"{city}_{i:06d}_000019"
                Image.fromarray(rng.randint(0, 255, (H, W, 3),
                                            dtype=np.uint8)).save(
                    img_dir / f"{base}_leftImg8bit.png")
                mask = np.zeros((H, W), np.uint8)
                mask[H // 2:, :] = 7
                mask[:H // 4, :] = 23
                Image.fromarray(mask).save(
                    msk_dir / f"{base}_gtFine_labelIds.png")
    return str(root)


def engine_cfg(fake_root, tmp):
    return make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.name": "cityscapes",
        "dataset.cityscapes_dir": fake_root,
        "dataset.centroid_root": os.path.join(tmp, "centroids"),
        "dataset.crop_size": (32, 32),
        "dataset.class_uniform_tile": 32,
        "dataset.num_workers": 2,
        "dataset.gblur": False,
        "dataset.color_aug": 0.0,
        "train.batch_size": 2,
        "train.test_mode": True,
        "train.max_epoch": 2,
        "train.log_every": 1,
        "eval.scales": (0.5, 1.0),
        "loss.loss_type": "ce",
        "optim.lr": 1e-3,
    })


def test_trainer_fit_end_to_end(fake_cityscapes, tmp_path):
    from tpuseg.train.loop import Trainer

    logdir = str(tmp_path / "logs")
    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    trainer = Trainer(cfg, logdir=logdir)
    trainer.fit()

    # metrics stream written
    lines = [json.loads(l) for l in
             open(os.path.join(logdir, "metrics.jsonl"))]
    assert any(l["phase"] == "train" for l in lines)
    assert any(l["phase"] == "val" for l in lines)
    val = [l for l in lines if l["phase"] == "val"][-1]
    assert 0.0 <= val["mIoU"] <= 1.0

    # checkpoint written and restorable; resume fast-forwards the epoch
    assert trainer.ckpt.latest_step() is not None
    trainer2 = Trainer(cfg, logdir=logdir)
    assert trainer2.start_epoch >= 1

    # the restored state must TRAIN: orbax restore without a structure
    # target loses the optax namedtuples and tx.update crashes (regression)
    import jax
    from tpuseg.parallel import shard_batch

    batch = next(iter(trainer2.train_loader))
    db = shard_batch(trainer2.mesh, {"image": batch["image"],
                                     "label": batch["label"]})
    step_fn = trainer2._get_train_step(False)
    # read BEFORE the step: the jitted step donates its input state, so
    # trainer2.state buffers are deleted once step_fn returns
    step_before = int(trainer2.state.step)
    state, metrics = step_fn(trainer2.state, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == step_before + 1


def test_training_is_bitwise_deterministic(tmp_path):
    """Two fresh Trainers with the same config produce an identical
    epoch-average loss: explicit rng everywhere (SURVEY §5.2), seeded
    sampler permutations, no wall-clock or host randomness in the step."""
    import dataclasses as dc

    from tpuseg.train.loop import Trainer

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.name": "synthetic",
        "dataset.num_classes": 19,
        "dataset.crop_size": (32, 32),
        "dataset.num_workers": 1,
        "train.batch_size": 2,
        "train.test_mode": True,
        "train.max_epoch": 1,
        "train.log_every": 100,
        "eval.scales": (0.5, 1.0),
        "loss.loss_type": "ce",
    })
    losses = []
    for run in range(2):
        cfg_r = cfg.replace(train=dc.replace(
            cfg.train, checkpoint_dir=str(tmp_path / f"ck{run}")))
        t = Trainer(cfg_r, logdir=str(tmp_path / f"logs{run}"))
        losses.append(t.train_epoch(0))
    assert losses[0] == losses[1], losses


def test_trainer_profile_steps(fake_cityscapes, tmp_path):
    """train.profile_steps captures a device trace of the first steps
    (SURVEY §5.1) without perturbing training."""
    import dataclasses as dc
    import glob

    from tpuseg.train.loop import Trainer

    logdir = str(tmp_path / "logs")
    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg = cfg.replace(train=dc.replace(cfg.train, profile_steps=2,
                                       max_epoch=1))
    trainer = Trainer(cfg, logdir=logdir)
    trainer.train_epoch(0)
    # at least one trace FILE was written (bare directories also match
    # `**/*`, and start_trace creates those before any artifact exists)
    found = [p for p in glob.glob(os.path.join(logdir, "trace", "**", "*"),
                                  recursive=True) if os.path.isfile(p)]
    assert found, "no profiler trace artifact written"


def test_eval_runner_avgpool_and_flip(fake_cityscapes, tmp_path):
    """Outer flip x extra-scale averaging (reference:
    trnval_utils.py:109-160)."""
    import jax
    import jax.numpy as jnp

    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.models import get_model

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    model = get_model(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    runner = EvalRunner(model, 19, scales=(1.0, 0.5), do_flip=True,
                        is_mscale=True)
    batch = {"image": np.random.RandomState(0).randn(1, 32, 32, 3).astype(
        np.float32), "label": np.zeros((1, 32, 32), np.int32)}
    assets, hist, _ = runner.run_batch(variables, batch, calc_metrics=True)
    assert assets["predictions"].shape == (1, 32, 32)
    assert hist.sum() == 32 * 32
    assert "err_mask" in assets


def test_batched_validation_matches_bs1(fake_cityscapes, tmp_path):
    """eval.batch_size (reference --bs_val): the confusion matrix is
    additive over images, so batched eval must reproduce bs=1 metrics
    bit-for-bit on a fixed-resolution val set."""
    from tpuseg.train.loop import evaluate_only

    base = engine_cfg(fake_cityscapes, str(tmp_path))
    m1 = evaluate_only(base, logdir=str(tmp_path / "bs1"))
    cfg2 = base.replace(eval=dataclasses.replace(base.eval, batch_size=2))
    m2 = evaluate_only(cfg2, logdir=str(tmp_path / "bs2"))
    assert m1.mean_iou == m2.mean_iou
    assert m1.acc == m2.acc
    np.testing.assert_array_equal(np.asarray(m1.iou), np.asarray(m2.iou))


def test_evaluate_only_with_dumps(fake_cityscapes, tmp_path):
    from tpuseg.train.loop import evaluate_only

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    import dataclasses

    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, dump_assets=True,
                                               dump_all_images=True))
    logdir = str(tmp_path / "evallogs")
    metrics = evaluate_only(cfg, logdir=logdir)
    assert metrics is not None and 0.0 <= metrics.mean_iou <= 1.0
    dump_dir = os.path.join(logdir, "eval_images")
    files = os.listdir(dump_dir)
    assert "index.html" in files
    assert any(f.endswith("_prediction.png") for f in files)
    assert any(f.endswith("_composited.png") for f in files)
    assert any("attn_" in f for f in files)  # mscale assets dumped


def test_forgiving_merge_shape_mismatch():
    from tpuseg.train.checkpoint import forgiving_merge

    target = {"a": {"w": np.zeros((3, 3))}, "b": {"w": np.zeros(4)}}
    loaded = {"a": {"w": np.ones((3, 3))}, "b": {"w": np.ones(7)}}
    merged = forgiving_merge(target, loaded, log=lambda *_: None)
    assert (merged["a"]["w"] == 1).all()   # shape match -> loaded
    assert (merged["b"]["w"] == 0).all()   # mismatch -> kept target


def test_checkpoint_extra_meta_roundtrip(tmp_path):
    """save(extra={numeric}) checkpoints must stay restorable: the restore
    template is rebuilt from the checkpoint's own meta structure."""
    import optax

    from tpuseg.train.checkpoint import CheckpointManager

    class FakeState:
        params = {"w": np.ones((2, 2), np.float32)}
        batch_stats = {"m": np.zeros((2,), np.float32)}
        opt_state = optax.sgd(1e-3, momentum=0.9).init(
            {"w": np.ones((2, 2), np.float32)})
        step = 7

    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(7, FakeState(), epoch=3, mean_iu=0.5, extra={"aux_wt": 0.4})
    out = mgr.restore(target_state=FakeState())
    assert out["meta"]["epoch"] == 3
    assert abs(out["meta"]["aux_wt"] - 0.4) < 1e-9
    # optax namedtuple containers reconstructed, not plain dicts
    assert hasattr(out["opt_state"][0], "trace")


def test_scale_hist_collective_count_is_data_independent(fake_cityscapes,
                                                         tmp_path,
                                                         monkeypatch):
    """Multi-host safety: evaluate_only must issue the same number of
    multihost_sum collectives whether a host's val shard is empty or not —
    otherwise hosts deadlock mid-eval (per-scale hists used to be reduced
    by iterating the data-dependent accumulated dict)."""
    import tpuseg.train.loop as loop_mod

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))

    calls = []
    real = loop_mod.multihost_sum
    monkeypatch.setattr(loop_mod, "multihost_sum",
                        lambda x: calls.append(1) or real(x))

    from tpuseg.train.loop import evaluate_only

    evaluate_only(cfg, logdir=str(tmp_path / "l1"), eval_mode="val")
    n_with_data = len(calls)

    # empty val shard: same cfg, but the loader yields nothing
    calls.clear()
    import tpuseg.data.setup as setup_mod
    real_setup = setup_mod.setup_data

    def empty_val(cfg2, **kw):
        train_loader, val_loader, train_set = real_setup(cfg2, **kw)

        class Empty:
            dataset = val_loader.dataset

            def __iter__(self):
                return iter(())

            def __len__(self):
                return 0

        return train_loader, Empty(), train_set

    monkeypatch.setattr(loop_mod, "setup_data", empty_val)
    evaluate_only(cfg, logdir=str(tmp_path / "l2"), eval_mode="val")
    assert len(calls) == n_with_data > 0


def test_loader_knob_validation(fake_cityscapes, tmp_path):
    """Unknown dataset.loader values must raise, not silently fall back
    to the threaded loader."""
    from tpuseg.data.setup import setup_data

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg = cfg.replace(dataset=dataclasses.replace(cfg.dataset,
                                                  loader="grian"))
    with pytest.raises(ValueError, match="loader"):
        setup_data(cfg, seed=0)


def test_reduce_border_label_swap():
    """After REDUCE_BORDER_EPOCH the Trainer swaps the train set's label
    transform to the reduce_border variant (halved window, 2x boundary
    weights — reference transforms/transforms.py:103-123). Regression:
    the label side of the flip used to never happen."""
    from types import SimpleNamespace

    from tpuseg.train.loop import Trainer

    cfg = make_config({"dataset.jointwtborder": True,
                       "dataset.num_classes": 3,
                       "loss.loss_type": "relaxed",
                       "loss.border_window": 2,
                       "loss.reduce_border_epoch": 0})
    ds = SimpleNamespace(label_transform=None, ignore_label=255)
    stub = SimpleNamespace(cfg=cfg, train_set=ds)

    Trainer._maybe_reduce_border_labels(stub, invert=False)
    assert ds.label_transform is None  # before the threshold: unchanged

    Trainer._maybe_reduce_border_labels(stub, invert=True)
    labels = np.zeros((8, 8), np.int64)
    labels[:, 4:] = 1
    oh = ds.label_transform(labels)
    # window halved 2 -> 1 and boundary pixels weighted 2x
    assert oh[4, 3].tolist()[:2] == [2, 2]
    assert oh[4, 0].tolist()[:2] == [1, 0]


def test_run_batch_skips_asset_transfers(fake_cityscapes, tmp_path):
    """need_assets=False must skip every full-res device->host transfer
    while leaving the confusion matrix and val loss identical."""
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.models import get_model

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    model = get_model(cfg)
    import jax
    import jax.numpy as jnp
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    runner = EvalRunner(model, cfg.dataset.num_classes, scales=(1.0,),
                        is_mscale=True)
    batch = {"image": np.random.RandomState(0)
             .randn(1, 32, 32, 3).astype(np.float32),
             "label": np.zeros((1, 32, 32), np.int64), "name": ["x"]}
    full, hist_full, _ = runner.run_batch(variables, batch)
    lean, hist_lean, _ = runner.run_batch(variables, batch,
                                          need_assets=False)
    assert "predictions" in full and "err_mask" in full
    assert "predictions" not in lean and "err_mask" not in lean
    np.testing.assert_array_equal(hist_full, hist_lean)


def test_boundary_fscore():
    from tpuseg.evaluation.f_boundary import db_eval_boundary

    gt = np.zeros((32, 32), bool)
    gt[8:24, 8:24] = True
    assert db_eval_boundary(gt, gt) == 1.0
    shifted = np.roll(gt, 1, axis=0)
    f = db_eval_boundary(shifted, gt)
    assert 0.9 < f <= 1.0   # 1px shift within tolerance band
    far = np.zeros_like(gt)
    far[28:, 28:] = True
    assert db_eval_boundary(far, gt) < 0.3


def test_seg2bmap_matches_reference():
    """_seg2bmap == a literal transcription of the reference seg2bmap
    (utils/f_boundary.py:176-233): boundaries marked on BOTH sides of the
    edge (regression: an `& seg` mask used to drop the left/top marks)."""
    from tpuseg.evaluation.f_boundary import _seg2bmap

    def ref_seg2bmap(seg):
        seg = seg.astype(bool).copy()
        e = np.zeros_like(seg)
        s = np.zeros_like(seg)
        se = np.zeros_like(seg)
        e[:, :-1] = seg[:, 1:]
        s[:-1, :] = seg[1:, :]
        se[:-1, :-1] = seg[1:, 1:]
        b = seg ^ e | seg ^ s | seg ^ se
        b[-1, :] = seg[-1, :] ^ e[-1, :]
        b[:, -1] = seg[:, -1] ^ s[:, -1]
        b[-1, -1] = 0
        return b

    rng = np.random.default_rng(0)
    for _ in range(25):
        h, w = rng.integers(2, 40, 2)
        seg = rng.random((h, w)) < 0.4
        np.testing.assert_array_equal(_seg2bmap(seg), ref_seg2bmap(seg))
    # the left edge of [0,1,1,0] is marked on the background side
    row = np.array([[0, 1, 1, 0], [0, 1, 1, 0]])
    np.testing.assert_array_equal(_seg2bmap(row)[0], [1, 0, 1, 0])


def test_dilate_disk_matches_dense_footprint():
    """The EDT-threshold dilation equals binary_dilation with the dense
    Euclidean-disk footprint (what skimage disk(r) builds)."""
    from scipy.ndimage import binary_dilation

    from tpuseg.evaluation.f_boundary import _dilate_disk

    rng = np.random.default_rng(1)
    for r in [1, 3, 7]:
        b = rng.random((48, 64)) < 0.02
        y, x = np.ogrid[-r:r + 1, -r:r + 1]
        disk = x * x + y * y <= r * r
        np.testing.assert_array_equal(_dilate_disk(b, r),
                                      binary_dilation(b, disk))
    # r=0 and empty masks are identity
    b = np.zeros((8, 8), bool)
    np.testing.assert_array_equal(_dilate_disk(b, 3), b)


def test_cli_config_parsing(tmp_path):
    from tpuseg.cli.main import load_config

    recipe = tmp_path / "r.yaml"
    recipe.write_text("model.arch: deepv3.DeepWV3Plus\noptim.lr: 0.01\n")
    cfg = load_config(str(recipe), ["train.batch_size=4",
                                    "eval.scales=0.5,1.0,2.0"])
    assert cfg.model.arch == "deepv3.DeepWV3Plus"
    assert cfg.optim.lr == 0.01
    assert cfg.train.batch_size == 4
    assert cfg.eval.scales == (0.5, 1.0, 2.0)
    # bracketed-list override form
    cfg = load_config(None, ["dataset.crop_size=[64,128]"])
    assert tuple(cfg.dataset.crop_size) == (64, 128)
    # YAML-style booleans: 'false' must become False, not a truthy string
    # (regression: `--set model.remat=false` used to ENABLE remat)
    cfg = load_config(None, ["model.remat=false", "eval.do_flip=true",
                             "model.n_scales=null"])
    assert cfg.model.remat is False
    assert cfg.eval.do_flip is True
    assert cfg.model.n_scales is None


def test_cli_train_checkpoint_maps_to_snapshot(monkeypatch, tmp_path):
    """`tpuseg train --checkpoint X` must warm-start from X (reference
    --snapshot); silently ignoring it would burn a full run from fresh
    init (regression)."""
    from tpuseg.cli import main as cli_main

    seen = {}

    class FakeTrainer:
        def __init__(self, cfg, logdir=None, is_primary=True):
            seen["cfg"] = cfg

        def fit(self):
            pass

    import tpuseg.train.loop as loop_mod
    monkeypatch.setattr(loop_mod, "Trainer", FakeTrainer)
    cli_main.main(["train", "--checkpoint", "/some/snapshot",
                   "--set", "model.arch=deepv3.DeepWV3Plus"])
    assert seen["cfg"].train.snapshot == "/some/snapshot"


def test_all_shipped_recipes_load():
    """Every recipe under cli/recipes must round-trip through make_config.

    Guards recipe keys against config-schema drift (the reference's runx
    YAMLs are only validated at launch time, scripts/*.yml)."""
    import glob
    import os

    from tpuseg.cli.main import load_config
    from tpuseg.models import get_model

    recipes = sorted(glob.glob(os.path.join(
        os.path.dirname(__file__), "..", "tpuseg", "cli", "recipes",
        "*.yaml")))
    assert len(recipes) >= 8
    for path in recipes:
        cfg = load_config(path, [])
        # the arch string must resolve in the model registry
        module, _, fn = cfg.model.arch.partition(".")
        assert module and fn, path
        get_model(cfg.replace())  # raises if the factory is unknown


def test_eval_runner_pad_multiple(fake_cityscapes, tmp_path):
    """Shape bucketing: ragged val sizes share one compiled graph; hist is
    exact because padded labels are ignore."""
    import jax
    import jax.numpy as jnp

    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.models import get_model

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    runner = EvalRunner(model, 19, is_mscale=True, pad_multiple=32)
    rng = np.random.RandomState(0)
    for h, w in [(33, 57), (40, 64), (33, 57)]:
        batch = {"image": rng.randn(1, h, w, 3).astype(np.float32),
                 "label": rng.randint(0, 19, (1, h, w)).astype(np.int32)}
        assets, hist, _ = runner.run_batch(variables, batch)
        assert assets["predictions"].shape == (1, h, w)
        assert hist.sum() == h * w  # padded ignore pixels excluded


def test_folder_mode_and_submission(fake_cityscapes, tmp_path):
    """Folder inference (no masks) + submission dumps (trainId->labelId)
    (reference: train.py:422-426, datasets/utils.py:4, misc.py:316-324)."""
    import dataclasses

    from tpuseg.train.loop import evaluate_only

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            folder / f"img{i}.png")

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg = cfg.replace(
        dataset=dataclasses.replace(cfg.dataset, eval_folder=str(folder)),
        eval=dataclasses.replace(cfg.eval, dump_all_images=True))
    logdir = str(tmp_path / "folderlogs")
    result = evaluate_only(cfg, logdir=logdir, eval_mode="folder")
    assert result is None  # no metrics without ground truth
    files = os.listdir(os.path.join(logdir, "eval_images"))
    assert sum(f.endswith("_prediction.png") for f in files) == 2

    # submission mode: trainId -> labelId PNGs in submit/
    cfg2 = cfg.replace(eval=dataclasses.replace(
        cfg.eval, dump_for_submission=True, dump_all_images=False))
    logdir2 = str(tmp_path / "subflogs")
    evaluate_only(cfg2, logdir=logdir2, eval_mode="folder")
    sub = os.path.join(logdir2, "eval_images", "submit")
    subs = [f for f in os.listdir(sub) if f.endswith(".png")]
    assert len(subs) == 2
    arr = np.array(Image.open(os.path.join(sub, subs[0])))
    # values are raw label ids (7..33 range for predicted classes), not
    # trainIds 0..18
    assert arr.max() >= 7


def test_evaluate_only_dump_topn(fake_cityscapes, tmp_path):
    """eval.dump_topn routes evaluate_only through validate_topn
    (reference --dump_topn: train.py:163-168, trnval_utils.py:201-348)."""
    import dataclasses

    from tpuseg.train.loop import evaluate_only

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, dump_topn=2))
    logdir = str(tmp_path / "topnlogs")
    metrics = evaluate_only(cfg, logdir=logdir)
    assert metrics is not None and 0.0 <= metrics.mean_iou <= 1.0
    out_dir = os.path.join(logdir, "eval_images", "best_images")
    files = os.listdir(out_dir)
    assert "topn_failures.html" in files
    assert any(f.endswith("_err_mask.png") for f in files)


def test_dumper_write_summaries(fake_cityscapes, tmp_path):
    """TB image grid assembly (reference write_summaries,
    utils/misc.py:388-417): strips collected during dump are padded to a
    common width and sent through Logger.image."""
    from tpuseg.evaluation.dumper import ImageDumper

    dumper = ImageDumper(val_len=2, dump_dir=str(tmp_path / "d"),
                         palette=None, dump_all_images=True)
    rng = np.random.RandomState(0)
    for idx, (h, w) in enumerate([(16, 24), (16, 20)]):
        dumper.dump({"input_images": rng.randn(1, h, w, 3).astype(np.float32),
                     "gt_images": np.zeros((1, h, w), np.int32),
                     "img_names": [f"im{idx}"],
                     "assets": {"predictions":
                                np.zeros((1, h, w), np.int32),
                                "prob_mask": np.ones((1, h, w))}}, idx)
    assert len(dumper.imgs_to_tensorboard) == 2

    grabbed = {}

    class FakeLogger:
        def image(self, tag, img, step):
            grabbed[tag] = (img, step)

    dumper.write_summaries(FakeLogger(), 7)
    img, step = grabbed["val/dumped_images"]
    assert step == 7
    assert img.shape == (32, 24 * 4, 3)  # rows stacked, width-padded
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_cross_dataset_snapshot_transfer(tmp_path):
    """The reference's Mapillary->Cityscapes warm start: a 65-class
    checkpoint forgiving-restored into a 19-class model loads every
    shape-compatible leaf and keeps fresh init for the classifier heads
    (reference forgiving_state_restore: loss/optimizer.py:137-154,
    train_cityscapes.yml snapshot)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from tpuseg.models import get_model
    from tpuseg.train.checkpoint import load_snapshot

    def init_vars(num_classes, fill=None):
        cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                           "model.compute_dtype": "float32",
                           "model.remat": False,
                           "dataset.num_classes": num_classes})
        model = get_model(cfg)
        v = model.init(jax.random.PRNGKey(0 if fill is None else 1),
                       jnp.zeros((1, 32, 32, 3)), train=False)
        if fill is not None:
            v = jax.tree.map(lambda x: jnp.full_like(x, fill), v)
        return v

    src = init_vars(65, fill=0.25)
    path = str(tmp_path / "ckpt65")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": src["params"],
                      "batch_stats": src["batch_stats"]})
    ckptr.wait_until_finished()

    tgt = init_vars(19)
    skipped = []
    params, stats = load_snapshot(path, tgt["params"], tgt["batch_stats"],
                                  log=skipped.append)
    # trunk leaves transferred...
    got = jax.tree.leaves(params["backbone"])[0]
    assert (np.asarray(got) == 0.25).all()
    # ...classifier heads (19- vs 65-class shapes) kept fresh init
    assert any("cls" in s for s in skipped)
    cls_kernel = params["ocr"]["cls"]["kernel"]
    assert cls_kernel.shape[-1] == 19
    assert not (np.asarray(cls_kernel) == 0.25).all()


def test_dump_topn_requires_labels(fake_cityscapes, tmp_path):
    """folder/auto-label/submission modes have no ground truth: dump_topn
    must refuse instead of ranking against dummy labels."""
    import dataclasses

    from tpuseg.train.loop import evaluate_only

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, dump_topn=2,
                                               dump_for_submission=True))
    with pytest.raises(ValueError, match="labels"):
        evaluate_only(cfg, logdir=str(tmp_path / "l"))


def test_per_scale_iou_and_default_scale(fake_cityscapes, tmp_path):
    """Outer multi-scale eval reports a per-scale IoU breakdown, and
    eval.default_scale sets the base inference scale (reference
    --default_scale/--log_msinf_to_tb: trnval_utils.py:95-99,
    misc.py:118-132 — the reference's per-scale table is degenerate
    [eval_metrics hard-codes scales=[1.0]]; here it is live)."""
    import jax
    import jax.numpy as jnp

    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.evaluation.metrics import format_evaluate_results
    from tpuseg.models import get_model

    cfg = engine_cfg(fake_cityscapes, str(tmp_path))
    model = get_model(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    batch = {"image": np.random.RandomState(0).randn(1, 32, 32, 3).astype(
        np.float32), "label": np.zeros((1, 32, 32), np.int32)}

    runner = EvalRunner(model, 19, scales=(1.0, 0.5), do_flip=True,
                        is_mscale=True)
    assets, hist, _ = runner.run_batch(variables, batch, calc_metrics=True)
    sh = assets["scale_hists"]
    assert sorted(sh) == [0.5, 1.0]
    for h in sh.values():
        assert h.shape == (19, 19) and h.sum() == 32 * 32
    table = format_evaluate_results(hist, epoch=0, iou_per_scale=sh)
    assert "iU_0.5" in table and "iU_1.0" in table
    assert "mean iou @0.5x" in table

    # default_scale != 1.0 as the base (and only) scale: output still at
    # input resolution (resized back), exact hist
    r2 = EvalRunner(model, 19, scales=(2.0,), is_mscale=True)
    a2, h2, _ = r2.run_batch(variables, batch, calc_metrics=True)
    assert a2["predictions"].shape == (1, 32, 32)
    assert h2.sum() == 32 * 32
    assert "scale_hists" not in a2  # single scale: no breakdown


def test_preemption_checkpoint_and_resume_bitwise(tmp_path, monkeypatch):
    """Kill-and-resume drill (reference AutoResume: termination poll +
    checkpoint + restart handshake, train.py:303-321,343-358): a
    termination request after epoch 0 makes fit() checkpoint and exit; a
    fresh Trainer on the same logdir auto-resumes at epoch 1; and the
    resumed run's final params / opt_state / batch_stats are BITWISE
    identical to an uninterrupted run — explicit rng plus step-carried
    schedule state make preemption invisible to the trajectory."""
    import jax

    from tpuseg.train.loop import Trainer

    base = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.name": "synthetic",
        "dataset.num_classes": 19,
        "dataset.crop_size": (32, 32),
        "dataset.num_workers": 1,
        "train.batch_size": 2,
        "train.test_mode": True,
        "train.log_every": 100,
        "eval.scales": (0.5, 1.0),
        "loss.loss_type": "ce",
    })

    def leaves(state):
        return [np.asarray(x) for x in jax.tree.leaves(
            {"p": state.params, "o": state.opt_state,
             "b": state.batch_stats})]

    # uninterrupted reference run (test_mode: 2 epochs x 10 steps)
    cfg_a = base.replace(train=dataclasses.replace(
        base.train, checkpoint_dir=str(tmp_path / "ckA")))
    ta = Trainer(cfg_a, logdir=str(tmp_path / "logsA"))
    ta.fit()
    want = leaves(ta.state)

    # interrupted run: the preemption signal arrives during epoch 0
    term = tmp_path / "TERMINATE"
    term.write_text("")
    monkeypatch.setenv("TPUSEG_TERMINATE_FILE", str(term))
    cfg_b = base.replace(train=dataclasses.replace(
        base.train, checkpoint_dir=str(tmp_path / "ckB")))
    tb1 = Trainer(cfg_b, logdir=str(tmp_path / "logsB"))
    tb1.fit()
    assert int(tb1.state.step) == 10  # stopped after epoch 0
    assert tb1.ckpt.latest_step() is not None

    # "restart": signal gone, a fresh process resumes from the checkpoint
    term.unlink()
    tb2 = Trainer(cfg_b, logdir=str(tmp_path / "logsB"))
    assert tb2.start_epoch == 1
    tb2.fit()

    assert int(tb2.state.step) == int(ta.state.step) == 20
    got = leaves(tb2.state)
    assert len(got) == len(want)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_transfer_uint8_wire_bitwise_engine(fake_cityscapes, tmp_path):
    """The uint8 wire is a pure transport change: evaluate_only and a full
    Trainer.fit produce bitwise-identical metrics on either wire format
    (device_normalize reproduces host normalization exactly, and the
    (seed, epoch, index)-keyed augmentations are wire-independent). Also
    guards the dumper's raw-uint8 input handling: the dumped _input.png
    must be the actual pixels, not a de-normalized garbage image."""
    from tpuseg.train.loop import Trainer, evaluate_only

    base = engine_cfg(fake_cityscapes, str(tmp_path))
    cfg8 = base.replace(dataset=dataclasses.replace(
        base.dataset, transfer_uint8=True))

    mf = evaluate_only(base, logdir=str(tmp_path / "wf"))
    cfg8_dump = cfg8.replace(eval=dataclasses.replace(
        cfg8.eval, dump_all_images=True))
    m8 = evaluate_only(cfg8_dump, logdir=str(tmp_path / "w8"))
    assert mf.mean_iou == m8.mean_iou
    np.testing.assert_array_equal(np.asarray(mf.iou), np.asarray(m8.iou))

    # dumped input == raw source pixels (val pipeline has no aug/resize)
    dump_dir = os.path.join(str(tmp_path / "w8"), "eval_images")
    name = next(f for f in sorted(os.listdir(dump_dir))
                if f.endswith("_input.png"))
    dumped = np.asarray(Image.open(os.path.join(dump_dir, name)))
    src = os.path.join(
        fake_cityscapes, "leftImg8bit_trainvaltest/leftImg8bit/val/lindau",
        name.replace("_input.png", ".png"))
    np.testing.assert_array_equal(dumped, np.asarray(Image.open(src)))

    # full fit: identical train-loss trajectory on either wire
    t_f = Trainer(base, logdir=str(tmp_path / "tf"))
    t_f.fit()
    t_8 = Trainer(cfg8, logdir=str(tmp_path / "t8"))
    t_8.fit()
    lines_f = [json.loads(l) for l in
               open(os.path.join(str(tmp_path / "tf"), "metrics.jsonl"))]
    lines_8 = [json.loads(l) for l in
               open(os.path.join(str(tmp_path / "t8"), "metrics.jsonl"))]
    tr_f = [l["loss"] for l in lines_f if l["phase"] == "train"]
    tr_8 = [l["loss"] for l in lines_8 if l["phase"] == "train"]
    assert tr_f == tr_8 and len(tr_f) >= 2
