"""Composed-val-loop oracle vs the ACTUAL reference validate() (VERDICT r4
Missing #2).

Every piece of the eval path has its own oracle (model logits < 1e-4,
resize bit-match, hist, transforms) — this test pins the COMPOSITION: the
reference's own val loop (train.py:536-597 ``validate`` metric body +
utils/trnval_utils.py:82-198 ``eval_minibatch`` + utils/misc.py:50-99
``fast_hist``/``calculate_iou``), driven end-to-end over a miniature
cityscapes tree with flips AND outer avgpool scales enabled
(tools/torch_reference.py --val-dump), must be reproduced by tpuseg's
``evaluate_only`` from converted weights with an IDENTICAL accumulated
confusion matrix — composition-order bugs (flip/scale averaging order,
pre- vs post-softmax averaging, resize convention, ignore handling at the
hist boundary) are exactly what piecewise tests miss.

Mutation-proven: post-softmax averaging and an align_corners resize swap
both move the confusion matrix, so agreement is not vacuous.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.oracle  # torch-reference tier (slow)

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from convert_torch_ckpt import convert_state_dict  # noqa: E402

H, W = 64, 128
SCALES = (1.0, 0.5, 2.0)  # default first, then the outer avgpool extras


@pytest.fixture(scope="module")
def fake_cityscapes(tmp_path_factory):
    """Miniature tree with LOW-FREQUENCY image content: iid-noise pixels
    wash out by stride 8 and the argmax collapses to one constant class,
    which would make the oracle insensitive to composition mutations.
    Block-structured images keep O(1) spatial variation in the deep
    features, so predictions vary across the image."""
    root = tmp_path_factory.mktemp("cs_val_oracle")
    rng = np.random.RandomState(0)
    for split, city in [("train", "aachen"), ("val", "lindau")]:
        img_dir = root / "leftImg8bit_trainvaltest/leftImg8bit" / split / city
        msk_dir = root / "gtFine_trainvaltest/gtFine" / split / city
        img_dir.mkdir(parents=True)
        msk_dir.mkdir(parents=True)
        for i in range(2):
            base = f"{city}_{i:06d}_000019"
            tiles = rng.randint(0, 256, (8, 16, 3), dtype=np.uint8)
            img = np.asarray(
                Image.fromarray(tiles).resize((W, H), Image.BILINEAR))
            img = np.clip(
                img.astype(np.int32) + rng.randint(-20, 20, img.shape),
                0, 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"{base}_leftImg8bit.png")
            mask = np.zeros((H, W), np.uint8)       # id 0 -> ignore 255
            mask[H // 2:, :] = 7                    # road  -> trainid 0
            mask[:H // 4, :] = 23                   # sky   -> trainid 10
            mask[:, W // 3:2 * W // 3] = 26         # car   -> trainid 13
            Image.fromarray(mask).save(msk_dir / f"{base}_gtFine_labelIds.png")
    return str(root)


@pytest.fixture(scope="module")
def val_dump(fake_cityscapes, tmp_path_factory):
    """The reference's composed val loop over the miniature tree: flips on,
    outer avgpool scales (0.5, 2.0) on top of the in-model two-scale."""
    out = str(tmp_path_factory.mktemp("val_dump"))
    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "torch_reference.py")
    subprocess.run(
        [sys.executable, script, "--val-dump", "--out", out,
         "--data-root", fake_cityscapes, "--tiny", "--do-flip",
         "--extra-scales", "0.5,2.0", "--seed", "0"],
        check=True, timeout=900)
    state = dict(np.load(os.path.join(out, "state_dict.npz")))
    oracle = dict(np.load(os.path.join(out, "val_oracle.npz")))
    return state, oracle


def _cfg(fake_root, tmp):
    from tpuseg.config import make_config

    return make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.name": "cityscapes",
        "dataset.cityscapes_dir": fake_root,
        "dataset.centroid_root": os.path.join(tmp, "centroids"),
        "dataset.num_workers": 0,
        # in-model two_scale (the reference dump runs N_SCALES=None):
        # eval.scales=() keeps make_config from promoting n_scales
        "eval.scales": (),
        "eval.default_scale": 1.0,
        "eval.extra_scales": (0.5, 2.0),
        "eval.do_flip": True,
        "loss.loss_type": "ce",
    })


@pytest.fixture(scope="module")
def converted(val_dump, tmp_path_factory):
    """Tiny flax model + converted variables + an orbax snapshot on disk
    (so evaluate_only exercises its real checkpoint-restore path)."""
    import orbax.checkpoint as ocp

    from tpuseg.config import make_config
    from tpuseg.models import get_model

    state, _ = val_dump
    cfg = make_config({"model.arch": "ocrnet.HRNet_Mscale_Tiny",
                       "model.compute_dtype": "float32",
                       "model.remat": False,
                       "model.n_scales": (),
                       "dataset.num_classes": 19})
    model = get_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3), jnp.float32))
    params, stats = convert_state_dict(
        state, variables["params"], variables.get("batch_stats", {}),
        strict=True)
    snap = os.path.join(str(tmp_path_factory.mktemp("snap")), "ckpt")
    ocp.StandardCheckpointer().save(
        snap, {"params": params, "batch_stats": stats})
    return model, {"params": params, "batch_stats": stats}, snap


def test_evaluate_only_matches_reference_val_loop(
        fake_cityscapes, val_dump, converted, tmp_path):
    """tpuseg's composed eval loop == the reference's, bit-for-bit at the
    confusion-matrix level, from converted weights through its own
    loader/normalize/fusion/hist stack."""
    from tpuseg.train.loop import evaluate_only

    _, oracle = val_dump
    _, _, snap = converted
    cfg = _cfg(fake_cityscapes, str(tmp_path))
    metrics = evaluate_only(cfg, logdir=str(tmp_path / "logs"),
                            checkpoint=snap)

    # the accumulated confusion matrix is IDENTICAL (not merely close):
    # both sides drop ignore pixels at the hist boundary and bin the same
    # argmax decisions
    np.testing.assert_array_equal(
        metrics.hist.astype(np.int64), oracle["iou_acc"])
    # ... so the whole formatted table agrees: per-class IoU and the
    # headline mean are derived from the same f64 arithmetic
    np.testing.assert_array_equal(np.isnan(metrics.iou),
                                  np.isnan(oracle["iu"]))
    m = ~np.isnan(oracle["iu"])
    np.testing.assert_array_equal(metrics.iou[m], oracle["iu"][m])
    assert metrics.mean_iou == pytest.approx(float(oracle["mean_iu"]),
                                             abs=0, rel=0)


def _manual_hist(runner, variables, loader):
    acc = runner.init_acc()
    preds = {}
    for batch in loader:
        out, acc = runner.run_batch(variables, batch, calc_metrics=True,
                                    need_assets=True, acc=acc)
        preds[batch["name"][0]] = np.asarray(out["predictions"][0])
    hist, _, loss_sum, loss_n = runner.drain(acc)
    return hist.astype(np.int64), preds, loss_sum / max(loss_n, 1e-9)


def test_runner_pixel_level_and_mutation_sensitivity(
        fake_cityscapes, val_dump, converted, tmp_path):
    """Beyond the matrix: per-image argmax maps match the reference
    pixel-for-pixel, the composed val loss agrees, and two composition
    mutants (post-softmax averaging; align_corners resize) each MOVE the
    confusion matrix — proving the oracle can actually fail."""
    from tpuseg.data.setup import setup_data
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.losses import get_loss

    _, oracle = val_dump
    model, variables, _ = converted
    cfg = _cfg(fake_cityscapes, str(tmp_path))
    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    _, val_criterion = get_loss(cfg)

    runner = EvalRunner(model, 19, scales=SCALES, do_flip=True,
                        align_corners=False, is_mscale=True,
                        criterion=val_criterion,
                        mean=cfg.dataset.mean, std=cfg.dataset.std)
    hist, preds, val_loss = _manual_hist(runner, variables, val_loader)
    np.testing.assert_array_equal(hist, oracle["iou_acc"])
    for name, ref_pred in zip(oracle["names"], oracle["preds"]):
        np.testing.assert_array_equal(preds[str(name)], ref_pred,
                                      err_msg=str(name))
    # composed val loss (criterion over the flip/scale-averaged logits,
    # pixel-weighted mean as the reference's AverageMeter accumulates it)
    assert val_loss == pytest.approx(float(oracle["val_loss"]), rel=1e-4)

    # mutant 1: average AFTER softmax (the classic composition bug —
    # reference averages pre-softmax logits, trnval_utils.py:160-192)
    class _PostSoftmax:
        def apply(self, v, x, train):
            d = model.apply(v, x, train=train)
            return {**d, "pred": jax.nn.softmax(d["pred"], axis=-1)}

    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    mut = EvalRunner(_PostSoftmax(), 19, scales=SCALES, do_flip=True,
                     align_corners=False, is_mscale=True,
                     mean=cfg.dataset.mean, std=cfg.dataset.std)
    mut_hist, _, _ = _manual_hist(mut, variables, val_loader)
    assert not np.array_equal(mut_hist, oracle["iou_acc"]), \
        "post-softmax averaging mutant did not move the confusion matrix"

    # mutant 2: wrong resize convention in the outer scale loop
    _, val_loader, _ = setup_data(cfg, eval_mode="val")
    mut2 = EvalRunner(model, 19, scales=SCALES, do_flip=True,
                      align_corners=True, is_mscale=True,
                      mean=cfg.dataset.mean, std=cfg.dataset.std)
    mut2_hist, _, _ = _manual_hist(mut2, variables, val_loader)
    assert not np.array_equal(mut2_hist, oracle["iou_acc"]), \
        "align_corners mutant did not move the confusion matrix"
