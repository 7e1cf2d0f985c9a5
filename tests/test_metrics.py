import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.evaluation.metrics import (
    eval_metrics_from_hist,
    fast_hist,
    fast_hist_jax,
    fmt_scale,
)

N = 5


def test_fast_hist_jax_matches_numpy(rng):
    gt = rng.randint(0, N, size=(4, 33, 17)).astype(np.int32)
    gt[gt == 0] = 255  # sprinkle ignore pixels
    pred = rng.randint(0, N, size=(4, 33, 17)).astype(np.int32)
    got = np.asarray(jax.jit(fast_hist_jax, static_argnums=2)(
        jnp.asarray(pred), jnp.asarray(gt), N))
    want = fast_hist(pred, gt, N)
    np.testing.assert_array_equal(got, want)
    # ignore pixels must be dropped entirely
    assert got.sum() == (gt != 255).sum()


def test_perfect_prediction_is_identity():
    gt = np.arange(N).repeat(10).reshape(1, -1)
    hist = fast_hist(gt, gt, N)
    assert (np.diag(hist) == 10).all()
    m = eval_metrics_from_hist(hist)
    assert m.mean_iou == 1.0 and m.acc == 1.0


def test_known_iou():
    # class 0: tp=2 fp=1 fn=2 -> IoU 0.4 ; class 1: tp=1 fp=2 fn=1 -> 0.25
    gt = np.array([0, 0, 0, 1, 1, 0])
    pred = np.array([0, 0, 1, 1, 0, 1])
    hist = fast_hist(pred, gt, 2)
    m = eval_metrics_from_hist(hist)
    np.testing.assert_allclose(m.iou, [0.4, 0.25])


def test_absent_class_is_nan_not_zero():
    gt = np.zeros(10, dtype=int)
    pred = np.zeros(10, dtype=int)
    m = eval_metrics_from_hist(fast_hist(pred, gt, 3))
    assert np.isnan(m.iou[1]) and np.isnan(m.iou[2])
    assert m.mean_iou == 1.0  # nanmean skips absent classes


def test_fmt_scale():
    # reference format (utils/misc.py:504-513): the replace('.', '') there
    # is a no-op on an immutable str, so the dot stays in the key
    assert fmt_scale("pred", 0.5) == "pred_0.5x"
    assert fmt_scale("attn", 1.0) == "attn_1.0x"
    assert fmt_scale("pred", 2.0) == "pred_2.0x"
    assert fmt_scale("pred", 2) == "pred_2.0x"
