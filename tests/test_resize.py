"""Resize parity vs torch — the reference's entire fusion stack depends on
exact `F.interpolate` semantics (network/mynn.py:43-114)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpuseg.ops import resize_bilinear, resize_nearest, resize_x
from tpuseg.ops.resize import avg_pool2d, max_pool2d

SIZES = [
    ((7, 9), (14, 18)),      # clean 2x up
    ((14, 18), (7, 9)),      # clean 2x down
    ((32, 64), (17, 51)),    # ragged down
    ((17, 51), (32, 64)),    # ragged up
    ((8, 8), (8, 8)),        # identity
    ((5, 5), (1, 1)),        # collapse
    ((1, 1), (6, 6)),        # broadcast
    ((128, 256), (64, 128)), # stride-8-ish shapes
]


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
@pytest.mark.parametrize("align_corners", [False, True])
def test_bilinear_matches_torch(rng, in_hw, out_hw, align_corners):
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        size=out_hw, mode="bilinear", align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("scale", [0.5, 2.0, 0.25, 1.5, 0.3333333])
def test_resize_x_matches_torch_recompute(rng, scale):
    """ResizeX == interpolate(scale_factor, recompute_scale_factor=True)
    (reference: network/mynn.py:102-114)."""
    x = rng.randn(1, 33, 65, 4).astype(np.float32)
    got = np.asarray(resize_x(jnp.asarray(x), scale))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        scale_factor=scale, mode="bilinear", align_corners=False,
        recompute_scale_factor=True,
    ).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", SIZES)
def test_nearest_matches_torch(rng, in_hw, out_hw):
    x = rng.randn(1, *in_hw, 2).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_hwc_rank3(rng):
    x = rng.randn(9, 11, 3).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), (18, 22)))
    want = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None],
        size=(18, 22), mode="bilinear", align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_bf16_passthrough(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 3), dtype=jnp.bfloat16)
    y = resize_bilinear(x, (16, 16))
    assert y.dtype == jnp.bfloat16


@pytest.mark.parametrize("window,stride,padding", [(4, 4, 2), (2, 2, 0), (3, 3, 1)])
def test_avg_pool_matches_torch(rng, window, stride, padding):
    x = rng.randn(2, 16, 24, 5).astype(np.float32)
    got = np.asarray(avg_pool2d(jnp.asarray(x), window, stride, padding))
    want = F.avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), window, stride, padding,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_max_pool_matches_torch(rng):
    x = rng.randn(1, 12, 12, 3).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 4, 4, 2))
    want = F.max_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), 4, 4, 2,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_max_pool2d_matches_torch_incl_ceil_mode():
    """torch F.max_pool2d parity incl. ceil_mode (Caffe-style SENet stem)
    and torch's drop-window-starting-in-padding rule."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from tpuseg.ops.resize import max_pool2d

    rng = np.random.RandomState(0)
    for size in (5, 7, 8, 32, 33):
        for k, s, p in [(2, 2, 1), (3, 2, 1), (3, 2, 0), (3, 3, 1)]:
            for ceil in (False, True):
                x = rng.randn(1, size, size, 3).astype(np.float32)
                got = np.asarray(max_pool2d(x, k, s, p, ceil_mode=ceil))
                want = F.max_pool2d(
                    torch.from_numpy(x).permute(0, 3, 1, 2), k, s, p,
                    ceil_mode=ceil).permute(0, 2, 3, 1).numpy()
                assert got.shape == want.shape, (size, k, s, p, ceil)
                np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resize_custom_vjp_matches_autodiff():
    """The scatter-free transpose (K fixed gathers, tpuseg/ops/resize.py
    _lerp_bwd) produces the same cotangents as plain autodiff of the lerp
    (whose gather transpose XLA lowers to a 30x-slower scatter-add on TPU)."""
    import jax

    from tpuseg.ops.resize import _gather_tables, resize_bilinear

    def ref_resize(x, size, align):
        def lerp(x, axis, out):
            i0, i1, w1 = _gather_tables(x.shape[axis], out, align)
            x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
            x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
            sh = [1] * x.ndim
            sh[axis] = out
            return x0 + (x1 - x0) * jnp.asarray(w1).reshape(sh)

        y = x.astype(jnp.float32)
        if y.shape[-3] != size[0]:
            y = lerp(y, y.ndim - 3, size[0])
        if y.shape[-2] != size[1]:
            y = lerp(y, y.ndim - 2, size[1])
        return y

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(8, 12, 16, 24), (16, 24, 8, 12), (7, 9, 20, 26),
                           (20, 26, 7, 9), (1, 4, 3, 4), (16, 24, 33, 50)]:
        for align in (False, True):
            x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
            ct = jnp.asarray(rng.randn(2, oh, ow, 3).astype(np.float32))
            np.testing.assert_array_equal(
                np.asarray(resize_bilinear(x, (oh, ow), align)),
                np.asarray(ref_resize(x, (oh, ow), align)))
            ga = np.asarray(jax.grad(
                lambda xx: jnp.vdot(resize_bilinear(xx, (oh, ow), align),
                                    ct))(x))
            gb = np.asarray(jax.grad(
                lambda xx: jnp.vdot(ref_resize(xx, (oh, ow), align),
                                    ct))(x))
            rel = np.abs(ga - gb).sum() / max(np.abs(gb).sum(), 1e-9)
            assert rel < 1e-6, (h, w, oh, ow, align, rel)
