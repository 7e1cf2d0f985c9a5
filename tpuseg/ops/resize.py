"""Bilinear / nearest resize with exact PyTorch coordinate semantics.

The reference stacks many ``F.interpolate(mode='bilinear')`` calls
(trunk fusion, OCR upsampling, multi-scale attention fusion — reference:
network/mynn.py:43-114, network/hrnetv2.py:440-445) and its mIoU is
sensitive to sub-pixel coordinate conventions (SURVEY §7 "hard parts" #1).
``jax.image.resize`` implements the half-pixel convention but neither
torch's ``align_corners=True`` nor its negative-coordinate clamping, so we
implement the resize directly as a separable two-neighbor gather + lerp.

Coordinate mapping (per axis), matching torch's
``area_pixel_compute_source_index``:

- ``align_corners=False``:  ``src = (dst + 0.5) * in/out - 0.5``, clamped
  below at 0.
- ``align_corners=True``:   ``src = dst * (in-1)/(out-1)`` (0 if out == 1).

Then ``i0 = floor(src)``, ``i1 = min(i0+1, in-1)``, ``w1 = src - i0``.

Because output sizes are static under jit, the gather indices and lerp
weights are compile-time constants; XLA lowers each axis to a cheap gather
(O(out) memory traffic, no MXU work). Interpolation runs in float32 and is
cast back — the fp32-island the reference creates with
``@amp.float_function`` (network/mynn.py:42-58).

Scale-factor resizes replicate ``recompute_scale_factor=True``
(network/mynn.py:102-114): output size is ``floor(in * scale)`` and the
coordinate mapping uses the *recomputed* in/out ratio, i.e. they are exactly
size-based resizes.

All tensors are NHWC.
"""
from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    if align_corners:
        if out_size == 1:
            return np.zeros((1,), dtype=np.float64)
        return np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
    return np.maximum(src, 0.0)


@lru_cache(maxsize=None)
def _gather_tables(in_size: int, out_size: int, align_corners: bool):
    src = _source_coords(in_size, out_size, align_corners)
    i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@lru_cache(maxsize=None)
def _transpose_tables(in_size: int, out_size: int, align_corners: bool):
    """Transpose of the two-neighbor lerp as K gathers.

    fwd: out[i] = (1-w1[i]) * in[i0[i]] + w1[i] * in[i1[i]]
    transpose: in_ct[j] = sum over outputs i touching j of their weight *
    out_ct[i]. Each input j is touched by a contiguous run of outputs, so
    the transpose is K fixed gathers + weighted sum — NOT a scatter-add
    (XLA lowers the gather transpose to scatter, measured 30x slower than
    the forward gather on TPU v5e).
    """
    i0, i1, w1 = _gather_tables(in_size, out_size, align_corners)
    contrib: list[dict] = [dict() for _ in range(in_size)]
    for i in range(out_size):
        contrib[i0[i]][i] = contrib[i0[i]].get(i, 0.0) + (1.0 - float(w1[i]))
        contrib[i1[i]][i] = contrib[i1[i]].get(i, 0.0) + float(w1[i])
    k_max = max(len(c) for c in contrib)
    idx = np.zeros((in_size, k_max), np.int64)
    wts = np.zeros((in_size, k_max), np.float32)
    for j, c in enumerate(contrib):
        for k, (i, w) in enumerate(sorted(c.items())):
            idx[j, k] = i
            wts[j, k] = w
    return idx, wts


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _lerp_axis_diff(x: jnp.ndarray, axis: int, out_size: int,
                    align_corners: bool, in_size: int):
    i0, i1, w1 = _gather_tables(in_size, out_size, align_corners)
    # Gather in the INPUT dtype and upcast inside the elementwise fusion:
    # the gathers are the only materialized buffers (XLA emits each as its
    # own fusion output), so a bf16 chain allocates bf16 — not f32 —
    # full-resolution temps. At the Mapillary eval shape the 2.0x-scale
    # 65-class logit upsample is 2x ~4 GB in f32, the difference between
    # fitting a 16 GB v5e and OOM (BENCH_mapillary.json); the lerp
    # arithmetic itself stays float32 either way (the reference's own O3
    # recipe runs the whole interpolate in fp16, README.md:73).
    x0 = jnp.take(x, jnp.asarray(i0), axis=axis)
    x1 = jnp.take(x, jnp.asarray(i1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = jnp.asarray(w1).reshape(shape)
    x0f = x0.astype(jnp.float32)
    y = x0f + (x1.astype(jnp.float32) - x0f) * w1
    return y.astype(x.dtype)


def _lerp_fwd(x, axis, out_size, align_corners, in_size):
    return _lerp_axis_diff(x, axis, out_size, align_corners, in_size), None


def _lerp_bwd(axis, out_size, align_corners, in_size, _res, ct):
    idx, wts = _transpose_tables(in_size, out_size, align_corners)
    shape = [1] * ct.ndim
    shape[axis] = in_size
    acc = None
    for k in range(idx.shape[1]):
        term = jnp.take(ct, jnp.asarray(idx[:, k]), axis=axis) \
            .astype(jnp.float32) * jnp.asarray(wts[:, k]).reshape(shape)
        acc = term if acc is None else acc + term
    # tangent dtype must match the primal's (which may be bf16 at eval;
    # every train-path resize is an f32 island, so grads lose nothing)
    return (acc.astype(ct.dtype),)


_lerp_axis_diff.defvjp(_lerp_fwd, _lerp_bwd)


def _lerp_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool):
    if x.shape[axis] == out_size:
        return x
    return _lerp_axis_diff(x, axis, out_size, align_corners, x.shape[axis])


def resize_bilinear(
    x: jnp.ndarray,
    size: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) ``x`` to ``size=(H, W)``.

    Bit-matches ``torch.nn.functional.interpolate(mode='bilinear')`` on the
    same input (see tests/test_resize.py). Lerp arithmetic is float32; the
    materialized per-axis buffers keep the input dtype (f32 inputs — every
    parity-critical island — are therefore pure-f32 end to end, while bf16
    fusion chains allocate bf16 temps; see _lerp_axis_diff).
    """
    out_h, out_w = int(size[0]), int(size[1])
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    y = _lerp_axis(x, h_axis, out_h, align_corners)
    y = _lerp_axis(y, w_axis, out_w, align_corners)
    return y


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of NHWC (or HWC) ``x``; matches torch ``mode='nearest'``
    (``src = floor(dst * in/out)``)."""
    out_h, out_w = int(size[0]), int(size[1])
    h_axis, w_axis = x.ndim - 3, x.ndim - 2

    def _idx(in_size, out_size):
        src = np.floor(np.arange(out_size, dtype=np.float64) * in_size / out_size)
        return jnp.asarray(np.minimum(src.astype(np.int64), in_size - 1))

    y = jnp.take(x, _idx(x.shape[h_axis], out_h), axis=h_axis)
    y = jnp.take(y, _idx(y.shape[w_axis], out_w), axis=w_axis)
    return y


def resize_x(x: jnp.ndarray, scale: float, align_corners: bool = False) -> jnp.ndarray:
    """Scale-factor bilinear resize, torch ``recompute_scale_factor=True``
    semantics (reference: network/mynn.py:102-114): out = floor(in * scale)."""
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    out_h = int(math.floor(x.shape[h_axis] * scale))
    out_w = int(math.floor(x.shape[w_axis] * scale))
    return resize_bilinear(x, (out_h, out_w), align_corners)


def scale_as(x: jnp.ndarray, y: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Resize ``x`` to the spatial size of ``y`` (reference: network/mynn.py:70-84)."""
    h_axis, w_axis = y.ndim - 3, y.ndim - 2
    return resize_bilinear(x, (y.shape[h_axis], y.shape[w_axis]), align_corners)


def avg_pool2d(x: jnp.ndarray, window: int, stride: int | None = None,
               padding: int = 0) -> jnp.ndarray:
    """count_include_pad average pool over NHWC, matching torch
    ``F.avg_pool2d`` defaults (used by the RMI loss downsample,
    reference: loss/rmi.py:154-155)."""

    stride = stride or window
    y = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (y / float(window * window)).astype(x.dtype)


def max_pool2d(x: jnp.ndarray, window: int, stride: int | None = None,
               padding: int = 0, ceil_mode: bool = False) -> jnp.ndarray:
    """Max pool over NHWC matching torch ``F.max_pool2d``.

    ``ceil_mode`` pads only the trailing edge with -inf so partial windows
    are kept (torch MaxPool2d(ceil_mode=True), needed for the Caffe-style
    SENet stem — reference SEresnext.py:269-272); window alignment stays at
    offset 0, unlike symmetric padding.
    """

    stride = stride or window

    def pad_end(size: int) -> int:

        out = math.ceil((size + 2 * padding - window) / stride) + 1
        # torch drops a ceil-mode window that would START in the right
        # padding ((out-1)*stride >= size + left_pad)
        if (out - 1) * stride >= size + padding:
            out -= 1
        return max(0, (out - 1) * stride + window - size - 2 * padding)

    ph = pad_end(x.shape[1]) if ceil_mode else 0
    pw = pad_end(x.shape[2]) if ceil_mode else 0
    # -inf init (not finfo.min): JAX's reduce_window autodiff rule only
    # recognizes the (-inf, max) monoid
    return jax.lax.reduce_window(
        x.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding + ph), (padding, padding + pw),
                 (0, 0)),
    ).astype(x.dtype)
