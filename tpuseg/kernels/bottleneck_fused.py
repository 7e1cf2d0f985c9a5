"""VMEM-resident fused HRNet stage-1 Bottleneck block (Pallas megakernel).

The multi-conv "megakernel" spike from the round-2 roofline analysis
(docs/ROOFLINE.md): eval at 2.0x is HBM-bound at >=94% of roofline, so
the only remaining lever is cross-conv traffic elimination. The stage-1
Bottleneck (reference: network/hrnetv2.py:69-106 — 1x1 C->M, 3x3 M->M,
1x1 M->4M, identity residual, all BN+ReLU) is the cleanest target:

- XLA compiles it as three conv calls with both intermediates (67 MB
  each at the 2.0x shape) and the residual input round-tripping HBM:
  ~1.07 GB of traffic per block at (512, 1024, 256).
- This kernel keeps both intermediates in VMEM: per output tile it DMAs
  one haloed input window (halo 1 for the 3x3), runs
  1x1 -> relu -> 3x3(9 shifted MXU dots) -> relu -> 1x1 -> +residual ->
  relu entirely on-chip, and writes only the final tile: ~0.56 GB.

Inference-mode only: the three BNs are folded into the conv weights on
the host (``fold_bn``), which is exact for eval (running stats are
constants). Channel counts (256 in/out, 64 mid) are lane-aligned, so no
layout padding is wasted — unlike the stem, whose 3-channel input makes
VMEM tiling hopeless (a (H, W, 3) tile burns 125/128 lanes).

Weights are passed pre-folded:
  w1 (C, M)  b1 (M,)    — conv1 1x1 + bn1
  w2 (9, M, M) b2 (M,)  — conv2 3x3 (tap-major HWIO flattened) + bn2
  w3 (M, 4M) b3 (4M,)   — conv3 1x1 + bn3
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold an eval-mode BN into the preceding bias-free conv.

    y = (conv(x) - mean) / sqrt(var + eps) * scale + bias
      = conv(x) * s + (bias - mean * s),   s = scale * rsqrt(var + eps)

    kernel: (..., Cout) f32 HWIO. Returns (kernel', bias') in f32.
    """
    s = scale * jax.lax.rsqrt(var + eps)
    return kernel * s, bias - mean * s


def _kernel(x_hbm, w1, b1, w2, b2, w3, b3, o_ref, xwin, sem, *, th, tw, cm):
    i, j = pl.program_id(0), pl.program_id(1)
    # the (th+2, tw+2) halo window is over-fetched to (th+8, tw+8): DMA
    # slice sizes on the sublane-tiled dim must be 8-aligned (Mosaic
    # memref_slice rejects 130-wide cuts of an (8,128)-tiled memref);
    # the host pads x accordingly and the value is trimmed in-register
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * th, th + 8), pl.ds(j * tw, tw + 8), :],
        xwin, sem)
    cp.start()
    cp.wait()

    c = xwin.shape[-1]
    xv = jax.lax.slice(xwin[:], (0, 0, 0), (th + 2, tw + 2, c))
    n1 = (th + 2) * (tw + 2)

    # conv1 1x1: one MXU dot over the full haloed window (the halo ring's
    # t1 values feed the 3x3's taps, so computing them here is not waste)
    t1 = jnp.dot(xv.reshape(n1, c), w1[:],
                 preferred_element_type=jnp.float32)
    t1 = jnp.maximum(t1 + b1[:], 0.0).astype(jnp.bfloat16)
    t1 = t1.reshape(th + 2, tw + 2, cm)

    # conv2 3x3 stride 1: nine shifted dots, f32 accumulation
    acc = jnp.zeros((th * tw, cm), jnp.float32)
    for k in range(9):
        dy, dx = k // 3, k % 3
        hs = jax.lax.slice(t1, (dy, dx, 0), (dy + th, dx + tw, cm))
        acc += jnp.dot(hs.reshape(th * tw, cm), w2[k],
                       preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b2[:], 0.0).astype(jnp.bfloat16)

    # conv3 1x1 + identity residual (window center) + final relu
    out = jnp.dot(t2, w3[:], preferred_element_type=jnp.float32) + b3[:]
    res = jax.lax.slice(xv, (1, 1, 0), (1 + th, 1 + tw, c))
    out = out + res.reshape(th * tw, c).astype(jnp.float32)
    o_ref[:] = jnp.maximum(out, 0.0).astype(o_ref.dtype).reshape(th, tw, c)


@functools.partial(jax.jit, static_argnames=("th", "tw", "interpret"))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, *, th=32, tw=128,
                     interpret=False):
    """relu(conv3(relu(conv2(relu(conv1(x))))) + x), BN pre-folded.

    x: (1, H, W, C) bf16, th | H, tw | W, C = 4 * M. Returns same shape.

    NOT differentiable: no custom VJP is defined, so lowering fails under
    jax.grad. The production gate (HRNetV2 routes here only when
    ``fused_stage1 and not train``, tpuseg/models/hrnet.py) keeps every
    training path on the XLA convs; call sites outside the model must
    respect the same inference-only constraint.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        interpret = True  # Mosaic is TPU-only; tests/dev run interpreted
    _, h, w, c = x.shape
    cm = w1.shape[-1]
    assert x.shape[0] == 1 and h % th == 0 and w % tw == 0, (x.shape, th, tw)
    assert w3.shape == (cm, c) and w2.shape == (9, cm, cm), (w2.shape, w3.shape)

    # pad 1 for the 3x3's zero padding, plus 6 more on the far edges so
    # every tile's 8-aligned over-fetch window stays in bounds
    xp = jnp.pad(x[0], ((1, 7), (1, 7), (0, 0)))
    bf = jnp.bfloat16
    args = (xp.astype(bf),
            w1.astype(bf), b1.reshape(1, cm).astype(jnp.float32),
            w2.astype(bf), b2.reshape(1, cm).astype(jnp.float32),
            w3.astype(bf), b3.reshape(1, c).astype(jnp.float32))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, cm=cm),
        grid=(h // th, w // tw),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),  # halo: manual DMA
                  vmem, vmem, vmem, vmem, vmem, vmem],
        out_specs=pl.BlockSpec((th, tw, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((th + 8, tw + 8, c), bf),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * h * w * (c * cm + 9 * cm * cm + cm * c),
            bytes_accessed=2 * h * w * c * 2,
            transcendentals=0),
        interpret=interpret,
    )(*args)
    return out[None]


def reference_bottleneck(x, w1, b1, w2, b2, w3, b3):
    """The same folded math as three XLA convs (the unfused baseline the
    kernel is benched against, and the interpret-mode parity oracle)."""
    bf = jnp.bfloat16
    dn = ("NHWC", "HWIO", "NHWC")
    cm = w1.shape[-1]
    t = jax.lax.conv_general_dilated(
        x.astype(bf), w1.reshape(1, 1, -1, cm).astype(bf), (1, 1), "VALID",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    t = jnp.maximum(t + b1, 0.0).astype(bf)
    t = jax.lax.conv_general_dilated(
        t, w2.reshape(3, 3, cm, cm).astype(bf), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    t = jnp.maximum(t + b2, 0.0).astype(bf)
    t = jax.lax.conv_general_dilated(
        t, w3.reshape(1, 1, cm, -1).astype(bf), (1, 1), "VALID",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    return jnp.maximum(t + b3 + x.astype(jnp.float32), 0.0).astype(x.dtype)
