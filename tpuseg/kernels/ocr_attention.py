"""Pallas TPU kernel: fused OCR object attention.

The OCR distribute step (reference ObjectAttentionBlock,
network/ocr_utils.py:95-119) is, per image:

    sim     = (Q @ K^T) / sqrt(d)      # (N, K) — N pixels, K classes
    attn    = softmax_K(sim)
    context = attn @ V                  # (N, d)

with tiny K (19/65 classes) and huge N (131k pixel queries at 2.0x eval).
Unfused, XLA writes ``sim``/``attn`` (N x K f32) to HBM between ops; this
kernel keeps the whole chain in VMEM per N-tile (flash-attention-style, but
the class axis is small enough that no online renormalization is needed —
one tile holds all keys).

Layout notes:
- K is padded to the 128-lane width; padded key slots are masked to -inf
  before the softmax;
- matmuls accumulate in f32 on the MXU (preferred_element_type);
- the N axis is tiled at 2048 rows/program (measured best of
  512/2048/8192 on v5e).

Honest status (tools/bench_pallas.py, v5e, N=131072 K=19 d=256 bf16):
XLA's own fusion of the unfused einsum chain runs this op at the HBM
roofline (~162 us = 134 MB q+ctx traffic at ~819 GB/s); this kernel
measures ~374 us. XLA never materializes the (N, K) sim/attn tensors to
HBM here — the flash-attention-style motivation does not pay off at such
a small class axis. The kernel therefore stays OPT-IN
(model.use_pallas, eval-only) as the Pallas integration point.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 2048
LANES = 128


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, num_keys: int,
                      scale: float):
    q = q_ref[0]                      # (TILE_N, d)
    k = k_ref[0]                      # (K_pad, d)
    v = v_ref[0]                      # (K_pad, d)

    sim = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TILE_N, K_pad)
    sim = sim * scale

    key_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
    sim = jnp.where(key_ids < num_keys, sim, -1e30)

    attn = jax.nn.softmax(sim, axis=-1)

    ctx = jax.lax.dot_general(
        attn.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (TILE_N, d)
    o_ref[0] = ctx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_object_attention(q: jnp.ndarray, key: jnp.ndarray,
                           val: jnp.ndarray, interpret: bool = False
                           ) -> jnp.ndarray:
    """q: (B, N, d) pixel queries; key/val: (B, K, d) class proxies.
    Returns (B, N, d) context, f32-accumulated, in q.dtype.

    On cpu/gpu backends the kernel runs in interpret mode automatically,
    so callers (the SpatialOCR use_pallas path) behave identically on
    every backend and the integration is testable without a TPU.
    """
    if jax.default_backend() in ("cpu", "gpu"):
        interpret = True
    b, n, d = q.shape
    k = key.shape[1]
    assert k <= LANES, f"class axis {k} > {LANES} not supported"

    n_pad = -(-n // TILE_N) * TILE_N
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    k_pad = LANES
    key = jnp.pad(key, ((0, 0), (0, k_pad - k), (0, 0)))
    val = jnp.pad(val, ((0, 0), (0, k_pad - k), (0, 0)))

    grid = (b, n_pad // TILE_N)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, num_keys=k,
                          scale=float(d) ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_N, d), lambda bi, ni: (bi, ni, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, d), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, d), lambda bi, ni: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_N, d), lambda bi, ni: (bi, ni, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * k_pad * d * 2,
            bytes_accessed=b * n_pad * d * 2 * 2,
            transcendentals=b * n_pad * k_pad,
        ),
        interpret=interpret,
    )(q, key, val)
    return out[:, :n, :]


def reference_object_attention(q, key, val):
    """Unfused XLA reference (the math the kernel replaces)."""
    d = q.shape[-1]
    sim = jnp.einsum("bnd,bkd->bnk", q, key,
                     preferred_element_type=jnp.float32) * (d ** -0.5)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bnk,bkd->bnd", attn.astype(val.dtype), val,
                      preferred_element_type=jnp.float32).astype(q.dtype)
