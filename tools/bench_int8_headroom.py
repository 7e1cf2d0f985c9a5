"""Quantization headroom probe: int8 vs bf16 conv-chain throughput.

The n-scale eval graph runs at >= 94% of the v5e HBM roofline in bf16
(docs/ROOFLINE.md) — the ONLY structural lever left on this chip is
halving the activation bytes. v5e's MXU also doubles int8 peak
(394.8 TOPs vs 197 bf16 TFLOP/s), so an int8 path wins on both axes IF
XLA lowers s8 x s8 -> s32 convs natively. This tool measures that on the
real chip with production-shaped conv chains: the two heaviest HRNet-W48
branch shapes of the 2.0x pass (stride-4 512x1024 @48ch and stride-8
256x512 @96ch on a 2048x4096 input — together most of the 56% of
pipeline time the 2.0x trunk costs, tools/bench_breakdown.py).

The int8 chain is an honest deployment shape: conv (s8 x s8 -> s32)
followed by per-layer requantization (f32 scale multiply, round, clip,
cast s8) so EVERY inter-layer tensor really is 1 byte/element — the
requant cost is inside the measurement. No accuracy claim is made or
measurable here (no datasets/checkpoints in-env; per-layer calibration
would be needed): this banks the THROUGHPUT headroom so a future int8
eval mode knows what it would buy. Reference comparison: the reference
has no quantized path at all (fp16 apex O1/O3 only, train.py:380-381).

Prints one JSON line per (shape, dtype) + the headroom ratios; run on
the real chip: python tools/bench_int8_headroom.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools._timing import measure_rtt  # noqa: E402

DEPTH = 8          # convs per chain
K = 64             # chain evaluations per timed readback (scan-amplified:
                   # a single ~ms chain is invisible under the ~29 ms
                   # relay RTT — same methodology as tools/_timing.scan_k)
REPS = 3
# (label, H, W, C): HRNet-W48 branch shapes under a 2.0x 2048x4096 input
SHAPES = (
    ("s4_branch_2.0x", 512, 1024, 48),
    ("s8_branch_2.0x", 256, 512, 96),
)


def bf16_chain():
    def chain(x, ws):
        def body(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y, 0).astype(jnp.bfloat16), None

        y, _ = jax.lax.scan(body, x, ws)
        return jnp.sum(y.astype(jnp.float32))

    def run(x, ws):
        # K chain evaluations inside one jit, inputs perturbed per step
        # so nothing collapses; one scalar readback
        def step(carry, i):
            xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            return carry + chain(xi, ws), None

        total, _ = jax.lax.scan(step, jnp.float32(0),
                                jnp.arange(K, dtype=jnp.int32))
        return total

    return jax.jit(run)


def int8_chain():
    def chain(x, ws, scales):
        def body(x, wscale):
            w, scale = wscale
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # requantize: f32 scale, relu, round, saturate back to s8 —
            # the real inter-layer wire of a deployed int8 network
            yq = jnp.clip(jnp.round(y.astype(jnp.float32) * scale),
                          0, 127).astype(jnp.int8)
            return yq, None

        y, _ = jax.lax.scan(body, x, (ws, scales))
        return jnp.sum(y.astype(jnp.int32))

    def run(x, ws, scales):
        def step(carry, i):
            xi = (x + i.astype(jnp.int8))  # wrapping perturbation
            return carry + chain(xi, ws, scales), None

        total, _ = jax.lax.scan(step, jnp.int32(0),
                                jnp.arange(K, dtype=jnp.int32))
        return total

    return jax.jit(run)


def time_chain(fn, *args) -> float:
    """Seconds per chain evaluation (K evals per readback, min of REPS,
    RTT-subtracted)."""
    float(fn(*args))  # compile + warm
    rtt = measure_rtt()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return (min(times) - rtt) / K


def main():
    rng = np.random.RandomState(0)
    ratios = {}
    for label, h, w, c in SHAPES:
        x16 = jnp.asarray(rng.randn(1, h, w, c), jnp.bfloat16)
        ws16 = jnp.asarray(rng.randn(DEPTH, 3, 3, c, c) * 0.05, jnp.bfloat16)
        x8 = jnp.asarray(rng.randint(-128, 128, (1, h, w, c)), jnp.int8)
        ws8 = jnp.asarray(rng.randint(-128, 128, (DEPTH, 3, 3, c, c)),
                          jnp.int8)
        # scales keep activations in-range so the chain doesn't saturate
        scales = jnp.full((DEPTH,), 1.0 / (9 * c * 42), jnp.float32)

        t16 = time_chain(bf16_chain(), x16, ws16)
        t8 = time_chain(int8_chain(), x8, ws8, scales)
        # bytes/layer: read in + write out (+ weights, negligible)
        gb16 = DEPTH * 2 * (h * w * c * 2) / 1e9
        gb8 = DEPTH * 2 * (h * w * c * 1) / 1e9
        ratios[label] = t16 / t8
        for dt, t, gb in (("bf16", t16, gb16), ("int8", t8, gb8)):
            print(json.dumps({
                "metric": "conv_chain_ms", "shape": label, "dtype": dt,
                "value": round(t * 1e3, 2), "unit": "ms",
                "depth": DEPTH, "hwc": [h, w, c],
                "achieved_gb_per_s": round(gb / t, 1),
            }), flush=True)
    print(json.dumps({
        "metric": "int8_headroom_ratio",
        "value": {k: round(v, 3) for k, v in ratios.items()},
        "unit": "x (bf16 time / int8 time)",
    }), flush=True)


if __name__ == "__main__":
    main()
