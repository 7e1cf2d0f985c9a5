"""Real-TPU benchmark + compile check for the Pallas OCR attention kernel.

Times fused_object_attention against the unfused XLA einsum chain at the
2.0x-eval shape (N = 256x512 pixel queries, K = 19 classes, d = 256,
bf16) and prints one JSON line per variant. This is the kernel's only
real-TPU exercise point (the unit tests run interpret-mode on CPU), so a
TPU-lowering regression (BlockSpec/VMEM) surfaces here.

Timing methodology: tools/_timing.py (single source, shared with
bench.py).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools._timing import scan_k, timeit_scan  # noqa: E402
from tpuseg.kernels.ocr_attention import (  # noqa: E402
    fused_object_attention,
    reference_object_attention,
)

N, KC, D = 256 * 512, 19, 256


def main():
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (1, N, D), jnp.bfloat16)
    key = jax.random.normal(kk, (1, KC, D), jnp.bfloat16)
    val = jax.random.normal(kv, (1, KC, D), jnp.bfloat16)

    interpret = jax.default_backend() in ("cpu", "gpu")
    variants = {
        "pallas_fused": lambda kv_, q_: fused_object_attention(
            q_, kv_[0], kv_[1], interpret=interpret),
        "xla_unfused": lambda kv_, q_: reference_object_attention(
            q_, kv_[0], kv_[1]),
    }
    results = {}
    # the attention op is sub-ms — chain many more calls per readback
    # than the default K=4 so the measurement dominates the relay RTT
    K_MICRO = 256
    for name, fn in variants.items():
        dt = timeit_scan(scan_k(fn, k=K_MICRO), (key, val), q, k=K_MICRO)
        results[name] = dt
        print(json.dumps({
            "metric": f"ocr_attention_{name}_us",
            "value": round(dt * 1e6, 1), "unit": "us/call",
            "shape": [1, N, KC, D], "dtype": "bfloat16",
            "backend": jax.default_backend()}))
    print(json.dumps({
        "metric": "ocr_attention_fused_speedup",
        "value": round(results["xla_unfused"] / results["pallas_fused"], 3),
        "unit": "x"}))


if __name__ == "__main__":
    main()
