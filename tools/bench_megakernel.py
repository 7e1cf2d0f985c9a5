"""Real-TPU benchmark for the fused stage-1 Bottleneck megakernel.

The bounded "megakernel spike" from the round-2 roofline analysis
(docs/ROOFLINE.md): times tpuseg.kernels.bottleneck_fused against the
identical folded math compiled by XLA as three convs, at the HRNet
stage-1 shapes the eval graph actually runs — (512, 1024, 256) for the
2.0x Cityscapes pass and (256, 512, 256) for 1.0x — chained over the
three identity-residual blocks (stage-1 blocks 2-4; block 1 has the
downsample projection and stays on XLA). Prints one JSON line per
variant; keep the kernel opt-in only if it beats XLA here.

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
import numpy as np  # noqa: E402

from tools._timing import scan_k, timeit_scan  # noqa: E402
from tpuseg.kernels.bottleneck_fused import (  # noqa: E402
    fused_bottleneck,
    reference_bottleneck,
)

C, M = 256, 64          # HRNetV2 stage-1: 64-plane bottleneck, expansion 4
BLOCKS = 3              # identity-residual blocks per stage-1 pass


def make_weights(rng):
    r = np.random.RandomState(rng)
    scale = 0.05  # keep the 3-block chain's activations in a sane range
    return tuple(jnp.asarray(a) for a in (
        r.randn(C, M).astype(np.float32) * scale,
        r.randn(M).astype(np.float32) * scale,
        r.randn(9, M, M).astype(np.float32) * scale,
        r.randn(M).astype(np.float32) * scale,
        r.randn(M, C).astype(np.float32) * scale,
        r.randn(C).astype(np.float32) * scale,
    ))


def main():
    if "--cpu" in sys.argv:  # interpret-mode smoke (env var alone is
        jax.config.update("jax_platforms", "cpu")  # overridden, CLAUDE.md)
    interpret = jax.default_backend() in ("cpu", "gpu")
    k_chain = 8
    shapes = {"2.0x": (512, 1024), "1.0x": (256, 512)}
    if interpret:  # CPU smoke: tiny shape, still exercises the full path
        shapes = {"smoke": (64, 128)}

    for tag, (h, w) in shapes.items():
        ws = make_weights(0)
        x = jnp.asarray(np.random.RandomState(1).randn(1, h, w, C),
                        jnp.bfloat16)

        def chain(fn):
            def run(ws_, x_):
                y = x_
                for _ in range(BLOCKS):
                    y = fn(y, *ws_)
                return y
            return run

        th = 16
        variants = {
            "xla_3conv": chain(reference_bottleneck),
            "pallas_fused": chain(lambda y, *w: fused_bottleneck(
                y, *w, th=th, tw=128 if not interpret else 64,
                interpret=interpret)),
        }
        results = {}
        for name, fn in variants.items():
            try:
                dt = timeit_scan(scan_k(fn, k=k_chain), ws, x, k=k_chain)
            except Exception as e:  # record a lowering failure honestly
                print(json.dumps({
                    "metric": f"stage1_block_{name}_{tag}",
                    "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
                continue
            results[name] = dt
            print(json.dumps({
                "metric": f"stage1_block_{name}_ms",
                "value": round(dt * 1e3, 3), "unit": f"ms/{BLOCKS}-block-chain",
                "scale": tag, "shape": [1, h, w, C], "dtype": "bfloat16",
                "backend": jax.default_backend()}), flush=True)
        if len(results) == 2:
            print(json.dumps({
                "metric": "stage1_fused_speedup", "scale": tag,
                "value": round(results["xla_3conv"]
                               / results["pallas_fused"], 3),
                "unit": "x"}), flush=True)


if __name__ == "__main__":
    main()
