"""Batched validation (eval.batch_size / reference --bs_val): on-chip win.

The metrics-only eval loop (need_assets=False, the 647 ms/image path —
docs/ROOFLINE.md) pays per-iteration host dispatch + relay round-trip +
confusion-matrix readback once per BATCH, not per image; fixed-resolution
Cityscapes val (1024x2048) can batch images into one forward, amortizing
that host path. The reference exposes the same knob as ``--bs_val``
(train.py flag, datasets/__init__.py:192) but its synchronous per-image
host argmax swallows the win; here everything but a 19x19 hist stays on
device, so batching shows up directly.

Times the REAL ``EvalRunner.run_batch`` loop (device relay wall-clock —
the tiny hist readback forces execution each iteration, so per-iteration
wall time is honest even through the relay) at bs=1 vs bs=4, single-scale
1024x2048, metrics-only. Prints one JSON line per batch size; run on the
real chip. Metrics bit-identity of batched vs bs=1 validation is pinned
separately in tests/test_engine.py (CPU).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4")
    ap.add_argument("--images", type=int, default=8,
                    help="timed images per batch size")
    ap.add_argument("--scales", default="1.0")
    args = ap.parse_args()
    scales = tuple(float(s) for s in args.scales.split(","))

    from tpuseg.config import make_config
    from tpuseg.evaluation.inference import EvalRunner
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.n_scales": scales,
        "model.remat": False,
        "model.eval_fusion_dtype": "bfloat16",
        "dataset.num_classes": 19,
    })
    model = get_model(cfg)
    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    runner = EvalRunner(model, cfg.dataset.num_classes, scales=scales,
                        is_mscale=True)
    rng = np.random.RandomState(0)

    for bs in (int(b) for b in args.batches.split(",")):
        batch = {
            "image": rng.randn(bs, H, W, 3).astype(np.float32),
            "label": rng.randint(0, 19, (bs, H, W)).astype(np.int32),
        }
        # warmup: compile + one steady-state run
        for _ in range(2):
            runner.run_batch(variables, batch, calc_metrics=True,
                             need_assets=False)
        n_iter = max(args.images // bs, 1)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            runner.run_batch(variables, batch, calc_metrics=True,
                             need_assets=False)
        dt = time.perf_counter() - t0
        per_image_ms = dt / (n_iter * bs) * 1e3
        print(json.dumps({
            "metric": "eval_loop_ms_per_image",
            "value": round(per_image_ms, 1),
            "unit": "ms/image",
            "batch_size": bs,
            "scales": list(scales),
            "resolution": f"{H}x{W}",
            "images_timed": n_iter * bs,
        }), flush=True)


if __name__ == "__main__":
    main()
