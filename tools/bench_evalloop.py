"""Pipelined eval loop (device-resident metric accumulator) vs the
per-image-sync loop, on the real chip.

The metrics-only val loop used to force one device->host sync per image:
``np.asarray(hist)`` + a jitted-criterion scalar readback
(reference analogue: per-image ``.cpu()`` logits + host argmax,
utils/trnval_utils.py:170-198). Through the device relay each sync costs
a ~29 ms round trip plus the host dispatch it serializes. The pipelined
``EvalRunner.run_batch(acc=...)`` path accumulates the confusion matrix /
loss ON DEVICE and drains once every ``DRAIN_EVERY`` batches, so the host
keeps the device queue fed.

Prints one JSON line per mode; run on the real chip
(``python tools/bench_evalloop.py``).
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
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--scales", default="1.0")
    args = ap.parse_args()
    scales = tuple(float(s) for s in args.scales.split(","))

    from tpuseg.config import make_config
    from tpuseg.evaluation.inference import DRAIN_EVERY, EvalRunner
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.n_scales": scales,
        "model.remat": False,
        "model.eval_fusion_dtype": "bfloat16",
        "dataset.num_classes": 19,
    })
    model = get_model(cfg)
    _, val_criterion = get_loss(cfg)
    variables = jax.jit(lambda k, xi: model.init(k, xi, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    runner = EvalRunner(model, cfg.dataset.num_classes, scales=scales,
                        is_mscale=True, criterion=val_criterion)
    runner_nodonate = EvalRunner(model, cfg.dataset.num_classes,
                                 scales=scales, is_mscale=True,
                                 criterion=val_criterion, donate_acc=False)
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(1, H, W, 3).astype(np.float32),
        "label": rng.randint(0, 19, (1, H, W)).astype(np.int32),
    }

    # warmup: compile + steady state for all modes
    runner.run_batch(variables, batch, need_assets=False)
    for r in (runner, runner_nodonate):
        acc = r.init_acc()
        _, acc = r.run_batch(variables, batch, need_assets=False, acc=acc)
        r.drain(acc)
    # h2d warmup: a jitted reduction forced to a scalar readback
    upload_probe = jax.jit(lambda x: x.sum())
    float(upload_probe(jnp.asarray(batch["image"])))

    results = {}
    # raw input-upload cost: fresh 24 MB H2D + tiny reduction + readback.
    # If this dominates the legacy iteration, hiding the hist readback
    # can't help — the loop is upload-bound through the relay.
    t0 = time.perf_counter()
    for _ in range(args.images):
        float(upload_probe(jnp.asarray(batch["image"])))
    results["h2d_upload_only"] = time.perf_counter() - t0

    # legacy: one sync per image
    t0 = time.perf_counter()
    for _ in range(args.images):
        runner.run_batch(variables, batch, need_assets=False)
    results["per_image_sync"] = time.perf_counter() - t0

    # pipelined: drain every DRAIN_EVERY batches (+ final), as the real
    # validate loop does; donation on/off isolates whether acc aliasing
    # through the relay serializes dispatch
    for name, r in (("pipelined", runner),
                    ("pipelined_nodonate", runner_nodonate)):
        t0 = time.perf_counter()
        acc = r.init_acc()
        hist = 0.0
        for i in range(args.images):
            _, acc = r.run_batch(variables, batch, need_assets=False,
                                 acc=acc)
            if (i + 1) % DRAIN_EVERY == 0:
                h, _, _, _ = r.drain(acc)
                hist = hist + h
                acc = r.init_acc()
        h, _, _, _ = r.drain(acc)
        hist = hist + h
        results[name] = time.perf_counter() - t0
        assert float(np.asarray(hist).sum()) == args.images * H * W

    for mode, dt in results.items():
        print(json.dumps({
            "metric": "eval_loop_ms_per_image",
            "mode": mode,
            "value": round(dt / args.images * 1e3, 1),
            "unit": "ms/image",
            "scales": list(scales),
            "resolution": f"{H}x{W}",
            "images_timed": args.images,
            "drain_every": DRAIN_EVERY,
        }), flush=True)
    print(json.dumps({
        "metric": "eval_loop_pipelining_speedup",
        "value": round(results["per_image_sync"] / results["pipelined"], 3),
        "unit": "x",
    }), flush=True)


if __name__ == "__main__":
    main()
