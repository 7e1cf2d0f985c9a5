"""Full train-LOOP throughput with real host->device input transfer.

BENCH_train_r02.json times the bare jitted step (device-resident inputs);
production `Trainer.train_epoch` uploads a fresh batch every step. Through
the ~39 MB/s device relay the f32 wire costs 32 MB/step at 1024x2048 bs1
(24 MB image + 8 MB int32 label) — the uint8 wire
(``dataset.transfer_uint8``, tpuseg/ops/normalize.py) ships the same
pixels in 8 MB. This tool measures the END-TO-END loop (H2D + dispatch +
step) for both wire formats, the train analogue of
tools/bench_evalloop.py.

The loop pipelines exactly like the Trainer: dispatch step N+1 while N
executes, one scalar loss readback at the end of the timed window (the
Trainer's on-device loss accumulator syncs even less often).

Prints one JSON line per mode; run on the real chip.
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

from tools._timing import measure_rtt  # noqa: E402

H, W = 1024, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--loss", default="rmi")
    args = ap.parse_args()

    from tpuseg.config import make_config
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model
    from tpuseg.train import create_train_state, make_optimizer, \
        make_train_step

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.remat": True,
        "model.remat_stages": (1, 2, 3),
        "dataset.num_classes": 19,
        "loss.loss_type": args.loss,
        "optim.lr": 5e-3,
    })
    model = get_model(cfg)
    criterion, _ = get_loss(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=372)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 128, 3), jnp.bfloat16))
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(3)

    host = np.random.RandomState(0)
    batch_f32 = {
        "image": host.randn(args.batch, H, W, 3).astype(np.float32),
        "label": host.randint(0, 19, (args.batch, H, W)).astype(np.int32),
    }
    batch_u8 = {
        "image": host.randint(0, 256,
                              (args.batch, H, W, 3)).astype(np.uint8),
        "label": batch_f32["label"].astype(np.uint8),
    }

    # compile both wire graphs + steady state
    for b in (batch_f32, batch_u8):
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in b.items()}, rng)
    float(metrics["loss"])
    rtt = measure_rtt()

    results = {}
    for name, b in (("trainloop_f32_wire", batch_f32),
                    ("trainloop_uint8_wire", batch_u8)):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            dev = {k: jnp.asarray(v) for k, v in b.items()}
            state, metrics = step(state, dev, rng)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0 - rtt) / args.steps
        results[name] = dt
        print(json.dumps({
            "metric": "train_loop_imgs_per_sec_chip",
            "mode": name,
            "value": round(args.batch / dt, 4),
            "unit": "imgs/sec/chip",
            "step_ms": round(dt * 1e3, 1),
            "wire_mb_per_step": round(
                sum(v.nbytes for v in b.values()) / 2**20, 1),
            "crop": f"{H}x{W}", "batch_per_chip": args.batch,
            "loss": args.loss, "steps_timed": args.steps,
            "arch": "ocrnet.HRNet_Mscale (two-scale fwd+bwd, remat 1-3)",
        }), flush=True)
    print(json.dumps({
        "metric": "train_loop_uint8_wire_speedup",
        "value": round(results["trainloop_f32_wire"]
                       / results["trainloop_uint8_wire"], 3),
        "unit": "x",
    }), flush=True)


if __name__ == "__main__":
    main()
