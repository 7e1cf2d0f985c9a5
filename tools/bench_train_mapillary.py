"""Mapillary TRAIN-shape on-chip benchmark (VERDICT r4 item 4).

The Mapillary recipe (tpuseg/cli/recipes/train_mapillary.yaml, mirroring
the reference scripts/train_mapillary.yml) trains ocrnet.HRNet_Mscale at
a 1024x1024 crop, 65 classes, RMI loss, bs 2/chip. The eval shape is
banked (BENCH_mapillary.json); this tool banks the TRAINING step: HBM
fit at the recipe batch/remat policy, img/s/chip, and the end-to-end
loop cost including the uint8-wire H2D (what `Trainer.train_epoch`
actually pays per step).

Prints one JSON line per mode; run on the real chip:

    python tools/bench_train_mapillary.py [--batch 2] [--remat 1,2,3]
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

H, W = 1024, 1024
NC = 65


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--remat", default="1,2,3",
                    help="comma list of HRNet stages to remat ('' = none)")
    args = ap.parse_args()
    stages = tuple(int(s) for s in args.remat.split(",") if s)

    from tpuseg.config import make_config
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model
    from tpuseg.train import create_train_state, make_optimizer, \
        make_train_step

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.remat": bool(stages),
        "model.remat_stages": stages,
        "dataset.name": "mapillary",
        "dataset.num_classes": NC,
        "dataset.ignore_label": NC,
        "loss.loss_type": "rmi",
        "optim.lr": 5e-3,
    })
    model = get_model(cfg)
    criterion, _ = get_loss(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=562)  # 18k imgs / 32
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.bfloat16))
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(3)

    host = np.random.RandomState(0)
    # production wire format (dataset.transfer_uint8): raw bytes
    batch = {
        "image": host.randint(0, 256,
                              (args.batch, H, W, 3)).astype(np.uint8),
        "label": host.randint(0, NC, (args.batch, H, W)).astype(np.uint8),
    }

    try:
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()}, rng)
        loss0 = float(metrics["loss"])
    except Exception as e:  # HBM overflow surfaces at compile/execute
        print(json.dumps({
            "metric": "mapillary_train_step",
            "fit": False, "batch_per_chip": args.batch,
            "remat_stages": stages, "error": str(e)[:400],
        }), flush=True)
        return
    rtt = measure_rtt()

    t0 = time.perf_counter()
    for _ in range(args.steps):
        dev = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, dev, rng)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0 - rtt) / args.steps

    print(json.dumps({
        "metric": "mapillary_train_imgs_per_sec_chip",
        "value": round(args.batch / dt, 4),
        "unit": "imgs/sec/chip",
        "fit": True,
        "step_ms": round(dt * 1e3, 1),
        "loss0": round(loss0, 4),
        "crop": f"{H}x{W}", "batch_per_chip": args.batch,
        "num_classes": NC, "loss": "rmi",
        "remat_stages": stages, "steps_timed": args.steps,
        "wire": "uint8 (recipe default), incl. H2D in the timed loop",
        "arch": "ocrnet.HRNet_Mscale (two-scale fwd+bwd)",
    }), flush=True)


if __name__ == "__main__":
    main()
