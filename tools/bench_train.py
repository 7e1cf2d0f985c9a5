"""Training-step throughput benchmark (secondary to bench.py).

Measures the full fused two-scale training step — forward 0.5x + 1.0x,
RMI loss, backward, SGD update, cross-replica BN — at the reference SOTA
recipe's production shape (1024x2048 crop, bs 1/chip,
scripts/train_cityscapes.yml) on one chip, with relay-safe timing
(see bench.py docstring).

Prints one JSON line: {"metric": "train_step_imgs_per_sec_chip", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools._timing import timeit_chain  # noqa: E402

H, W = 1024, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="true", choices=["true", "false"])
    ap.add_argument("--remat-stages", default=None,
                    help="comma list, e.g. 1,2,3 (selective remat)")
    ap.add_argument("--loss", default="rmi")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    remat = args.remat == "true"
    from tpuseg.config import make_config
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model
    from tpuseg.train import create_train_state, make_optimizer, \
        make_train_step

    stages = tuple(int(x) for x in args.remat_stages.split(",")) \
        if args.remat_stages else None
    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.remat": remat,
        "model.remat_stages": stages,
        "dataset.num_classes": 19,
        "loss.loss_type": args.loss,
        "optim.lr": 5e-3,
    })
    model = get_model(cfg)
    criterion, _ = get_loss(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=372)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    image = jax.random.normal(jax.random.PRNGKey(1), (args.batch, H, W, 3),
                              jnp.bfloat16)
    label = jax.random.randint(jax.random.PRNGKey(2), (args.batch, H, W),
                               0, 19, jnp.int32)
    step = make_train_step(model, criterion, ocr_alpha=cfg.loss.ocr_alpha)

    # one jitted call per step with a donated state, exactly as the Trainer
    # runs it (a lax.scan harness double-buffers the carried state — an
    # extra ~1GB that production never holds). Dispatch is async through
    # the relay: K chained calls pipeline, one scalar readback at the end.
    fwd = jax.jit(step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(3)
    batch = {"image": image, "label": label}
    dt, state = timeit_chain(fwd, state, batch, rng)

    print(json.dumps({
        "metric": "train_step_imgs_per_sec_chip",
        "value": round(args.batch / dt, 4),
        "unit": "imgs/sec/chip",
        "step_ms": round(dt * 1e3, 1),
        "crop": f"{H}x{W}", "batch_per_chip": args.batch, "loss": args.loss,
        "remat": remat, "remat_stages": stages,
        "arch": "ocrnet.HRNet_Mscale (two-scale fwd+bwd)",
    }))


if __name__ == "__main__":
    main()
