"""Training-step throughput benchmark (secondary to bench.py).

Measures the full fused two-scale training step — forward 0.5x + 1.0x,
RMI loss, backward, SGD update, cross-replica BN — at the reference SOTA
recipe's production shape (1024x2048 crop, bs 1/chip,
scripts/train_cityscapes.yml) on one chip, with relay-safe timing
(see bench.py docstring).

Prints one JSON line: {"metric": "train_step_imgs_per_sec_chip", ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 2048
K = 4


def main():
    from tpuseg.config import make_config
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model
    from tpuseg.train import create_train_state, make_optimizer, \
        make_train_step

    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale",
        "model.remat": True,
        "dataset.num_classes": 19,
        "loss.loss_type": "rmi",
        "optim.lr": 5e-3,
    })
    model = get_model(cfg)
    criterion, _ = get_loss(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=372)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 128, 3), jnp.bfloat16))

    image = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3),
                              jnp.bfloat16)
    label = jax.random.randint(jax.random.PRNGKey(2), (1, H, W), 0, 19,
                               jnp.int32)
    step = make_train_step(model, criterion, ocr_alpha=cfg.loss.ocr_alpha)

    def run_k(state, image, label, rng):
        def body(carry, i):
            st, _ = carry
            st, metrics = step(st, {"image": image, "label": label},
                               jax.random.fold_in(rng, i))
            return (st, metrics["loss"]), None

        (st, loss), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                     jnp.arange(K, dtype=jnp.int32))
        return loss

    fwd = jax.jit(run_k)
    rng = jax.random.PRNGKey(3)
    float(fwd(state, image, label, rng))  # compile + warm

    h = jax.jit(lambda x: x + 1.0)
    float(h(jnp.float32(0)))
    t0 = time.perf_counter()
    for i in range(10):
        float(h(jnp.float32(i)))
    rtt = (time.perf_counter() - t0) / 10

    times = []
    for r in range(2):
        t0 = time.perf_counter()
        float(fwd(state, image * jnp.bfloat16(1 + 0.1 * r), label, rng))
        times.append(time.perf_counter() - t0)
    dt = (min(times) - rtt) / K

    print(json.dumps({
        "metric": "train_step_imgs_per_sec_chip",
        "value": round(1.0 / dt, 4),
        "unit": "imgs/sec/chip",
        "step_ms": round(dt * 1e3, 1),
        "crop": f"{H}x{W}", "batch_per_chip": 1, "loss": "rmi",
        "remat": True, "arch": "ocrnet.HRNet_Mscale (two-scale fwd+bwd)",
    }))


if __name__ == "__main__":
    main()
