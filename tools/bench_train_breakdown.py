"""Component breakdown of the TRAIN step on one chip (relay-safe timing,
see bench.py). Locates where the 1024x2048 two-scale fwd+bwd step spends
its time:

  fwd_rmi        - loss value only (two-scale fwd + RMI), no grad
  fwd_ce         - loss value only with plain CE
  step_rmi       - full step (grad + SGD update), remat stages (1,2,3)
  resize_bwd     - isolated grad through the torch-parity gather resize
                   (upsample 512x1024 -> 1024x2048, 19ch f32): measures the
                   scatter-add cost of the gather transpose on TPU
  resize_fwd     - same resize, forward only

Prints one JSON line per entry as it completes.
Timing methodology: tools/_timing.py (single source, shared with bench.py).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools._timing import K, timeit_chain, timeit_scan  # noqa: E402

H, W = 1024, 2048


def emit(name, dt):
    print(json.dumps({"component": name, "ms": round(dt * 1e3, 1)}),
          flush=True)


def main():
    from tpuseg.config import make_config
    from tpuseg.losses import get_loss
    from tpuseg.models import get_model
    from tpuseg.train import create_train_state, make_optimizer, \
        make_train_step

    # isolated resize probes first (fast compiles)
    from tpuseg.ops import resize_bilinear

    x_small = jax.random.normal(jax.random.PRNGKey(0), (1, 512, 1024, 19),
                                jnp.float32)

    def res_fwd(v, x):
        def body(c, i):
            y = resize_bilinear(x * (1.0 + i.astype(jnp.float32) * 1e-3),
                                (H, W))
            return c + jnp.mean(y), None
        t, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(K, dtype=jnp.int32))
        return t

    def res_bwd(v, x):
        g = jax.grad(lambda xx: jnp.mean(resize_bilinear(xx, (H, W))))

        def body(c, i):
            gx = g(x * (1.0 + i.astype(jnp.float32) * 1e-3))
            return c + jnp.mean(gx), None
        t, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(K, dtype=jnp.int32))
        return t

    emit("resize_fwd", timeit_scan(jax.jit(res_fwd), 0, x_small))
    emit("resize_bwd", timeit_scan(jax.jit(res_bwd), 0, x_small))

    def build(loss_type):
        cfg = make_config({
            "model.arch": "ocrnet.HRNet_Mscale",
            "model.remat": True,
            "model.remat_stages": (1, 2, 3),
            "dataset.num_classes": 19,
            "loss.loss_type": loss_type,
            "optim.lr": 5e-3,
        })
        model = get_model(cfg)
        criterion, _ = get_loss(cfg)
        tx, _ = make_optimizer(cfg, steps_per_epoch=372)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 128, 3), jnp.bfloat16))
        return model, criterion, tx, state

    image = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3),
                              jnp.bfloat16)
    label = jax.random.randint(jax.random.PRNGKey(2), (1, H, W), 0, 19,
                               jnp.int32)
    batch = {"image": image, "label": label}
    rng = jax.random.PRNGKey(3)

    for loss_type in ("rmi", "ce"):
        model, criterion, tx, state = build(loss_type)

        def fwd_loss(params, stats, x):
            def body(c, i):
                xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                out, _ = model.apply(
                    {"params": params, "batch_stats": stats},
                    xi, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                loss = criterion(out["pred"], label, do_rmi=True)
                return c + loss, None
            t, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(K, dtype=jnp.int32))
            return t

        emit(f"fwd_{loss_type}",
             timeit_scan(jax.jit(fwd_loss), state.params,
                         state.batch_stats, image))

        if loss_type == "rmi":
            step = jax.jit(make_train_step(model, criterion, ocr_alpha=0.4),
                           donate_argnums=(0,))
            dt, state = timeit_chain(step, state, batch, rng)
            emit("step_rmi", dt)


if __name__ == "__main__":
    main()
