"""Standalone repro for the XLA SPMD strided-conv kernel-gradient bug.

Two precisely-delimited broken layouts on a 2D (data, model) mesh with a
conv's H dimension sharded over ``model`` (jax 0.9.0; forward values stay
exact in both — only the KERNEL GRADIENT silently corrupts):

  1. batch-REPLICATED operand: ``P(None, model)`` — partial-replication
     reduction mis-emitted;
  2. DEGENERATE H-shards: the conv sees fewer H rows than the ``model``
     axis has devices (< 1 row/device).

The production layout ``P(data, model)`` with >= 1 H row/device is exact
(tests/test_spatial_sharding.py::test_spatial_train_step_2d_mesh) — dp x sp
training is gated on it by the Trainer crop-size guard (train/loop.py).

Run on ANY box (forces an 8-device virtual CPU mesh, < 1 min):

    python tools/repro_xla_conv_grad_bug.py

to qualify a jax upgrade in minutes. If it prints FIXED for both cases,
delete the Trainer crop guard, relax parallel/mesh.py:spatial_sharding's
caveat, and retire the two canaries in tests/test_spatial_sharding.py
(they are written to FAIL when the bug disappears). Self-contained on
purpose: no tpuseg imports, so it also serves as an upstream bug report.
"""
from __future__ import annotations

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402


def conv_grad(h: int, pre_convs: int = 0):
    """jitted d/dw sum(conv(x', w)^2) where x' is ``x`` passed through
    ``pre_convs`` fixed stride-2 convs — so the DIFFERENTIATED conv's
    operand has h / 2^pre_convs rows. Gradient is wrt the kernel of that
    last conv only (how production graphs hit the degenerate-shard case:
    a stage kernel whose operand lost its H rows to earlier strides even
    though the model axis divides the input H). Also returns the
    unsharded reference gradient."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, 8, 8), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
    w_fixed = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)

    def loss(w, x):
        y = x
        for _ in range(pre_convs):
            y = jax.lax.conv_general_dilated(
                y, w_fixed, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            y, w, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    g = jax.jit(jax.grad(loss))
    return g, np.asarray(g(w, x)), w, x


def rel_err(got, want) -> float:
    return float(np.abs(got - want).max() / np.abs(want).max())

def main() -> int:
    devs = jax.devices()
    assert len(devs) >= 8, devs
    mesh = Mesh(np.asarray(devs[:8]).reshape(2, 4), ("data", "model"))
    tol = 1e-4
    broken = {}

    # case 1: batch-replicated operand, H sharded (P(None, model)), 8 rows
    g, ref, w, x = conv_grad(h=8)
    got = np.asarray(g(jax.device_put(w, NamedSharding(mesh, P())),
                       jax.device_put(x, NamedSharding(mesh,
                                                       P(None, "model")))))
    broken["batch_replicated_P(None,model)"] = rel_err(got, ref)

    # control: the production layout P(data, model), H non-degenerate
    # (8 rows over a 4-device model axis = 2 rows/device) must be exact
    # under ANY jax version — if this fails the repro itself is suspect
    got = np.asarray(g(jax.device_put(w, NamedSharding(mesh, P())),
                       jax.device_put(x, NamedSharding(mesh,
                                                       P("data", "model")))))
    control = rel_err(got, ref)

    # case 2: degenerate H-shard on the production layout — input H=8
    # shards cleanly over the 4-device model axis, but the differentiated
    # conv's operand has been strided down to H=2 (< 1 row/device)
    g2, ref2, w2, x2 = conv_grad(h=8, pre_convs=2)
    got2 = np.asarray(g2(jax.device_put(w2, NamedSharding(mesh, P())),
                         jax.device_put(x2, NamedSharding(
                             mesh, P("data", "model")))))
    broken["degenerate_h_shard_P(data,model)"] = rel_err(got2, ref2)

    print(f"jax {jax.__version__} | control P(data,model) h=8: "
          f"rel {control:.2e} "
          f"{'OK' if control < tol else 'BROKEN (repro invalid!)'}")
    any_repro = False
    for name, rel in broken.items():
        repro = rel > tol
        any_repro |= repro
        print(f"{name}: rel {rel:.2e} -> "
              f"{'BUG REPRODUCES' if repro else 'FIXED'}")
    if control >= tol:
        print("FAIL: control layout is wrong — do not trust this run")
        return 2
    if any_repro:
        print("PASS (status quo): keep the Trainer crop guard and the "
              "canaries in tests/test_spatial_sharding.py")
    else:
        print("PASS (bug fixed upstream): relax the Trainer crop guard "
              "(train/loop.py), spatial_sharding's docstring caveat, and "
              "retire the two canaries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
