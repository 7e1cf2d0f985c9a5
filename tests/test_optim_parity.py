"""Optimizer trajectory parity vs the reference's torch implementations.

The reference's RAdam (loss/radam.py:11-107) carries its own
rectification/step-size buffer; our optax.scale_by_radam substitution is
validated here by driving BOTH on identical synthetic gradients for 12
steps (enough to cross the N_sma >= 5 rectification threshold at
beta2=0.999 -> step 5) and comparing parameter trajectories.
"""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.oracle  # torch-reference tier (slow)

import jax.numpy as jnp


def _torch_radam_traj(grads, lr, wd, steps):
    """Run the ACTUAL reference RAdam on one tensor."""
    sys.path.insert(0, "/root/reference")
    import torch

    from loss.radam import RAdam  # reference loss/radam.py

    p = torch.nn.Parameter(torch.zeros(grads[0].shape, dtype=torch.float32))
    with torch.no_grad():
        p.add_(1.0)  # start at ones
    opt = RAdam([p], lr=lr, weight_decay=wd)
    traj = []
    for t in range(steps):
        opt.zero_grad()
        p.grad = torch.from_numpy(grads[t]).float()
        opt.step()
        traj.append(p.detach().numpy().copy())
    return traj


def _optax_radam_traj(grads, lr, wd, steps):
    import optax

    from tpuseg.config import make_config
    from tpuseg.train.optim import make_optimizer

    cfg = make_config({"optim.optimizer": "radam", "optim.lr": lr,
                       "optim.weight_decay": wd,
                       "optim.poly_exp": 0.0,  # constant lr
                       "train.max_epoch": 1000})
    tx, _ = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones(grads[0].shape, jnp.float32)}
    state = tx.init(params)
    traj = []
    for t in range(steps):
        updates, state = tx.update({"w": jnp.asarray(grads[t])}, state,
                                   params)
        params = optax.apply_updates(params, updates)
        traj.append(np.asarray(params["w"]))
    return traj


@pytest.mark.parametrize("wd", [0.0, 1e-4])
def test_radam_trajectory_matches_reference(wd):
    rng = np.random.RandomState(0)
    steps = 12
    grads = [rng.randn(4, 3).astype(np.float32) for _ in range(steps)]
    want = _torch_radam_traj(grads, lr=1e-2, wd=wd, steps=steps)
    got = _optax_radam_traj(grads, lr=1e-2, wd=wd, steps=steps)
    for t, (w, g) in enumerate(zip(want, got)):
        np.testing.assert_allclose(g, w, rtol=2e-5, atol=2e-6,
                                   err_msg=f"step {t}")
