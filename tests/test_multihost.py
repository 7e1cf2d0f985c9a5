"""TRUE multi-process (multi-host) coverage over a CPU gloo cluster.

Every other mesh test runs single-process, so the ``process_count() > 1``
branches — jax.make_array_from_process_local_data placement in
shard_batch / shard_batch_spatial, multihost_sum's process_allgather,
sync_hosts' barrier — were dead code to the suite. This test spawns a
REAL 2-process jax.distributed cluster (4 CPU devices each, 8 global)
running tests/_mh_child.py and checks:

- both hosts agree bitwise on the post-step loss and updated params;
- the 2-process GSPMD train step matches this (single-process, 8-device)
  process's own step on the identical global batch;
- same for the dp x sp (data=4, model=2) eval forward fed through
  shard_batch_spatial's multi-host branch;
- multihost_sum sums across hosts; the barrier completes.

Replaces-in-kind the reference's NCCL DDP semantics (train.py:290-300,
SURVEY §2.8.2-2.8.3): grads/loss reduced across processes by the
compiler, host-side metrics by process_allgather.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.config import make_config
from tpuseg.losses import get_loss
from tpuseg.models import get_model
from tpuseg.parallel import make_mesh, replicate, shard_batch
from tpuseg.train import create_train_state, make_optimizer, make_train_step

CHILD = os.path.join(os.path.dirname(__file__), "_mh_child.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_step():
    """Single-process 8-device reference on the SAME global program and
    batch as the children (seeds must match tests/_mh_child.py)."""
    cfg = make_config({
        "model.arch": "ocrnet.HRNet_Mscale_Tiny",
        "model.compute_dtype": "float32",
        "model.remat": False,
        "dataset.num_classes": 19,
        "loss.loss_type": "ce",
    })
    model = get_model(cfg)
    criterion, _ = get_loss(cfg)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 32, 3)))
    step = jax.jit(make_train_step(model, criterion,
                                   ocr_alpha=cfg.loss.ocr_alpha))
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.randn(8, 64, 32, 3).astype(np.float32),
        "label": rng.randint(0, 19, (8, 64, 32)).astype(np.int32),
    }
    mesh = make_mesh(jax.devices())
    new_state, metrics = step(replicate(mesh, state),
                              shard_batch(mesh, batch), jax.random.PRNGKey(1))
    param_l1 = float(sum(
        np.abs(np.asarray(leaf, np.float64)).sum()
        for leaf in jax.tree.leaves(new_state.params)))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["pred"])
    pred = fwd({"params": state.params, "batch_stats": state.batch_stats},
               batch["image"][:4])
    return (float(metrics["loss"]), param_l1,
            float(np.abs(np.asarray(pred, np.float64)).sum()))


def test_two_process_cluster_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    # the children configure their own 4-device CPU platform; the parent
    # conftest's 8-device XLA_FLAGS would conflict
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, CHILD, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(CHILD)))
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-3000:]
        line = [l for l in text.splitlines() if l.startswith("MHRESULT ")]
        assert line, text[-3000:]
        r = json.loads(line[-1][len("MHRESULT "):])
        results[r["pid"]] = r

    r0, r1 = results[0], results[1]
    # hosts agree bitwise (same global program, same global data)
    assert r0["loss"] == r1["loss"]
    assert r0["param_l1"] == r1["param_l1"]
    assert r0["pred_l1"] == r1["pred_l1"]
    # cross-host collectives
    assert r0["mh_sum"] == [3.0] and r1["mh_sum"] == [3.0]

    want_loss, want_param_l1, want_pred_l1 = _reference_step()
    np.testing.assert_allclose(r0["loss"], want_loss, rtol=1e-6)
    np.testing.assert_allclose(r0["param_l1"], want_param_l1, rtol=1e-6)
    np.testing.assert_allclose(r0["pred_l1"], want_pred_l1, rtol=1e-6)


ENGINE_CHILD = os.path.join(os.path.dirname(__file__),
                            "_mh_engine_child.py")


@pytest.mark.slow
def test_two_process_trainer_fit(tmp_path):
    """FULL engine on a real 2-process cluster: Trainer.fit() end-to-end —
    per-host sampler shards, GSPMD train step, multi-host validate (hist
    reduced across hosts), collective orbax checkpointing into one shared
    logdir, primary-only logging. The reference's DDP engine run
    (train.py:290-300,324-462) collapsed to one process per host."""
    port = _free_port()
    logdir = str(tmp_path / "logs")
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, ENGINE_CHILD, str(port), str(pid), logdir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(ENGINE_CHILD)))
        for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-3000:]
        line = [l for l in text.splitlines() if l.startswith("MHRESULT ")]
        assert line, text[-3000:]
        r = json.loads(line[-1][len("MHRESULT "):])
        results[r["pid"]] = r

    r0, r1 = results[0], results[1]
    # the trained state is bitwise-identical on both hosts (grads/BN
    # stats reduced by the compiler over the global mesh)
    assert r0["param_l1"] == r1["param_l1"]
    assert r0["step"] == r1["step"] == 20  # 2 test_mode epochs x 10 steps
    # the collective checkpoint landed in the shared logdir
    assert r0["ckpt_step"] == r1["ckpt_step"] is not None
    # primary-only logging: metrics stream exists and carries both phases
    lines = [json.loads(l)
             for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert any(l["phase"] == "train" for l in lines)
    val = [l for l in lines if l["phase"] == "val"]
    assert val and 0.0 <= val[-1]["mIoU"] <= 1.0
