"""Child process for tests/test_multihost.py: one of N hosts in a CPU
jax.distributed cluster (gloo collectives).

Runs the REAL multi-process code paths — the ``process_count() > 1``
branches of shard_batch / shard_batch_spatial
(jax.make_array_from_process_local_data), multihost_sum
(process_allgather), and sync_hosts — on a 2-process x 4-device global
mesh, and prints machine-readable results for the parent to compare
against its single-process 8-device reference.

Mirrors the reference's one-process-per-GPU NCCL model
(train.py:290-300) collapsed to one process per HOST (SURVEY §2.8.2).
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PORT = sys.argv[1]
PID = int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tpuseg.config import make_config  # noqa: E402
from tpuseg.losses import get_loss  # noqa: E402
from tpuseg.models import get_model  # noqa: E402
from tpuseg.parallel import (  # noqa: E402
    make_mesh,
    multihost_sum,
    replicate,
    shard_batch,
    shard_batch_spatial,
    sync_hosts,
)
from tpuseg.train import (  # noqa: E402
    create_train_state,
    make_optimizer,
    make_train_step,
)

assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

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
rng = np.random.RandomState(0)
global_batch = {
    "image": rng.randn(8, 64, 32, 3).astype(np.float32),
    "label": rng.randint(0, 19, (8, 64, 32)).astype(np.int32),
}
out = {}

# --- dp train step: each host contributes its 4 local rows -------------
mesh = make_mesh(jax.devices())
# replicated out_shardings: without it the compiler may emit sharded
# outputs, which a host cannot np.asarray() in a multi-process run
step = jax.jit(make_train_step(model, criterion,
                               ocr_alpha=cfg.loss.ocr_alpha),
               out_shardings=NamedSharding(mesh, P()))
local = {k: v[PID * 4:(PID + 1) * 4] for k, v in global_batch.items()}
new_state, metrics = step(replicate(mesh, state), shard_batch(mesh, local),
                          jax.random.PRNGKey(1))
out["loss"] = float(metrics["loss"])
out["param_l1"] = float(sum(
    np.abs(np.asarray(leaf, np.float64)).sum()
    for leaf in jax.tree.leaves(new_state.params)))

# --- dp x sp eval forward: spatial multi-host placement ----------------
sp_mesh = make_mesh(jax.devices(), model_parallelism=2)
sp_local = {k: v[PID * 2:(PID + 1) * 2] for k, v in global_batch.items()}
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["pred"],
              out_shardings=NamedSharding(sp_mesh, P()))
pred = fwd({"params": state.params, "batch_stats": state.batch_stats},
           shard_batch_spatial(sp_mesh, sp_local)["image"])
out["pred_l1"] = float(np.abs(np.asarray(pred, np.float64)).sum())

# --- host collectives ---------------------------------------------------
out["mh_sum"] = multihost_sum(np.array([float(PID + 1)])).tolist()
sync_hosts()
out["pid"] = PID
print("MHRESULT " + json.dumps(out), flush=True)
