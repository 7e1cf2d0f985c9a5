"""Child for tests/test_multihost.py::test_two_process_trainer_fit: one of
two hosts running the FULL engine — Trainer.fit() end-to-end (per-host
sampler shards, jitted GSPMD train step, multi-host validate with
cross-host hist reduction, collective orbax checkpointing into a shared
logdir, primary-only logging) on a 2-process x 4-device CPU gloo cluster.

The reference's engine runs exactly like this under NCCL DDP
(train.py:290-300,324-462); here one process per HOST (SURVEY §2.8.2).
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PORT, PID, LOGDIR = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from tpuseg.config import make_config  # noqa: E402
from tpuseg.train.loop import Trainer  # noqa: E402

assert jax.process_count() == 2 and len(jax.devices()) == 8

cfg = make_config({
    "model.arch": "ocrnet.HRNet_Mscale_Tiny",
    "model.compute_dtype": "float32",
    "model.remat": False,
    "dataset.name": "synthetic",
    "dataset.num_classes": 19,
    "dataset.crop_size": (32, 32),
    "dataset.num_workers": 1,
    "train.batch_size": 8,          # GLOBAL batch -> 4 rows per host
    "train.test_mode": True,        # 2 epochs x 10 steps, 5 val iters
    "train.log_every": 5,
    "eval.scales": (0.5, 1.0),
    "loss.loss_type": "ce",
})
trainer = Trainer(cfg, logdir=LOGDIR, is_primary=jax.process_index() == 0)
assert dict(trainer.mesh.shape) == {"data": 8, "model": 1}
# each host's loader yields its LOCAL shard of the global batch
assert trainer.train_loader.batch_size == 4
trainer.fit()

param_l1 = float(sum(np.abs(np.asarray(l, np.float64)).sum()
                     for l in jax.tree.leaves(trainer.state.params)))
print("MHRESULT " + json.dumps({
    "pid": PID,
    "step": int(trainer.state.step),
    "param_l1": param_l1,
    "ckpt_step": trainer.ckpt.latest_step(),
}), flush=True)
