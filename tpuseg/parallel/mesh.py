"""Device mesh + sharding layout.

TPU-native replacement for the reference's entire distributed stack
(SURVEY §2.8): NCCL process groups, apex DDP wrappers, DistributedSampler
and SyncBN collapse into a named-axis mesh and two sharding rules:

- batches: sharded over the ``data`` axis (leading dim);
- train state: fully replicated.

Under ``jax.jit`` XLA then emits the gradient psum (DDP), global batch-norm
statistics (SyncBN), and metric reductions (loss/hist allreduce) over ICI.
An optional ``model`` axis is reserved for spatial sharding of the conv
trunk (halo exchange) for >2x scales / 8k imagery — the domain's
ring-attention analogue (SURVEY §5.7), not needed for parity.

Multi-host: ``jax.distributed.initialize()`` before mesh creation; each
host feeds its local shard of the global batch
(``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, model_parallelism: int = 1,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """1D data mesh by default; 2D (data, model) if model_parallelism > 1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallelism == 0, (n, model_parallelism)
    dev_array = np.asarray(devices).reshape(n // model_parallelism,
                                            model_parallelism)
    return Mesh(dev_array, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for a (B, H, W, C) batch."""
    return NamedSharding(mesh, P(data_axis))


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     model_axis: str = "model") -> NamedSharding:
    """(B, H, W, C) sharded over batch x image-height.

    Sharding H over the ``model`` axis makes XLA partition every conv
    spatially and insert halo exchanges over ICI automatically — the
    segmentation analogue of sequence/context parallelism (SURVEY §5.7),
    for whole-image crops (bs=1/chip at 1024x2048) or >2x-scale / 8k-class
    imagery that won't fit one chip's HBM.

    KNOWN XLA BUG (jax 0.9.0), precisely delimited — the KERNEL GRADIENT
    of a strided conv on a 2D mesh is silently wrong in exactly two
    degenerate layouts (forward values and losses stay EXACT in both):

    1. operand REPLICATED over one mesh axis while H is sharded over
       another (``P(None, model)``) — the partial-replication reduction
       is mis-emitted. Pinned by the canary
       ``test_strided_conv_grad_batch_replicated_xla_bug``.
    2. DEGENERATE H-SHARDS: some conv in the graph sees fewer H rows
       than the ``model`` axis has devices (< 1 row/device — e.g. the
       0.5x train pass of a 32px image reaching a stride-32 stage on a
       4-device axis). Measured grad L1-rel 0.84 at 32px vs 2.4e-4 at
       128px on the identical graph. Pinned by the canary
       ``test_train_step_2d_mesh_degenerate_h_xla_bug``.

    The sharding this function returns — ``P(data, model)``, batch
    genuinely sharded over ``data`` — is EXACT on 2D meshes whenever
    every conv keeps >= 1 H row per model-axis device (full train-step
    proof: tests/test_spatial_sharding.py::test_spatial_train_step_2d_mesh).
    Production crops (>= 512px) with model_parallelism <= 8 satisfy this
    by an order of magnitude; Trainer asserts it at startup
    (train/loop.py). Therefore dp x sp TRAINING is supported whenever
    the global batch is a multiple of the ``data`` axis size AND crops
    are non-degenerate; batch-replicated H-sharded layouts (batch
    smaller than the data axis) remain inference-only.
    """
    return NamedSharding(mesh, P(data_axis, model_axis))


def shard_batch_spatial(mesh: Mesh, batch, data_axis: str = "data",
                        model_axis: str = "model"):
    """Place a host batch with images sharded over (data, model) axes;
    labels shard the same way on H. Multi-host: each host contributes its
    local batch rows (same contract as shard_batch)."""
    import jax

    sharding = spatial_sharding(mesh, data_axis, model_axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Place a host batch onto the mesh, sharded over the data axis.

    Multi-host: ``batch`` is each host's LOCAL shard (global_batch /
    process_count rows — setup_data shards the sampler per host) and the
    global array is assembled from the per-host pieces without any host
    ever materializing the full batch. Single-host: plain device_put.
    """
    sharding = batch_sharding(mesh, data_axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (train state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def multihost_sum(x: np.ndarray) -> np.ndarray:
    """Sum a host-local numpy array across all hosts (the reference's
    IoU-hist/loss NCCL allreduce, utils/misc.py:110-114, train.py:495-497).
    No-op in single-process runs."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(x))
    return np.asarray(gathered).sum(axis=0)


def sync_hosts():
    """Barrier across hosts (the reference's centroid-build barrier,
    datasets/uniform.py:265)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tpuseg_barrier")
