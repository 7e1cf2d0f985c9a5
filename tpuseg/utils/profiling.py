"""Profiling: compiled-cost model summary and device tracing.

Replaces the reference's thop MACs/params ``--summary``
(train.py:385-392) with XLA's own cost model, and nvprof-style tracing
with ``jax.profiler`` (SURVEY §5.1).
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def model_summary(model, input_shape=(1, 1024, 2048, 3),
                  dtype=jnp.bfloat16, train: bool = False) -> dict:
    """-> {params, flops, bytes_accessed, peak_hbm_bytes} for one forward.

    FLOPs come from ``jit(...).lower().compile().cost_analysis()`` — the
    compiler's count for the exact fused program, not an op-table estimate.
    """
    x = jnp.zeros(input_shape, dtype)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    n_params = sum(int(np.prod(v.shape)) for v in
                   jax.tree.leaves(variables["params"]))

    def fwd(v, xi):
        return model.apply(v, xi, train=train)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis() or {}
    mem = {}
    try:
        mem_analysis = compiled.memory_analysis()
        if mem_analysis is not None:
            mem["peak_hbm_bytes"] = int(
                getattr(mem_analysis, "temp_size_in_bytes", 0) +
                getattr(mem_analysis, "argument_size_in_bytes", 0))
    except Exception:
        pass
    return {
        "params": n_params,
        "flops": int(cost.get("flops", 0)),
        "bytes_accessed": int(cost.get("bytes accessed", 0)),
        **mem,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard / Perfetto
    (replaces cudnn-benchmark-style ad-hoc timing, SURVEY §5.1)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
