"""Relay-safe TPU timing helpers, shared by bench.py and tools/bench_*.

The device tunnel used here satisfies ``block_until_ready`` without
waiting for execution, so naive wall-clock timing reports dispatch time
only. Methodology (calibrated against a bf16 matmul chain reaching
179 TFLOP/s ~ 91% of v5e peak):

- run K model evaluations per timed readback (chained inside one jitted
  ``lax.scan``, or K chained donated-state calls), forcing one scalar
  readback at the end;
- subtract the measured relay round-trip (RTT);
- take the min of ``reps`` repetitions, divide by K.

Single source of truth: any change to the methodology here changes every
benchmark's basis at once (bench.py, tools/bench_train.py, the two
breakdown tools).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

K = 4  # model evals per timed readback


def measure_rtt(n: int = 10) -> float:
    """Measured relay round-trip of one scalar readback."""
    h = jax.jit(lambda x: x + 1.0)
    float(h(jnp.float32(0)))  # compile
    t0 = time.perf_counter()
    for i in range(n):
        float(h(jnp.float32(i)))
    return (time.perf_counter() - t0) / n


def scan_k(apply_fn, k: int = K):
    """Wrap ``apply_fn(v, x) -> array`` into a jitted K-step scan with a
    scalar result (inputs perturbed per step so nothing collapses)."""

    def run(v, x):
        def body(carry, i):
            xi = x * (1.0 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            out = apply_fn(v, xi)
            return carry + jnp.mean(out.astype(jnp.float32)), None

        total, _ = jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(k, dtype=jnp.int32))
        return total

    return jax.jit(run)


def timeit_scan(fn, *args, reps: int = 2, k: int = K) -> float:
    """Seconds per model eval for a jitted fn with K evals inside
    (e.g. built by scan_k). ``float(fn(*args))`` must force a readback."""
    float(fn(*args))  # compile + warm
    r = measure_rtt()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return (min(times) - r) / k


def timeit_chain(fn, state, batch, rng, reps: int = 2, k: int = K):
    """Seconds per step for a donated-state train step: K chained calls
    pipeline through the relay, one scalar readback at the end. Returns
    (dt, final_state) — the caller must keep using the returned state
    (the old one was donated)."""
    state, metrics = fn(state, batch, rng)  # compile + warm
    float(metrics["loss"])
    r = measure_rtt()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = fn(state, batch, rng)
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    return (min(times) - r) / k, state
