"""Timing helpers for benches run through the axon TPU tunnel.

Two tunnel artifacts break naive timing loops (BASELINE.md
"measurement-methodology correction"):

- a ~29 ms RPC floor on any host-observed completion, and
- dedup of IDENTICAL dispatches: re-calling a jitted fn with the same input
  buffers returns a cached result (measured 0.04 ms/iter for a kernel whose
  FLOP floor alone is >0.1 ms), so repeat-call loops measure nothing.

`measure_rpc_floor` times a null program; `time_with_fresh_input` blocks
per call, re-materializes the varying input with fresh content before every
timed call, and subtracts the floor. (Block-based syncing here is valid:
the round-5 probe established block_until_ready is a TRUE SYNC on the
tunnel — BASELINE.md "sync semantics resolved".) Good for staged programs >~30 ms where
floor jitter (~±2 ms) is small; for sub-10 ms kernels chain dependent
iterations inside one jitted fori_loop instead (scripts/bench_first_layer.py).
"""

import time

import numpy as np


def measure_rpc_floor(jax, jnp, reps: int = 8) -> float:
    """Median ms for a trivial jitted program, i.e. the tunnel round-trip."""

    @jax.jit
    def null_prog(x):
        return x + 1.0

    xs = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(null_prog(xs))
    ts = []
    for _ in range(reps):
        # fresh content each rep: identical dispatches are dedup-cached and
        # return in ~0.05 ms, hiding the true round-trip
        xs = jax.block_until_ready(xs + 1.0)
        t0 = time.perf_counter()
        jax.block_until_ready(null_prog(xs))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def time_with_fresh_input(jax, call, vary, iters: int, floor_ms: float):
    """(median ms per call - floor, warm-call output).

    ``call(v)`` runs the program on varying input ``v``; ``vary`` is
    perturbed by a relative 1e-6 and re-materialized before each timed call
    so the tunnel cannot serve a cached execution. The returned output is
    from the UNPERTURBED warm call (use it for correctness comparisons).
    """
    out = call(vary)
    jax.block_until_ready(out)  # compile + warm
    times = []
    v = vary
    for _ in range(iters):
        v = jax.block_until_ready(v * (1.0 + 1e-6))
        t0 = time.perf_counter()
        o = call(v)
        jax.block_until_ready(o)
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3 - floor_ms, out
