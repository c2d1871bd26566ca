"""Persistent JAX compilation cache (VERDICT round-4 #2).

Cold remote compiles dominate every wall-clock number in this container
(the axon platform compiles through a remote service whose latency runs
minutes under congestion; BENCH_r03/r04 both died on cold compiles).
JAX's on-disk compilation cache persists serialized executables keyed on
HLO + compile options, so a SECOND process compiling the same program
loads it from disk instead of re-paying the remote service.

Call :func:`enable` early (before the first jit) from any entry point
that re-runs known programs: bench.py, the workflow scripts, conftest.
Idempotent; ``DRSA_COMPCACHE=0`` disables; ``DRSA_COMPCACHE_DIR``
overrides the location (default ``<repo>/runs/jax_cache``).

Whether the axon PJRT plugin supports executable serialization is
measured by ``scripts/probe_compile_cache.py`` — see BASELINE.md for the
verdict; enable() is harmless either way (JAX skips the cache with a
warning when the backend can't serialize).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "runs", "jax_cache")

_enabled = False


def enable(cache_dir: str | None = None, cpu_ok: bool = False) -> str | None:
    """Turn on the on-disk compilation cache. Returns the dir, or None when
    disabled via DRSA_COMPCACHE=0, an unwritable directory, or a CPU-only
    platform (unless ``cpu_ok``).

    The CPU gate: XLA:CPU's cached AOT executables reload with machine-
    feature-mismatch errors on this host ("+prefer-no-scatter is not
    supported... could lead to SIGILL") — measured working, but the risk/
    noise isn't worth the sub-second CPU compiles. The minutes-long remote
    compiles this cache exists for all go through the axon TPU platform."""
    global _enabled
    if os.environ.get("DRSA_COMPCACHE", "1") == "0":
        return None
    import jax
    platforms = jax.config.jax_platforms or ""
    if not cpu_ok and "axon" not in platforms and "tpu" not in platforms:
        return None
    cache_dir = (cache_dir or os.environ.get("DRSA_COMPCACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: this host pays minutes for compiles the defaults
    # (>= 1 s compile time, >= 4 KB) would mostly cover anyway, but the
    # small programs (probes, warmups) also benefit through the tunnel
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
