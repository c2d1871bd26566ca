"""What does each sync strategy actually measure on the axon tunnel?

v2 (round 5): the v1 probe's D2H control was INVALID — it re-pulled a
buffer whose host copy jax had already cached (`_npy_value`), reading
0.005 ms, and concluded from `block=24 ms vs asarray=394 ms` that
block_until_ready "acks rather than syncs". ADVICE r4 pointed out the
394 ms is plausibly plain D2H of the 16.8 MB result over a slow tunnel
link with block being a true sync. This version prices D2H correctly:

  1. d2h_fresh: np.asarray on a NEVER-PULLED buffer (a new output object
     each rep) whose compute has provably drained — we block, then sleep
     DRAIN_SLEEP_S (>> any plausible compute) before timing the pull.
     Measured at two sizes -> bytes/s of the D2H link.
  2. asarray_immediate: np.asarray right after dispatch (compute + D2H).
  3. block_fresh: jax.block_until_ready right after dispatch.

Interpretation:
  compute_upper_bound = asarray_immediate - d2h_fresh(same size)
  If block_fresh >= compute_upper_bound (within the RPC floor), block is
  consistent with a TRUE SYNC and v1's "ack" conclusion was an artifact
  of the invalid control. Either way the chained-slope headline stands:
  it cancels ALL fixed per-dispatch costs (upload, RPC, ack-or-sync
  latency, D2H) regardless of which semantics block has.

v3 (the decisive leg — run 2026-08-21): legs 1-3 cannot separate ack
from sync when the compute is ~2.5 ms and the RPC floor is ~27 ms (both
semantics read ~floor), and `compute_upper_bound` from leg 2 is
contaminated by whatever slows an immediately-issued D2H beyond a
drained one. So: chain LONG_CHAIN_N dependent frontend iterations in one
program (~100 x 2.5 ms = ~250 ms of device compute) returning only a
f32 CHECKSUM (D2H ~= 0). Then
  block_long   ~= floor            -> block is an ACK
  block_long   ~= asarray_long     -> block is a TRUE SYNC
(asarray_long = compute + floor, since the 4-byte pull is free).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DRAIN_SLEEP_S = 3.0
REPS = 5
LONG_CHAIN_N = 100  # ~100 x 2.5 ms >> the ~27 ms RPC floor
# PROBE_V3_ONLY=1 skips the v1/v2 legs (each pays a remote compile +
# ~45 s of drain sleeps) and runs just the decisive long-chain leg
V3_ONLY = os.environ.get("PROBE_V3_ONLY") == "1"


def _median_ms(ts):
    return round(float(np.median(ts)) * 1e3, 3)


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize

    fe = FrontendConfig.for_case("gtzan")
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (256, fe.sample_rate * fe.slice_length)).astype(np.float32))

    report = {"drain_sleep_s": DRAIN_SLEEP_S, "v3_only": V3_ONLY}

    if not V3_ONLY:
        fe_full = jax.jit(lambda w: logmel(peak_normalize(w), fe)[:, None])
        out = jax.block_until_ready(fe_full(wavs))  # compile
        out_np = np.asarray(out)
        nbytes_mel = out_np.nbytes
        print(f"out shape {out_np.shape}, {nbytes_mel/1e6:.1f} MB",
              file=sys.stderr)

        # a trivial big producer for the second D2H size point (64 MB)
        big = jnp.asarray(rng.standard_normal((256, 65536)).astype(np.float32))
        scale_big = jax.jit(lambda w: w * 1.000001)
        jax.block_until_ready(scale_big(big))
        nbytes_big = big.size * 4

    # 1. pure D2H on never-pulled fresh output objects, compute drained
    def d2h_fresh(producer, operand, label, nbytes):
        ts = []
        v = operand
        for _ in range(REPS):
            v = jax.block_until_ready(v * (1.0 + 1e-6))  # fresh content
            o = producer(v)                               # NEW output object
            jax.block_until_ready(o)
            time.sleep(DRAIN_SLEEP_S)  # compute has drained by now even if
            #                            block only acked the dispatch
            t0 = time.perf_counter()
            np.asarray(o)
            ts.append(time.perf_counter() - t0)
        ms = _median_ms(ts)
        report[f"d2h_fresh_{label}_ms"] = ms
        report[f"d2h_fresh_{label}_mb_per_s"] = round(
            nbytes / (ms / 1e3) / 1e6, 1)
        return ms

    if not V3_ONLY:
        d2h_mel = d2h_fresh(fe_full, wavs, "mel17mb", nbytes_mel)
        d2h_fresh(scale_big, big, "big64mb", nbytes_big)

        # 2. asarray immediately after dispatch (compute + D2H together)
        v = wavs
        ts = []
        for _ in range(REPS):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            np.asarray(fe_full(v))
            ts.append(time.perf_counter() - t0)
        report["asarray_immediate_ms"] = _median_ms(ts)

        # 3. block_until_ready immediately after dispatch
        ts = []
        for _ in range(REPS):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            jax.block_until_ready(fe_full(v))
            ts.append(time.perf_counter() - t0)
        report["block_fresh_ms"] = _median_ms(ts)

        compute_ub = report["asarray_immediate_ms"] - d2h_mel
        report["compute_upper_bound_ms"] = round(compute_ub, 3)
        report["block_consistent_with_true_sync"] = bool(
            report["block_fresh_ms"] >= compute_ub - 5.0)  # 5 ms grace

    # 4. v3 decisive leg: long dependent-compute chain, scalar output
    @jax.jit
    def long_chain(w):
        def body(_, carry):
            out = logmel(peak_normalize(carry), fe)
            return carry * (1.0 + 1e-12 * jnp.mean(out))

        v2 = jax.lax.fori_loop(0, LONG_CHAIN_N, body, w)
        return jnp.float32(jnp.sum(v2) / v2.size)

    np.asarray(long_chain(wavs))  # compile + warm + drain
    ts_b, ts_a = [], []
    v = wavs
    for _ in range(REPS):
        v = jax.block_until_ready(v * (1.0 + 1e-6))
        t0 = time.perf_counter()
        jax.block_until_ready(long_chain(v))
        ts_b.append(time.perf_counter() - t0)
    for _ in range(REPS):
        v = jax.block_until_ready(v * (1.0 + 1e-6))
        t0 = time.perf_counter()
        np.asarray(long_chain(v))
        ts_a.append(time.perf_counter() - t0)
    report["long_chain_n"] = LONG_CHAIN_N
    report["block_long_ms"] = _median_ms(ts_b)
    report["asarray_long_ms"] = _median_ms(ts_a)
    # ack iff block covers < half the scalar-pull (compute+floor) time
    report["block_is_ack"] = bool(
        report["block_long_ms"] < 0.5 * report["asarray_long_ms"])

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
