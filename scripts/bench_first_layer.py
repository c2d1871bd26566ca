"""Microbench variants of the fused first-layer LRP kernel on the real chip.

The round-3 profile put `_first_layer_kernel` (pool backward + relu gate +
wsquare first-conv rule, xai/lrp/pallas_chain.py) at ~21 ms/iter = 53% of the
fused lower backward. A byte-count of the kernel body says it is
VPU-bandwidth-bound: per clone the transposed conv does 9 full 128-lane
multiply-accumulate passes over the fine map whose results are then reduced
to P0=4 lanes anyway. Variants tested here fold the per-tap channel weights
into the reduction matmul (one [128, P0] block-diagonal matrix per tap), so
the conv becomes 9 MXU reads with tiny outputs and zero full-map writes.

Usage: python scripts/bench_first_layer.py [--batch 256] [--iters 16]
Prints a JSON line per variant: ms/iter + max abs diff vs production.
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from drsa_audio_tpu.xai.lrp import pallas_chain as pc

K = 4
C1 = 32          # first-block channel count (gtzan-3s)
HF, WF = 128, 128


def _first_layer_kernel_mmtaps(R_ref, a1_ref, z0_ref, mtaps_ref, out_ref,
                               *, Ci, K, stab0):
    """Variant: per-tap block-diagonal reduce matrices (fold w into _mm).
    Same math as pc._first_layer_kernel(mm_taps=True)."""
    a1 = a1_ref[0]
    mask = pc.maxpool2x2_fine_mask(jnp.maximum(a1, 0.0), Ci)
    F = mask * pc.relu_gate(a1) / pc.stabilize(z0_ref[:], stab0)
    for k in range(K):
        s0 = pc.pool2x2_backward(R_ref[0, k], F, Ci)
        out_ref[0, k] = pc._first_tail_mm(s0, mtaps_ref[:], Ci)


def _first_layer_kernel_mmtaps_kvec(R_ref, a1_ref, z0_ref, mtaps_ref, out_ref,
                                    *, Ci, K, stab0):
    """mmtaps + the K clone loop vectorized (all clones live in VMEM)."""
    a1 = a1_ref[0]
    mask = pc.maxpool2x2_fine_mask(jnp.maximum(a1, 0.0), Ci)
    F = mask * pc.relu_gate(a1) / pc.stabilize(z0_ref[:], stab0)
    s0 = pc.pool2x2_backward(R_ref[0], F, Ci)          # [K, H, G, 128]
    out_ref[0] = pc._first_tail_mm(s0, mtaps_ref[:], Ci)


pack_first_mtaps = pc.pack_first_mtaps


def run_prod(R, a1p, z0p, wl0, mred, b, Hc_shape):
    kern = functools.partial(pc._first_layer_kernel, Ci=C1, K=K, stab0=1e-6)
    P0 = mred.shape[1]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K) + R.shape[2:], lambda n: (n, 0, 0, 0, 0)),
            pl.BlockSpec((1,) + a1p.shape[1:], lambda n: (n, 0, 0, 0)),
            pl.BlockSpec(z0p.shape, lambda n: (0, 0, 0)),
            pl.BlockSpec(wl0.shape, lambda n: (0, 0, 0)),
            pl.BlockSpec(mred.shape, lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, HF, WF // 4, P0),
                               lambda n: (n, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, K, HF, WF // 4, P0), jnp.float32),
        compiler_params=pc._params(),
        interpret=pc._interpret(),
    )(R, a1p, z0p, wl0, mred)


def run_variant(kern_fn, R, a1p, z0p, mtaps, b):
    kern = functools.partial(kern_fn, Ci=C1, K=K, stab0=1e-6)
    P0 = mtaps.shape[-1]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, K) + R.shape[2:], lambda n: (n, 0, 0, 0, 0)),
            pl.BlockSpec((1,) + a1p.shape[1:], lambda n: (n, 0, 0, 0)),
            pl.BlockSpec(z0p.shape, lambda n: (0, 0, 0)),
            pl.BlockSpec(mtaps.shape, lambda n: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, K, HF, WF // 4, P0),
                               lambda n: (n, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, K, HF, WF // 4, P0), jnp.float32),
        compiler_params=pc._params(),
        interpret=pc._interpret(),
    )(R, a1p, z0p, mtaps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    b = args.batch

    P = 128 // C1
    # realistic inputs: a1 has post-conv stats (mixed sign), R nonneg-ish.
    # Generated ON DEVICE (jax.random): the batch-256 operand set is ~1.6 GB
    # and host->device numpy transfers crawl through the RPC tunnel
    # (observed: >13 min, never finished).
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    a1 = jax.random.normal(k1, (b, HF, WF, C1), jnp.float32)
    a1p = jax.block_until_ready(pc.pack(a1, P))
    R = jax.block_until_ready(jnp.abs(jax.random.normal(
        k2, (b, K, HF // 2, WF // 2 // P, 128), jnp.float32)))
    print(json.dumps({"setup": "device inputs ready"}), flush=True)
    w = jax.random.normal(k3, (C1, 1, 3, 3), jnp.float32)
    wm = w * w                                           # wsquare rule
    ones = jnp.ones((HF, WF), jnp.float32)
    # z0 map for wsquare: conv of ones with wm (input-independent denominator)
    z0 = jax.lax.conv_general_dilated(
        jnp.ones((1, 1, HF, WF), jnp.float32), jnp.transpose(wm, (0, 1, 2, 3)),
        (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    z0p = pc.pack(jnp.transpose(z0, (0, 2, 3, 1))[0], P)
    wl0 = jnp.stack([jnp.stack([jnp.tile(wm[:, 0, 2 - dy, 2 - dx], P)
                                for dx in range(3)]) for dy in range(3)])
    mred = pc.blockdiag(jnp.ones((C1, 1), jnp.float32), P)
    mtaps = pack_first_mtaps(wm, P)

    # arrays MUST be jit arguments, not closure constants: closed-over device
    # arrays are embedded as literal constants and the remote-compile tunnel
    # then serializes gigabytes per compile (observed: >25 min, never done).
    # Each variant: (fn(R, *rest), rest). fn's first arg is the relevance so
    # the chained timer can thread a data dependency through it.
    runs = {
        "prod": (lambda R, a1p, z0p, wl0, mred:
                 run_prod(R, a1p, z0p, wl0, mred, b, None),
                 (a1p, z0p, wl0, mred)),
        "mmtaps": (lambda R, a1p, z0p, mtaps:
                   run_variant(_first_layer_kernel_mmtaps,
                               R, a1p, z0p, mtaps, b),
                   (a1p, z0p, mtaps)),
        "mmtaps_kvec": (lambda R, a1p, z0p, mtaps:
                        run_variant(_first_layer_kernel_mmtaps_kvec,
                                    R, a1p, z0p, mtaps, b),
                        (a1p, z0p, mtaps)),
    }

    # Timing methodology (BASELINE.md): the tunnel adds a ~29 ms RPC floor
    # per host-observed completion AND dedups/pipelines identical dispatches
    # (16 repeat calls of the same jitted fn measured 0.04 ms/iter — bogus).
    # True per-kernel time needs N DEPENDENT iterations chained inside ONE
    # jitted program; the RPC floor is measured with a null program and
    # subtracted.
    def make_chained(fn, rest, n_iters):
        def chained(R, *rest):
            out_full = fn(R, *rest)           # correctness output (1 exec)
            # seed the chain off out_full so no iteration can CSE with it
            R0 = R + out_full[0, 0, 0, 0, 0] * 1e-30
            def body(_, carry):
                Rc, acc = carry
                out = fn(Rc, *rest)
                dep = out[0, 0, 0, 0, 0] * 1e-30
                return (Rc + dep, acc + dep)
            _, acc = jax.lax.fori_loop(0, n_iters, body,
                                       (R0, jnp.float32(0.0)))
            return acc, out_full
        return jax.jit(chained)

    @jax.jit
    def null_prog(x):
        return x + 1.0

    xs = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(null_prog(xs))
    floors = []
    for _ in range(8):
        # fresh content each rep: identical dispatches are dedup-cached
        xs = jax.block_until_ready(xs + 1.0)
        t0 = time.perf_counter()
        jax.block_until_ready(null_prog(xs))
        floors.append(time.perf_counter() - t0)
    floor_ms = float(np.median(floors)) * 1e3
    print(json.dumps({"rpc_floor_ms": round(floor_ms, 2)}), flush=True)

    ref = None
    for name, (fn, rest) in runs.items():
        # an experimental kernel that fails to lower must not kill the
        # production number (nor vice versa)
        try:
            print(json.dumps({"variant": name, "status": "compiling"}),
                  flush=True)
            jf = make_chained(fn, rest, args.iters)
            _, out = jf(R, *rest)                         # compile + warm
            jax.block_until_ready(out)
            o = np.asarray(out)
            times = []
            Rv = R
            for i in range(3):
                # fresh input content+buffer each call: the tunnel dedups
                # identical dispatches (measured 0.04 ms/iter on repeats)
                Rv = jax.block_until_ready(Rv * (1.0 + 1e-6))
                t0 = time.perf_counter()
                acc, _ = jf(Rv, *rest)
                jax.block_until_ready(acc)
                times.append(time.perf_counter() - t0)
        except Exception as e:
            print(json.dumps({"variant": name, "error":
                              f"{type(e).__name__}: {str(e)[:500]}"}),
                  flush=True)
            continue
        # total per call = floor + (iters+1) kernel execs (chain + out_full)
        ms = (float(np.median(times)) * 1e3 - floor_ms) / (args.iters + 1)
        if ref is None:
            ref = o
            diff = 0.0
        else:
            diff = float(np.max(np.abs(o - ref)))
        print(json.dumps({"variant": name, "ms_per_iter": round(ms, 3),
                          "max_abs_diff_vs_prod": diff,
                          "out_absmax": float(np.max(np.abs(o)))}),
              flush=True)


if __name__ == "__main__":
    main()
