"""End-to-end chained-slope bench point for the FLAGSHIP 6s topology
(VERDICT round-4 #5): wav -> log-mel(128x256) -> LRP -> K=4 subspace
heatmaps at layer 33 of the block_depth-2 BN model — the model/layer the
thesis-scale eval actually runs (reference getdrsadata.py:72-108).

Same methodology as bench.py's headline (BASELINE.md "methodology
correction #2"): n dependent full-explain iterations chained inside ONE
compiled program returning a scalar checksum, pulled with np.asarray;
the slope between two trip counts is pure device time. Includes the 6s
analytic HBM floor so the roofline transfers to this topology.

Writes runs/bench_6s.json. Usage:
  python scripts/bench_6s_point.py [--batch 32] [--nlo 2] [--nhi 6]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

LAYER_IDX = 33   # relu after block 5's last conv: the 8x8x128 level
D = 128
K = 4


def min_hbm_bytes_6s(batch: int, k: int) -> int:
    """Minimum HBM traffic/iter of the fused 6s explain pipeline — same
    accounting as bench.min_hbm_bytes but at the 6s geometry: every tensor
    that must cross HBM under the current program structure (frontend +
    forward/upper-backward + 5 Pallas chain kernels, first block banded),
    written once + read once, perfect fusion elsewhere.

    Levels (block_depth 2, pools (2,4)+(2,2)x4 on 128x256 input):
    block1 convs @128x256x64 -> pool 64x64; block2 @64x64x64 -> 32x32;
    block3 @32x32x100 -> 16x16; block4 @16x16x128 -> 8x8; block5 @8x8x128.
    Projection (d=128) sits at the 8x8 level (layer 33 = last relu of
    block 5, before its pool)."""
    f = 4
    wav = batch * 96000 * f
    mel = batch * 128 * 256 * f
    acts = batch * f * (
        2 * (128 * 256 * 64) + 64 * 64 * 64      # block1 conv outs + pool
        + 2 * (64 * 64 * 64) + 32 * 32 * 64      # block2
        + 2 * (32 * 32 * 100) + 16 * 16 * 100    # block3
        + 2 * (16 * 16 * 128) + 8 * 8 * 128      # block4
        + 2 * (8 * 8 * 128)                      # block5 (pool is upper-side)
    )
    # upper segment: R_filter + projection fwd/bwd at K*b on the 8x8 map
    upper = batch * f * (8 * 8 * 128) * (2 + 2 * k)
    # relevances crossing the 5 chain-kernel boundaries, K*b each
    chain_r = batch * k * f * (
        8 * 8 * 128        # filter -> block5 kernel
        + 16 * 16 * 128    # block5 -> block4
        + 32 * 32 * 100    # block4 -> block3
        + 64 * 64 * 64     # block3 -> block2
        + 128 * 256 * 64   # block2 -> first (banded) kernel
        + 128 * 256        # first kernel out, per clone
    )
    heat = batch * (k + 1) * 128 * 256 * f
    return int(wav + 2 * mel + 2 * acts + upper + 2 * chain_r
               + heat + 2 * batch * k * 128 * 256 * f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--nlo", type=int, default=2)
    ap.add_argument("--nhi", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the wiring on CPU (Pallas interpret)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # Pallas interpret mode engages automatically off-TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_6s_config, fold_batchnorm)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.ops.frontend import (
        FrontendConfig, logmel, peak_normalize)
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN_6S

    fe = FrontendConfig.for_case("gtzan_6s")
    specs = build_layer_specs(gtzan_6s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    specs, params = fold_batchnorm(specs, params)
    U = random_orthogonal(jax.random.PRNGKey(7), D)
    specs_proj = insert_projection(specs, LAYER_IDX, U, K,
                                   input_size=(128, 256))
    composite = class_composite(LRP_NAME_MAP_GTZAN_6S, K)

    def explain_core(wavs):
        mels = logmel(peak_normalize(wavs), fe)[:, None]
        heat, _ = subspace_heatmaps(specs_proj, params, mels, composite, K,
                                    class_idx=0)
        return heat

    @jax.jit
    def chained(wavs, n):
        def body(state):
            i, w, acc = state
            heat = explain_core(w)
            s = jnp.sum(heat) / heat.size
            return i + 1, w * (1.0 + 1e-12 * s), acc + s

        _, _, acc = jax.lax.while_loop(
            lambda st: st[0] < n, body,
            (jnp.int32(0), wavs, jnp.float32(0)))
        return acc

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (args.batch, fe.sample_rate * fe.slice_length)).astype(np.float32))

    print(f"compiling 6s chained explain (batch {args.batch}, layer "
          f"{LAYER_IDX}, K={K})...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    np.asarray(chained(wavs, 1))
    compile_s = time.perf_counter() - t0
    print(f"compile+warmup {compile_s:.0f}s", file=sys.stderr, flush=True)

    def timed(n):
        ts, v = [], wavs
        for _ in range(args.reps):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            np.asarray(chained(v, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = timed(args.nlo), timed(args.nhi)
    slope = (t_hi - t_lo) / (args.nhi - args.nlo)
    model_bytes = min_hbm_bytes_6s(args.batch, K)
    rec = {
        "metric": "explained_clips_per_sec_device_6s",
        "value": round(args.batch / slope, 2),
        "unit": "clips/s",
        "case": "gtzan_6s", "layer_idx": LAYER_IDX, "k": K,
        "batch": args.batch,
        "ms_per_iter": round(slope * 1e3, 2),
        "timing_method": "chained-slope",
        "chain_t_ms": {str(args.nlo): round(t_lo * 1e3, 1),
                       str(args.nhi): round(t_hi * 1e3, 1)},
        "compile_s": round(compile_s, 1),
        "hbm_model_gb": round(model_bytes / 1e9, 2),
        "hbm_floor_ms": round(model_bytes / 819e9 * 1e3, 2),
        "hbm_bw_util": round(model_bytes / slope / 819e9, 4),
    }
    out = os.path.join("/root/repo", "runs", "bench_6s.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
