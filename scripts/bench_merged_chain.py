"""On-chip A/B of the merged-tail chain (DRSA_CHAIN_MERGED) vs the
multi-kernel production chain, chained-slope methodology (one compiled
program with a dynamic trip count per variant; slope between two trip
counts cancels all per-dispatch tunnel costs — BASELINE.md methodology
correction #2).

The flag is read at TRACE time, so both variants trace in one process by
flipping the env var between jit definitions. Also cross-checks heatmap
parity of the two variants on the same inputs.

Usage: python scripts/bench_merged_chain.py [batch] [--variants multi,merged]
Results print INCREMENTALLY per variant (a compile-service failure on the
second variant — observed: tpu_compile_helper SIGKILL'd, HTTP 500 — must
not lose the first variant's numbers).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

_ap = argparse.ArgumentParser()
_ap.add_argument("batch", type=int, nargs="?", default=256)
_ap.add_argument("--variants", default="multi,merged")
_ap.add_argument("--parity-batch", type=int, default=8,
                 help="0 disables the heatmap parity cross-check")
_args = _ap.parse_args()

N_LO = 2
N_HI = 6
REPS = 3
BATCH = _args.batch


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import (
        build_layer_specs, init_params, gtzan_3s_config)
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN

    fe = FrontendConfig.for_case("gtzan")
    specs = build_layer_specs(gtzan_3s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    U = random_orthogonal(jax.random.PRNGKey(7), 64)
    specs_proj = insert_projection(specs, 10, U, 4)
    composite = class_composite(LRP_NAME_MAP_GTZAN, 4)

    def make_chained(merged: bool):
        os.environ["DRSA_CHAIN_MERGED"] = "1" if merged else "0"

        def explain_core(wavs):
            mels = logmel(peak_normalize(wavs), fe)[:, None]
            heat, _ = subspace_heatmaps(specs_proj, params, mels, composite,
                                        4, class_idx=0)
            return heat

        @jax.jit
        def chained(wavs, n):
            def body(state):
                i, w, acc = state
                heat = explain_core(w)
                s = jnp.sum(heat) / heat.size
                return i + 1, w * (1.0 + 1e-12 * s), acc + s

            _, _, acc = jax.lax.while_loop(
                lambda st: st[0] < n, body, (0, wavs, jnp.float32(0)))
            return acc

        return jax.jit(explain_core), chained

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (BATCH, fe.sample_rate * fe.slice_length)).astype(np.float32))

    report = {"batch": BATCH, "n_lo": N_LO, "n_hi": N_HI}

    def timed(chained, n):
        ts, v = [], wavs
        for _ in range(REPS):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            np.asarray(chained(v, n))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    heats = {}
    variants = [v.strip() for v in _args.variants.split(",") if v.strip()]
    try:
        for label in variants:
            explain_j, chained = make_chained(label == "merged")
            print(f"[{label}] compiling...", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            np.asarray(chained(wavs, 1))
            report[f"{label}_compile_s"] = round(time.perf_counter() - t0, 1)
            t_lo = timed(chained, N_LO)
            t_hi = timed(chained, N_HI)
            slope = (t_hi - t_lo) / (N_HI - N_LO)
            report[f"{label}_t_ms"] = {str(N_LO): round(t_lo * 1e3, 1),
                                       str(N_HI): round(t_hi * 1e3, 1)}
            report[f"{label}_ms_per_iter"] = round(slope * 1e3, 2)
            report[f"{label}_clips_per_sec"] = round(BATCH / slope, 1)
            # incremental: a later variant's compile failure must not lose this
            print(json.dumps({k: v for k, v in report.items()
                              if k.startswith(label)}), flush=True)
            if _args.parity_batch:
                heats[label] = np.asarray(explain_j(wavs[:_args.parity_batch]))
    finally:
        os.environ.pop("DRSA_CHAIN_MERGED", None)

    if len(heats) == 2:
        a, b_ = heats["multi"].ravel(), heats["merged"].ravel()
        report["parity_corr"] = round(float(np.corrcoef(a, b_)[0, 1]), 8)
        report["parity_max_abs_diff"] = float(np.abs(a - b_).max())
    if "multi_ms_per_iter" in report and "merged_ms_per_iter" in report:
        report["speedup"] = round(report["multi_ms_per_iter"]
                                  / report["merged_ms_per_iter"], 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
