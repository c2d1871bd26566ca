"""Tunnel-independent measurement of the fused explain's per-iteration time.

Motivation: on the axon tunnel today, `jax.block_until_ready` on a fresh
16.8 MB result returns in ~24 ms while `np.asarray` of the same fresh
result takes ~394 ms (scripts/_probe_sync_semantics.py) — i.e. block may
acknowledge dispatch rather than sync compute, which would make any
block-based loop (bench.py's main loop included) suspect.

This probe cannot be fooled by ack semantics, dispatch dedup, or D2H cost:

  - N DEPENDENT iterations of the full production explain chained inside
    ONE jitted program (lax.while_loop with a *dynamic* trip count, so one
    compile serves every N); each iteration folds a scalar of its output
    into the next input, forcing sequential on-device execution;
  - the program returns only a float32 scalar checksum, so device->host
    transfer is negligible;
  - the result is pulled with np.asarray (a D2H copy cannot complete
    before the compute that produces it);
  - per-iteration time = slope between two trip counts, which cancels any
    fixed per-dispatch overhead (RPC floor, upload, ack latency).

Prints one JSON report comparing the slope against bench.py's
block-until-ready loop methodology at the same operating point
(GTZAN-3s, batch 256, K=4, layer 10).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_LO = 2
N_HI = 6
REPS = 3
BATCH = 256


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, gtzan_3s_config
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

    def explain_core(wavs):
        mels = logmel(peak_normalize(wavs), fe)[:, None]
        heat, _ = subspace_heatmaps(specs_proj, params, mels, composite, 4,
                                    class_idx=0)
        return heat

    @jax.jit
    def chained(wavs, n):
        def cond(state):
            i, _, _ = state
            return i < n

        def body(state):
            i, w, acc = state
            heat = explain_core(w)
            s = jnp.sum(heat) / heat.size
            # sequential dependency: next input derives from this output
            return i + 1, w * (1.0 + 1e-12 * s), acc + s

        _, _, acc = jax.lax.while_loop(cond, body, (0, wavs, jnp.float32(0)))
        return acc

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (BATCH, fe.sample_rate * fe.slice_length)).astype(np.float32))

    report = {"batch": BATCH, "n_lo": N_LO, "n_hi": N_HI}

    print("compiling chained explain (dynamic trip count)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    np.asarray(chained(wavs, 1))
    report["compile_s"] = round(time.perf_counter() - t0, 1)
    print(f"compiled in {report['compile_s']}s", file=sys.stderr, flush=True)

    def timed(n):
        ts = []
        v = wavs
        for _ in range(REPS):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            np.asarray(chained(v, n))
            ts.append(time.perf_counter() - t0)
        return [round(t * 1e3, 1) for t in ts]

    ts_lo = timed(N_LO)
    ts_hi = timed(N_HI)
    report["t_lo_ms"] = ts_lo
    report["t_hi_ms"] = ts_hi
    slope = (float(np.median(ts_hi)) - float(np.median(ts_lo))) / (N_HI - N_LO)
    report["true_ms_per_iter"] = round(slope, 2)
    report["true_clips_per_sec"] = round(BATCH / (slope / 1e3), 1)

    # bench.py's methodology at the same point, for the comparison:
    # same-buffer async loop, block_until_ready on the last output
    explain_j = jax.jit(explain_core)
    print("compiling plain explain...", file=sys.stderr, flush=True)
    np.asarray(explain_j(wavs))
    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        out = explain_j(wavs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    report["bench_style_ms_per_iter"] = round(dt / iters * 1e3, 2)
    # ...and with a forced D2H sync after the loop: does more compute drain?
    t0 = time.perf_counter()
    np.asarray(out)
    report["post_loop_asarray_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
