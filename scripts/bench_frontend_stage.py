"""VERDICT round-3 item #9: where do the staged-frontend milliseconds go?

bench.py's per-stage split reports the frontend (peak-norm + logmel) at
4.1-4.9 ms/iter, while the standalone XLA logmel measured 2.55 ms
(BASELINE.md round-2 table). Both of those numbers came from naive
repeat-call loops, which on the axon tunnel carry a per-dispatch overhead
(~3 ms) and are exposed to dispatch dedup (BASELINE.md
"measurement-methodology correction"). This script measures the frontend
with the round-3 methodology instead:

  - N dependent iterations chained inside ONE jitted program (fori_loop,
    each iteration's input perturbed by a scalar of the previous output so
    nothing can be CSE'd or dedup-cached), minus a null chain that prices
    the perturbation itself;
  - single-dispatch staged timing with fresh input content + measured RPC
    floor subtraction (scripts/_tunnel_timing.py) to reproduce what
    bench.py's stage loop sees;
  - the fused-marginal cost: fused explain from wavs vs the same program
    from precomputed mels — the frontend's true cost inside the production
    program, where XLA may overlap it with the rest.

Prints one JSON report. Reference workload: cxai/utils/dataloading.py:138-176
(the Loader front-end) at the bench operating point (GTZAN-3s, batch 256).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from scripts._tunnel_timing import measure_rpc_floor, time_with_fresh_input  # noqa: E402

ITERS_CHAIN = 16
ITERS_STAGED = 8
BATCH = 256


def chained_ms(jax, jnp, fn, x, floor_ms, null_ms=0.0):
    """ms/iter for fn chained ITERS_CHAIN times inside one jitted program.

    The program returns only a float32 checksum, pulled with np.asarray —
    a D2H copy of 4 bytes cannot complete before the compute that produces
    it and costs ~nothing, so the timing is valid regardless of whether
    block_until_ready syncs or merely acks on the tunnel (ADVICE r4; the
    round-5 v3 probe SETTLED it — block is a true sync, BASELINE.md "sync
    semantics resolved" — so the block-synced legs below are valid too)."""

    @jax.jit
    def prog(w):
        def body(_, carry):
            out = fn(carry)
            # data dependency: fold a scalar of the output back into the
            # input so iteration i+1 cannot start before i finishes and no
            # two iterations are identical dispatches
            return carry * (1.0 + 1e-12 * jnp.mean(out))

        v = jax.lax.fori_loop(0, ITERS_CHAIN, body, w)
        return jnp.float32(jnp.sum(v) / v.size)

    np.asarray(prog(x))  # compile + warm + drain
    times = []
    v = x
    for _ in range(5):
        v = jax.block_until_ready(v * (1.0 + 1e-6))
        t0 = time.perf_counter()
        np.asarray(prog(v))
        times.append(time.perf_counter() - t0)
    total = float(np.median(times)) * 1e3 - floor_ms
    return total / ITERS_CHAIN - null_ms


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize
    from drsa_audio_tpu.models.vgg import build_layer_specs, init_params, gtzan_3s_config
    from drsa_audio_tpu.models.projection import insert_projection
    from drsa_audio_tpu.xai.explain import class_composite, subspace_heatmaps
    from drsa_audio_tpu.xai.drsa.optimizer import random_orthogonal
    from drsa_audio_tpu.utils.constants import LRP_NAME_MAP_GTZAN

    fe = FrontendConfig.for_case("gtzan")
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (BATCH, fe.sample_rate * fe.slice_length)).astype(np.float32))

    report = {"batch": BATCH}
    floor = measure_rpc_floor(jax, jnp)
    report["rpc_floor_ms"] = round(floor, 2)

    # --- chained: price the perturbation itself first
    null_ms = chained_ms(jax, jnp, lambda w: w, wavs, floor)
    report["chain_null_ms"] = round(null_ms, 3)

    def fe_full(w):
        return logmel(peak_normalize(w), fe)[:, None]

    report["chained_frontend_ms"] = round(
        chained_ms(jax, jnp, fe_full, wavs, floor, null_ms), 3)
    report["chained_logmel_ms"] = round(
        chained_ms(jax, jnp, lambda w: logmel(w, fe), wavs, floor, null_ms), 3)
    report["chained_peaknorm_ms"] = round(
        chained_ms(jax, jnp, peak_normalize, wavs, floor, null_ms), 3)

    # --- single-dispatch staged timing (what bench.py's stage loop pays)
    staged_fn = jax.jit(fe_full)
    ms, _ = time_with_fresh_input(jax, staged_fn, wavs, ITERS_STAGED, floor)
    report["staged_frontend_ms_fresh_minus_floor"] = round(ms, 3)

    # --- fused-marginal: production explain from wavs vs from mels
    specs = build_layer_specs(gtzan_3s_config())
    params = init_params(specs, jax.random.PRNGKey(0))
    K, layer_idx, d = 4, 10, 64
    U = random_orthogonal(jax.random.PRNGKey(7), d)
    specs_proj = insert_projection(specs, layer_idx, U, K)
    composite = class_composite(LRP_NAME_MAP_GTZAN, K)

    @jax.jit
    def explain_wav(w):
        mels = logmel(peak_normalize(w), fe)[:, None]
        heat, _ = subspace_heatmaps(specs_proj, params, mels, composite, K,
                                    class_idx=0)
        return heat

    @jax.jit
    def explain_mel(mels):
        heat, _ = subspace_heatmaps(specs_proj, params, mels, composite, K,
                                    class_idx=0)
        return heat

    mels0 = jax.block_until_ready(jax.jit(fe_full)(wavs))
    for name, fn, arg in (("fused_from_wav_ms", explain_wav, wavs),
                          ("fused_from_mel_ms", explain_mel, mels0)):
        print(f"compiling {name} ...", file=sys.stderr, flush=True)
        ms, _ = time_with_fresh_input(jax, fn, arg, ITERS_STAGED, floor)
        report[name] = round(ms, 3)
    report["fused_marginal_frontend_ms"] = round(
        report["fused_from_wav_ms"] - report["fused_from_mel_ms"], 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
