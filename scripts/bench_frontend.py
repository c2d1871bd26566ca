"""Microbench: pallas_logmel vs XLA stft_mag_matmul logmel on the real chip
(VERDICT.md round-1 item #4). Prints a small JSON report."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel
    from drsa_audio_tpu.ops.pallas_frontend import pallas_logmel

    results = {}
    rng = np.random.default_rng(0)
    for case, batch in (("gtzan", 256), ("toy", 256)):
        fe = FrontendConfig.for_case(case)
        wavs = jnp.asarray(rng.standard_normal(
            (batch, fe.sample_rate * fe.slice_length)).astype(np.float32))

        xla_fn = jax.jit(lambda w: logmel(w, fe))
        pal_fn = jax.jit(lambda w: pallas_logmel(w, fe))

        out_x = np.asarray(xla_fn(wavs))
        out_p = np.asarray(pal_fn(wavs))
        maxdiff = float(np.abs(out_x - out_p).max())

        timings = {}
        for name, fn in (("xla", xla_fn), ("pallas", pal_fn)):
            for _ in range(2):
                jax.block_until_ready(fn(wavs))
            t0 = time.perf_counter()
            iters = 20
            for _ in range(iters):
                r = fn(wavs)
            jax.block_until_ready(r)
            timings[name] = (time.perf_counter() - t0) / iters * 1e3
        results[case] = {
            "batch": batch,
            "xla_ms": round(timings["xla"], 3),
            "pallas_ms": round(timings["pallas"], 3),
            "speedup_pallas": round(timings["xla"] / timings["pallas"], 3),
            "max_abs_diff": maxdiff,
        }
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
