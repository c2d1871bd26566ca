"""Decompose the bench's frontend stage time (VERDICT round-3 #9).

The production stage is peak_normalize + logmel + [:, None] channel
reshape (bench.py stage_frontend); BASELINE.md's 2.55 ms standalone
number timed logmel alone (scripts/bench_frontend.py). This probe times
each composition on the real chip at the production batch so the gap
can be attributed: stage-boundary artifact vs real work, and whether
fusing peak-normalize into the DFT matmul input read would pay.

Reference front-end semantics: /root/reference/cxai/utils/dataloading.py:138-176
(peak-norm at sound.py:67-70 happens before the STFT there too).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, args, iters=20):
    import jax
    for _ in range(2):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.ops.frontend import (
        FrontendConfig, logmel, peak_normalize)

    fe = FrontendConfig.for_case("gtzan")
    batch = 256
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (batch, fe.sample_rate * fe.slice_length)).astype(np.float32))

    logmel_only = jax.jit(lambda w: logmel(w, fe))
    peak_only = jax.jit(peak_normalize)
    stage = jax.jit(lambda w: logmel(peak_normalize(w), fe)[:, None])
    # peak-norm folded into the framing read: normalize per clip by a
    # precomputed reciprocal, deferred into the logmel input — measures
    # whether XLA already fuses the divide into the DFT matmul's operand
    recip = jax.jit(lambda w: 1.0 / jnp.max(jnp.abs(w), axis=-1,
                                            keepdims=True))

    def fused(w, r):
        return logmel(w * r, fe)[:, None]

    fused_j = jax.jit(fused)

    out = {
        "batch": batch,
        "logmel_ms": round(timeit(logmel_only, (wavs,)), 3),
        "peak_normalize_ms": round(timeit(peak_only, (wavs,)), 3),
        "stage_ms": round(timeit(stage, (wavs,)), 3),
        "recip_ms": round(timeit(recip, (wavs,)), 3),
        "scale_logmel_ms": round(
            timeit(fused_j, (wavs, recip(wavs))), 3),
    }
    out["sum_parts_ms"] = round(out["logmel_ms"] + out["peak_normalize_ms"], 3)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
