"""Is block_until_ready a true sync on the axon tunnel right now?

Times the batch-256 logmel frontend with two sync strategies on fresh
input content each call:
  (a) jax.block_until_ready(out)
  (b) np.asarray(out)  -- a D2H copy cannot complete before the compute
If (a) << (b) - transfer_time, block_until_ready is an ack, not a sync,
and every timing in this repo that relies on it needs re-reading.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from drsa_audio_tpu.ops.frontend import FrontendConfig, logmel, peak_normalize

    fe = FrontendConfig.for_case("gtzan")
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal(
        (256, fe.sample_rate * fe.slice_length)).astype(np.float32))

    fe_full = jax.jit(lambda w: logmel(peak_normalize(w), fe)[:, None])
    out = jax.block_until_ready(fe_full(wavs))  # compile
    out_np = np.asarray(out)
    print(f"out shape {out_np.shape}, {out_np.nbytes/1e6:.1f} MB", file=sys.stderr)

    report = {}
    # pure D2H cost of the output buffer (already computed)
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(out)
        ts.append(time.perf_counter() - t0)
    report["d2h_only_ms"] = round(float(np.median(ts)) * 1e3, 3)

    v = wavs
    for name, sync in (("block_until_ready", jax.block_until_ready),
                       ("np_asarray", np.asarray)):
        ts = []
        for _ in range(8):
            v = jax.block_until_ready(v * (1.0 + 1e-6))
            t0 = time.perf_counter()
            sync(fe_full(v))
            ts.append(time.perf_counter() - t0)
        report[f"logmel_{name}_ms"] = round(float(np.median(ts)) * 1e3, 3)

    # same-buffer repeat loop (what bench.py's stage loop does)
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(fe_full(wavs))
        ts.append(time.perf_counter() - t0)
    report["logmel_samebuf_bur_ms"] = round(float(np.median(ts)) * 1e3, 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
