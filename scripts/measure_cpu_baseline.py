"""Pin the CPU denominator (VERDICT round-4 #8).

Measures bench.py's torch-CPU reference pipeline several times at larger
iteration counts than the bench's quick inline measurement, and prints
mean +- spread. The resulting mean goes into bench.CPU_RATE_PINNED so
vs_baseline is stable across runs (the inline ~8-clip measurement carries
run-to-run variance that was never stated the way the TPU side's is —
VERDICT r4 weak #7).

Forces the CPU platform (the torch pipeline needs jax only for the
deterministic U / params, which are backend-independent threefry).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

RUNS = 5
ITERS = 4


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import bench
    bench.CPU_RATE_PINNED = None          # force the real measurement
    bench.CPU_ITERS = ITERS
    cfg, specs, params = bench.build_model()
    rates = []
    for i in range(RUNS):
        t0 = time.perf_counter()
        r = bench.cpu_reference_clips_per_sec(specs, params)
        rates.append(r)
        print(f"run {i}: {r:.3f} clips/s ({time.perf_counter()-t0:.0f}s)",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "runs": [round(r, 3) for r in rates],
        "mean": round(float(np.mean(rates)), 3),
        "std": round(float(np.std(rates)), 3),
        "spread": round(float(np.max(rates) - np.min(rates)), 3),
        "cpu_batch": bench.CPU_BATCH, "cpu_iters": ITERS,
    }, indent=1))


if __name__ == "__main__":
    main()
