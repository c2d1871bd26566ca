"""Operating-point sweep for the production 3 s explain pipeline
(VERDICT round-3 #8): clips/s + HBM roofline numbers at several batch
sizes, so the production batch (bench.py's default 256) is a documented
choice rather than the reference's blind memory knob
(/root/reference/cxai/xai/drsa/preprocessing.py:126-139).

Runs bench.py in a subprocess per batch point (BENCH_TPU_BATCH marks the
run as an experiment, so the persisted production record is untouched),
reuses one measured CPU-baseline rate via BENCH_CPU_RATE, and prints a
JSON table. Each new batch size is a cold remote-compile: minutes each.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tunnel_up(timeout_s=90):
    """One subprocess device probe; False on failure or timeout."""
    probe = ("import jax, jax.numpy as jnp; "
             "print((jnp.ones((4,4)) @ jnp.ones((4,4))).sum())")
    try:
        return subprocess.run([sys.executable, "-c", probe],
                              capture_output=True,
                              timeout=timeout_s).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[128, 256, 512, 1024])
    ap.add_argument("--cpu-rate", type=float, default=3.0,
                    help="previously measured torch-CPU baseline clips/s")
    ap.add_argument("--deadline-s", type=int, default=2400,
                    help="per-point in-process bench deadline")
    ap.add_argument("--retries", type=int, default=0,
                    help="retries per point when the run falls back to the "
                         "stale record (tunnel outage mid-run)")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    rows = []
    for b in args.batches:
        env = dict(os.environ,
                   BENCH_TPU_BATCH=str(b),
                   BENCH_CPU_RATE=str(args.cpu_rate),
                   BENCH_DEADLINE_S=str(args.deadline_s),
                   BENCH_SKIP_EXTRAS="1")
        row = None
        for attempt in range(args.retries + 1):
            # don't burn a bench launch into a dead tunnel: wait for one
            # good probe first (outages observed to last tens of minutes)
            t_wait0 = time.time()
            while not tunnel_up() and time.time() - t_wait0 < 3600:
                print(f"batch {b}: tunnel down, waiting...",
                      file=sys.stderr, flush=True)
                time.sleep(30)
            print(f"=== batch {b} (attempt {attempt + 1}): running bench.py "
                  "(cold compile likely)...", file=sys.stderr, flush=True)
            r = subprocess.run([sys.executable,
                                os.path.join(ROOT, "bench.py")],
                               capture_output=True, text=True,
                               timeout=args.deadline_s + 300, env=env)
            lines = [l for l in r.stdout.strip().splitlines()
                     if l.startswith("{")]
            if not lines:
                row = {"tpu_batch": b, "error": "no JSON emitted",
                       "stderr_tail": r.stderr[-300:]}
                continue
            rec = json.loads(lines[-1])
            if rec.get("stale"):
                # fallback record from an outage — NOT a measurement of
                # this batch point; retry if budget remains
                row = {"tpu_batch": b,
                       "error": "stale fallback (tunnel outage mid-run)"}
                continue
            row = {k: rec.get(k) for k in (
                "tpu_batch", "value", "mfu", "hbm_model_gb",
                "hbm_floor_ms", "hbm_bw_util") if k in rec}
            break
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)

    out = {"sweep": rows}
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
