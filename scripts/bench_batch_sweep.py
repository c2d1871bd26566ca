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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[128, 256, 512, 1024])
    ap.add_argument("--cpu-rate", type=float, default=3.0,
                    help="previously measured torch-CPU baseline clips/s")
    ap.add_argument("--deadline-s", type=int, default=2400,
                    help="per-point in-process bench deadline")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    rows = []
    for b in args.batches:
        env = dict(os.environ,
                   BENCH_TPU_BATCH=str(b),
                   BENCH_CPU_RATE=str(args.cpu_rate),
                   BENCH_DEADLINE_S=str(args.deadline_s))
        print(f"=== batch {b}: running bench.py (cold compile likely)...",
              file=sys.stderr, flush=True)
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           capture_output=True, text=True,
                           timeout=args.deadline_s + 300, env=env)
        lines = [l for l in r.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            rows.append({"tpu_batch": b, "error": "no JSON emitted",
                         "stderr_tail": r.stderr[-300:]})
            continue
        rec = json.loads(lines[-1])
        rows.append({k: rec.get(k) for k in (
            "tpu_batch", "value", "stale", "mfu", "hbm_model_gb",
            "hbm_floor_ms", "hbm_bw_util") if k in rec})
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    out = {"sweep": rows}
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
