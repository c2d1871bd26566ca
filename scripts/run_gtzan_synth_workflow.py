#!/usr/bin/env python
"""Post-training GTZAN-scale rehearsal: extract -> optimize -> eval ->
prototypes+sonify, writing runs/gtzan_synth/ artifacts (VERDICT round-1 #3).

Assumes the 6 s BN model is already trained (scripts/train.py --case
gtzan_6s). Mirrors the reference cluster scripts' flagship workload:
DRSA at layers {19,26,33}, num_locations=20 (getdrsadata.py:63-141),
K=4 at 5000 steps x 3 runs (optsubspaces.py:8-64), concept + interclass
flipping on a balanced eval batch (cpf.py:398-476).
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import subprocess
import sys
import time

SCRIPTS = _os.path.dirname(_os.path.abspath(__file__))


def run(desc, cmd):
    t0 = time.perf_counter()
    print(f"=== {desc}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run([sys.executable] + cmd)
    if proc.returncode != 0:
        raise SystemExit(f"stage failed: {desc}")
    print(f"=== {desc} done in {time.perf_counter() - t0:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help="synthetic corpus root")
    ap.add_argument("--run-dir", default="runs/gtzan_synth")
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--num-concepts", type=int, default=4)
    ap.add_argument("--layers", type=int, nargs="+", default=[19, 26, 33])
    ap.add_argument("--samples-per-class", type=int, default=20)
    ap.add_argument("--num-clips", type=int, default=300,
                    help="DRSA clips per class (reference: 30 songs x 10 "
                         "chunks -> 6000 vectors at 20 locations)")
    ap.add_argument("--skip", nargs="+", default=[],
                    choices=["extract", "optimize", "eval", "prototypes"])
    args = ap.parse_args()

    rd = args.run_dir
    model = os.path.join(rd, "model")
    drsa_data = os.path.join(rd, "drsa_data")
    subspaces = os.path.join(rd, "subspaces", f"{args.num_concepts}_concepts")
    eval_dir = os.path.join(rd, "eval")
    layer_args = [str(li) for li in args.layers]

    if "extract" not in args.skip:
        run("DRSA extraction (layers {19,26,33}, 20 locations)", [
            os.path.join(SCRIPTS, "extract_drsa_data.py"),
            "--case", "gtzan_6s", "--data", args.data,
            "--checkpoint", model, "--out", drsa_data,
            "--layers", *layer_args,
            "--num-clips", str(args.num_clips),
        ])

    if "optimize" not in args.skip:
        run(f"DRSA optimization (K={args.num_concepts}, "
            f"{args.steps}x{args.runs}, batched sweep)", [
            os.path.join(SCRIPTS, "optimize_subspaces.py"),
            "--data", drsa_data, "--out", subspaces,
            "--num-concepts", str(args.num_concepts),
            "--steps", str(args.steps), "--runs", str(args.runs),
        ])

    if "eval" not in args.skip:
        run("concept + interclass flipping eval", [
            os.path.join(SCRIPTS, "run_concept_eval.py"),
            "--case", "gtzan_6s", "--data", args.data,
            "--checkpoint", model,
            "--subspaces", os.path.join(rd, "subspaces"),
            "--out", eval_dir,
            "--num-concepts", str(args.num_concepts),
            "--layers", *layer_args,
            "--interclass-layer", layer_args[-1],
        ])

    if "prototypes" not in args.skip:
        run("prototypes + sonification (pop, deepest layer)", [
            os.path.join(SCRIPTS, "sonify_prototypes.py"),
            "--case", "gtzan_6s", "--data", args.data,
            "--checkpoint", model, "--subspaces", subspaces,
            "--out", os.path.join(rd, "sonified"),
            "--sample-class", "pop", "--layer", str(args.layers[-1]),
            "--num-concepts", str(args.num_concepts),
        ])

    print("workflow complete:", rd, flush=True)


if __name__ == "__main__":
    main()
