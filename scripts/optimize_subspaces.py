#!/usr/bin/env python
"""Optimize DRSA subspaces for every class x layer.

Reference cxai/xai/drsa/cluster/optsubspaces.py:8-64 — but all restarts run
as one vmapped program per (class, layer) instead of sequential loops.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True, help="extract_drsa_data output root")
    ap.add_argument("--out", required=True)
    ap.add_argument("--num-concepts", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ortho", choices=["ns", "eigh"], default="ns")
    args = ap.parse_args()

    import time
    from collections import defaultdict

    import jax.numpy as jnp
    from drsa_audio_tpu.xai.drsa.optimizer import fit_batched
    from drsa_audio_tpu.xai.drsa.preprocessing import normalize_vectors
    from drsa_audio_tpu.utils.evaluation import save_drsa_run

    # Gather every (class, layer) pair, grouped by layer: pairs at one layer
    # share d, so the whole group runs as ONE compiled vmapped program
    # (drsa_fit_batched) instead of the reference's 30 sequential
    # optimizations (optsubspaces.py:8-64).
    groups = defaultdict(list)  # layer -> [(cls, act, ctx)]
    for cls in sorted(os.listdir(args.data)):
        cls_dir = os.path.join(args.data, cls)
        if not os.path.isdir(cls_dir):
            continue
        for fname in sorted(os.listdir(cls_dir)):
            if not fname.startswith("dataset_layer"):
                continue
            layer = fname[len("dataset_layer"):-len(".npz")]
            data = np.load(os.path.join(cls_dir, fname))
            act = np.asarray(normalize_vectors(jnp.asarray(data["activations"])))
            ctx = np.asarray(normalize_vectors(jnp.asarray(data["contexts"])))
            groups[layer].append((cls, act, ctx))

    for layer, entries in sorted(groups.items()):
        t0 = time.perf_counter()
        res = fit_batched([(a, c) for _, a, c in entries],
                          num_concepts=args.num_concepts, steps=args.steps,
                          runs=args.runs, seed=args.seed,
                          ortho_method=args.ortho)
        dt = time.perf_counter() - t0
        for i, (cls, _, _) in enumerate(entries):
            for run in range(args.runs):
                run_dir = os.path.join(args.out, cls, f"layer{layer}",
                                       f"run{run + 1}")
                save_drsa_run(run_dir, res.U[i, run], res.objectives[i, run])
            best = int(res.best_run[i])
            print(f"{cls} layer {layer}: best run {best + 1}, "
                  f"objective {float(res.objectives[i, best, -1]):.4f}")
        print(f"layer {layer}: {len(entries)} classes x {args.runs} runs x "
              f"{args.steps} steps in {dt:.1f}s (one batched program)")


if __name__ == "__main__":
    main()
