#!/usr/bin/env python
"""Generate the synthetic toy dataset (reference notebook
dataprep/toydata/generate_toydata.ipynb as a deterministic CLI)."""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--per-class", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--noise", type=float, default=0.01)
    args = ap.parse_args()

    from drsa_audio_tpu.data.toydata import generate_dataset
    splits = generate_dataset(args.out, args.per_class, args.seed, args.noise)
    for k, v in splits.items():
        print(f"{k}: {len(v)} samples")


if __name__ == "__main__":
    main()
