#!/bin/bash
# Flagship rerun on shipped defaults (VERDICT round-3 #2): regenerate the
# multi-concept corpus, train the 6 s BN model, run the full workflow with
# the production auto-fused row-banded chain + compiled extraction, and the
# round-4 per-instance sep/peak analysis (eval/sep_peak_analysis.json).
# Everything regenerable is under /root/data_gtzan_synth_mc (gitignored);
# committed artifacts land in runs/gtzan_synth_v3.
set -euo pipefail
cd "$(dirname "$0")/.."

D=${D:-/root/data_gtzan_synth_mc}
RD=${RD:-runs/gtzan_synth_v3}

if [ ! -f "$D/5folds/fold_5.txt" ]; then
  time python scripts/generate_gtzan_synth.py \
    --out "$D" --songs-per-genre 100 --multi-concept --seed 42
fi

if [ ! -d "$RD/model" ] || [ -z "$(ls "$RD/model" 2>/dev/null)" ]; then
  time python scripts/train.py --case gtzan_6s --data "$D" \
    --out "$RD/model" --epochs 30
fi

time python scripts/run_gtzan_synth_workflow.py \
  --data "$D" --run-dir "$RD"

echo "v3 flagship complete: $RD"
