#!/bin/bash
# 100-epoch convergence runs on every static-temporal dataset (mirrors
# /root/reference/benchmarking/ext-static-bench-100.sh): fixed F=8/H=16,
# long epoch budget — the quality-convergence leg of the sweep matrix.
set -u
cd "$(dirname "$0")"
mkdir -p results/static-temporal
CSV=results/static-temporal/static-temporal.csv
EXTRA=${EXTRA_ARGS:-}

for ds in hungarycp pedalme monte wikimath windmill_large; do
  cutoff=""
  tag="Twhole_Bwhole"
  if [ "$ds" = "windmill_large" ]; then
    cutoff="--cutoff_time 3000 --backprop_every 1000"
    tag="T3000_B1000"
  fi
  python3 static-temporal-tgcn/train.py --dataset "$ds" \
    --num_epochs 100 --feat_size 8 --num_hidden 16 \
    $cutoff --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_${ds}_${tag}_H16_F8_E100.txt" 2>&1 \
    && echo "$ds E100 done"
done
