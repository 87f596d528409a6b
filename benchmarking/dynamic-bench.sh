#!/bin/bash
# Dynamic-temporal sweeps, mirroring /root/reference/benchmarking/dynamic-bench.sh:
# graph-store type (naive vs delta — our PCSR/GPMA analogue) x feature sizes.
set -u
cd "$(dirname "$0")"
mkdir -p results/dynamic-temporal
EXTRA=${EXTRA_ARGS:-}

for type in naive delta; do
  for f in 8 16 32; do
    h=$((f * 2))
    python3 dynamic-temporal-tgcn/train.py --dataset england_covid --type "$type" \
      --num_epochs 5 --feat_size "$f" --num_hidden "$h" $EXTRA \
      > "results/dynamic-temporal/stgraph_${type}_england_Twhole_B20_H${h}_F${f}.txt" 2>&1 \
      && echo "dynamic $type F=$f done"
  done
done
