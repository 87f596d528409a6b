#!/bin/bash
# Extended static-temporal sweeps (mirrors the reference's
# /root/reference/benchmarking/ext-static-bench.sh): all five temporal
# datasets at the default configuration plus the WikiMath/Windmill
# feature-size x BPTT matrix. The reference interleaves PyG-T runs; ours
# anchors externally via `baselines-bench.sh` (torch side-by-side).
# Naming: stgraph_(dataset)_T(cutoff|whole)_B(bptt|whole)_H(hidden)_F(feat)
set -u
cd "$(dirname "$0")"
mkdir -p results/static-temporal
CSV=results/static-temporal/static-temporal.csv
EXTRA=${EXTRA_ARGS:-}
EPOCHS=${EPOCHS:-10}

echo "== All temporal datasets, default config =="
for ds in hungarycp pedalme monte wikimath windmill_large; do
  cutoff=""
  tag="Twhole_Bwhole"
  if [ "$ds" = "windmill_large" ]; then
    cutoff="--cutoff_time 3000 --backprop_every 1000"
    tag="T3000_B1000"
  fi
  python3 static-temporal-tgcn/train.py --dataset "$ds" \
    --num_epochs "$EPOCHS" --feat_size 8 --num_hidden 16 \
    $cutoff --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_${ds}_${tag}_H16_F8.txt" 2>&1 \
    && echo "$ds done"
done

echo "== WikiMath extended feature sweep =="
for f in $(seq 8 8 80); do
  h=$((f * 2))
  python3 static-temporal-tgcn/train.py --dataset wikimath \
    --num_epochs "$EPOCHS" --feat_size "$f" --num_hidden "$h" \
    --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_wikimaths_Twhole_Bwhole_H${h}_F${f}.txt" 2>&1 \
    && echo "wikimath F=$f done"
done

python3 results/result_generator.py "$CSV" || true
