#!/bin/bash
# Static & static-temporal sweeps, mirroring the reference harness
# (/root/reference/benchmarking/static-bench.sh): feature sizes 8..80 step 8
# and truncated-BPTT sequence lengths, one results row per run.
# Naming scheme: stgraph_(dataset)_T(cutoff|whole)_B(bptt|whole)_H(hidden)_F(feat)
set -u
cd "$(dirname "$0")"
mkdir -p results/static-temporal results/static
CSV=results/static-temporal/static-temporal.csv
EXTRA=${EXTRA_ARGS:-}

echo "== GCN / GAT on Cora =="
python3 gcn/train.py --num_epochs 10 $EXTRA > results/static/stgraph_gcn_cora.txt 2>&1 \
  && echo "gcn done"
python3 gat/train.py --num_epochs 10 $EXTRA > results/static/stgraph_gat_cora.txt 2>&1 \
  && echo "gat done"

echo "== TGCN WikiMath: feature-size sweep =="
for f in $(seq 8 8 80); do
  h=$((f * 2))
  python3 static-temporal-tgcn/train.py --dataset wikimath --num_epochs 10 \
    --feat_size "$f" --num_hidden "$h" --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_wikimaths_Twhole_Bwhole_H${h}_F${f}.txt" 2>&1 \
    && echo "wikimath F=$f done"
done

echo "== TGCN WikiMath: BPTT sequence-length sweep =="
for b in $(seq 100 100 700); do
  python3 static-temporal-tgcn/train.py --dataset wikimath --num_epochs 10 \
    --feat_size 8 --num_hidden 16 --backprop_every "$b" --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_wikimaths_Twhole_B${b}_H16_F8.txt" 2>&1 \
    && echo "wikimath B=$b done"
done

echo "== TGCN Windmill: feature-size sweep (cutoff 3000, BPTT 1000) =="
for f in $(seq 8 8 80); do
  h=$((f * 2))
  python3 static-temporal-tgcn/train.py --dataset windmill_large --num_epochs 10 \
    --feat_size "$f" --num_hidden "$h" --backprop_every 1000 --cutoff_time 3000 \
    --results_csv "$CSV" $EXTRA \
    > "results/static-temporal/stgraph_windmill_T3000_B1000_H${h}_F${f}.txt" 2>&1 \
    && echo "windmill F=$f done"
done

python3 results/result_generator.py results/static-temporal/static-temporal.csv || true
