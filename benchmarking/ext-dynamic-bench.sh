#!/bin/bash
# Extended dynamic-temporal sweeps (mirrors the reference's
# /root/reference/benchmarking/ext-dynamic-bench.sh): store type x slide
# size x feature size over SNAP-format DTDG streams. The reference uses
# downloaded SNAP datasets (math, wikitalk, ...); this environment has no
# egress, so streams are produced by the SNAP preprocessing pipeline in
# --synthetic mode (same file schema the real datasets produce; pass
# SNAP_DIR pointing at real preprocessed JSONs to sweep those instead).
# Naming: stgraph_(type)_(dataset)_T(cutoff|whole)_S(slide)_H(hidden)_F(feat)
set -u
cd "$(dirname "$0")"
mkdir -p results/dynamic-temporal /tmp/stgraph_dtdg
EXTRA=${EXTRA_ARGS:-}
EPOCHS=${EPOCHS:-5}
SNAP_DIR=${SNAP_DIR:-/tmp/stgraph_dtdg}

echo "== Slide-size sweep (SNAP-format streams) =="
for slide in 2 4 6 8 10; do
  f="$SNAP_DIR/stream_S${slide}.json"
  if [ ! -f "$f" ]; then
    python3 dataset/preprocessing.py --synthetic 4000 --synthetic-nodes 500 \
      --base 400 --percent-change "$slide" --out "$f"
  fi
  for type in naive delta delta-scan pma-scan lazy-scan; do
    python3 dynamic-temporal-tgcn/train.py --dataset "$f" --type "$type" \
      --num_epochs "$EPOCHS" --feat_size 8 --num_hidden 16 $EXTRA \
      > "results/dynamic-temporal/stgraph_${type}_synthsnap_Twhole_S${slide}_H16_F8.txt" 2>&1 \
      && echo "$type S=$slide done"
  done
done

echo "== Feature-size sweep (slide 5) =="
f="$SNAP_DIR/stream_S5.json"
if [ ! -f "$f" ]; then
  python3 dataset/preprocessing.py --synthetic 4000 --synthetic-nodes 500 \
    --base 400 --percent-change 5 --out "$f"
fi
for feat in $(seq 8 8 32); do
  h=$((feat * 2))
  for type in delta-scan pma-scan lazy-scan; do
    python3 dynamic-temporal-tgcn/train.py --dataset "$f" --type "$type" \
      --num_epochs "$EPOCHS" --feat_size "$feat" --num_hidden "$h" $EXTRA \
      > "results/dynamic-temporal/stgraph_${type}_synthsnap_Twhole_S5_H${h}_F${feat}.txt" 2>&1 \
      && echo "$type F=$feat done"
  done
done
