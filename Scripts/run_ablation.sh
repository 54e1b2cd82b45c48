#!/usr/bin/env bash
# GNN backbone x edge-scorer grid (reference run_ablation.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASET="${DATASET:-SmallCora}"
for gnn in GCN GIN Cheb; do
  for scorer in MLP GSAGE GCN; do
    ${RUN} --dataset "${DATASET}" --GNN "$gnn" --edge_mlp_type "$scorer" \
      --mode learned --runs 3 --epochs 250 --save_csv True \
      | tee "${LOG_DIR}/ablation_${DATASET}_${gnn}_${scorer}.log"
  done
done
