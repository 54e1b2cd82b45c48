#!/usr/bin/env bash
# GAT backbone scorer ablation (reference run_ablationGAT.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASET="${DATASET:-SmallCora}"
for scorer in MLP GSAGE GCN; do
  ${RUN} --dataset "${DATASET}" --GNN GAT --edge_mlp_type "$scorer" \
    --mode learned --runs 3 --epochs 250 --save_csv True \
    | tee "${LOG_DIR}/ablationGAT_${DATASET}_${scorer}.log"
done
