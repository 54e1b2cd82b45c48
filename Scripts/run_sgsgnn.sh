#!/usr/bin/env bash
# Main quality sweep (reference Scripts/run_sgsgnn.sh): modes x datasets,
# 3 runs x 250 epochs, GCN backbone + GCN scorer, conditional + reg1 + reg2.
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
PIPELINE="${PIPELINE:-hybrid}"
DATASETS_CSV="${DATASETS_CSV:-SmallCora,Cora,cornell5,amherst41}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"
for mode in learned random full; do
  for dataset in "${DATASETS[@]}"; do
    ${RUN} --dataset "$dataset" --mode "$mode" --runs 3 --epochs 250 \
      --save_csv True --edge_mlp_type GCN --GNN GCN --log False \
      --sparse_edge_mlp False --conditional True --reg1 True --reg2 True \
      --sample_perc 0.2 --pipeline "${PIPELINE}" ${EXTRA_ARGS} \
      | tee "${LOG_DIR}/sgsgnn_${dataset}_${mode}.log"
  done
done
