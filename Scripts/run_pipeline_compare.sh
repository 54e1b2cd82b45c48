#!/usr/bin/env bash
# 3 pipelines x dataset suite, 3 epochs, stats+profile
# (reference Scripts/run_pipeline_compare.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
PIPELINES_CSV="${PIPELINES:-two_pass,straight_through,hybrid}"
DATASETS_CSV="${DATASETS_CSV:-amherst41,Amazon-ratings,Tolokers,johnshopkins55,cornell5,arxiv-year,wiki,Reddit}"
EXTRA_ARGS="${EXTRA_ARGS:-}"
IFS=',' read -r -a PIPELINES <<< "${PIPELINES_CSV}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"
for dataset in "${DATASETS[@]}"; do
  for pipeline in "${PIPELINES[@]}"; do
    ${RUN} --dataset "$dataset" --pipeline "$pipeline" --mode learned \
      --runs 1 --epochs 3 --save_csv True --edge_mlp_type GCN --GNN GCN \
      --sparse_edge_mlp True --conditional True --reg1 True --reg2 True \
      --stats True --hybrid_checkpoint True --gpu_profile True ${EXTRA_ARGS} \
      | tee "${LOG_DIR}/pipeline_${dataset}_${pipeline}.log"
  done
done
