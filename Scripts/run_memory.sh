#!/usr/bin/env bash
# Memory profile sweep, 10 epochs, threshold 1M (reference run_memory.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
PIPELINES_CSV="${PIPELINES:-hybrid,straight_through}"
DATASETS_CSV="${DATASETS_CSV:-amherst41,Amazon-ratings,Tolokers,johnshopkins55,cornell5,arxiv-year,wiki,Reddit}"
IFS=',' read -r -a PIPELINES <<< "${PIPELINES_CSV}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"
for dataset in "${DATASETS[@]}"; do
  for pipeline in "${PIPELINES[@]}"; do
    ${RUN} --dataset "$dataset" --pipeline "$pipeline" --mode learned \
      --runs 1 --epochs 10 --metis_threshold 1000000 --sample_perc 0.2 \
      --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp True \
      --conditional True --reg1 True --reg2 True --stats True \
      --hybrid_checkpoint True --gpu_profile True \
      | tee "${LOG_DIR}/memory_${dataset}_${pipeline}.log"
  done
done
