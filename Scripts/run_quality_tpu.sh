#!/usr/bin/env bash
# TPU quality sweep with the BENCH configuration (bf16 matmuls, rbg PRNG,
# approx top-k, tile index auto, dense-subgraph auto) — proves the
# production TPU fast paths reach the same F1 as the CPU reference runs
# (logs/quality_*.log). Mirrors Scripts/run_sgsgnn.sh's protocol
# (reference main.py:272-306): 3 runs x 250 epochs, GCN + GCN scorer,
# conditional + reg1 + reg2.
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
TPU_ARGS="--dtype bfloat16 --prng_impl rbg --approx_topk true \
  --save_csv false --stats true --log true"
DATASETS_CSV="${DATASETS_CSV:-Moon,SyntheticSBM}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"
for dataset in "${DATASETS[@]}"; do
  for pipeline in hybrid straight_through two_pass; do
    ${RUN} --dataset "$dataset" --mode learned --runs 3 --epochs 250 \
      --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp False \
      --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
      --pipeline "$pipeline" ${TPU_ARGS} \
      | tee "${LOG_DIR}/quality_${dataset}_${pipeline}_tpu.log"
  done
  for mode in random edge full; do
    ${RUN} --dataset "$dataset" --mode "$mode" --runs 3 --epochs 250 \
      --edge_mlp_type GCN --GNN GCN --sample_perc 0.2 \
      --pipeline hybrid ${TPU_ARGS} \
      | tee "${LOG_DIR}/quality_${dataset}_mode_${mode}_tpu.log"
  done
done
# partitioned large graph: tile index + dense route + partitioned driver
${RUN} --dataset SyntheticLarge --mode learned --runs 1 --epochs 30 \
  --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp False \
  --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
  --pipeline hybrid ${TPU_ARGS} \
  | tee "${LOG_DIR}/quality_SyntheticLarge_hybrid_tpu.log"
