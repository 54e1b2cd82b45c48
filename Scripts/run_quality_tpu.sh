#!/usr/bin/env bash
# TPU quality sweep with the BENCH configuration (bf16 matmuls, rbg PRNG,
# approx top-k, tile index auto, dense-subgraph auto) — proves the
# production TPU fast paths reach the same F1 as the CPU reference runs
# (logs/quality_*.log). Mirrors Scripts/run_sgsgnn.sh's protocol
# (reference main.py:272-306): 3 runs x 250 epochs, GCN + GCN scorer,
# conditional + reg1 + reg2. Re-runnable: configs whose log already ends
# with the multi-run summary are skipped (TPU-tunnel claims can wedge; see
# PERF.md methodology notes).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
set +e   # a wedged tunnel claim must not abort the remaining configs
TPU_ARGS="--dtype bfloat16 --prng_impl rbg --approx_topk true \
  --save_csv false --stats true --log true"
DATASETS_CSV="${DATASETS_CSV:-Moon,SyntheticSBM}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"

run_cfg () {  # $1 = log path, rest = args
  local log="$1"; shift
  if grep -q "Loaded best Val model Test F1" "$log" 2>/dev/null; then
    echo "skip $(basename "$log") (complete)"; return
  fi
  timeout 3000 python -u -m sgs_gnn_tpu.run.cli "$@" 2>&1 | tee "$log"
  # brief gap so the tunnel claim is fully released before the next
  # process dials in (observed: a claim request racing the previous
  # release can be dropped, leaving the new process futex-blocked forever)
  sleep 15
}

for dataset in "${DATASETS[@]}"; do
  for pipeline in hybrid straight_through two_pass; do
    run_cfg "${LOG_DIR}/quality_${dataset}_${pipeline}_tpu.log" \
      --dataset "$dataset" --mode learned --runs 3 --epochs 250 \
      --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp False \
      --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
      --pipeline "$pipeline" ${TPU_ARGS}
  done
  for mode in random edge full; do
    run_cfg "${LOG_DIR}/quality_${dataset}_mode_${mode}_tpu.log" \
      --dataset "$dataset" --mode "$mode" --runs 3 --epochs 250 \
      --edge_mlp_type GCN --GNN GCN --sample_perc 0.2 \
      --pipeline hybrid ${TPU_ARGS}
  done
done
# partitioned large graph: tile index + dense route + partitioned driver
run_cfg "${LOG_DIR}/quality_SyntheticLarge_hybrid_tpu.log" \
  --dataset SyntheticLarge --mode learned --runs 1 --epochs 30 \
  --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp False \
  --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
  --pipeline hybrid ${TPU_ARGS}

# discriminative low-homophily protocol (VERDICT r3 #5): He~0.19 + noisy
# features -> the LEARNED sparsifier must beat random AND the full graph
# by a wide margin (the method's core claim); the reg1+conditional
# ablation shows the regularizers matter. CPU references run first so
# quality_compare has both sides.
LOW_ARGS="--dataset SyntheticSBMLow --runs 3 --epochs 100 \
  --edge_mlp_type GCN --GNN GCN --sample_perc 0.2 --pipeline hybrid"
for mode in learned random full; do
  extra=""
  if [ "$mode" = learned ]; then
    extra="--sparse_edge_mlp False --conditional True --reg1 True --reg2 True"
  fi
  run_cfg "${LOG_DIR}/quality_SyntheticSBMLow_mode_${mode}.log" \
    ${LOW_ARGS} --mode "$mode" $extra --platform cpu \
    --save_csv false --stats true --log true
  run_cfg "${LOG_DIR}/quality_SyntheticSBMLow_mode_${mode}_tpu.log" \
    ${LOW_ARGS} --mode "$mode" $extra ${TPU_ARGS}
done
run_cfg "${LOG_DIR}/quality_SyntheticSBMLow_ablate_reg_tpu.log" \
  ${LOW_ARGS} --mode learned --sparse_edge_mlp False \
  --conditional False --reg1 False --reg2 False ${TPU_ARGS}

# the sweep is only evidence when learned separates from the baselines
python "${ROOT_DIR}/tools/quality_separation.py" "${LOG_DIR}"
