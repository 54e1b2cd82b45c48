#!/usr/bin/env bash
# TPU ablation grid (VERDICT r3 #7): every backbone x scorer combination
# executed on TPU hardware with --stats — the only direct evidence the
# non-GCN backbones run on the real chip (CPU tests cover correctness).
# GNN in {GCN, GIN, GAT, Cheb} x scorer in {MLP, GSAGE, GCN} on the
# datasets given in DATASETS_CSV (default: SyntheticSBM and Moon).
# Re-runnable: completed configs are skipped; a wedged tunnel claim gets
# a timeout and the next config proceeds (see run_quality_tpu.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
set +e
TPU_ARGS="--dtype bfloat16 --prng_impl rbg --approx_topk true \
  --save_csv false --stats true --log true"
DATASETS_CSV="${DATASETS_CSV:-SyntheticSBM,Moon}"
RUNS="${RUNS:-2}"
EPOCHS="${EPOCHS:-100}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"

run_cfg () {
  local log="$1"; shift
  if grep -q "Loaded best Val model Test F1" "$log" 2>/dev/null; then
    echo "skip $(basename "$log") (complete)"; return
  fi
  timeout 2400 python -u -m sgs_gnn_tpu.run.cli "$@" 2>&1 | tee "$log"
  sleep 15
}

for dataset in "${DATASETS[@]}"; do
  for gnn in GCN GIN Cheb GAT; do
    for scorer in MLP GSAGE GCN; do
      run_cfg "${LOG_DIR}/ablation_${dataset}_${gnn}_${scorer}_tpu.log" \
        --dataset "$dataset" --GNN "$gnn" --edge_mlp_type "$scorer" \
        --mode learned --pipeline hybrid --runs "${RUNS}" \
        --epochs "${EPOCHS}" --sample_perc 0.2 ${TPU_ARGS}
    done
  done
done
# summary table: one [stats] line per config
grep -H "best_test_f1" "${LOG_DIR}"/ablation_*_tpu.log | tail -40
