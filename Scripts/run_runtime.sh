#!/usr/bin/env bash
# Runtime comparison across modes, eval off (reference run_runtime.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASETS_CSV="${DATASETS_CSV:-SmallCora,Cora}"
IFS=',' read -r -a DATASETS <<< "${DATASETS_CSV}"
for dataset in "${DATASETS[@]}"; do
  for mode in learned random edge full; do
    ${RUN} --dataset "$dataset" --mode "$mode" --runs 3 --epochs 50 \
      --eval False --stats True --save_csv False \
      | tee "${LOG_DIR}/runtime_${dataset}_${mode}.log"
  done
done
