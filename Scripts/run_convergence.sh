#!/usr/bin/env bash
# Convergence-threshold study (reference run_convergence.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASET="${DATASET:-SmallCora}"
for conv in 0.01 0.001 0.0001; do
  ${RUN} --dataset "${DATASET}" --mode learned --runs 3 --epochs 250 \
    --convergence "$conv" --pipeline hybrid --save_csv True \
    | tee "${LOG_DIR}/convergence_${DATASET}_${conv}.log"
done
