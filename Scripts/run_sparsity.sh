#!/usr/bin/env bash
# Sparsity sweep 0.1 -> 0.99 (reference run_sparsity.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASET="${DATASET:-SmallCora}"
PIPELINE="${PIPELINE:-hybrid}"
for perc in 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 0.99; do
  ${RUN} --dataset "${DATASET}" --mode learned --runs 3 --epochs 250 \
    --sample_perc "$perc" --pipeline "${PIPELINE}" --save_csv True \
    | tee "${LOG_DIR}/sparsity_${DATASET}_${perc}.log"
done
