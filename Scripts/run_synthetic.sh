#!/usr/bin/env bash
# Homophily x sparsity grid on synthetic rewirings (reference run_synthetic.sh).
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
DATASET="${DATASET:-SyntheticSBM}"
for h in 0.1 0.3 0.5 0.7 0.9; do
  for perc in 0.1 0.3 0.5; do
    ${RUN} --dataset "${DATASET}" --syn True --hn "$h" --degree 50 \
      --mode learned --runs 3 --epochs 100 --sample_perc "$perc" \
      --pipeline hybrid --save_csv True \
      | tee "${LOG_DIR}/synthetic_h${h}_p${perc}.log"
  done
done
