#!/usr/bin/env bash
# Learned-vs-baseline sampling modes at flagship scale (VERDICT r4 #2):
# the reference claims the learned sparsifier beats random/prior sampling
# at 10-20% sparsity (reference README.md:3-5); r4 only demonstrated the
# separation on a 2k-node fixture. This sweep runs mode=random/edge/full
# on the 116.5M-edge SyntheticReddit (homophilous — baselines are expected
# to be competitive there, like on the real Reddit) AND all four modes on
# SyntheticRedditLow (same scale, heterophilous edges + noisy features:
# the regime the sparsifier exists for). Baseline modes ride the same
# whole-epoch scan as learned mode since r5, so epoch times are
# dispatch-comparable.
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
EPOCHS="${EPOCHS:-5}"
COMMON_ARGS="--runs 1 --epochs ${EPOCHS} \
  --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp True \
  --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
  --pipeline hybrid --metis_threshold 1000000 \
  --dtype bfloat16 --prng_impl rbg --approx_topk true \
  --num_samples_eval 1 --convergence 0.0 \
  --save_csv false --stats true --log true"

for MODE in ${MODES:-random edge full}; do
  timeout "${TIMEOUT:-5400}" python -u -m sgs_gnn_tpu.run.cli \
    --dataset SyntheticReddit --mode "${MODE}" ${COMMON_ARGS} \
    2>&1 | tee "${LOG_DIR}/reddit_scale_mode_${MODE}_tpu.log"
done

for MODE in ${LOW_MODES:-learned random full}; do
  timeout "${TIMEOUT:-5400}" python -u -m sgs_gnn_tpu.run.cli \
    --dataset SyntheticRedditLow --mode "${MODE}" ${COMMON_ARGS} \
    2>&1 | tee "${LOG_DIR}/redditlow_scale_mode_${MODE}_tpu.log"
done
