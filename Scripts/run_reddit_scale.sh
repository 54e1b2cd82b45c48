#!/usr/bin/env bash
# Reference-scale TPU epoch (VERDICT r3 #2): a Reddit-shaped synthetic
# graph (~233k nodes / ~114.6M directed edges / 602 feats / 41 classes,
# community-structured so the partitioner retains most edges) driven
# through the FULL run_experiment — partition decision at
# metis_threshold=1M (~115 parts), hybrid pipeline, bf16, stats — the
# driver-level equivalent of reference logs/memory_Reddit_hybrid.log.
# Expect the first epoch to be compile-dominated; [stats] reports the
# steady-state edges/s over all epochs.
source "$(dirname "${BASH_SOURCE[0]}")/common.sh"
EPOCHS="${EPOCHS:-4}"
timeout "${TIMEOUT:-5400}" python -u -m sgs_gnn_tpu.run.cli \
  --dataset SyntheticReddit --mode learned --runs 1 --epochs "${EPOCHS}" \
  --edge_mlp_type GCN --GNN GCN --sparse_edge_mlp True \
  --conditional True --reg1 True --reg2 True --sample_perc 0.2 \
  --pipeline hybrid --metis_threshold 1000000 \
  --dtype bfloat16 --prng_impl rbg --approx_topk true \
  --num_samples_eval 1 --convergence 0.0 \
  --save_csv false --stats true --log true \
  2>&1 | tee "${LOG_DIR}/reddit_scale_tpu.log"
