"""SGS-GNN-TPU: a TPU-native framework for supervised graph sparsification.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the SGS-GNN
reference (anonymousauthors001/SGS-GNN): a small edge-scoring network learns a
sampling distribution over edges, a sparse q-edge subgraph is sampled each
step (Gumbel-top-k), and a GNN backbone is trained on that subgraph.

Layout (see SURVEY.md section 7):
  core/      graph containers (static-shape COO), config dataclasses, prng
  ops/       sparse compute: SpMM / gather-scatter segment ops, SDDMM,
             GCN normalization, Gumbel-top-k sampling kernels (XLA + Pallas)
  models/    edge scorers (MLP/GSAGE/GCN) and backbones (GCN/GIN/GAT/Cheb)
  sparsify/  probability normalization, degree-prior mixing, straight-through
             sampling, temperature schedule
  train/     two_pass / straight_through / hybrid pipelines as jitted steps,
             conditional gate, reg1/reg2 losses, dual-Adam optimizer scheme
  data/      dataset registry, priors (degree / effective resistance),
             synthetic generators, masks, partitioner
  parallel/  device mesh setup, partition-parallel training (shard_map),
             gradient psum, halo exchange
  eval/      ensemble evaluator, on-device micro-F1
  run/       CLI (flag-compatible with the reference parser), stats, ckpt
"""

__version__ = "0.1.0"
