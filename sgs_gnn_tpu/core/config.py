"""Experiment configuration.

Flag-for-flag port of the reference argparse surface (reference parser.py:60-109)
as a frozen dataclass so configs hash cleanly into jit static arguments.
Names and defaults are kept 1:1 for comparability of runs.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

DATASETS = [
    'Cornell', 'Texas', 'Wisconsin', 'reed98', 'amherst41', 'penn94',
    'Roman-empire', 'cornell5', 'Squirrel', 'johnshopkins55', 'Actor',
    'Minesweeper', 'Questions', 'Chameleon', 'Tolokers', 'Amazon-ratings',
    'genius', 'pokec', 'arxiv-year', 'snap-patents', 'Cora', 'DBLP',
    'Computers', 'PubMed', 'Cora_ML', 'SmallCora', 'CS', 'Photo', 'Physics',
    'CiteSeer', 'wiki', 'Reddit', 'ogbn-proteins', 'Reddit0.1', 'Reddit0.2',
    'Reddit0.3', 'Reddit0.4', 'Reddit0.5', 'Reddit0.6', 'Reddit0.7', 'Moon',
    'Karate',
    # new in this framework: synthetic fixtures usable without downloads
    'SyntheticSBM', 'SyntheticLarge',
]

GNNS = ['GCN', 'GIN', 'GAT', 'Cheb']
EDGE_MLPS = ['MLP', 'GSAGE', 'GCN']
PIPELINES = ['two_pass', 'straight_through', 'hybrid']
MODES = ['learned', 'edge', 'random', 'full']


@dataclasses.dataclass(frozen=True)
class Config:
    # model (reference parser.py:62-63, 85)
    GNN: str = 'GCN'
    edge_mlp_type: str = 'GCN'
    nhid: int = 256
    drop_rate: float = 0.3
    gat_heads: int = 1            # reference GAT wrapper leaves PyG default heads=1
    # pipelines (parser.py:65-66, 98-107)
    sparse_edge_mlp: bool = False
    conditional: bool = True
    pipeline: str = 'two_pass'
    hybrid_checkpoint: bool = False
    # TPU-first hybrid variant: score the full edge set without grad (for
    # sampling only) and re-run the score head with grad on just the q
    # sampled edges. Gradient structure is identical to the reference
    # hybrid (grads reach the scorer only through probs_full[idx],
    # training_hybrid.py:86); only the head's dropout noise decouples
    # between the sampling pass and the weight pass. Cuts the backward
    # from E to q edges. False = exact reference dataflow.
    hybrid_rescore: bool = True
    # sampling (parser.py:76-79, 84)
    sample_perc: float = 0.20
    t_init: float = 0.7
    t_min: float = 0.5
    degree_bias_coef: float = 0.3
    # regularizers (parser.py:80-83)
    regularizer1_coef: float = 1.0
    reg1: bool = True
    reg2: bool = True
    consist_reg_coef: float = 0.5
    # run control (parser.py:67-75, 86, 91)
    eval: bool = True
    runs: int = 1
    seed: int = 42
    dataset: str = 'SmallCora'
    mode: str = 'learned'
    lr: float = 0.001
    weight_decay: float = 0.0005
    epochs: int = 200
    metis_threshold: int = 500000
    num_samples_eval: int = 11
    convergence: float = 0.0001
    # data (parser.py:92-97)
    ER: bool = False
    ERcompute: bool = False
    syn: bool = False
    degree: int = 100
    train: float = 0.2
    hn: float = 0.1
    # reporting (parser.py:88-90, 105-106)
    save_csv: bool = True
    plot_curve: bool = False
    log: bool = False
    gpu_profile: bool = False
    stats: bool = False
    # TPU-specific additions (no reference analogue)
    data_dir: str = './Dataset'
    results_dir: str = './Results'
    dtype: str = 'float32'        # compute dtype for backbones
    prng_impl: str = 'threefry2x32'  # 'rbg' = fast TPU PRNG for big runs
    approx_topk: bool = False     # approx_max_k sampling (~5x faster at 1M)
    checkpoint_every: int = 0     # save full train state every N epochs
    resume: bool = False          # resume from the latest checkpoint
    debug_checks: bool = False    # validate graph batches at prep time
    data_parallel: str = 'off'    # 'on' = shard partitions over the mesh
                                  # (synchronous grad-psum superset mode)
    num_partitions: int = 0       # 0 = auto from metis_threshold (main.py:41-54)
    mesh_shape: Optional[tuple] = None  # device mesh for partition parallelism
    donate: bool = True

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)

    def validate(self):
        assert self.GNN in GNNS, self.GNN
        assert self.edge_mlp_type in EDGE_MLPS, self.edge_mlp_type
        assert self.pipeline in PIPELINES, self.pipeline
        assert self.mode in MODES, self.mode
