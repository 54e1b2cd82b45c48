"""GNN backbones, each owning an edge-probability scorer.

Mirrors the reference model classes (reference model.py:147-230): every
backbone holds `.edge_prob_mlp` and exposes
    forward(x, senders, receivers, edge_weight) -> logits
plus `score_edges(...)` delegating to the scorer. Submodule names replicate
the reference's (`gcn1`/`gcn2`/`GIN`/`GAT`/`edge_prob_mlp`) because the
dual-optimizer scheme partitions parameters by name substring
(reference main.py:98-123) — see train/optim.py.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .layers import GCNConv, GATConv, GINConv, ChebConv
from .scorers import get_edge_mlp


class _Backbone(nn.Module):
    """Shared scaffolding: scorer construction + score_edges method."""
    in_channels: int
    hidden_dim: int
    num_classes: int
    dropout_prob: float = 0.3
    edge_mlp_type: str = "MLP"
    heads: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        self.edge_prob_mlp = get_edge_mlp(self.hidden_dim, self.dropout_prob,
                                          self.edge_mlp_type, self.dtype)
        self._setup_backbone()

    def _setup_backbone(self):
        raise NotImplementedError

    def score_edges(self, x, prop_senders, prop_receivers, score_senders,
                    score_receivers, deterministic: bool = True,
                    use_remat: bool = False, score_receiver_band: int = 0,
                    score_sorted_side: str = ""):
        return self.edge_prob_mlp(x, prop_senders, prop_receivers,
                                  score_senders, score_receivers,
                                  deterministic, use_remat,
                                  score_receiver_band, score_sorted_side)

    def encode_scorer(self, x, prop_senders, prop_receivers,
                      deterministic: bool = True, exchange=None,
                      edge_mask=None):
        """Scorer encoder only -> node embeddings (hybrid fast path)."""
        return self.edge_prob_mlp.encode(x, prop_senders, prop_receivers,
                                         deterministic, exchange, edge_mask)

    def score_from_embeddings(self, h, senders, receivers,
                              deterministic: bool = True,
                              use_remat: bool = False,
                              receiver_band: int = 0, exchange=None,
                              sorted_side: str = ""):
        """Score head only, over precomputed scorer embeddings."""
        return self.edge_prob_mlp.score_from(h, senders, receivers,
                                             deterministic, use_remat,
                                             receiver_band, exchange,
                                             sorted_side)

    def score_tiles_from_embeddings(self, h, tile_ls, tile_lr, tile_su,
                                    tile_rv, t: int, bk: int,
                                    deterministic: bool = True, seed=0):
        """Fused tile-pair full-edge-set scoring (ops/score_tiles.py)."""
        return self.edge_prob_mlp.score_tiles(h, tile_ls, tile_lr, tile_su,
                                              tile_rv, t, bk, deterministic,
                                              seed)


class GNNModel(_Backbone):
    """2-layer GCN backbone (reference model.py:147-164). Accepts per-edge
    weights (the sampled probabilities) which enter the sym normalization."""

    def _setup_backbone(self):
        self.gcn1 = GCNConv(self.hidden_dim, dtype=self.dtype)
        self.gcn2 = GCNConv(self.num_classes, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, x, senders, receivers, edge_weight=None,
                 deterministic: bool = True, exchange=None, edge_mask=None):
        h = nn.relu(self.gcn1(x, senders, receivers, edge_weight,
                              exchange, edge_mask))
        h = self.drop(h, deterministic=deterministic)
        return self.gcn2(h, senders, receivers, edge_weight,
                         exchange, edge_mask)


class GINModel(_Backbone):
    """2-layer GIN (reference model.py:167-186). PyG's GIN ignores
    edge_weight (BasicGNN supports_edge_weight=False); kept for parity."""

    def _setup_backbone(self):
        self.GIN_conv1 = GINConv(self.hidden_dim, self.hidden_dim,
                                 dtype=self.dtype)
        self.GIN_conv2 = GINConv(self.hidden_dim, self.num_classes,
                                 dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, x, senders, receivers, edge_weight=None,
                 deterministic: bool = True, exchange=None, edge_mask=None):
        h = nn.relu(self.GIN_conv1(x, senders, receivers,
                                   exchange=exchange, edge_mask=edge_mask))
        h = self.drop(h, deterministic=deterministic)
        return self.GIN_conv2(h, senders, receivers,
                              exchange=exchange, edge_mask=edge_mask)


class GATModel(_Backbone):
    """2-layer GAT (reference model.py:189-208); heads default 1 matching the
    PyG BasicGNN default the reference ends up with. edge_weight ignored
    (PyG GAT supports_edge_weight=False)."""

    def _setup_backbone(self):
        self.GAT_conv1 = GATConv(self.hidden_dim, heads=self.heads,
                                 concat=True, dtype=self.dtype)
        self.GAT_conv2 = GATConv(self.num_classes, heads=1, concat=False,
                                 dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, x, senders, receivers, edge_weight=None,
                 deterministic: bool = True, exchange=None, edge_mask=None):
        h = nn.relu(self.GAT_conv1(x, senders, receivers,
                                   exchange=exchange, edge_mask=edge_mask))
        h = self.drop(h, deterministic=deterministic)
        return self.GAT_conv2(h, senders, receivers,
                              exchange=exchange, edge_mask=edge_mask)


class ChebModel(_Backbone):
    """2-layer ChebConv K=1 sym (reference model.py:211-230)."""

    def _setup_backbone(self):
        self.gcn1 = ChebConv(self.hidden_dim, K=1, dtype=self.dtype)
        self.gcn2 = ChebConv(self.num_classes, K=1, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, x, senders, receivers, edge_weight=None,
                 deterministic: bool = True, exchange=None, edge_mask=None):
        h = nn.relu(self.gcn1(x, senders, receivers, edge_weight,
                              exchange, edge_mask))
        h = self.drop(h, deterministic=deterministic)
        return self.gcn2(h, senders, receivers, edge_weight,
                         exchange, edge_mask)


def init_params(model: "_Backbone", key, x, senders, receivers):
    """Initialize parameters for BOTH the backbone forward and the scorer
    (flax only creates params along the traced path, so init must visit
    `__call__` and `score_edges`)."""

    def _init_all(mod, x_, s_, r_):
        mod(x_, s_, r_)
        return mod.score_edges(x_, s_, r_, s_, r_)

    return model.init(key, x, senders, receivers, method=_init_all)


def get_model(gnn: str, in_channels: int, hidden_dim: int, num_classes: int,
              dropout_prob: float = 0.3, edge_mlp_type: str = "MLP",
              heads: int = 1, dtype=jnp.float32) -> _Backbone:
    """Backbone factory (reference main.py:98-111). ``dtype`` is the compute
    dtype for matmuls (bf16 recommended on TPU); params stay float32."""
    if isinstance(dtype, str):
        dtype = jnp.dtype(dtype)
    cls = {"GCN": GNNModel, "GIN": GINModel, "GAT": GATModel,
           "Cheb": ChebModel}.get(gnn)
    if cls is None:
        raise NotImplementedError(gnn)
    return cls(in_channels=in_channels, hidden_dim=hidden_dim,
               num_classes=num_classes, dropout_prob=dropout_prob,
               edge_mlp_type=edge_mlp_type, heads=heads, dtype=dtype)
