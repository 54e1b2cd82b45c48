"""Edge-probability scorers ("EdgeMLP" family).

Re-design of the reference scorers (reference model.py:8-145): an encoder
produces node embeddings, then a shared score head maps each edge
(u, v) -> sigmoid(fc2(relu(fc1([h_u * h_v || h_u - h_v])))).

Scorer call signature (all variants):
    scorer(x, prop_senders, prop_receivers, score_senders, score_receivers,
           deterministic, use_remat)

  * prop edges drive the encoder's message passing. In `sparse_edge_mlp`
    mode the reference feeds a random q-subgraph here instead of the full
    graph (reference model.py:106-111) — the caller decides.
  * score edges are the edges to produce probabilities for (full set in
    pass 1; the sampled set in the two-pass pipeline's re-score,
    reference training_two_pass.py:75-77).

`use_remat` rematerializes the score head on the backward pass — the direct
analogue of the reference's `torch.utils.checkpoint` under
`--hybrid_checkpoint` (reference model.py:38-39, 126-127).

Note: the reference's MLP variant gathers endpoint features from the random
subgraph's *edges* when one is provided (model.py:24-25), which is
shape-inconsistent with its own samplers when q < E (the GCN variant — the
default — only uses the random subgraph for propagation). Since the MLP
variant has no propagation step, this framework always scores the requested
`score` edges; the random subgraph is irrelevant to it.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import GCNConv, SAGEConv
from ..ops.edge_gather import gather_rows


class _ScoreHead(nn.Module):
    """fc1 -> ReLU -> dropout -> fc2 -> sigmoid over [h_u*h_v || h_u-h_v]
    (reference model.py:29-34). Matmuls in `dtype`; the sigmoid output is
    cast to float32 for the samplers/losses."""
    hidden_dim: int
    dropout_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hu, hv, deterministic: bool):
        hu = hu.astype(self.dtype)
        hv = hv.astype(self.dtype)
        feats = jnp.concatenate([hu * hv, hu - hv], axis=-1)
        z = nn.relu(nn.Dense(self.hidden_dim, name="fc1",
                             dtype=self.dtype)(feats))
        z = nn.Dropout(self.dropout_prob, deterministic=deterministic)(z)
        logit = nn.Dense(1, name="fc2", dtype=self.dtype)(z)
        return nn.sigmoid(logit.astype(jnp.float32))


def _maybe_remat(fn, use_remat: bool):
    return jax.checkpoint(fn) if use_remat else fn


class EdgeProbMLP(nn.Module):
    """MLP scorer: per-endpoint projection, no propagation
    (reference model.py:8-45)."""
    hidden_dim: int
    dropout_prob: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prop_senders, prop_receivers, score_senders,
                 score_receivers, deterministic: bool = True,
                 use_remat: bool = False, score_receiver_band: int = 0):
        proj = nn.Dense(self.hidden_dim, name="fcdim", dtype=self.dtype)
        drop = nn.Dropout(self.dropout_prob, deterministic=deterministic)
        hu = drop(nn.relu(proj(gather_rows(x, score_senders))))
        hv = drop(nn.relu(proj(gather_rows(x, score_receivers,
                                           score_receiver_band))))
        head = _ScoreHead(self.hidden_dim, self.dropout_prob,
                          dtype=self.dtype, name="head")

        def score(hu_, hv_):
            return head(hu_, hv_, deterministic)

        prob = _maybe_remat(score, use_remat)(hu, hv)
        return prob.squeeze(-1)


class EdgeProbSAGE(nn.Module):
    """1-layer GraphSAGE encoder + score head (reference model.py:47-89)."""
    hidden_dim: int
    dropout_prob: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prop_senders, prop_receivers, score_senders,
                 score_receivers, deterministic: bool = True,
                 use_remat: bool = False, score_receiver_band: int = 0):
        h = SAGEConv(self.hidden_dim, dtype=self.dtype,
                     name="gcn1")(x, prop_senders, prop_receivers)
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(nn.relu(h))
        head = _ScoreHead(self.hidden_dim, self.dropout_prob,
                          dtype=self.dtype, name="head")

        def score(h_):
            return head(gather_rows(h_, score_senders),
                        gather_rows(h_, score_receivers,
                                    score_receiver_band), deterministic)

        prob = _maybe_remat(score, use_remat)(h)
        return prob.squeeze(-1)


class EdgeProbGCN(nn.Module):
    """2-layer GCN encoder + score head — the default scorer
    (`--edge_mlp_type GCN`, reference parser.py:63; model.py:91-133)."""
    hidden_dim: int
    dropout_prob: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, prop_senders, prop_receivers, score_senders,
                 score_receivers, deterministic: bool = True,
                 use_remat: bool = False, score_receiver_band: int = 0):
        h = GCNConv(self.hidden_dim, dtype=self.dtype,
                    name="gcn1")(x, prop_senders, prop_receivers)
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(nn.relu(h))
        h = nn.relu(GCNConv(self.hidden_dim, dtype=self.dtype,
                            name="gcn2")(h, prop_senders, prop_receivers))
        head = _ScoreHead(self.hidden_dim, self.dropout_prob,
                          dtype=self.dtype, name="head")

        def score(h_):
            return head(gather_rows(h_, score_senders),
                        gather_rows(h_, score_receivers,
                                    score_receiver_band), deterministic)

        prob = _maybe_remat(score, use_remat)(h)
        return prob.squeeze(-1)


def get_edge_mlp(hidden_dim: int, dropout_prob: float,
                 edge_mlp_type: str = "MLP",
                 dtype: Any = jnp.float32) -> nn.Module:
    """Scorer factory (reference model.py:135-145)."""
    if edge_mlp_type == "MLP":
        return EdgeProbMLP(hidden_dim, dropout_prob, dtype,
                           name="edge_prob_mlp")
    if edge_mlp_type == "GSAGE":
        return EdgeProbSAGE(hidden_dim, dropout_prob, dtype,
                            name="edge_prob_mlp")
    if edge_mlp_type == "GCN":
        return EdgeProbGCN(hidden_dim, dropout_prob, dtype,
                           name="edge_prob_mlp")
    raise NotImplementedError(edge_mlp_type)
