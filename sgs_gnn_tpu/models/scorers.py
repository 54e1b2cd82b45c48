"""Edge-probability scorers ("EdgeMLP" family).

Re-design of the reference scorers (reference model.py:8-145): an encoder
produces node embeddings, then a shared score head maps each edge
(u, v) -> sigmoid(fc2(relu(fc1([h_u * h_v || h_u - h_v])))).

Each scorer exposes two sub-steps plus the combined call:

    encode(x, prop_senders, prop_receivers, deterministic) -> h   (N, hid)
    score_from(h, senders, receivers, deterministic, use_remat,
               receiver_band) -> probs                            (E,)
    __call__(...) == score_from(encode(...), score edges)

The split exists for the TPU-first hybrid fast path (train/pipelines.py,
cfg.hybrid_rescore): the full-edge-set scoring pass runs on detached
embeddings for sampling only, and the gradient pass re-runs just the head
on the q sampled edges — the reference's gradient structure
(training_hybrid.py:86 gathers probs_full[idx], so grads only ever flow
through sampled edges) at q/E of the backward cost.

  * prop edges drive the encoder's message passing. In `sparse_edge_mlp`
    mode the reference feeds a random q-subgraph here instead of the full
    graph (reference model.py:106-111) — the caller decides.
  * score edges are the edges to produce probabilities for (full set in
    pass 1; the sampled set in the two-pass pipeline's re-score,
    reference training_two_pass.py:75-77).

`use_remat` rematerializes the score head on the backward pass — the direct
analogue of the reference's `torch.utils.checkpoint` under
`--hybrid_checkpoint` (reference model.py:38-39, 126-127).

`receiver_band` > 0 asserts the score receivers are sorted with that
narrow-band bound (Graph.receiver_band), routing the backward dh scatter
through the banded Pallas kernel.

Notes on deliberate divergences from the reference:
  * The MLP variant projects node rows first and gathers the projections
    (row-wise linearity; the reference projects gathered E rows,
    model.py:24-30 — E/N x more MXU FLOPs). Dropout noise is therefore
    shared across edges touching the same node rather than drawn per edge.
  * The reference MLP variant gathers endpoint features from the random
    subgraph's *edges* when one is provided (model.py:24-25), which is
    shape-inconsistent with its own samplers when q < E; since the MLP
    variant has no propagation step, this framework always scores the
    requested `score` edges.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import GCNConv, SAGEConv
from ..ops.edge_gather import gather_rows


class _DenseParams(nn.Module):
    """Explicit-parameter Dense with nn.Dense's tree layout ({kernel, bias})
    and default inits, so the raw kernel/bias are addressable for kernels
    that consume them directly (ops/score_tiles.py, parallel/halo_train.py)."""
    din: int
    dout: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.din, self.dout))
        self.bias = self.param("bias", nn.initializers.zeros, (self.dout,))

    def __call__(self, x):
        return x @ self.kernel.astype(x.dtype) + self.bias.astype(x.dtype)


class _ScoreHead(nn.Module):
    """fc1 -> ReLU -> dropout -> fc2 -> sigmoid over [h_u*h_v || h_u-h_v]
    (reference model.py:29-34). Matmuls in `dtype`; the sigmoid output is
    cast to float32 for the samplers/losses. The head's input width is the
    encoder output (= hidden_dim for every scorer variant)."""
    hidden_dim: int
    dropout_prob: float
    dtype: Any = jnp.float32

    def setup(self):
        self.fc1 = _DenseParams(2 * self.hidden_dim, self.hidden_dim,
                                name="fc1")
        self.fc2 = _DenseParams(self.hidden_dim, 1, name="fc2")
        self.drop = nn.Dropout(self.dropout_prob)

    def __call__(self, hu, hv, deterministic: bool):
        hu = hu.astype(self.dtype)
        hv = hv.astype(self.dtype)
        feats = jnp.concatenate([hu * hv, hu - hv], axis=-1)
        z = nn.relu(self.fc1(feats))
        z = self.drop(z, deterministic=deterministic)
        logit = self.fc2(z)
        return nn.sigmoid(logit.astype(jnp.float32))

    def tiles(self, h, tile_ls, tile_lr, tile_su, tile_rv, t: int, bk: int,
              deterministic: bool, seed):
        """Fused tile-pair scoring over ALL tile-indexed edge slots
        (ops/score_tiles.py). Forward-only (detached sampling pass)."""
        from ..ops.score_tiles import (score_head_tiles,
                                       score_head_tiles_fallback)
        rate = 0.0 if deterministic else self.dropout_prob
        fn = (score_head_tiles if jax.default_backend() == "tpu"
              else score_head_tiles_fallback)
        return fn(h.astype(self.dtype), self.fc1.kernel, self.fc1.bias,
                  self.fc2.kernel, self.fc2.bias, tile_ls, tile_lr, tile_su,
                  tile_rv, t=t, bk=bk, drop_rate=rate, seed=seed)


def _maybe_remat(fn, use_remat: bool):
    return jax.checkpoint(fn) if use_remat else fn


class _EdgeScorer(nn.Module):
    """Shared scaffolding: score head + score_from + combined __call__."""
    hidden_dim: int
    dropout_prob: float = 0.2
    dtype: Any = jnp.float32

    def setup(self):
        self.head = _ScoreHead(self.hidden_dim, self.dropout_prob,
                               dtype=self.dtype)
        self._setup_encoder()

    def _setup_encoder(self):
        raise NotImplementedError

    def encode(self, x, prop_senders, prop_receivers,
               deterministic: bool = True, exchange=None, edge_mask=None):
        raise NotImplementedError

    def score_from(self, h, senders, receivers, deterministic: bool = True,
                   use_remat: bool = False, receiver_band: int = 0,
                   exchange=None, sorted_side: str = ""):
        if exchange is not None:
            # halo (parallel/halo_train.py): boundary sender embeddings ride
            # the ring; receivers are local rows
            return self.head(exchange(h)[senders], h[receivers],
                             deterministic).squeeze(-1)
        from ..ops.score_sampled import (score_head_sampled,
                                         fused_head_block)
        blk = fused_head_block(h.shape[0], h.shape[1], self.hidden_dim) \
            if receiver_band == 0 else None
        if blk is not None:
            # Fused sampled-edge head kernel (ops/score_sampled.py): gather
            # + head + dh scatter ride one VMEM-resident kernel; blk is the
            # largest edge block whose working set fits VMEM. Its backward
            # recomputes the forward, subsuming `use_remat`. When the
            # caller sampled in sorted order (r5 sorted-head fast path,
            # train/pipelines.py), `sorted_side` names the near-sorted
            # endpoint and that side's one-hot ops run banded.
            rate = 0.0 if deterministic else self.head.dropout_prob
            seed = 0
            if rate > 0.0:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max)
            return score_head_sampled(
                h.astype(self.dtype), self.head.fc1.kernel,
                self.head.fc1.bias, self.head.fc2.kernel, self.head.fc2.bias,
                senders, receivers, drop_rate=rate, seed=seed, block=blk,
                sorted_side=sorted_side)

        def score(h_):
            return self.head(gather_rows(h_, senders),
                             gather_rows(h_, receivers, receiver_band),
                             deterministic)

        return _maybe_remat(score, use_remat)(h).squeeze(-1)

    def score_tiles(self, h, tile_ls, tile_lr, tile_su, tile_rv, t: int,
                    bk: int, deterministic: bool = True, seed=0):
        """Fused tile-pair full-edge-set scoring (detached; tile order)."""
        return self.head.tiles(h, tile_ls, tile_lr, tile_su, tile_rv, t, bk,
                               deterministic, seed)

    def __call__(self, x, prop_senders, prop_receivers, score_senders,
                 score_receivers, deterministic: bool = True,
                 use_remat: bool = False, score_receiver_band: int = 0,
                 score_sorted_side: str = ""):
        h = self.encode(x, prop_senders, prop_receivers, deterministic)
        return self.score_from(h, score_senders, score_receivers,
                               deterministic, use_remat,
                               score_receiver_band,
                               sorted_side=score_sorted_side)


class EdgeProbMLP(_EdgeScorer):
    """MLP scorer: per-endpoint projection, no propagation
    (reference model.py:8-45)."""

    def _setup_encoder(self):
        self.fcdim = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def encode(self, x, prop_senders, prop_receivers,
               deterministic: bool = True, exchange=None, edge_mask=None):
        # project node rows, not gathered edge rows (module docstring);
        # cast before the E-row gathers: the head computes in `dtype`
        # anyway, and bf16 halves gather HBM traffic at edge scale.
        # No propagation, so exchange/edge_mask are inert.
        h = self.drop(nn.relu(self.fcdim(x)), deterministic=deterministic)
        return h.astype(self.dtype)


class EdgeProbSAGE(_EdgeScorer):
    """1-layer GraphSAGE encoder + score head (reference model.py:47-89)."""

    def _setup_encoder(self):
        self.gcn1 = SAGEConv(self.hidden_dim, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def encode(self, x, prop_senders, prop_receivers,
               deterministic: bool = True, exchange=None, edge_mask=None):
        h = self.gcn1(x, prop_senders, prop_receivers,
                      exchange=exchange, edge_mask=edge_mask)
        h = self.drop(nn.relu(h), deterministic=deterministic)
        return h.astype(self.dtype)


class EdgeProbGCN(_EdgeScorer):
    """2-layer GCN encoder + score head — the default scorer
    (`--edge_mlp_type GCN`, reference parser.py:63; model.py:91-133)."""

    def _setup_encoder(self):
        self.gcn1 = GCNConv(self.hidden_dim, dtype=self.dtype)
        self.gcn2 = GCNConv(self.hidden_dim, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_prob)

    def encode(self, x, prop_senders, prop_receivers,
               deterministic: bool = True, exchange=None, edge_mask=None):
        h = self.gcn1(x, prop_senders, prop_receivers,
                      exchange=exchange, edge_mask=edge_mask)
        h = self.drop(nn.relu(h), deterministic=deterministic)
        h = nn.relu(self.gcn2(h, prop_senders, prop_receivers,
                              exchange=exchange, edge_mask=edge_mask))
        return h.astype(self.dtype)


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
