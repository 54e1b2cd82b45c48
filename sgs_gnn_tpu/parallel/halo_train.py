"""Halo-exchange training: FULL-GRAPH semantics with partitioned storage.

The reference's cluster batching drops inter-cluster edges (ClusterData
keep_inter_cluster_edges=False, reference main.py:63), which
parallel/partitioned.py reproduces for parity. This module is the superset
mode (SURVEY.md section 2.5 "halo exchange"): each device owns

  * a node shard (features, labels, masks) and
  * ALL edges arriving at its nodes — including inter-partition ones.

Exchange strategy (v2): host-built per-device-pair halo tables drive a ring
of ``ppermute`` rounds — device p sends to (p+r)%D, at round r, exactly the
rows that destination's inbound edges reference (the boundary set), padded
to the round's static max. Received rows are concatenated after the local
shard, and every sender index is a host-precomputed position into that
EXTENDED matrix, so no global gather ever materializes. Rounds whose
boundary set is empty across all pairs compile away entirely — with a
locality-aware partitioner (RCM / native greedy) most non-adjacent pairs
share no boundary, so the exchanged volume is the true halo, not D x N_loc
rows per device (v1 all_gather; kept in parallel/halo.py as the reference
implementation). XLA schedules the independent ppermute rounds over ICI
concurrently with the local gather/segment-sum of the aggregation.

Per GCN layer the dense projection runs node-parallel on the local shard,
then the PROJECTED features are exchanged (H-dim rows instead of F-dim,
F/H x less traffic for F > nhid) and aggregation is a local segment-sum over
the device's inbound edges. Degrees are weighted in-degrees, which are local
by construction; only the boundary slice of d^{-1/2} is exchanged. The
result is numerically the full-graph GNN (test_halo.py parity tests).

The train step runs the complete learned pipeline with per-shard edge
sampling: each device samples q_loc of its own inbound edges, mirroring the
per-partition q of the reference driver (main.py:50). All three pipelines
are supported (hybrid fast-rescore and exact, straight_through, two_pass —
train/pipelines.py semantics; the scorer's encoder propagates on the full
halo graph). Losses are global means assembled from per-shard sums with
``psum``; the conditional gate compares GLOBAL train-F1 of the learned vs
random forwards (the full-graph analogue of training_hybrid.py:98-141);
gradients are ``psum``-reduced and one replicated dual-Adam update applies.

The model math has a single source of truth: the flax modules themselves.
Every conv layer (models/layers.py) and the scorer (models/scorers.py)
accept ``exchange``/``edge_mask`` SPMD hooks, so this module applies the
SAME modules inside shard_map — the per-layer exchange happens between the
local projection and the local aggregation inside each layer. The allclose
parity tests (tests/test_halo.py) certify the sharded application equals
the single-device one. Supported: all four backbones (GCN, GIN, Cheb, GAT)
with GCN/MLP/GSAGE scorers.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
from jax import shard_map

from ..core.config import Config
from ..models import get_model
from ..sparsify.sampling import (sample_edges, sample_prior_edges,
                                 random_edges, temperature_at)
from ..train.optim import DualOptimizer
from ..train.pipelines import StepMetrics


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "senders_ext", "receivers_loc", "edge_mask",
                      "y", "train_mask", "val_mask", "test_mask", "prob",
                      "node_mask", "send_idx"],
         meta_fields=["num_nodes", "num_classes", "q_loc", "round_sizes",
                      "ext_rows", "gather_rows"])
@dataclasses.dataclass(frozen=True)
class HaloBatch:
    """Stacked per-device halo shards, shape (D, ...), sharded on axis 0.

    senders_ext holds positions into the device's EXTENDED feature matrix
    ``[local shard (N_loc rows) | recv round 1 (H_1) | ... | round D-1]``;
    receivers_loc are local indices into the owning device's shard.
    send_idx[p] concatenates, round by round, the LOCAL row indices device p
    must ship to (p+r)%D (padded with 0 to the static round size H_r —
    padding rows are shipped but never referenced). Padding edge slots have
    edge_mask False and point at slot 0 with zero prior; padding node slots
    have all masks False and zero features.
    """
    x: jax.Array              # (D, N_loc, F)
    senders_ext: jax.Array    # (D, E_loc) int32, ext-space positions
    receivers_loc: jax.Array  # (D, E_loc) int32
    edge_mask: jax.Array      # (D, E_loc) bool
    y: jax.Array              # (D, N_loc) int32
    train_mask: jax.Array     # (D, N_loc) bool
    val_mask: jax.Array       # (D, N_loc) bool
    test_mask: jax.Array      # (D, N_loc) bool
    prob: jax.Array           # (D, E_loc) f32 sampling prior (0 on padding)
    node_mask: jax.Array      # (D, N_loc) bool
    send_idx: jax.Array       # (D, sum_r H_r) int32 local rows to ship
    num_nodes: int = 0        # global N (before padding)
    num_classes: int = 0
    q_loc: int = 0            # per-device sampled-edge budget
    round_sizes: Tuple[int, ...] = ()   # static H_r per ring round
    ext_rows: int = 0         # rows moved per exchange, all devices (v2)
    gather_rows: int = 0      # rows an all_gather would move (v1 baseline)

    @property
    def n_devices(self) -> int:
        return self.x.shape[0]

    @property
    def valid_edges(self) -> int:
        return int(np.asarray(jnp.sum(self.edge_mask)))


def build_halo_batch(x, edge_index, y, train_mask, val_mask, test_mask,
                     prob, num_parts: int, num_classes: int,
                     sample_perc: float = 0.2,
                     part: Optional[np.ndarray] = None) -> HaloBatch:
    """Host-side one-time construction of the halo tables.

    ``part`` is a node->partition assignment; default METIS-style native
    partitioner (data/partition.py). Every device receives all inbound
    edges of its nodes — inter-partition edges included, unlike
    induced_subgraphs (the drop-edges parity mode). The per-pair boundary
    sets (unique remote senders per destination) become the ppermute ring
    schedule of the v2 exchange."""
    from ..data.partition import partition_nodes

    x = np.asarray(x, np.float32)
    edge_index = np.asarray(edge_index, np.int64)
    n = x.shape[0]
    if part is None:
        part = partition_nodes(edge_index, n, num_parts, method="native")
    part = np.asarray(part)
    s_all, r_all = edge_index
    d = num_parts
    nodes = [np.where(part == p)[0] for p in range(d)]
    n_loc = max(max(len(v) for v in nodes), 1)
    local_of = -np.ones(n, np.int64)
    for p in range(d):
        local_of[nodes[p]] = np.arange(len(nodes[p]))

    edge_sets = [np.where(part[r_all] == p)[0] for p in range(d)]
    e_loc = max(max(len(v) for v in edge_sets), 1)

    # per-pair boundary sets: pair_nodes[p][dv] = global ids owned by p that
    # dv's inbound edges reference (sorted — position = recv-buffer slot)
    pair_nodes = [[np.zeros(0, np.int64)] * d for _ in range(d)]
    for dv in range(d):
        sg = s_all[edge_sets[dv]]
        owners = part[sg]
        for p in range(d):
            if p != dv:
                pair_nodes[p][dv] = np.unique(sg[owners == p])
    round_sizes = tuple(
        int(max(len(pair_nodes[p][(p + r) % d]) for p in range(d)))
        for r in range(1, d))
    h_sum = int(sum(round_sizes))
    send_idx = np.zeros((d, h_sum), np.int32)
    for p in range(d):
        off = 0
        for r in range(1, d):
            hr = round_sizes[r - 1]
            u = pair_nodes[p][(p + r) % d]
            send_idx[p, off:off + len(u)] = local_of[u]
            off += hr
    # ext-space position of every (dst, global sender): local rows first,
    # then recv buffers in round order
    round_off = n_loc + np.concatenate([[0], np.cumsum(round_sizes)])

    def ext_pos(dv, sg):
        src = part[sg]
        pos = np.where(src == dv, local_of[sg], 0).astype(np.int64)
        for p in range(d):
            if p == dv:
                continue
            m = src == p
            if not m.any():
                continue
            r = (dv - p) % d
            pos[m] = round_off[r - 1] + np.searchsorted(pair_nodes[p][dv],
                                                        sg[m])
        return pos.astype(np.int32)

    def zeros(shape, dt):
        return np.zeros(shape, dt)

    xs = zeros((d, n_loc, x.shape[1]), np.float32)
    se = zeros((d, e_loc), np.int32)
    rl = zeros((d, e_loc), np.int32)
    em = zeros((d, e_loc), bool)
    ys = zeros((d, n_loc), np.int32)
    tm = zeros((d, n_loc), bool)
    vm = zeros((d, n_loc), bool)
    te = zeros((d, n_loc), bool)
    pr = zeros((d, e_loc), np.float32)
    nm = zeros((d, n_loc), bool)
    prob = (np.full(len(s_all), 1.0 / max(len(s_all), 1), np.float32)
            if prob is None else np.asarray(prob, np.float32))
    for p in range(d):
        k = len(nodes[p])
        xs[p, :k] = x[nodes[p]]
        ys[p, :k] = np.asarray(y)[nodes[p]]
        tm[p, :k] = np.asarray(train_mask)[nodes[p]]
        vm[p, :k] = np.asarray(val_mask)[nodes[p]]
        te[p, :k] = np.asarray(test_mask)[nodes[p]]
        nm[p, :k] = True
        eidx = edge_sets[p]
        se[p, :len(eidx)] = ext_pos(p, s_all[eidx])
        rl[p, :len(eidx)] = local_of[r_all[eidx]]
        em[p, :len(eidx)] = True
        pr[p, :len(eidx)] = prob[eidx]

    min_valid = min(max(len(v), 1) for v in edge_sets)
    q_loc = max(1, int(sample_perc * min_valid))
    return HaloBatch(
        x=jnp.asarray(xs), senders_ext=jnp.asarray(se),
        receivers_loc=jnp.asarray(rl), edge_mask=jnp.asarray(em),
        y=jnp.asarray(ys), train_mask=jnp.asarray(tm),
        val_mask=jnp.asarray(vm), test_mask=jnp.asarray(te),
        prob=jnp.asarray(pr), node_mask=jnp.asarray(nm),
        send_idx=jnp.asarray(send_idx),
        num_nodes=n, num_classes=int(num_classes), q_loc=q_loc,
        round_sizes=round_sizes,
        ext_rows=d * h_sum, gather_rows=d * d * n_loc)


def shard_halo_batch(hb: HaloBatch, mesh: Mesh) -> HaloBatch:
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        # multi-host: contribute only this process's shard rows
        from .distributed import local_slot_indices
        slots = np.asarray(local_slot_indices(mesh))

        def put(a):
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(a)[slots], np.shape(a))

        return jax.tree_util.tree_map(put, hb)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), hb)


# ---------------------------------------------------------------------------
# The v2 exchange and the functional sharded forward
# (parameter names per models/backbones.py)
# ---------------------------------------------------------------------------


def make_exchange(send_idx_loc, round_sizes, axis: str, d: int):
    """Build ``exchange(v) -> v_ext`` for one device inside shard_map.

    v is (N_loc, F) or (N_loc,); the result prepends v and appends one recv
    buffer per non-empty ring round, matching the ext-space positions
    baked into senders_ext. Empty rounds (no boundary anywhere) vanish at
    trace time."""

    def exchange(v):
        vec = v.ndim == 1
        xv = v[:, None] if vec else v
        parts = [xv]
        off = 0
        for r in range(1, d):
            hr = round_sizes[r - 1]
            if hr:
                idx = jax.lax.slice_in_dim(send_idx_loc, off, off + hr)
                perm = [(p, (p + r) % d) for p in range(d)]
                parts.append(jax.lax.ppermute(xv[idx], axis, perm))
            off += hr
        out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else xv
        return out[:, 0] if vec else out

    return exchange


def _model_from_params(gnn: str, pr, drop_rate: float, dtype,
                       edge_mlp_type: str = "MLP"):
    """Reconstruct the backbone module from a parameter tree's shapes —
    the compat surface for callers that hold only (params, gnn) like the
    gradient-parity test; the train/eval steps build from Config."""
    heads = 1
    if gnn == "GCN":
        hid = pr["gcn1"]["lin"]["kernel"].shape[1]
        ncls = pr["gcn2"]["lin"]["kernel"].shape[1]
    elif gnn == "GIN":
        hid = pr["GIN_conv1"]["mlp_lin2"]["kernel"].shape[1]
        ncls = pr["GIN_conv2"]["mlp_lin2"]["kernel"].shape[1]
    elif gnn == "GAT":
        _, heads, hid = pr["GAT_conv1"]["att_src"].shape
        ncls = pr["GAT_conv2"]["att_src"].shape[2]
    elif gnn == "Cheb":
        hid = pr["gcn1"]["lins_0"]["kernel"].shape[1]
        ncls = pr["gcn2"]["lins_0"]["kernel"].shape[1]
    else:
        raise NotImplementedError(gnn)
    return get_model(gnn, 0, int(hid), int(ncls), drop_rate, edge_mlp_type,
                     heads=int(heads), dtype=dtype)


def halo_gnn_forward(pr, gnn, hb_loc, s_ext, r_loc, w, emask, exchange,
                     dtype, drop_rate, key=None):
    """Backbone forward on the local shard with halo exchange per layer —
    applies the REAL flax modules (models/backbones.py) through their SPMD
    hooks (models/layers.py ``exchange``/``edge_mask``); no re-implemented
    math."""
    model = _model_from_params(gnn, pr, drop_rate, dtype)
    det = key is None
    rngs = None if det else {"dropout": key}
    return model.apply({"params": pr}, hb_loc, s_ext, r_loc, w, det,
                       exchange, emask, rngs=rngs)


def halo_scorer_encode(model, params, x_loc, s_ext, r_loc, emask, exchange,
                       key=None):
    """Scorer encoder (models/scorers.py encode) on the local shard."""
    det = key is None
    rngs = None if det else {"dropout": key}
    return model.apply(params, x_loc, s_ext, r_loc, det, exchange, emask,
                       method="encode_scorer", rngs=rngs)


def halo_score_head(model, params, h_loc, s_ext, r_loc, exchange, key=None):
    """Score head (models/scorers._ScoreHead) over local inbound edges;
    boundary sender embeddings arrive via the ring exchange of h."""
    det = key is None
    rngs = None if det else {"dropout": key}
    return model.apply(params, h_loc, s_ext, r_loc, det, False, 0, exchange,
                       method="score_from_embeddings", rngs=rngs)


# ---------------------------------------------------------------------------
# Global (psum-assembled) losses and metrics
# ---------------------------------------------------------------------------


def _global_masked_ce(logits, labels, mask, axis):
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(nll.dtype)
    s = jax.lax.psum(jnp.sum(nll * m), axis)
    c = jax.lax.psum(jnp.sum(m), axis)
    return s / jnp.maximum(c, 1.0)


def _global_micro_f1(logits, labels, mask, axis):
    preds = jnp.argmax(logits, axis=-1)
    hit = (preds == labels).astype(jnp.float32) * mask.astype(jnp.float32)
    s = jax.lax.psum(jnp.sum(hit), axis)
    c = jax.lax.psum(jnp.sum(mask.astype(jnp.float32)), axis)
    return s / jnp.maximum(c, 1.0)


def _global_assortative_bce(edge_probs, hu_train, hv_train, same, axis):
    """reg1 (train/losses.assortative_bce) with psum-global reduction and
    the reference's global >1-positives gate."""
    labels = same.astype(edge_probs.dtype)
    p = jnp.clip(edge_probs, 1e-38, 1.0 - 1e-7)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    valid = (hu_train & hv_train).astype(edge_probs.dtype)
    s = jax.lax.psum(jnp.sum(bce * valid), axis)
    c = jax.lax.psum(jnp.sum(valid), axis)
    n_pos = jax.lax.psum(jnp.sum(labels * valid), axis)
    return jnp.where(n_pos > 1.0, s / jnp.maximum(c, 1.0), 0.0)


def _global_consistency(edge_probs, emb_u, emb_v, axis, n_total):
    num = jnp.sum(emb_u * emb_v, axis=-1)

    def safe_norm(v):
        return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-16))

    denom = jnp.maximum(safe_norm(emb_u), 1e-8) * \
        jnp.maximum(safe_norm(emb_v), 1e-8)
    cos = num / denom
    s = jax.lax.psum(jnp.sum((edge_probs - cos) ** 2), axis)
    return s / n_total


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------


def _check_supported(cfg: Config):
    if cfg.GNN not in ("GCN", "GIN", "Cheb", "GAT"):
        raise NotImplementedError(cfg.GNN)
    if cfg.mode == "learned" and cfg.edge_mlp_type not in ("GCN", "MLP",
                                                           "GSAGE"):
        raise NotImplementedError(cfg.edge_mlp_type)


def make_halo_train_step(cfg: Config, opt: DualOptimizer, max_epoch: int,
                         mesh: Mesh, axis: str = "data"):
    """Jitted halo train step: (params, opt_state, hb, epoch, key) ->
    (params, opt_state, StepMetrics). hb sharded on axis 0, params/opt
    replicated. Learned mode runs the configured pipeline
    (train/pipelines.py semantics: hybrid fast-rescore/exact,
    straight_through, two_pass) with per-shard q_loc sampling; the scorer's
    encoder propagates on the full (halo) graph. full/random/edge modes
    mirror train/pipelines.baseline_step with global-graph semantics."""
    _check_supported(cfg)
    dtype = jnp.dtype(cfg.dtype)
    mode = cfg.mode
    pipeline = cfg.pipeline
    gnn = cfg.GNN
    d = mesh.devices.size

    def local_loss(p, hb: HaloBatch, key):
        x = hb.x[0]
        s_ext = hb.senders_ext[0]
        r_loc = hb.receivers_loc[0]
        emask = hb.edge_mask[0]
        y = hb.y[0]
        tmask = hb.train_mask[0]
        prob = hb.prob[0]
        q_loc = hb.q_loc
        exchange = make_exchange(hb.send_idx[0], hb.round_sizes, axis, d)
        me = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, me)
        k_rand, k_sample, k_s1, k_s2, k_g1, k_g2 = jax.random.split(key, 6)
        # train-mask/labels of boundary senders ride the same exchange
        y_ext = exchange(y)
        t_ext = exchange(tmask)

        if mode == "learned":
            model = get_model(cfg.GNN, x.shape[-1], cfg.nhid, hb.num_classes,
                              cfg.drop_rate, cfg.edge_mlp_type, dtype=dtype)
            h = halo_scorer_encode(model, p, x, s_ext, r_loc, emask,
                                   exchange, key=k_s1)
            ones_mask = jnp.ones(q_loc, bool)
            if pipeline == "hybrid" and cfg.hybrid_rescore:
                probs_sample = jax.lax.stop_gradient(halo_score_head(
                    model, p, jax.lax.stop_gradient(h), s_ext, r_loc,
                    exchange, key=k_s1))
                idx, _ = sample_edges(k_sample, probs_sample, prob, q_loc,
                                      cfg.degree_bias_coef, edge_mask=emask,
                                      approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                weights = halo_score_head(model, p, h, s_s, s_r, exchange,
                                          key=k_s2)
            elif pipeline == "hybrid":
                probs_full = halo_score_head(model, p, h, s_ext, r_loc,
                                             exchange, key=k_s1)
                idx, _ = sample_edges(
                    k_sample, jax.lax.stop_gradient(probs_full), prob, q_loc,
                    cfg.degree_bias_coef, edge_mask=emask,
                    approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                weights = probs_full[idx]
            elif pipeline == "straight_through":
                probs_full = halo_score_head(model, p, h, s_ext, r_loc,
                                             exchange, key=k_s1)
                idx, weights = sample_edges(
                    k_sample, probs_full, prob, q_loc, cfg.degree_bias_coef,
                    edge_mask=emask, approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
            elif pipeline == "two_pass":
                probs_sample = jax.lax.stop_gradient(halo_score_head(
                    model, p, jax.lax.stop_gradient(h), s_ext, r_loc,
                    exchange, key=k_s1))
                idx, _ = sample_edges(k_sample, probs_sample, prob, q_loc,
                                      cfg.degree_bias_coef, edge_mask=emask,
                                      approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                # grad pass: the encoder re-propagates on the SAMPLED
                # subgraph (training_two_pass.py:75-77)
                h2 = halo_scorer_encode(model, p, x, s_s, s_r, ones_mask,
                                        exchange, key=k_s2)
                weights = halo_score_head(model, p, h2, s_s, s_r, exchange,
                                          key=k_s2)
            else:
                raise ValueError(pipeline)
            out = model.apply(p, x, s_s, s_r, weights, False, exchange,
                              ones_mask, rngs={"dropout": k_g1})
            loss = _global_masked_ce(out, y, tmask, axis)
            if cfg.reg1:
                loss = loss + cfg.regularizer1_coef * _global_assortative_bce(
                    weights, t_ext[s_s], tmask[s_r],
                    y_ext[s_s] == y[s_r], axis)
            if cfg.reg2:
                out_ext = exchange(out)
                loss = loss + cfg.consist_reg_coef * _global_consistency(
                    weights, out_ext[s_s], out[s_r], axis,
                    q_loc * hb.n_devices)
            if cfg.conditional:
                r_idx = sample_prior_edges(k_rand, prob, q_loc, emask,
                                           approx=cfg.approx_topk)
                rand_out = model.apply(
                    p, x, s_ext[r_idx], r_loc[r_idx], None, False, exchange,
                    jnp.ones(q_loc, bool), rngs={"dropout": k_g2})
                lf1 = _global_micro_f1(out, y, tmask, axis)
                rf1 = _global_micro_f1(rand_out, y, tmask, axis)
                gate = jax.lax.stop_gradient(lf1 > rf1)
                loss_rand = _global_masked_ce(rand_out, y, tmask, axis)
                total = jnp.where(gate, loss, loss_rand)
            else:
                gate = jnp.asarray(True)
                lf1 = rf1 = jnp.zeros(())
                total = loss
            return total, (gate, lf1, rf1)

        # baseline modes
        if mode == "full":
            s_s, s_r, msk = s_ext, r_loc, emask
        elif mode == "random":
            idx = random_edges(k_rand, emask.shape[0], q_loc, edge_mask=emask,
                               approx=cfg.approx_topk)
            s_s, s_r, msk = s_ext[idx], r_loc[idx], jnp.ones(q_loc, bool)
        elif mode == "edge":
            idx = sample_prior_edges(k_rand, prob, q_loc, emask,
                                     approx=cfg.approx_topk)
            s_s, s_r, msk = s_ext[idx], r_loc[idx], jnp.ones(q_loc, bool)
        else:
            raise ValueError(mode)
        model = get_model(cfg.GNN, x.shape[-1], cfg.nhid, hb.num_classes,
                          cfg.drop_rate, cfg.edge_mlp_type, dtype=dtype)
        out = model.apply(p, x, s_s, s_r, None, False, exchange, msk,
                          rngs={"dropout": k_g1})
        loss = _global_masked_ce(out, y, tmask, axis)
        return loss, (jnp.asarray(False), jnp.zeros(()), jnp.zeros(()))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(), P(axis), P(), P()),
             out_specs=(P(), P(), P()),
             check_vma=False)
    def step(params, opt_state, hb, epoch, key):
        (loss, (gate, lf1, rf1)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, hb, key)
        # local_loss is the GLOBAL loss (assembled with psums) replicated on
        # every shard, so AD effectively differentiates D*L: each device's
        # loss output is seeded 1 and the forward psum's transpose sums the
        # D seeds. Each shard's grads carry its local producer paths with a
        # uniform factor D -> pmean (== psum / D) yields d(global)/dp.
        grads = jax.lax.pmean(grads, axis)
        t = temperature_at(epoch, max_epoch, cfg.t_init, cfg.t_min)
        if mode == "learned":
            params2, opt_state2 = opt.step_learned(params, grads, opt_state,
                                                   gate)
        else:
            params2, opt_state2 = opt.step_all(params, grads, opt_state)
        metrics = StepMetrics(loss, t, gate.astype(jnp.float32), lf1, rf1)
        return params2, opt_state2, metrics

    return jax.jit(step)


def halo_full_forward(cfg: Config, params, hb: HaloBatch, mesh: Mesh,
                      axis: str = "data"):
    """Deterministic full-graph forward on halo shards -> (D, N_loc, C)
    logits. Parity surface for tests and the predict/serve path."""
    _check_supported(cfg)
    dtype = jnp.dtype(cfg.dtype)
    d = mesh.devices.size

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis)),
             out_specs=P(axis), check_vma=False)
    def fwd(p, hb_):
        exchange = make_exchange(hb_.send_idx[0], hb_.round_sizes, axis, d)
        out = halo_gnn_forward(p["params"], cfg.GNN, hb_.x[0],
                               hb_.senders_ext[0], hb_.receivers_loc[0],
                               None, hb_.edge_mask[0], exchange, dtype,
                               cfg.drop_rate, key=None)
        return out[None]

    return fwd(params, hb)


def make_halo_eval_step(cfg: Config, mesh: Mesh, axis: str = "data"):
    """Halo ensemble eval: deterministic scorer once, num_samples_eval
    sampled draws vmapped per shard, logits averaged, global per-split F1
    sums via psum (same contract as eval/evaluate.make_eval_step)."""
    _check_supported(cfg)
    dtype = jnp.dtype(cfg.dtype)
    mode = cfg.mode
    gnn = cfg.GNN
    n_draws = cfg.num_samples_eval
    d = mesh.devices.size

    @partial(shard_map, mesh=mesh, in_specs=(P(), P(axis), P(), P()),
             out_specs=P(), check_vma=False)
    def eval_step(params, hb, key, temperature):
        x = hb.x[0]
        s_ext = hb.senders_ext[0]
        r_loc = hb.receivers_loc[0]
        emask = hb.edge_mask[0]
        q_loc = hb.q_loc
        exchange = make_exchange(hb.send_idx[0], hb.round_sizes, axis, d)
        me = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, me)

        model = get_model(gnn, x.shape[-1], cfg.nhid, hb.num_classes,
                          cfg.drop_rate, cfg.edge_mlp_type, dtype=dtype)

        def forward(s, r, w, msk):
            return model.apply(params, x, s, r, w, True, exchange, msk)

        if mode == "full":
            logits = forward(s_ext, r_loc, None, emask)
        else:
            if mode == "learned":
                h = halo_scorer_encode(model, params, x, s_ext, r_loc,
                                       emask, exchange)
                probs = halo_score_head(model, params, h, s_ext, r_loc,
                                        exchange)

            def draw(k):
                if mode == "learned":
                    idx, w = sample_edges(k, probs, hb.prob[0], q_loc,
                                          cfg.degree_bias_coef, istest=True,
                                          edge_mask=emask,
                                          approx=cfg.approx_topk)
                elif mode == "random":
                    idx = random_edges(k, emask.shape[0], q_loc,
                                       edge_mask=emask,
                                       approx=cfg.approx_topk)
                    w = None
                else:  # edge
                    idx = sample_prior_edges(k, hb.prob[0], q_loc, emask,
                                             approx=cfg.approx_topk)
                    w = None
                return forward(s_ext[idx], r_loc[idx], w,
                               jnp.ones(q_loc, bool))

            logits = jnp.mean(
                jax.vmap(draw)(jax.random.split(key, n_draws)), axis=0)

        out = {}
        for split, mask in (("train", hb.train_mask[0]),
                            ("val", hb.val_mask[0]),
                            ("test", hb.test_mask[0])):
            m = mask.astype(jnp.float32)
            hit = (jnp.argmax(logits, -1) == hb.y[0]).astype(jnp.float32)
            out[f"{split}_f1_weighted"] = jax.lax.psum(
                jnp.sum(hit * m), axis)
            out[f"{split}_count"] = jax.lax.psum(jnp.sum(m), axis)
        # report weighted sum == f1 * count so aggregate_eval composes
        return out

    return jax.jit(eval_step)
