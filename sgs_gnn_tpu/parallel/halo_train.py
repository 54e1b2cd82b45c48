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

Because the model is re-expressed as sharded collectives, the flax modules
cannot be applied directly; the forward is re-implemented functionally from
the same parameter pytree (names pinned by the dual-optimizer contract,
models/backbones.py docstring) and pinned to the module implementations by
the allclose parity tests. Supported: all four backbones (GCN, GIN, Cheb,
GAT) with GCN/MLP/GSAGE scorers.
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


def _dense(p, x, dtype):
    y = x.astype(dtype) @ p["kernel"].astype(dtype)
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _dropout(key, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _halo_gcn_conv(lp, x_loc, s_ext, r_loc, w, emask, exchange, dtype):
    """One GCN layer with halo exchange == GCNConv(models/layers.py:30-74):
    D^{-1/2}(A+I)D^{-1/2} X W + b with weighted in-degree + self-loop fill 1,
    projection in `dtype`, f32 aggregation, analytic diagonal term. Degrees
    are exact: each device owns ALL inbound edges of its nodes."""
    n_loc = x_loc.shape[0]
    xw = (x_loc.astype(dtype) @ lp["lin"]["kernel"].astype(dtype))
    mf = emask.astype(jnp.float32)
    ww = mf if w is None else w.astype(jnp.float32) * mf
    deg = jax.ops.segment_sum(ww, r_loc, num_segments=n_loc) + 1.0
    dis_loc = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-32)), 0.0)
    # halo exchange: boundary d^{-1/2} scalars + projected boundary rows
    dis_ext = exchange(dis_loc)
    xw_ext = exchange(xw)
    norm = dis_ext[s_ext] * ww * dis_loc[r_loc]
    msgs = xw_ext[s_ext].astype(jnp.float32) * norm[:, None]
    out = jax.ops.segment_sum(msgs, r_loc, num_segments=n_loc)
    out = out + (dis_loc * dis_loc)[:, None] * xw.astype(jnp.float32)
    return out + lp["bias"].astype(jnp.float32)


def _halo_gin_conv(lp, x_loc, s_ext, r_loc, emask, exchange, dtype):
    """GIN layer (models/layers.py GINConv, eps=0): MLP(x + sum_in x_j);
    edge weights ignored (PyG parity)."""
    n_loc = x_loc.shape[0]
    x_ext = exchange(x_loc)
    msgs = x_ext[s_ext] * emask.astype(x_loc.dtype)[:, None]
    agg = jax.ops.segment_sum(msgs.astype(jnp.float32), r_loc,
                              num_segments=n_loc)
    z = x_loc.astype(jnp.float32) + agg
    z = jax.nn.relu(_dense(lp["mlp_lin1"], z, dtype))
    return _dense(lp["mlp_lin2"], z, dtype).astype(jnp.float32)


def _halo_sage_conv(lp, x_loc, s_ext, r_loc, emask, exchange, dtype):
    """SAGEConv (models/layers.py:77-96): W_l mean_in(x) + W_r x."""
    n_loc = x_loc.shape[0]
    x_ext = exchange(x_loc)
    mf = emask.astype(jnp.float32)
    msgs = x_ext[s_ext].astype(jnp.float32) * mf[:, None]
    s = jax.ops.segment_sum(msgs, r_loc, num_segments=n_loc)
    cnt = jax.ops.segment_sum(mf, r_loc, num_segments=n_loc)
    agg = s / jnp.maximum(cnt, 1.0)[:, None]
    out = _dense(lp["lin_l"], agg, dtype) + _dense(lp["lin_r"], x_loc, dtype)
    return out.astype(jnp.float32)


def _halo_gat_conv(lp, x_loc, s_ext, r_loc, emask, exchange, dtype,
                   concat: bool):
    """GATConv (models/layers.py GATConv, sparse branch) with halo exchange:
    per-node attention terms are computed locally, the sender-side terms and
    projected features ride the ring exchange, and the per-destination
    segment softmax is local (every inbound edge of a node lives on its
    owner). Self-loops are appended as local edges (PyG add_self_loops)."""
    n_loc = x_loc.shape[0]
    att_src = lp["att_src"]
    _, h, f = att_src.shape
    xw = (x_loc.astype(dtype) @ lp["lin"]["kernel"].astype(dtype))
    xw = xw.astype(jnp.float32).reshape(n_loc, h, f)
    alpha_src = jnp.sum(xw * att_src, axis=-1)       # (N_loc, H)
    alpha_dst = jnp.sum(xw * lp["att_dst"], axis=-1)
    # exchange sender-side quantities; self-loop edges are local slots
    as_ext = exchange(alpha_src)                     # (N_ext, H)
    xw_ext = exchange(xw.reshape(n_loc, h * f)).reshape(-1, h, f)
    loop = jnp.arange(n_loc, dtype=s_ext.dtype)
    s = jnp.concatenate([s_ext, loop])
    r = jnp.concatenate([r_loc, loop])
    m = jnp.concatenate([emask, jnp.ones(n_loc, bool)])
    logits = as_ext[s] + alpha_dst[r]                # (E'+N_loc, H)
    logits = jax.nn.leaky_relu(logits, 0.2)
    logits = jnp.where(m[:, None], logits, -jnp.inf)
    from ..ops.segment import segment_softmax
    alpha = jax.vmap(lambda lg: segment_softmax(lg, r, n_loc), in_axes=1,
                     out_axes=1)(logits)
    msgs = xw_ext[s] * alpha[..., None]
    out = jax.ops.segment_sum(msgs, r, num_segments=n_loc)
    if concat:
        return out.reshape(n_loc, h * f) + lp["bias"].astype(jnp.float32)
    return jnp.mean(out, axis=1) + lp["bias"].astype(jnp.float32)


def _halo_cheb_conv(lp, x_loc, dtype):
    """ChebConv K=1 (models/layers.py ChebConv, the reference's
    configuration, model.py:217-219): reduces to Z = X Theta_0 + b — no
    propagation, so no exchange. General K is served by the drop-edges
    parallel mode."""
    out = x_loc.astype(dtype) @ lp["lins_0"]["kernel"].astype(dtype)
    return out.astype(jnp.float32) + lp["bias"].astype(jnp.float32)


def halo_gnn_forward(pr, gnn, hb_loc, s_ext, r_loc, w, emask, exchange,
                     dtype, drop_rate, key=None):
    """Backbone forward (models/backbones.py GNNModel/GINModel/ChebModel)
    on the local shard with halo exchange per layer."""
    det = key is None
    k = jax.random.PRNGKey(0) if det else key
    if gnn == "GCN":
        h = jax.nn.relu(_halo_gcn_conv(pr["gcn1"], hb_loc, s_ext, r_loc, w,
                                       emask, exchange, dtype))
        h = _dropout(k, h, drop_rate, det)
        return _halo_gcn_conv(pr["gcn2"], h, s_ext, r_loc, w, emask,
                              exchange, dtype)
    if gnn == "GIN":
        h = jax.nn.relu(_halo_gin_conv(pr["GIN_conv1"], hb_loc, s_ext, r_loc,
                                       emask, exchange, dtype))
        h = _dropout(k, h, drop_rate, det)
        return _halo_gin_conv(pr["GIN_conv2"], h, s_ext, r_loc, emask,
                              exchange, dtype)
    if gnn == "Cheb":
        h = jax.nn.relu(_halo_cheb_conv(pr["gcn1"], hb_loc, dtype))
        h = _dropout(k, h, drop_rate, det)
        return _halo_cheb_conv(pr["gcn2"], h, dtype)
    if gnn == "GAT":
        h = jax.nn.relu(_halo_gat_conv(pr["GAT_conv1"], hb_loc, s_ext,
                                       r_loc, emask, exchange, dtype,
                                       concat=True))
        h = _dropout(k, h, drop_rate, det)
        return _halo_gat_conv(pr["GAT_conv2"], h, s_ext, r_loc, emask,
                              exchange, dtype, concat=False)
    raise NotImplementedError(gnn)


def halo_scorer_encode(sp, x_loc, s_ext, r_loc, emask, exchange, dtype,
                       edge_mlp_type, drop_rate, key=None):
    """Scorer encoder (models/scorers.py encode) on the local shard."""
    det = key is None
    k1, k2 = jax.random.split(key) if not det else (None, None)
    if edge_mlp_type == "GCN":
        h = _halo_gcn_conv(sp["gcn1"], x_loc, s_ext, r_loc, None, emask,
                           exchange, dtype)
        h = _dropout(k1, jax.nn.relu(h), drop_rate, det)
        h = jax.nn.relu(_halo_gcn_conv(sp["gcn2"], h, s_ext, r_loc, None,
                                       emask, exchange, dtype))
    elif edge_mlp_type == "MLP":
        h = jax.nn.relu(_dense(sp["fcdim"], x_loc, dtype))
        h = _dropout(k1, h, drop_rate, det)
    elif edge_mlp_type == "GSAGE":
        h = _halo_sage_conv(sp["gcn1"], x_loc, s_ext, r_loc, emask, exchange,
                            dtype)
        h = _dropout(k1, jax.nn.relu(h), drop_rate, det)
    else:
        raise NotImplementedError(edge_mlp_type)
    return h.astype(dtype)


def halo_score_head(sp, h_loc, s_ext, r_loc, exchange, dtype, drop_rate,
                    key=None):
    """Score head (models/scorers._ScoreHead) over local inbound edges;
    boundary sender embeddings arrive via the ring exchange of h."""
    det = key is None
    h_ext = exchange(h_loc)
    hu = h_ext[s_ext].astype(dtype)
    hv = h_loc[r_loc].astype(dtype)
    feats = jnp.concatenate([hu * hv, hu - hv], axis=-1)
    z = jax.nn.relu(_dense(sp["head"]["fc1"], feats, dtype))
    z = _dropout(key if not det else jax.random.PRNGKey(0), z, drop_rate,
                 det)
    logit = _dense(sp["head"]["fc2"], z, dtype)
    return jax.nn.sigmoid(logit.astype(jnp.float32)).squeeze(-1)


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
        pr = p["params"]
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
            spr = pr["edge_prob_mlp"]
            h = halo_scorer_encode(spr, x, s_ext, r_loc, emask, exchange,
                                   dtype, cfg.edge_mlp_type, cfg.drop_rate,
                                   key=k_s1)
            ones_mask = jnp.ones(q_loc, bool)
            if pipeline == "hybrid" and cfg.hybrid_rescore:
                probs_sample = jax.lax.stop_gradient(halo_score_head(
                    spr, jax.lax.stop_gradient(h), s_ext, r_loc, exchange,
                    dtype, cfg.drop_rate, key=k_s1))
                idx, _ = sample_edges(k_sample, probs_sample, prob, q_loc,
                                      cfg.degree_bias_coef, edge_mask=emask,
                                      approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                weights = halo_score_head(spr, h, s_s, s_r, exchange, dtype,
                                          cfg.drop_rate, key=k_s2)
            elif pipeline == "hybrid":
                probs_full = halo_score_head(spr, h, s_ext, r_loc, exchange,
                                             dtype, cfg.drop_rate, key=k_s1)
                idx, _ = sample_edges(
                    k_sample, jax.lax.stop_gradient(probs_full), prob, q_loc,
                    cfg.degree_bias_coef, edge_mask=emask,
                    approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                weights = probs_full[idx]
            elif pipeline == "straight_through":
                probs_full = halo_score_head(spr, h, s_ext, r_loc, exchange,
                                             dtype, cfg.drop_rate, key=k_s1)
                idx, weights = sample_edges(
                    k_sample, probs_full, prob, q_loc, cfg.degree_bias_coef,
                    edge_mask=emask, approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
            elif pipeline == "two_pass":
                probs_sample = jax.lax.stop_gradient(halo_score_head(
                    spr, jax.lax.stop_gradient(h), s_ext, r_loc, exchange,
                    dtype, cfg.drop_rate, key=k_s1))
                idx, _ = sample_edges(k_sample, probs_sample, prob, q_loc,
                                      cfg.degree_bias_coef, edge_mask=emask,
                                      approx=cfg.approx_topk)
                s_s, s_r = s_ext[idx], r_loc[idx]
                # grad pass: the encoder re-propagates on the SAMPLED
                # subgraph (training_two_pass.py:75-77)
                h2 = halo_scorer_encode(spr, x, s_s, s_r, ones_mask,
                                        exchange, dtype, cfg.edge_mlp_type,
                                        cfg.drop_rate, key=k_s2)
                weights = halo_score_head(spr, h2, s_s, s_r, exchange, dtype,
                                          cfg.drop_rate, key=k_s2)
            else:
                raise ValueError(pipeline)
            out = halo_gnn_forward(pr, gnn, x, s_s, s_r, weights, ones_mask,
                                   exchange, dtype, cfg.drop_rate, key=k_g1)
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
                rand_out = halo_gnn_forward(
                    pr, gnn, x, s_ext[r_idx], r_loc[r_idx], None,
                    jnp.ones(q_loc, bool), exchange, dtype, cfg.drop_rate,
                    key=k_g2)
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
        out = halo_gnn_forward(pr, gnn, x, s_s, s_r, None, msk, exchange,
                               dtype, cfg.drop_rate, key=k_g1)
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
        pr = params["params"]
        x = hb.x[0]
        s_ext = hb.senders_ext[0]
        r_loc = hb.receivers_loc[0]
        emask = hb.edge_mask[0]
        q_loc = hb.q_loc
        exchange = make_exchange(hb.send_idx[0], hb.round_sizes, axis, d)
        me = jax.lax.axis_index(axis)
        key = jax.random.fold_in(key, me)

        def forward(s, r, w, msk):
            return halo_gnn_forward(pr, gnn, x, s, r, w, msk, exchange,
                                    dtype, cfg.drop_rate, key=None)

        if mode == "full":
            logits = forward(s_ext, r_loc, None, emask)
        else:
            if mode == "learned":
                h = halo_scorer_encode(pr["edge_prob_mlp"], x, s_ext,
                                       r_loc, emask, exchange, dtype,
                                       cfg.edge_mlp_type, cfg.drop_rate)
                probs = halo_score_head(pr["edge_prob_mlp"], h, s_ext,
                                        r_loc, exchange, dtype,
                                        cfg.drop_rate)

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
