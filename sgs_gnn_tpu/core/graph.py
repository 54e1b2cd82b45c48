"""Static-shape graph container.

The reference threads a PyG `Data` object (x, edge_index, y, masks, prob, He)
through every layer (reference datasets.py:176-232, training_hybrid.py:29-48).
On TPU everything under jit is traced once with static shapes, so the graph
container is an immutable pytree of fixed-size arrays; variable-size graphs
are padded (``num_edges``/``num_nodes`` record the valid prefix) so that one
compiled step serves every partition of a clustered graph.

Conventions:
  * COO edge list ``senders``/``receivers`` of shape (E,), int32. Messages
    flow sender -> receiver (same as PyG's row -> col, source_to_target).
  * Padding edges point at node index ``num_nodes`` - callers allocate one
    extra "ghost" row so padded edges aggregate into a discarded slot, or use
    ``edge_mask`` to zero contributions.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "senders", "receivers", "y", "train_mask",
                      "val_mask", "test_mask", "prob", "edge_mask",
                      "tile_ls", "tile_lr", "tile_su", "tile_rv",
                      "tile_perm", "tile_prob", "tile_mask",
                      "edge_aux", "tile_aux"],
         meta_fields=["num_classes", "receiver_band", "tile_t", "tile_b"])
@dataclasses.dataclass(frozen=True)
class Graph:
    """One graph (or one cluster partition) with static shapes.

    Mirrors the fields the reference attaches to PyG ``Data``
    (datasets.py:221-227: ``num_classes``, ``He``, ``prob``).

    ``receiver_band`` > 0 declares that ``receivers`` is non-decreasing with
    the given narrow-band bound (ops/scatter_pallas.required_band), enabling
    the banded Pallas scatter in gradient accumulations over the full edge
    list. It is static metadata: two graphs with different bands compile
    separately, so batched partitions should share the max band.
    """

    x: jax.Array            # (N, F) node features
    senders: jax.Array      # (E,) int32 edge sources (row)
    receivers: jax.Array    # (E,) int32 edge destinations (col)
    y: jax.Array            # (N,) int32 labels
    train_mask: jax.Array   # (N,) bool
    val_mask: jax.Array     # (N,) bool
    test_mask: jax.Array    # (N,) bool
    prob: jax.Array         # (E,) float sampling prior (degree or ER)
    edge_mask: jax.Array    # (E,) bool; False on padding edges
    # Optional tile-pair index for the fused full-E score kernel
    # (ops/score_tiles.py): edge slots grouped by (sender-tile,
    # receiver-tile), Ep >= E with padding slots. tile_prob/tile_mask are
    # the prior/mask permuted into tile order so sampling can run entirely
    # in tile space; tile_perm maps winners back to edge ids.
    tile_ls: Optional[jax.Array] = None    # (Ep,) int32 local sender id
    tile_lr: Optional[jax.Array] = None    # (Ep,) int32 local receiver id
    tile_su: Optional[jax.Array] = None    # (nblocks,) int32 sender tile
    tile_rv: Optional[jax.Array] = None    # (nblocks,) int32 receiver tile
    tile_perm: Optional[jax.Array] = None  # (Ep,) int32 original edge id
    tile_prob: Optional[jax.Array] = None  # (Ep,) f32 prior, 0 on padding
    tile_mask: Optional[jax.Array] = None  # (Ep,) bool
    # Packed per-edge aux tables: one (E, 3) int32 row gather replaces the
    # separate senders/receivers/edge_mask/label gathers (per-row DMA cost
    # dominates TPU gathers — tools/microbench_gather.py). Columns:
    # [sender, receiver, flags] with flags bit0 = both endpoints train,
    # bit1 = same label (reg1's static edge labels), bit2 = valid (edge_mask).
    edge_aux: Optional[jax.Array] = None   # (E, 3) int32, edge order
    tile_aux: Optional[jax.Array] = None   # (Ep, 3) int32, tile order
    num_classes: int = 0
    receiver_band: int = 0  # 0 = receivers not known to be sorted
    tile_t: int = 0         # tile rows (0 = no tile index)
    tile_b: int = 0         # edges per kernel block

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def edge_index(self) -> jax.Array:
        """(2, E) stacked COO, PyG-style."""
        return jnp.stack([self.senders, self.receivers])

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)

    @staticmethod
    def build(x, edge_index, y, train_mask=None, val_mask=None,
              test_mask=None, prob=None, num_classes: Optional[int] = None,
              pad_edges_to: Optional[int] = None,
              pad_edge_node: int = 0,
              sort_by_receiver: bool = False,
              tile_index: bool = False,
              tile_t: int = 128, tile_b: int = 512) -> "Graph":
        """Construct from host numpy arrays, optionally padding the edge list.

        Padding edges are self-loops on ``pad_edge_node`` with
        ``edge_mask=False`` and zero prior probability. Callers that pad
        should point them at a dedicated ghost node (all-zero features,
        all masks False) so full-edge forwards through layers that ignore
        edge weights (GIN/GAT) never mix padding into real aggregations.

        ``sort_by_receiver`` stably reorders the edge list by destination
        (all per-edge arrays permuted together — semantics are edge-order
        invariant) and records ``receiver_band`` so scatter-adds over the
        full edge list take the banded Pallas fast path (PERF.md).
        """
        x = np.asarray(x, dtype=np.float32)
        edge_index = np.asarray(edge_index, dtype=np.int32)
        n, e = x.shape[0], edge_index.shape[1]
        y = np.asarray(y, dtype=np.int32).reshape(-1)
        if num_classes is None:
            num_classes = int(y.max()) + 1 if y.size else 0
        zeros = np.zeros(n, dtype=bool)
        train_mask = zeros if train_mask is None else np.asarray(train_mask, bool)
        val_mask = zeros if val_mask is None else np.asarray(val_mask, bool)
        test_mask = zeros if test_mask is None else np.asarray(test_mask, bool)
        if prob is None:
            prob = np.full(e, 1.0 / max(e, 1), dtype=np.float32)
        prob = np.asarray(prob, dtype=np.float32)

        edge_mask = np.ones(e, dtype=bool)
        if pad_edges_to is not None and pad_edges_to > e:
            pad = pad_edges_to - e
            edge_index = np.concatenate(
                [edge_index,
                 np.full((2, pad), pad_edge_node, dtype=np.int32)], axis=1)
            prob = np.concatenate([prob, np.zeros(pad, dtype=np.float32)])
            edge_mask = np.concatenate([edge_mask, np.zeros(pad, dtype=bool)])

        receiver_band = 0
        if sort_by_receiver and edge_index.shape[1]:
            from ..ops.scatter_pallas import required_band
            order = np.argsort(edge_index[1], kind="stable")
            edge_index = edge_index[:, order]
            prob = prob[order]
            edge_mask = edge_mask[order]
            receiver_band = required_band(edge_index[1])

        # packed per-edge aux table (see field docstring): static across
        # training since y/train_mask are fixed
        s_, r_ = edge_index[0], edge_index[1]
        both_train = train_mask[s_] & train_mask[r_]
        same_label = y[s_] == y[r_] if y.size else np.zeros(e, bool)
        flags = (both_train.astype(np.int32)
                 | (same_label.astype(np.int32) << 1)
                 | (edge_mask.astype(np.int32) << 2))
        edge_aux = np.stack([s_, r_, flags], axis=1).astype(np.int32)

        tiles = {}
        t_meta = b_meta = 0
        if tile_index and edge_index.shape[1]:
            from ..ops.score_tiles import build_tile_index
            ti = build_tile_index(edge_index[0], edge_index[1], n,
                                  t=tile_t, b=tile_b)
            if ti is not None:
                tmask = ti.valid & edge_mask[ti.perm]
                tile_aux = edge_aux[ti.perm]
                tile_aux[:, 2] = (tile_aux[:, 2] & 3) | \
                    (tmask.astype(np.int32) << 2)
                tiles = dict(
                    tile_ls=jnp.asarray(ti.ls),
                    tile_lr=jnp.asarray(ti.lr),
                    tile_su=jnp.asarray(ti.su),
                    tile_rv=jnp.asarray(ti.rv),
                    tile_perm=jnp.asarray(ti.perm),
                    tile_prob=jnp.asarray(
                        np.where(ti.valid, prob[ti.perm], 0.0).astype(
                            np.float32)),
                    tile_mask=jnp.asarray(tmask),
                    tile_aux=jnp.asarray(tile_aux),
                )
                t_meta, b_meta = ti.t, ti.b

        return Graph(
            tile_t=t_meta,
            tile_b=b_meta,
            edge_aux=jnp.asarray(edge_aux),
            **tiles,
            x=jnp.asarray(x),
            senders=jnp.asarray(edge_index[0]),
            receivers=jnp.asarray(edge_index[1]),
            y=jnp.asarray(y),
            train_mask=jnp.asarray(train_mask),
            val_mask=jnp.asarray(val_mask),
            test_mask=jnp.asarray(test_mask),
            prob=jnp.asarray(prob),
            edge_mask=jnp.asarray(edge_mask),
            num_classes=int(num_classes),
            receiver_band=int(receiver_band),
        )


def edge_homophily(senders, receivers, y, edge_mask=None) -> jax.Array:
    """Fraction of edges whose endpoints share a label.

    TPU-native replacement for ``torch_geometric.utils.homophily(...,
    method='edge')`` used at reference datasets.py:222.
    """
    same = (y[senders] == y[receivers]).astype(jnp.float32)
    if edge_mask is not None:
        m = edge_mask.astype(jnp.float32)
        return jnp.sum(same * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(same)
