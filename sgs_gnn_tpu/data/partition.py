"""Graph partitioning into cluster mini-batches.

The reference partitions big graphs with METIS via PyG ClusterData /
ClusterLoader (reference main.py:57-67; vendored copy in
Notebooks/MetisLoader.ipynb): nodes are split into `num_parts` sets, each
batch is the induced subgraph on one part with relabeled node ids and
inter-cluster edges DROPPED (ClusterData keep_inter_cluster_edges=False) —
partitioned training must reproduce exactly that graph semantics
(SURVEY.md section 7 "Halo exchange correctness").

This module provides:
  * locality-aware node partitioning without METIS: reverse-Cuthill-McKee
    ordering (scipy, C speed) chunked into balanced parts — same contract
    as ClusterData, different (but comparable-quality) partitioner. A
    native C++ greedy-refinement partitioner can plug in via
    `partition_nodes(..., method=...)`.
  * `induced_subgraphs` — build per-part Graph batches, padded to shared
    static shapes so ONE jitted train step serves every batch.
"""
from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..core.graph import Graph
from .priors import degree_prior


def partition_nodes(edge_index: np.ndarray, num_nodes: int, num_parts: int,
                    method: str = "rcm") -> np.ndarray:
    """Assign each node to one of num_parts contiguous clusters.

    'rcm'    — bandwidth-reducing reverse-Cuthill-McKee order, chunked.
    'native' — C++ greedy partitioner (native/partitioner.cpp) if built.
    'random' — shuffled chunking (worst-case baseline).
    Returns int32 part id per node.
    """
    if num_parts <= 1:
        return np.zeros(num_nodes, np.int32)
    if method == "native":
        try:
            from .native_partitioner import greedy_partition
            return greedy_partition(edge_index, num_nodes, num_parts)
        except (ImportError, OSError):
            method = "rcm"
    if method == "rcm":
        a = sp.coo_matrix((np.ones(edge_index.shape[1]),
                           (edge_index[0], edge_index[1])),
                          shape=(num_nodes, num_nodes))
        a = ((a + a.T) > 0).astype(np.int8).tocsr()
        order = sp.csgraph.reverse_cuthill_mckee(a, symmetric_mode=True)
    elif method == "random":
        order = np.random.default_rng(0).permutation(num_nodes)
    else:
        raise ValueError(method)
    part = np.empty(num_nodes, np.int32)
    bounds = np.linspace(0, num_nodes, num_parts + 1).astype(np.int64)
    for p in range(num_parts):
        part[order[bounds[p]:bounds[p + 1]]] = p
    return part


def shape_class_targets(counts, k: int) -> List[int]:
    """Per-partition padded edge targets using at most ``k`` shape classes.

    One global pad shape makes every batch pay the MAX partition's compute
    (valid/padded 0.84 measured on the Reddit-scale workload); classing the
    padded shapes recovers most of that at the cost of k compiled
    executables instead of one. Boundaries minimize sum(class_size *
    class_max) exactly (O(m^2) over the sorted counts — m is the partition
    count, a few hundred at most)."""
    m = len(counts)
    k = max(1, min(k, m))
    order = np.argsort(counts)[::-1]
    c = np.asarray(counts)[order]
    # dp[j][i] = min padded total for the first i partitions with j classes
    INF = float("inf")
    dp = np.full((k + 1, m + 1), INF)
    cut = np.zeros((k + 1, m + 1), np.int64)
    dp[0][0] = 0.0
    for j in range(1, k + 1):
        for i in range(1, m + 1):
            for b in range(j - 1, i):      # previous boundary
                v = dp[j - 1][b] + float(c[b]) * (i - b)
                if v < dp[j][i]:
                    dp[j][i] = v
                    cut[j][i] = b
    # recover boundaries at the best class count <= k
    jbest = int(np.argmin([dp[j][m] for j in range(1, k + 1)])) + 1
    bounds = []
    i = m
    for j in range(jbest, 0, -1):
        bounds.append(int(cut[j][i]))
        i = bounds[-1]
    bounds = bounds[::-1] + [m]
    targets = np.zeros(m, np.int64)
    for a, b in zip(bounds[:-1], bounds[1:]):
        targets[order[a:b]] = c[a]
    return [int(t) for t in targets]


def induced_subgraphs(x, edge_index, y, train_mask, val_mask, test_mask,
                      part: np.ndarray, num_parts: int,
                      pad: bool = True, prior: str = "degree",
                      prior_probs: Optional[np.ndarray] = None,
                      tile_index: bool = False,
                      shape_classes: int = 1) -> List[Graph]:
    """Materialize one Graph per partition: induced subgraph, relabeled
    nodes, inter-cluster edges dropped (ClusterData semantics). With
    pad=True batches share static shapes so jitted steps compile once per
    shape: ``shape_classes=1`` pads every batch to the global max edge
    count; >1 groups partitions into up to that many padded edge-shape
    classes (shape_class_targets) — the driver runs one scan per class.
    Node counts always pad to the global max (feature rows dominate
    neither compute nor memory at cluster scale). The sampling prior is
    recomputed per batch from the batch's own edges — matching the
    reference, whose `batch.prob` is permuted/sliced per cluster by
    ClusterLoader."""
    s_all, r_all = edge_index
    same_part = part[s_all] == part[r_all]
    out = []
    # +1 ghost node: padding edges are self-loops on the ghost so they never
    # touch real nodes, even in layers that ignore edge weights (GIN/GAT)
    max_n = max(int((part == p).sum()) for p in range(num_parts)) + 1
    counts_e = []
    per_part_edges = []
    for p in range(num_parts):
        in_p = same_part & (part[s_all] == p)
        per_part_edges.append(np.where(in_p)[0])
        counts_e.append(len(per_part_edges[-1]))
    pad_targets = shape_class_targets(counts_e, shape_classes) if pad \
        else [None] * num_parts

    for p in range(num_parts):
        nodes = np.where(part == p)[0]
        relabel = -np.ones(len(part), np.int64)
        relabel[nodes] = np.arange(len(nodes))
        eidx = per_part_edges[p]
        s = relabel[s_all[eidx]].astype(np.int32)
        r = relabel[r_all[eidx]].astype(np.int32)
        n_local, e_local = len(nodes), len(eidx)

        xb = x[nodes]
        yb = y[nodes]
        tr, va, te = train_mask[nodes], val_mask[nodes], test_mask[nodes]
        if prior_probs is not None:
            pb = prior_probs[eidx]
            pb = pb / max(pb.sum(), 1e-12)
        elif prior == "degree":
            pb = degree_prior(s, r, n_local)
        else:
            pb = np.full(e_local, 1.0 / max(e_local, 1), np.float32)

        if pad:
            pad_n = max_n - n_local
            xb = np.concatenate([xb, np.zeros((pad_n, x.shape[1]),
                                              x.dtype)])
            yb = np.concatenate([yb, np.zeros(pad_n, y.dtype)])
            tr = np.concatenate([tr, np.zeros(pad_n, bool)])
            va = np.concatenate([va, np.zeros(pad_n, bool)])
            te = np.concatenate([te, np.zeros(pad_n, bool)])
        g = Graph.build(xb, np.stack([s, r]), yb, tr, va, te, prob=pb,
                        num_classes=int(y.max()) + 1,
                        pad_edges_to=pad_targets[p],
                        pad_edge_node=max_n - 1 if pad else 0,
                        sort_by_receiver=True,
                        tile_index=tile_index)
        out.append(g)
    # receiver_band is static under jit: unify to the max so every
    # equal-shape partition shares one compiled step executable (a common
    # band across classes keeps the kernel variants identical too)
    max_band = max(g.receiver_band for g in out)
    out = [g.replace(receiver_band=max_band) for g in out]
    if tile_index:
        # unify tile slot counts WITHIN each padded-edge class (graphs of
        # one class must stack; classes compile separately anyway)
        by_cls = {}
        for i, g in enumerate(out):
            by_cls.setdefault(int(g.senders.shape[0]), []).append(i)
        for idxs in by_cls.values():
            unified = unify_tile_shapes([out[i] for i in idxs])
            for i, g in zip(idxs, unified):
                out[i] = g
    return out


def unify_tile_shapes(graphs: List[Graph]) -> List[Graph]:
    """Pad every partition's tile-pair index (core/graph.py tile_* fields)
    to one shared slot count so all batches hit a single compiled step.

    If ANY partition declined the tile layout (>35% padding overhead,
    ops/score_tiles.build_tile_index), tiles are dropped on all of them —
    a mixed fleet would compile two executables and defeat the point.
    Padding blocks address tile (0, 0) with local ids 0 and invalid flags,
    so they score garbage that the tile-space sampler masks out."""
    if not graphs:
        return graphs
    if any(g.tile_t == 0 for g in graphs):
        return [g.replace(tile_ls=None, tile_lr=None, tile_su=None,
                          tile_rv=None, tile_perm=None, tile_prob=None,
                          tile_mask=None, tile_aux=None, tile_t=0, tile_b=0)
                for g in graphs]
    b = graphs[0].tile_b
    max_ep = max(g.tile_ls.shape[0] for g in graphs)
    out = []
    for g in graphs:
        ep = g.tile_ls.shape[0]
        if ep == max_ep:
            out.append(g)
            continue
        pe = max_ep - ep
        pb = pe // b
        zi = np.zeros(pe, np.int32)

        def cat(a, padv):
            return jnp.asarray(np.concatenate([np.asarray(a), padv]))

        out.append(g.replace(
            tile_ls=cat(g.tile_ls, zi), tile_lr=cat(g.tile_lr, zi),
            tile_su=cat(g.tile_su, np.zeros(pb, np.int32)),
            tile_rv=cat(g.tile_rv, np.zeros(pb, np.int32)),
            tile_perm=cat(g.tile_perm, zi),
            tile_prob=cat(g.tile_prob, np.zeros(pe, np.float32)),
            tile_mask=cat(g.tile_mask, np.zeros(pe, bool)),
            tile_aux=jnp.asarray(np.concatenate(
                [np.asarray(g.tile_aux), np.zeros((pe, 3), np.int32)]))))
    return out
