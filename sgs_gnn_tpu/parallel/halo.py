"""Halo-exchange partitioned SpMM: message passing ACROSS partitions.

The reference's cluster batching DROPS inter-cluster edges (ClusterData
keep_inter_cluster_edges=False; SURVEY.md section 7 "Halo exchange
correctness"), which parallel/partitioned.py reproduces for numerical
parity. This module is the superset mode: each device owns a node shard
plus ALL edges arriving at its nodes; sender features living on other
devices ("halo" nodes) are exchanged over ICI before local aggregation, so
partitioned execution computes exactly the full-graph SpMM.

v1 exchange strategy: `all_gather` of the node-feature shards (simple,
correct, bandwidth 2x optimal on a ring); the per-pair halo-table
`ppermute` overlap is the documented upgrade path. Edge tables are static
per partition (built once on host), so the whole step jits cleanly.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


class HaloPartition(NamedTuple):
    """Static per-device tables for halo-exchange aggregation.

    node_map[d]   : global ids of device d's nodes (padded with -1)
    senders_glob  : per device, global sender id of each incoming edge
    receivers_loc : per device, LOCAL receiver index of each incoming edge
    edge_mask     : per device, validity of each (padded) edge slot
    """
    node_map: np.ndarray       # (D, N_loc)
    senders_glob: np.ndarray   # (D, E_loc)
    receivers_loc: np.ndarray  # (D, E_loc)
    edge_mask: np.ndarray      # (D, E_loc)
    num_nodes: int


def build_halo_partition(edge_index: np.ndarray, part: np.ndarray,
                         num_parts: int) -> HaloPartition:
    """Host-side one-time table construction. Node shards are padded to the
    max shard size; per-device edge lists (ALL inbound edges, including
    inter-partition ones) are padded to the max inbound count."""
    n = len(part)
    s_all, r_all = edge_index
    nodes = [np.where(part == p)[0] for p in range(num_parts)]
    n_loc = max(len(v) for v in nodes)
    local_of = -np.ones(n, np.int64)
    for p in range(num_parts):
        local_of[nodes[p]] = np.arange(len(nodes[p]))

    edge_sets = [np.where(part[r_all] == p)[0] for p in range(num_parts)]
    e_loc = max(len(v) for v in edge_sets)

    node_map = np.full((num_parts, n_loc), -1, np.int32)
    senders = np.zeros((num_parts, e_loc), np.int32)
    receivers = np.zeros((num_parts, e_loc), np.int32)
    emask = np.zeros((num_parts, e_loc), bool)
    for p in range(num_parts):
        node_map[p, :len(nodes[p])] = nodes[p]
        eidx = edge_sets[p]
        senders[p, :len(eidx)] = s_all[eidx]
        receivers[p, :len(eidx)] = local_of[r_all[eidx]]
        emask[p, :len(eidx)] = True
    return HaloPartition(node_map, senders, receivers, emask, n)


def shard_features(x: np.ndarray, hp: HaloPartition) -> np.ndarray:
    """(D, N_loc, F) feature shards following the node map (padded zeros)."""
    d, n_loc = hp.node_map.shape
    out = np.zeros((d, n_loc, x.shape[1]), x.dtype)
    for p in range(d):
        valid = hp.node_map[p] >= 0
        out[p, valid] = x[hp.node_map[p][valid]]
    return out


def make_halo_spmm(hp: HaloPartition, mesh: Mesh, axis: str = "data"):
    """Returns jitted ``halo_spmm(x_shards, weight_shards) -> y_shards``
    computing the full-graph weighted SpMM with partitioned storage.

    x_shards: (D, N_loc, F) sharded over `axis`. weights per local edge
    (D, E_loc). Output matches x_shards layout.
    """
    d, n_loc = hp.node_map.shape
    if mesh.devices.size != d:
        raise ValueError(
            f"halo partition built for {d} devices but mesh has "
            f"{mesh.devices.size} — with fewer devices the all-gather "
            f"silently mis-shapes; rebuild the partition or the mesh")
    node_map = jnp.asarray(hp.node_map)
    senders = jnp.asarray(hp.senders_glob)
    receivers = jnp.asarray(hp.receivers_loc)
    emask = jnp.asarray(hp.edge_mask)

    # global -> (device, local) lookup built once: global_local[g] = flat
    # index into the all-gathered (D*N_loc, F) feature matrix
    flat_of_global = np.zeros(hp.num_nodes, np.int32)
    for p in range(d):
        valid = hp.node_map[p] >= 0
        flat_of_global[hp.node_map[p][valid]] = (
            p * n_loc + np.arange(n_loc)[valid]).astype(np.int32)
    flat_of_global = jnp.asarray(flat_of_global)

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def halo_spmm(x_shards, w_shards):
        me = jax.lax.axis_index(axis)
        x_local = x_shards[0]                      # (N_loc, F)
        w_local = w_shards[0]                      # (E_loc,)
        # halo exchange: gather every shard's features over ICI
        x_all = jax.lax.all_gather(x_local, axis)  # (D, N_loc, F)
        x_flat = x_all.reshape(d * n_loc, -1)
        s = senders[me]
        r = receivers[me]
        m = emask[me].astype(x_flat.dtype)
        msgs = x_flat[flat_of_global[s]] * (w_local * m)[:, None]
        y = jax.ops.segment_sum(msgs, r, num_segments=n_loc)
        return y[None]

    return halo_spmm
