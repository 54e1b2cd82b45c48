"""Halo-exchange partitioned SpMM: full-graph numerical equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.data import sbm_graph, to_undirected, partition_nodes
from sgs_gnn_tpu.parallel import make_mesh
from sgs_gnn_tpu.parallel.halo import (build_halo_partition, shard_features,
                                       make_halo_spmm)
from sgs_gnn_tpu.ops import spmm_xla


def test_halo_spmm_matches_full_graph():
    n, f, d = 256, 32, 8
    x, ei, y, _ = sbm_graph(n=n, num_classes=4, deg=8, h=0.6, feat_dim=f,
                            seed=0)
    ei = to_undirected(ei)
    e = ei.shape[1]
    rng = np.random.default_rng(0)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)

    part = partition_nodes(ei, n, d)
    hp = build_halo_partition(ei, part, d)
    # check every edge is represented exactly once
    assert hp.edge_mask.sum() == e

    mesh = make_mesh(d)
    halo_spmm = make_halo_spmm(hp, mesh)

    x_sh = jnp.asarray(shard_features(x, hp))
    # per-device edge weights following the same edge layout
    w_sh = np.zeros(hp.senders_glob.shape, np.float32)
    # reconstruct: edges assigned to device p are those with receiver in p,
    # in np.where order — mirror build_halo_partition's ordering
    s_all, r_all = ei
    for p in range(d):
        eidx = np.where(part[r_all] == p)[0]
        w_sh[p, :len(eidx)] = w[eidx]
    y_sh = halo_spmm(x_sh, jnp.asarray(w_sh))

    expected = np.asarray(spmm_xla(jnp.asarray(ei[0]), jnp.asarray(ei[1]),
                                   jnp.asarray(w), jnp.asarray(x), n))
    got = np.zeros_like(expected)
    y_np = np.asarray(y_sh)
    for p in range(d):
        valid = hp.node_map[p] >= 0
        got[hp.node_map[p][valid]] = y_np[p][valid]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)
