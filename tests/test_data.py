"""Data layer: priors, transforms, synthetic generators, partitioning."""
import numpy as np
import pytest

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.data import (degree_prior, effective_resistance_exact,
                              effective_resistance_rw, sbm_graph, moon_graph,
                              karate_club, to_undirected, edge_homophily,
                              train_val_test_masks, partition_nodes,
                              induced_subgraphs, get_dataset,
                              rewire_to_homophily)


def test_degree_prior_normalized_and_inverse_degree(rng):
    # undirected star + one leaf-leaf edge: for undirected graphs the
    # formula reduces to 1/(deg[s]+deg[r]); hub edges get LOWER probability
    n = 11
    hub_s = np.concatenate([np.zeros(n - 1), np.arange(1, n)])
    hub_r = np.concatenate([np.arange(1, n), np.zeros(n - 1)])
    extra_s, extra_r = np.array([1, 2]), np.array([2, 1])
    ss = np.concatenate([hub_s, extra_s]).astype(np.int32)
    rr = np.concatenate([hub_r, extra_r]).astype(np.int32)
    p = degree_prior(ss, rr, n)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-5)
    assert p[-1] > p[0]  # leaf-leaf edge more probable than hub edge


def test_er_exact_path_graph():
    # path graph 0-1-2: ER of each unit edge is 1, end-to-end would be 2
    s = np.array([0, 1, 1, 2], np.int32)
    r = np.array([1, 0, 2, 1], np.int32)
    er = effective_resistance_exact(s, r, 3)
    np.testing.assert_allclose(er, 1.0, atol=1e-6)


def test_er_rw_correlates_with_exact(rng):
    # ER estimator should rank a bridge edge above in-cluster edges
    x, ei, y, _ = sbm_graph(n=60, num_classes=2, deg=8, h=0.95, seed=1)
    ei = to_undirected(ei)
    exact = effective_resistance_exact(ei[0], ei[1], 60)
    est = effective_resistance_rw(ei[0], ei[1], 60, seed=0)
    # positive rank correlation
    from scipy.stats import spearmanr
    rho, _ = spearmanr(exact, est)
    assert rho > 0.3, rho


def test_to_undirected_coalesces():
    ei = np.array([[0, 1, 0], [1, 0, 1]], np.int32)  # dup edge 0->1
    und = to_undirected(ei)
    assert und.shape[1] == 2  # {0->1, 1->0}
    pairs = set(map(tuple, und.T.tolist()))
    assert pairs == {(0, 1), (1, 0)}


def test_rewire_hits_target_homophily(rng):
    y = rng.integers(0, 4, 500).astype(np.int32)
    for h in (0.1, 0.5, 0.9):
        ei = rewire_to_homophily(y, 20, h, rng)
        he = edge_homophily(ei, y)
        assert abs(he - h) < 0.1, (h, he)


def test_masks_deterministic_and_disjoint():
    tr1, va1, te1 = train_val_test_masks(100, 0.2, 0.4, 0.4)
    tr2, va2, te2 = train_val_test_masks(100, 0.2, 0.4, 0.4)
    np.testing.assert_array_equal(tr1, tr2)
    assert tr1.sum() == 20 and va1.sum() == 40 and te1.sum() == 40
    assert not (tr1 & va1).any() and not (va1 & te1).any()


def test_karate_and_moon_fixtures():
    x, ei, y, (tr, va, te) = karate_club()
    assert x.shape == (34, 34) and ei.shape[1] == 156
    assert tr.sum() == 4
    x, ei, y, (tr, va, te) = moon_graph(200, 6, 0.3, seed=0)
    assert x.shape == (200, 2)
    he = edge_homophily(ei, y)
    assert he < 0.7  # low-homophily fixture


def test_partition_preserves_intra_edges_and_pads(rng):
    x, ei, y, (tr, va, te) = sbm_graph(n=300, num_classes=3, deg=10, h=0.8,
                                       seed=0)
    ei = to_undirected(ei)
    part = partition_nodes(ei, 300, 4)
    assert part.shape == (300,) and set(part) == {0, 1, 2, 3}
    graphs = induced_subgraphs(x, ei, y, tr, va, te, part, 4)
    # all batches share static shapes
    shapes = {(g.num_nodes, g.num_edges) for g in graphs}
    assert len(shapes) == 1
    # total valid edges == intra-partition edges
    same = part[ei[0]] == part[ei[1]]
    total_valid = sum(int(np.asarray(g.edge_mask).sum()) for g in graphs)
    assert total_valid == int(same.sum())
    # node coverage: total valid (unpadded) nodes = 300
    # ghost node: padded edges are self-loops on the last node, masks False
    for g in graphs:
        em = np.asarray(g.edge_mask)
        if (~em).any():
            s = np.asarray(g.senders)[~em]
            assert (s == g.num_nodes - 1).all()
        assert not bool(np.asarray(g.train_mask)[-1])


def test_registry_synthetic_and_missing(tmp_path):
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "SyntheticSBM")
    assert ds.num_nodes == 2000 and ds.num_classes == 5
    assert abs(ds.prob.sum() - 1.0) < 1e-4
    assert 0.0 < ds.He < 1.0
    # undirected after prep
    pairs = set(map(tuple, ds.edge_index.T.tolist()))
    assert all((b, a) in pairs for a, b in list(pairs)[:50])

    with pytest.raises(FileNotFoundError, match="no network"):
        get_dataset(cfg, "Reddit")


def test_registry_npz_roundtrip(tmp_path):
    x, ei, y, (tr, va, te) = sbm_graph(n=100, num_classes=3, deg=6, seed=2)
    np.savez(tmp_path / "Tolokers.npz", x=x, edge_index=ei, y=y,
             train_mask=tr, val_mask=va, test_mask=te)
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "Tolokers")
    assert ds.num_nodes == 100
    assert ds.train_mask.sum() == tr.sum()


def test_registry_multisplit_mask_column(tmp_path):
    x, ei, y, (tr, va, te) = sbm_graph(n=50, num_classes=2, deg=4, seed=3)
    multi = np.stack([tr, va, te], axis=1)  # [N, 3] split matrix
    np.savez(tmp_path / "Roman-empire.npz", x=x, edge_index=ei, y=y,
             train_mask=multi, val_mask=multi, test_mask=multi)
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "Roman-empire")
    # column 2 selected (reference datasets.py:211-216)
    np.testing.assert_array_equal(ds.train_mask, te)


def test_registry_edge_attr_feature_init(tmp_path, rng):
    # ogbn-proteins-style: no x, node features = scatter-sum of edge attrs
    n, e = 10, 40
    ei = rng.integers(0, n, (2, e)).astype(np.int32)
    ea = np.ones((e, 3), np.float32)
    y = rng.integers(0, 2, n).astype(np.int32)
    np.savez(tmp_path / "ogbn-proteins.npz", edge_index=ei, edge_attr=ea, y=y)
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "ogbn-proteins")
    assert ds.x.shape == (n, 3)
    np.testing.assert_allclose(ds.x.sum(), e * 3)  # all edge attrs summed in


def test_registry_fb100_mat(tmp_path, rng):
    # Facebook100 .mat convention (LINKXDataset._process_facebook)
    import scipy.io
    import scipy.sparse as sp
    n = 20
    a = sp.random(n, n, density=0.2, random_state=1, dtype=np.float64)
    a = ((a + a.T) > 0).astype(np.float64)
    # local_info columns: [status, gender, major, minor, dorm, year, school]
    meta = np.column_stack([
        rng.integers(1, 3, n), rng.integers(0, 3, n),  # gender 0..2 -> y -1..1
        rng.integers(1, 4, n), rng.integers(0, 2, n),
        rng.integers(1, 5, n), rng.integers(2005, 2008, n),
        np.full(n, 7),
    ]).astype(np.float64)
    scipy.io.savemat(tmp_path / "reed98.mat", {"A": sp.csr_matrix(a),
                                               "local_info": meta})
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "reed98")  # also exercises the SVD augmentation
    assert ds.num_nodes == n
    assert set(np.unique(ds.y)) <= {-1, 0, 1}
    # one-hot blocks: column sums over each block are all-n
    assert ds.train_mask.sum() > 0


def test_registry_geom_gcn_text(tmp_path):
    # geom-gcn out1_* convention (WebKB/Actor raw files)
    n = 12
    d = tmp_path / "texas"
    d.mkdir()
    (d / "out1_graph_edges.txt").write_text(
        "src\tdst\n" + "".join(f"{i}\t{(i + 1) % n}\n" for i in range(n)))
    (d / "out1_node_feature_label.txt").write_text(
        "id\tfeat\tlabel\n" + "".join(
            f"{i}\t{i},0,2\t{i % 2}\n" for i in range(n)))
    cfg = Config(data_dir=str(tmp_path))
    ds = get_dataset(cfg, "texas")
    assert ds.num_nodes == n and ds.x.shape == (n, 3)
    np.testing.assert_array_equal(ds.x[2], [2, 0, 2])
    assert ds.num_classes == 2

    # film/Actor variant: feature column is keyword indices into a binary vec
    d2 = tmp_path / "film"
    d2.mkdir()
    (d2 / "out1_graph_edges.txt").write_text(
        "src\tdst\n" + "".join(f"{i}\t{(i + 1) % n}\n" for i in range(n)))
    (d2 / "out1_node_feature_label.txt").write_text(
        "id\tfeat\tlabel\n" + "".join(
            f"{i}\t{i},{i + 2}\t{i % 3}\n" for i in range(n)))
    ds2 = get_dataset(cfg, "film")
    assert ds2.x.shape[1] == 932  # Actor keyword-vocabulary floor
    assert ds2.x[1, 3] == 1.0 and ds2.x[0, 3] == 0.0


def test_node_homophily_and_assortativity(rng):
    from sgs_gnn_tpu.data import node_homophily, assortativity
    # perfect homophily: two disconnected same-label cliques
    ei = np.array([[0, 1, 2, 3], [1, 0, 3, 2]], np.int32)
    y = np.array([0, 0, 1, 1], np.int32)
    assert node_homophily(ei, y, 4) == 1.0
    y2 = np.array([0, 1, 0, 1], np.int32)
    assert node_homophily(ei, y2, 4) == 0.0
    # star graph is disassortative (hub high degree <-> leaves degree 1)
    n = 12
    s = np.concatenate([np.zeros(n - 1), np.arange(1, n)]).astype(np.int32)
    r = np.concatenate([np.arange(1, n), np.zeros(n - 1)]).astype(np.int32)
    assert assortativity(np.stack([s, r]), n) < 0


def test_unify_tile_shapes_pads_to_common_shape():
    """Partitioned batches with tile indexes must share one tile-slot shape
    (single compiled step); padding blocks must be masked out of sampling."""
    import jax.numpy as jnp
    from sgs_gnn_tpu.core.graph import Graph
    from sgs_gnn_tpu.data.partition import unify_tile_shapes
    rng = np.random.default_rng(3)

    def dense_part(n, e, seed):
        r2 = np.random.default_rng(seed)
        s = r2.integers(0, n, e).astype(np.int32)
        r = r2.integers(0, n, e).astype(np.int32)
        x = r2.normal(size=(n, 8)).astype(np.float32)
        y = r2.integers(0, 3, n).astype(np.int32)
        return Graph.build(x, np.stack([s, r]), y, num_classes=3,
                           tile_index=True, tile_t=64, tile_b=128)

    g1 = dense_part(128, 4000, 1)
    g2 = dense_part(128, 2500, 2)
    assert g1.tile_t == 64 and g2.tile_t == 64
    out = unify_tile_shapes([g1, g2])
    ep = out[0].tile_ls.shape[0]
    assert all(g.tile_ls.shape[0] == ep for g in out)
    assert all(g.tile_su.shape[0] == ep // 128 for g in out)
    for g, orig in zip(out, (g1, g2)):
        e0 = orig.tile_ls.shape[0]
        # padding slots are invalid + zero prior
        assert not bool(jnp.any(g.tile_mask[e0:]))
        assert float(jnp.sum(g.tile_prob[e0:])) == 0.0
        assert not bool(jnp.any((g.tile_aux[e0:, 2] & 4) > 0))
        # original slots untouched
        np.testing.assert_array_equal(np.asarray(g.tile_perm[:e0]),
                                      np.asarray(orig.tile_perm))

    # one partition declining drops tiles everywhere (single executable)
    g3 = g1.replace(tile_ls=None, tile_lr=None, tile_su=None, tile_rv=None,
                    tile_perm=None, tile_prob=None, tile_mask=None,
                    tile_aux=None, tile_t=0, tile_b=0)
    out2 = unify_tile_shapes([g1, g3])
    assert all(g.tile_t == 0 and g.tile_ls is None for g in out2)


def test_planetoid_raw_loader(tmp_path):
    """Format-faithful synthetic ind.* fixture through the registry loader
    (reference PyG Planetoid assembly used at datasets.py:52): pickled scipy
    matrices, one-hot labels, permuted contiguous test.index — checks the
    test-row permutation, masks, and feature placement."""
    import pickle
    import scipy.sparse as sp
    from sgs_gnn_tpu.data.registry import _load_planetoid_raw

    rng = np.random.default_rng(5)
    n_tr, n_allx, n_te, f, c = 10, 50, 20, 8, 3
    n = n_allx + n_te
    allx = rng.random((n_allx, f)).astype(np.float32)
    tx = rng.random((n_te, f)).astype(np.float32)
    ally = np.eye(c, dtype=np.int32)[rng.integers(0, c, n_allx)]
    ty = np.eye(c, dtype=np.int32)[rng.integers(0, c, n_te)]
    # Planetoid test indices: a PERMUTED contiguous range [n_allx, n)
    test_idx = rng.permutation(np.arange(n_allx, n))
    graph = {i: [int(v) for v in rng.integers(0, n, 3)] for i in range(n)}

    raw = tmp_path / "raw"
    raw.mkdir()
    blobs = {"x": sp.csr_matrix(allx[:n_tr]), "tx": sp.csr_matrix(tx),
             "allx": sp.csr_matrix(allx), "y": ally[:n_tr], "ty": ty,
             "ally": ally, "graph": graph}
    for suffix, obj in blobs.items():
        with open(raw / f"ind.cora.{suffix}", "wb") as fh:
            pickle.dump(obj, fh)
    with open(raw / "ind.cora.test.index", "w") as fh:
        fh.write("\n".join(str(i) for i in test_idx))

    x, ei, y, masks = _load_planetoid_raw(str(raw), "cora")
    assert x.shape == (n, f) and y.shape == (n,)
    # tx row j belongs to node test_idx[j]; allx rows stay in place
    np.testing.assert_allclose(x[:n_allx], allx, rtol=1e-6)
    for j, node in enumerate(test_idx):
        np.testing.assert_allclose(x[node], tx[j], rtol=1e-6)
        assert y[node] == int(ty[j].argmax())
    np.testing.assert_array_equal(y[:n_allx], ally.argmax(1))
    tr, va, te = (masks["train_mask"], masks["val_mask"],
                  masks["test_mask"])
    assert tr[:n_tr].all() and not tr[n_tr:].any()
    assert va[n_tr:n_tr + min(500, n - n_tr)].any()
    assert te[test_idx].all() and te.sum() == n_te
    # edges come straight from the graph dict
    assert ei.shape[0] == 2 and ei.shape[1] == 3 * n


def test_planetoid_raw_through_registry(tmp_path):
    """SmallCora resolves to the Planetoid raw dir through get_dataset."""
    import pickle
    import scipy.sparse as sp
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.data.registry import get_dataset

    rng = np.random.default_rng(6)
    n_allx, n_te, f, c = 30, 10, 4, 2
    n = n_allx + n_te
    raw = tmp_path / "SmallCora" / "raw"
    raw.mkdir(parents=True)
    allx = sp.csr_matrix(rng.random((n_allx, f)).astype(np.float32))
    tx = sp.csr_matrix(rng.random((n_te, f)).astype(np.float32))
    ally = np.eye(c, dtype=np.int32)[rng.integers(0, c, n_allx)]
    ty = np.eye(c, dtype=np.int32)[rng.integers(0, c, n_te)]
    graph = {i: [int((i + 1) % n), int((i + 2) % n)] for i in range(n)}
    blobs = {"x": allx[:5], "tx": tx, "allx": allx, "y": ally[:5],
             "ty": ty, "ally": ally, "graph": graph}
    for suffix, obj in blobs.items():
        with open(raw / f"ind.cora.{suffix}", "wb") as fh:
            pickle.dump(obj, fh)
    with open(raw / "ind.cora.test.index", "w") as fh:
        fh.write("\n".join(str(i) for i in range(n_allx, n)))

    ds = get_dataset(Config(dataset="SmallCora", data_dir=str(tmp_path)))
    assert ds.num_nodes == n and ds.num_classes == c
    assert ds.train_mask.sum() == 5 and ds.test_mask.sum() == n_te
    assert ds.prob.shape == (ds.num_edges,)


def test_linkx_tensor_loader(tmp_path):
    """LINKXdataset/<name>/{x,edge_index,y}.pt convention (reference
    Dataset.ipynb cell 7 LINKXpyg2) incl. the 0.6/0.2/0.2 split and
    negative-label shift."""
    import torch
    from sgs_gnn_tpu.data.vendored import try_load_vendored

    rng = np.random.default_rng(7)
    n, e, f = 40, 120, 6
    d = tmp_path / "LINKXdataset" / "pokec"
    d.mkdir(parents=True)
    x = rng.random((n, f)).astype(np.float32)
    ei = rng.integers(0, n, (2, e)).astype(np.int64)
    y = rng.integers(-1, 3, n).astype(np.int64)  # -1 = unlabeled
    torch.save(torch.tensor(x), d / "x.pt")
    torch.save(torch.tensor(ei), d / "edge_index.pt")
    torch.save(torch.tensor(y), d / "y.pt")

    out = try_load_vendored(str(tmp_path), "pokec")
    assert out is not None
    x2, ei2, y2, masks = out
    np.testing.assert_allclose(x2, x, rtol=1e-6)
    np.testing.assert_array_equal(ei2, ei.astype(np.int32))
    np.testing.assert_array_equal(y2, (y - y.min()).astype(np.int32))
    tr, va, te = (masks["train_mask"], masks["val_mask"],
                  masks["test_mask"])
    assert tr.sum() + va.sum() + te.sum() == n
    assert abs(tr.sum() / n - 0.6) < 0.1


def test_graphsaint_loader(tmp_path):
    """Reddit2/GraphSAINT raw convention (reference RedditTwo.ipynb
    Reddit2.process): CSR adj_full.npz + feats.npy + class_map.json +
    role.json."""
    import json as js
    import scipy.sparse as sp
    from sgs_gnn_tpu.data.vendored import try_load_vendored

    rng = np.random.default_rng(8)
    n, f, c = 30, 5, 4
    adj = sp.random(n, n, density=0.2, format="csr",
                    random_state=3, dtype=np.float64)
    d = tmp_path / "Reddit2" / "raw"
    d.mkdir(parents=True)
    np.savez(d / "adj_full.npz", data=adj.data, indices=adj.indices,
             indptr=adj.indptr, shape=np.array(adj.shape))
    x = rng.random((n, f)).astype(np.float32)
    np.save(d / "feats.npy", x)
    y = rng.integers(0, c, n)
    with open(d / "class_map.json", "w") as fh:
        js.dump({str(i): int(y[i]) for i in range(n)}, fh)
    perm = rng.permutation(n)
    role = {"tr": perm[:20].tolist(), "va": perm[20:25].tolist(),
            "te": perm[25:].tolist()}
    with open(d / "role.json", "w") as fh:
        js.dump(role, fh)

    out = try_load_vendored(str(tmp_path), "Reddit2")
    assert out is not None
    x2, ei2, y2, masks = out
    coo = adj.tocoo()
    np.testing.assert_array_equal(ei2[0], coo.row.astype(np.int32))
    np.testing.assert_array_equal(ei2[1], coo.col.astype(np.int32))
    np.testing.assert_allclose(x2, x, rtol=1e-6)
    np.testing.assert_array_equal(y2, y.astype(np.int32))
    assert masks["train_mask"].sum() == 20
    assert masks["val_mask"].sum() == 5
    assert masks["test_mask"].sum() == 5
    assert not (masks["train_mask"] & masks["test_mask"]).any()


def test_reddit_subsample_registry_path(tmp_path):
    """Reddit0.x resolves through the registry against a cached Reddit npz
    (reference RedditSynthetic per-node subsampling, Dataset.ipynb cell 11):
    keeps ~x of the edges, biased toward homophilic ones."""
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.data.registry import get_dataset

    rng = np.random.default_rng(9)
    n, e, f, c = 80, 1200, 6, 4
    x = rng.random((n, f)).astype(np.float32)
    ei = rng.integers(0, n, (2, e)).astype(np.int32)
    y = rng.integers(0, c, n).astype(np.int32)
    np.savez(tmp_path / "Reddit.npz", x=x, edge_index=ei, y=y)

    full = get_dataset(Config(dataset="Reddit", data_dir=str(tmp_path)))
    sub = get_dataset(Config(dataset="Reddit0.5", data_dir=str(tmp_path)))
    assert sub.num_nodes == n
    # subsample happens pre-undirected: 0.5 of raw edges survive, then
    # symmetrization; the result must be substantially smaller
    assert sub.num_edges < full.num_edges
    # homophily bias (h=0.9): kept fraction must skew homophilic
    he_full, he_sub = full.He, sub.He
    assert he_sub > he_full


def test_ogb_mag_tensor_dir_loader(tmp_path):
    """<data_dir>/OGB_MAG/{x,edge_index,y,*_mask}.pt convention (reference
    Dataset.ipynb OGB_MAG branch: paper.x / paper-cites-paper edges /
    official paper split masks wrapped in OGB_MAGcustom)."""
    import torch
    from sgs_gnn_tpu.data.vendored import try_load_vendored

    rng = np.random.default_rng(11)
    n, e, f = 30, 90, 8
    d = tmp_path / "OGB_MAG"
    d.mkdir(parents=True)
    x = rng.random((n, f)).astype(np.float32)
    ei = rng.integers(0, n, (2, e)).astype(np.int64)
    y = rng.integers(0, 5, n).astype(np.int64)
    tr = np.zeros(n, bool); tr[: n // 2] = True
    va = np.zeros(n, bool); va[n // 2: 3 * n // 4] = True
    te = ~(tr | va)
    torch.save(torch.tensor(x), d / "x.pt")
    torch.save(torch.tensor(ei), d / "edge_index.pt")
    torch.save(torch.tensor(y), d / "y.pt")
    torch.save(torch.tensor(tr), d / "train_mask.pt")
    torch.save(torch.tensor(va), d / "val_mask.pt")
    torch.save(torch.tensor(te), d / "test_mask.pt")

    out = try_load_vendored(str(tmp_path), "OGB_MAG")
    assert out is not None
    x2, ei2, y2, masks = out
    np.testing.assert_allclose(x2, x, rtol=1e-6)
    np.testing.assert_array_equal(ei2, ei.astype(np.int32))
    np.testing.assert_array_equal(y2, y.astype(np.int32))
    # official masks must ride through verbatim (not regenerated)
    np.testing.assert_array_equal(masks["train_mask"], tr)
    np.testing.assert_array_equal(masks["val_mask"], va)
    np.testing.assert_array_equal(masks["test_mask"], te)
    # config validation admits the vendored directory for names
    # outside the CLI's DATASETS list
    Config(dataset="OGB_MAG", data_dir=str(tmp_path)).validate()
    ds = get_dataset(Config(dataset="OGB_MAG", data_dir=str(tmp_path)))
    assert ds.num_nodes == n
    assert ds.train_mask.sum() == tr.sum()


def test_community_sbm_graph_properties():
    """Reddit-shaped generator (VERDICT r3 #2): target homophily, community
    locality (so a partitioner can retain most edges), right shapes."""
    from sgs_gnn_tpu.data.synthetic import community_sbm_graph
    n, communities = 4000, 16
    x, ei, y, (tr, va, te) = community_sbm_graph(
        n=n, num_classes=7, communities=communities, deg=20, h=0.9,
        p_local=0.85, feat_dim=32, seed=0)
    assert x.shape == (n, 32) and y.shape == (n,)
    assert ei.min() >= 0 and ei.max() < n
    assert not (ei[0] == ei[1]).any()            # no self-loops
    # labels are community-correlated: homophily emerges from locality;
    # He ~= p_local*h^2 + cross terms (~0.72 at h=0.9, C=7)
    he = float(np.mean(y[ei[0]] == y[ei[1]]))
    assert 0.6 < he < 0.85, he
    comm = (np.arange(n, dtype=np.int64) * communities // n)
    loc = float(np.mean(comm[ei[0]] == comm[ei[1]]))
    # p_local edges target the home community; non-local ones rarely land
    # there by chance, so locality ~= p_local
    assert loc > 0.8, loc
    assert tr.sum() + va.sum() + te.sum() == n
    # degree profile is heavy-tailed (pareto weights): max out-degree far
    # above the mean
    outdeg = np.bincount(ei[0], minlength=n)
    assert outdeg.max() > 5 * outdeg.mean()


def test_heterophilous_raw_npz_loader(tmp_path):
    """The official heterophilous-suite raw npz format (node_features /
    node_labels / edges / (10,N) mask matrices — the on-disk layout of
    roman_empire.npz and friends, loaded by the reference via PyG's
    HeterophilousGraphDataset, reference datasets.py:55-57) resolves through
    the registry with split-column-2 mask semantics (datasets.py:199-219)."""
    from sgs_gnn_tpu.data.registry import get_dataset
    rng = np.random.default_rng(0)
    n, e, f, c, s = 60, 240, 12, 5, 10
    feats = rng.normal(size=(n, f)).astype(np.float32)
    labels = rng.integers(0, c, size=n).astype(np.int64)
    edges = rng.integers(0, n, size=(e, 2)).astype(np.int64)   # (E, 2)!
    masks = np.zeros((3, s, n), bool)                           # (10, N)!
    for si in range(s):
        perm = rng.permutation(n)
        masks[0, si, perm[: n // 2]] = True
        masks[1, si, perm[n // 2: 3 * n // 4]] = True
        masks[2, si, perm[3 * n // 4:]] = True
    np.savez(tmp_path / "Roman-empire.npz", node_features=feats,
             node_labels=labels, edges=edges, train_masks=masks[0],
             val_masks=masks[1], test_masks=masks[2])
    ds = get_dataset(Config(dataset="Roman-empire",
                            data_dir=str(tmp_path)))
    assert ds.num_nodes == n and ds.x.shape == (n, f)
    assert ds.num_classes == c
    # undirected symmetrization happened; all original edges present
    assert ds.num_edges >= e
    # split column 2 of the transposed (N, 10) matrices
    np.testing.assert_array_equal(ds.train_mask, masks[0, 2])
    np.testing.assert_array_equal(ds.val_mask, masks[1, 2])
    np.testing.assert_array_equal(ds.test_mask, masks[2, 2])


def test_shape_class_targets():
    """Padded-shape class boundaries minimize total padded slots and
    assign each partition its class max."""
    from sgs_gnn_tpu.data.partition import shape_class_targets
    counts = [100, 95, 60, 58, 10]
    t1 = shape_class_targets(counts, 1)
    assert t1 == [100] * 5
    t3 = shape_class_targets(counts, 3)
    assert all(t >= c for t, c in zip(t3, counts))
    # optimal 3-class split: {100,95}->100, {60,58}->60, {10}->10
    assert t3 == [100, 100, 60, 60, 10]
    # never worse than fewer classes
    assert sum(t3) <= sum(shape_class_targets(counts, 2)) <= sum(t1)
    # k >= m degenerates to exact (no padding)
    assert shape_class_targets(counts, 10) == counts


def test_induced_subgraphs_shape_classes():
    """shape_classes>1 pads per class; same valid content as global pad."""
    from sgs_gnn_tpu.data.partition import (partition_nodes,
                                            induced_subgraphs)
    from sgs_gnn_tpu.data.synthetic import sbm_graph
    from sgs_gnn_tpu.data import to_undirected
    x, ei, y, (tr, va, te) = sbm_graph(n=400, num_classes=4, deg=8, h=0.8,
                                       seed=9)
    ei = to_undirected(ei)
    part = partition_nodes(ei, 400, 6, method="native")
    g1 = induced_subgraphs(x, ei, y, tr, va, te, part, 6, shape_classes=1)
    g3 = induced_subgraphs(x, ei, y, tr, va, te, part, 6, shape_classes=3)
    shapes1 = {int(g.senders.shape[0]) for g in g1}
    shapes3 = {int(g.senders.shape[0]) for g in g3}
    assert len(shapes1) == 1
    assert 1 < len(shapes3) <= 3
    total1 = sum(int(g.senders.shape[0]) for g in g1)
    total3 = sum(int(g.senders.shape[0]) for g in g3)
    assert total3 < total1       # padding actually shrank
    for a, b in zip(g1, g3):
        ma = np.asarray(a.edge_mask)
        mb = np.asarray(b.edge_mask)
        assert ma.sum() == mb.sum()     # same valid edges
        np.testing.assert_array_equal(np.asarray(a.senders)[ma],
                                      np.asarray(b.senders)[mb])
        np.testing.assert_array_equal(np.asarray(a.receivers)[ma],
                                      np.asarray(b.receivers)[mb])


def test_community_sbm_low_graph_properties():
    """Reddit-scale discriminative fixture generator: clean uniform labels,
    edge homophily ~= edge_h ~= chance (1/C), community locality high
    enough for the partitioner (VERDICT r4 #2: a low-homophily variant
    where learned-vs-random separation is possible AT SCALE)."""
    from sgs_gnn_tpu.data.synthetic import community_sbm_low_graph
    n, communities = 6000, 24
    x, ei, y, (tr, va, te) = community_sbm_low_graph(
        n=n, num_classes=5, communities=communities, deg=20, edge_h=0.2,
        p_local=0.85, feat_dim=64, feat_noise=4.0, seed=0)
    assert x.shape == (n, 64) and y.shape == (n,)
    assert ei.min() >= 0 and ei.max() < n
    assert not (ei[0] == ei[1]).any()
    # labels uniform: every class well represented
    cls_counts = np.bincount(y, minlength=5)
    assert cls_counts.min() > n / 10
    # edge homophily ~ edge_h (chance level for C=5)
    he = float(np.mean(y[ei[0]] == y[ei[1]]))
    assert 0.15 < he < 0.25, he
    # community locality ~= p_local (partitioner watermark)
    comm = (np.arange(n, dtype=np.int64) * communities // n)
    loc = float(np.mean(comm[ei[0]] == comm[ei[1]]))
    assert loc > 0.75, loc
    assert tr.sum() + va.sum() + te.sum() == n
