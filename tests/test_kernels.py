"""Pallas kernel + custom-VJP gather tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_pallas
from sgs_gnn_tpu.ops.edge_gather import gather_rows


def test_scatter_pallas_interpret_matches_segment_sum(rng):
    e, f, n = 700, 128, 40
    vals = jnp.asarray(rng.normal(size=(e, f)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = scatter_add_pallas(vals, ids, n, block=256, interpret=True)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_scatter_pallas_handles_padding(rng):
    # e not a multiple of block: padded items must scatter zeros
    e, f, n = 100, 128, 10
    vals = jnp.ones((e, f))
    ids = jnp.zeros(e, jnp.int32)
    out = scatter_add_pallas(vals, ids, n, block=64, interpret=True)
    np.testing.assert_allclose(float(out[0, 0]), e)
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)


def test_gather_rows_forward_and_grad(rng):
    n, f, e = 30, 16, 200
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))

    def loss(t):
        return jnp.sum(jnp.sin(gather_rows(t, idx)))

    def loss_ref(t):
        return jnp.sum(jnp.sin(t[idx]))

    g1 = jax.grad(loss)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)


def test_gather_rows_under_jit_and_vmap(rng):
    n, f = 20, 8
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (4, 50)).astype(np.int32))
    out = jax.jit(jax.vmap(gather_rows, in_axes=(None, 0)))(table, idx)
    assert out.shape == (4, 50, f)
    np.testing.assert_array_equal(np.asarray(out[2]),
                                  np.asarray(table[idx[2]]))


def test_scatter_sorted_pallas_matches_segment_sum(rng):
    from sgs_gnn_tpu.ops.scatter_pallas import (scatter_add_sorted_pallas,
                                                required_band)
    for e, n, f in [(700, 40, 32), (512, 8, 8), (3, 5, 16), (1, 1, 8)]:
        ids = np.sort(rng.integers(0, n, e)).astype(np.int32)
        vals = rng.normal(size=(e, f)).astype(np.float32)
        band = required_band(ids, block=256)
        out = scatter_add_sorted_pallas(jnp.asarray(vals), jnp.asarray(ids),
                                        n, band=band, block=256,
                                        interpret=True)
        ref = jax.ops.segment_sum(jnp.asarray(vals), jnp.asarray(ids),
                                  num_segments=n, indices_are_sorted=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_scatter_sorted_pallas_f32_exact_single():
    # MXU default precision truncates f32 to bf16; the kernel must request
    # HIGHEST for f32 vals so a single-element scatter is bit-exact
    from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_sorted_pallas
    vals = jnp.asarray([[1.001, 2.002, 3.003, 4.004, 5.0, 6.0, 7.0, 8.0]],
                       jnp.float32)
    ids = jnp.asarray([0], jnp.int32)
    out = scatter_add_sorted_pallas(vals, ids, 1, band=8, block=256,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(vals[0]))


def test_required_band_properties(rng):
    from sgs_gnn_tpu.ops.scatter_pallas import required_band
    # uniform ids over few segments -> tiny band
    ids = np.sort(rng.integers(0, 16, 4096)).astype(np.int32)
    band = required_band(ids, block=256)
    assert band % 8 == 0
    # every 256-window spans <= band segments from its aligned origin
    for i in range(0, len(ids), 256):
        w = ids[i:i + 256]
        assert w[-1] - (w[0] // 8 * 8) + 1 <= band
    # adversarial: one window spanning the whole range
    ids2 = np.arange(4096, dtype=np.int32)
    assert required_band(ids2, block=256) >= 256


def test_gather_rows_sorted_band_grad(rng):
    # plumbing check: sorted_band must not change gradients (CPU falls back
    # to segment_sum with the sorted hint)
    n, e, f = 30, 200, 16
    table = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    idx = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))

    def loss_banded(t):
        return jnp.sum(gather_rows(t, idx, sorted_band=16) ** 2)

    def loss_plain(t):
        return jnp.sum(gather_rows(t, idx) ** 2)

    g1 = jax.grad(loss_banded)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_graph_build_sort_by_receiver(rng):
    from sgs_gnn_tpu.core.graph import Graph
    n, e = 20, 150
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    prob = rng.random(e).astype(np.float32)
    g = Graph.build(x, np.stack([s, r]), y, prob=prob, pad_edges_to=180,
                    pad_edge_node=n - 1, sort_by_receiver=True)
    rr = np.asarray(g.receivers)
    assert (np.diff(rr) >= 0).all()
    assert g.receiver_band > 0
    # the (sender, receiver, prob) triples are preserved as a multiset
    got = sorted(zip(np.asarray(g.senders)[np.asarray(g.edge_mask)],
                     rr[np.asarray(g.edge_mask)],
                     np.asarray(g.prob)[np.asarray(g.edge_mask)]))
    want = sorted(zip(s, r, prob))
    assert got == want


def test_segment_sum_scalar_pallas_interpret(rng):
    from sgs_gnn_tpu.ops.scatter_pallas import _segment_sum_scalar_pallas
    e, n = 700, 40
    ids = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    # unweighted counts must be exact (0/1 x 1 products, f32 accumulation)
    out = _segment_sum_scalar_pallas(jnp.ones(e, jnp.float32), ids, n,
                                     block=256, interpret=True)
    ref = jax.ops.segment_sum(jnp.ones(e), ids, num_segments=n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # weighted sums round w to bf16
    w = jnp.asarray(rng.random(e).astype(np.float32))
    out = _segment_sum_scalar_pallas(w, ids, n, block=256, interpret=True)
    ref = jax.ops.segment_sum(w, ids, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2)


def test_segment_sum_scalar_grad(rng):
    from sgs_gnn_tpu.ops.scatter_pallas import segment_sum_scalar
    e, n = 300, 20
    ids = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    coef = jnp.asarray(rng.random(n).astype(np.float32))

    def loss(w_):
        return jnp.sum(coef * segment_sum_scalar(w_, ids, n))

    def loss_ref(w_):
        return jnp.sum(coef * jax.ops.segment_sum(w_, ids, num_segments=n))

    np.testing.assert_allclose(np.asarray(jax.grad(loss)(w)),
                               np.asarray(jax.grad(loss_ref)(w)), rtol=1e-6)


def test_gcn_norm_terms_matches_concat_form(rng):
    from sgs_gnn_tpu.ops.gcn_norm import gcn_norm, gcn_norm_terms
    n, e = 30, 200
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    # dense oracle from the concat form
    s2, r2, norm2 = gcn_norm(s, r, w, n, add_loops=True)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (np.asarray(r2), np.asarray(s2)), np.asarray(norm2))
    want = dense @ np.asarray(x)
    # terms form: edge spmm + analytic diagonal
    norm, loop_coef = gcn_norm_terms(s, r, w, n)
    dense_e = np.zeros((n, n), np.float32)
    np.add.at(dense_e, (np.asarray(r), np.asarray(s)), np.asarray(norm))
    got = dense_e @ np.asarray(x) + np.asarray(loop_coef)[:, None] * np.asarray(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_spmm_pallas_interpret_matches_xla(rng):
    from sgs_gnn_tpu.ops.spmm_pallas import _spmm_pallas_impl
    from sgs_gnn_tpu.ops.spmm import spmm_xla
    for e, n, f in [(700, 40, 32), (256, 8, 8), (3, 5, 16), (1, 1, 8)]:
        s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
        w = jnp.asarray(rng.random(e).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
        out = _spmm_pallas_impl(s, r, w, x, n, block=256, interpret=True)
        ref = spmm_xla(s, r, w, x, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_spmm_pallas_grad_matches_xla(rng):
    from sgs_gnn_tpu.ops.spmm_pallas import _spmm_pallas_core
    from sgs_gnn_tpu.ops.spmm import spmm_xla
    e, n, f = 300, 20, 16
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

    def loss_p(w_, x_):
        return jnp.sum(jnp.sin(_spmm_pallas_core(n, True, s, r, w_, x_)))

    def loss_x(w_, x_):
        return jnp.sum(jnp.sin(spmm_xla(s, r, w_, x_, n)))

    gw1, gx1 = jax.grad(loss_p, argnums=(0, 1))(w, x)
    gw2, gx2 = jax.grad(loss_x, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4,
                               atol=1e-5)


def test_spmm_backend_dispatch_no_crash(rng):
    # backend="pallas" must never ImportError; off-TPU it falls back to XLA
    from sgs_gnn_tpu.ops.spmm import spmm
    e, n, f = 50, 10, 8
    s = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    w = jnp.asarray(rng.random(e).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    out = spmm(s, r, w, x, n, backend="pallas")
    ref = spmm(s, r, w, x, n, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_score_tiles_kernel_matches_reference(rng):
    """Interpret-mode tile-pair score kernel == jnp oracle == direct head."""
    from sgs_gnn_tpu.ops.score_tiles import (build_tile_index,
                                             score_head_tiles,
                                             score_head_tiles_reference)
    n, e, f, k = 200, 8000, 32, 32
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    ti = build_tile_index(s, r, n, t=64, b=128)
    assert ti is not None
    h = rng.normal(size=(n, f)).astype(np.float32)
    fc1k = (rng.normal(size=(2 * f, k)) * 0.1).astype(np.float32)
    fc1b = (rng.normal(size=(k,)) * 0.1).astype(np.float32)
    fc2k = (rng.normal(size=(k, 1)) * 0.1).astype(np.float32)
    fc2b = (rng.normal(size=(1,)) * 0.1).astype(np.float32)
    args = (jnp.asarray(h), jnp.asarray(fc1k), jnp.asarray(fc1b),
            jnp.asarray(fc2k), jnp.asarray(fc2b), jnp.asarray(ti.ls),
            jnp.asarray(ti.lr), jnp.asarray(ti.su), jnp.asarray(ti.rv))
    probs = score_head_tiles(*args, t=ti.t, bk=ti.b, drop_rate=0.0,
                             interpret=True)
    ref = score_head_tiles_reference(*args, t=ti.t, bk=ti.b)
    v = np.asarray(ti.valid)
    np.testing.assert_allclose(np.asarray(probs)[v], np.asarray(ref)[v],
                               rtol=1e-5, atol=1e-6)
    # map back to original edge order and compare against the direct head
    hu, hv = h[s], h[r]
    z = np.maximum(np.concatenate([hu * hv, hu - hv], 1) @ fc1k + fc1b, 0)
    direct = 1.0 / (1.0 + np.exp(-(z @ fc2k[:, 0] + fc2b[0])))
    back = np.zeros(e, np.float32)
    back[np.asarray(ti.perm)[v]] = np.asarray(probs)[v]
    np.testing.assert_allclose(back, direct, rtol=1e-4, atol=1e-5)


def test_tile_index_overhead_gate():
    """Sparse huge-N graphs must decline the tile layout (returns None)."""
    from sgs_gnn_tpu.ops.score_tiles import build_tile_index
    rng2 = np.random.default_rng(1)
    n, e = 100_000, 5000   # ~1 edge per tile pair -> massive padding
    s = rng2.integers(0, n, e).astype(np.int32)
    r = rng2.integers(0, n, e).astype(np.int32)
    assert build_tile_index(s, r, n, t=256, b=1024) is None


def test_hybrid_rescore_trains_with_tile_index(rng):
    """The hybrid fast path must route through the tile kernel when the
    graph carries a tile index, and still train (interpret mode on CPU)."""
    import jax
    from sgs_gnn_tpu.core import Config
    from sgs_gnn_tpu.core.graph import Graph
    from sgs_gnn_tpu.models import get_model, init_params
    from sgs_gnn_tpu.train import DualOptimizer, make_train_step
    n, e, f, c = 200, 8000, 16, 4
    s = rng.integers(0, n, e).astype(np.int32)
    r = rng.integers(0, n, e).astype(np.int32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, c, n).astype(np.int32)
    tr = rng.random(n) < 0.5
    g = Graph.build(x, np.stack([s, r]), y, tr, ~tr, np.zeros(n, bool),
                    num_classes=c, tile_index=True, tile_t=64, tile_b=128)
    assert g.tile_t == 64 and g.tile_su is not None
    cfg = Config(pipeline="hybrid", mode="learned", nhid=16, donate=False,
                 drop_rate=0.1)
    model = get_model(cfg.GNN, f, cfg.nhid, c, cfg.drop_rate,
                      cfg.edge_mlp_type)
    params = init_params(model, jax.random.PRNGKey(0), g.x, g.senders,
                         g.receivers)
    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    q = 512
    step = make_train_step(cfg, model, opt, q, max_epoch=10)
    losses = []
    for i in range(10):
        params, opt_state, m = step(params, opt_state, g, jnp.asarray(i),
                                    jax.random.PRNGKey(100 + i))
        losses.append(float(m.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ---------------------------------------------------------------------------
# Fused sampled-edge score head (ops/score_sampled.py)
# ---------------------------------------------------------------------------

from sgs_gnn_tpu.ops.score_sampled import (score_head_sampled,
                                           score_head_sampled_reference)


def _head_params(rng, f, k):
    w1 = jnp.asarray(rng.normal(size=(2 * f, k)).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng.normal(size=(k,)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(k, 1)).astype(np.float32)) * 0.2
    b2 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32)) * 0.1
    return w1, b1, w2, b2


def test_score_sampled_fwd_matches_oracle(rng):
    n, f, k, q = 40, 128, 128, 77          # q not a block multiple: padding
    h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w1, b1, w2, b2 = _head_params(rng, f, k)
    s = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    out = score_head_sampled(h, w1, b1, w2, b2, s, r, block=64,
                             interpret=True)
    ref = score_head_sampled_reference(h, w1, b1, w2, b2, s, r)
    assert out.shape == (q,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_score_sampled_grad_matches_oracle(rng):
    n, f, k, q = 24, 128, 128, 90
    h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w1, b1, w2, b2 = _head_params(rng, f, k)
    s = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(q,)).astype(np.float32))

    def loss_kernel(h_, w1_, b1_, w2_, b2_):
        p = score_head_sampled(h_, w1_, b1_, w2_, b2_, s, r, block=64,
                               interpret=True)
        return jnp.sum(jnp.cos(3.0 * p) * cot)

    def loss_ref(h_, w1_, b1_, w2_, b2_):
        p = score_head_sampled_reference(h_, w1_, b1_, w2_, b2_, s, r)
        return jnp.sum(jnp.cos(3.0 * p) * cot)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    for a, b, name in zip(gk, gr, ["h", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


@pytest.mark.parametrize("side", ["senders", "receivers"])
def test_score_sampled_banded_matches_oracle(rng, side):
    """r5 sorted-head fast path: with one endpoint near-sorted and a band
    declared, fwd and grads must equal the oracle exactly (the banded
    kernel covers every id, the receiver variant rides the swapped-endpoint
    + negated-W1b identity)."""
    n, f, k, q = 96, 128, 128, 200
    h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w1, b1, w2, b2 = _head_params(rng, f, k)
    sorted_ids = jnp.asarray(np.sort(rng.integers(0, n, q)).astype(np.int32))
    other = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    s, r = (sorted_ids, other) if side == "senders" else (other, sorted_ids)
    cot = jnp.asarray(rng.normal(size=(q,)).astype(np.float32))

    def loss(fn):
        def inner(h_, w1_, b1_, w2_, b2_):
            p = fn(h_, w1_, b1_, w2_, b2_)
            return jnp.sum(jnp.cos(3.0 * p) * cot)
        return inner

    kern = loss(lambda *a: score_head_sampled(
        *a, s, r, block=64, sorted_side=side, band=32, interpret=True))
    ref = loss(lambda *a: score_head_sampled_reference(*a, s, r))
    np.testing.assert_allclose(np.asarray(kern(h, w1, b1, w2, b2)),
                               np.asarray(ref(h, w1, b1, w2, b2)),
                               rtol=1e-5, atol=1e-5)
    gk = jax.grad(kern, argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    gr = jax.grad(ref, argnums=(0, 1, 2, 3, 4))(h, w1, b1, w2, b2)
    for a, b, name in zip(gk, gr, ["h", "w1", "b1", "w2", "b2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-5, err_msg=name)


def test_score_sampled_banded_fallback_on_wide_span(rng):
    """A sample whose block span exceeds the band must ride the full-kernel
    branch of the in-graph coverage cond — identical results, never dropped
    contributions."""
    n, f, k, q = 96, 128, 128, 128
    h = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    w1, b1, w2, b2 = _head_params(rng, f, k)
    # UNSORTED ids declared sorted: spans blow the 16-row band every block
    s = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    r = jnp.asarray(rng.integers(0, n, q).astype(np.int32))
    out = score_head_sampled(h, w1, b1, w2, b2, s, r, block=64,
                             sorted_side="senders", band=16, interpret=True)
    ref = score_head_sampled_reference(h, w1, b1, w2, b2, s, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_kernel(h_):
        p = score_head_sampled(h_, w1, b1, w2, b2, s, r, block=64,
                               sorted_side="senders", band=16,
                               interpret=True)
        return jnp.sum(p * p)

    def loss_ref(h_):
        p = score_head_sampled_reference(h_, w1, b1, w2, b2, s, r)
        return jnp.sum(p * p)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_kernel)(h)),
                               np.asarray(jax.grad(loss_ref)(h)),
                               rtol=2e-4, atol=2e-5)


def test_use_fused_sampled_head_gate(monkeypatch):
    """Gate: TPU-only, MXU-aligned widths, VMEM budget, env override."""
    from sgs_gnn_tpu.ops import score_sampled as ss
    assert not ss.use_fused_sampled_head(2048, 256, 256)  # CPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert ss.use_fused_sampled_head(2048, 256, 256)
    assert not ss.use_fused_sampled_head(2048, 100, 256)   # F not 128-mult
    assert not ss.use_fused_sampled_head(2048, 256, 200)   # K not 128-mult
    assert not ss.use_fused_sampled_head(50_000, 256, 256)  # VMEM blown
    monkeypatch.setenv("SGS_FUSED_HEAD", "off")
    assert not ss.use_fused_sampled_head(2048, 256, 256)


def test_scatter_vmem_model_regression_n6128_f256(rng):
    """Round-3 shipped crash: N=6128, F=256, bf16, block=1024 -> 17.9MB
    scoped VMEM > 16MB limit (logs/quality_SyntheticLarge_hybrid_tpu.log).
    The working-set model must (a) reject block=1024 there, (b) still pick a
    smaller block that fits, and (c) that block must compute correctly."""
    from sgs_gnn_tpu.ops.scatter_pallas import (scatter_vmem_bytes,
                                                scatter_block_for,
                                                scatter_add_pallas)
    n, f = 6128, 256
    # the crashing config must be over budget in the model
    assert scatter_vmem_bytes(n, f, 2, 1024) > 16 * 1024 * 1024
    blk = scatter_block_for(n, f, itemsize=2)
    assert blk is not None and blk < 1024
    assert scatter_vmem_bytes(n, f, 2, blk) <= 12 * 1024 * 1024
    # correctness at the chosen block (interpret mode, subsampled shape for
    # runtime: same block-selection path, smaller E)
    e = 2048
    vals = jnp.asarray(rng.normal(size=(e, 32)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = scatter_add_pallas(vals, ids, n, block=blk, interpret=True)
    ref = jax.ops.segment_sum(vals, ids, num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_scatter_block_for_monotonic_and_bounds():
    from sgs_gnn_tpu.ops.scatter_pallas import (scatter_block_for,
                                                scatter_vmem_bytes,
                                                sorted_scatter_block_for)
    # tiny partitions keep the full block
    assert scatter_block_for(2048, 256) == 1024
    # huge N: no block fits -> XLA fallback
    assert scatter_block_for(500_000, 256) is None
    # scalar-kernel shape that the old 6MB-accumulator gate wrongly accepted
    # (N=12288: one-hot panel alone is 24MB at block=1024)
    assert scatter_vmem_bytes(12288, 128, 2, 1024) > 16 * 1024 * 1024
    blk = scatter_block_for(12288, 128, itemsize=2)
    assert blk is None or scatter_vmem_bytes(12288, 128, 2, blk) <= \
        12 * 1024 * 1024
    # banded kernel: the full-size f32 accumulator still bounds N
    assert sorted_scatter_block_for(200_000, 64, band=256) is None
    # ...but a narrow band keeps the full block at mid-size N
    assert sorted_scatter_block_for(8192, 256, band=256) == 1024


def test_pallas_routes_respect_global_switch(rng, monkeypatch):
    """Every Pallas engage-gate must refuse when core.fastpath disables the
    routes (TP-sharded params), even on a TPU backend."""
    from sgs_gnn_tpu.core import fastpath
    from sgs_gnn_tpu.ops.score_sampled import use_fused_sampled_head
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with fastpath.pallas_disabled():
        assert not fastpath.pallas_enabled()
        assert not use_fused_sampled_head(1024, 256, 256)
        # _scatter_rows must take the segment_sum fallback (executable on
        # CPU even with the faked backend — the pallas branch would not be)
        from sgs_gnn_tpu.ops.spmm import _scatter_rows
        vals = jnp.asarray(rng.normal(size=(64, 8))).astype(jnp.bfloat16)
        ids = jnp.asarray(rng.integers(0, 10, 64).astype(np.int32))
        out = _scatter_rows(vals, ids, 10)
        ref = jax.ops.segment_sum(vals.astype(jnp.float32), ids,
                                  num_segments=10)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
        # gather backward likewise
        from sgs_gnn_tpu.ops.edge_gather import gather_rows
        t = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
        gfn = jax.grad(lambda tt: jnp.sum(gather_rows(tt, ids) ** 2))
        assert np.isfinite(np.asarray(gfn(t))).all()
        # scalar segment sum
        from sgs_gnn_tpu.ops.scatter_pallas import segment_sum_scalar
        d = segment_sum_scalar(jnp.ones(64), ids, 10)
        np.testing.assert_allclose(
            np.asarray(d),
            np.asarray(jax.ops.segment_sum(jnp.ones(64), ids,
                                           num_segments=10)))
    assert fastpath.pallas_enabled()


def test_want_tile_index_off_when_pallas_disabled(monkeypatch):
    from sgs_gnn_tpu.core import Config, fastpath
    from sgs_gnn_tpu.run.driver import want_tile_index
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    cfg = Config(mode="learned", pipeline="hybrid", tile_index="on")
    assert want_tile_index(cfg)
    with fastpath.pallas_disabled():
        assert not want_tile_index(cfg)
