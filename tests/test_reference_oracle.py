"""Full-step numerical parity against a torch re-implementation of the
reference training step (VERDICT r4 #1).

A PyG-free torch oracle reproduces the reference's exact math — PyG GCNConv
semantics (gcn_norm with self-loops, reference model.py:147-164), the
EdgeProbGCN scorer (model.py:91-133), all three learned pipelines
(training_hybrid.py:29-141, training_two_pass.py:48-80,
training_straight_through.py:49-75), the conditional gate, reg1/reg2
(utils.py:187-211), and the three name-filtered Adam groups
(main.py:98-123) — and this framework's jitted steps are run against it on
the same small graph with the SAMPLED EDGE SET FROZEN and dropout off:

  * per-layer activation parity (scorer embeddings, edge probabilities,
    GNN logits)
  * N-step loss / gate-decision / parameter trajectory parity for
    hybrid (exact AND hybrid_rescore fast path), two_pass,
    straight_through, and a baseline mode

Sampling itself is covered separately by distribution tests
(tests/test_sampling.py); freezing it here isolates the deterministic step
math, which is the only way activation-level allclose is meaningful.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from sgs_gnn_tpu.core import Config
from sgs_gnn_tpu.core.graph import Graph
from sgs_gnn_tpu.models import get_model, init_params
from sgs_gnn_tpu.train import DualOptimizer, make_train_step

torch.set_default_dtype(torch.float64)  # oracle in f64: truth, not noise

# ---------------------------------------------------------------- fixture

N, F_IN, HID, C, Q = 40, 8, 16, 4, 100


def _graph(seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, N, size=160).astype(np.int32)
    r = rng.integers(0, N, size=160).astype(np.int32)
    keep = s != r
    ei = np.stack([s[keep], r[keep]])
    ei = np.concatenate([ei, ei[::-1]], axis=1)          # undirected
    x = rng.normal(size=(N, F_IN)).astype(np.float32)
    y = rng.integers(0, C, size=N).astype(np.int32)
    perm = rng.permutation(N)
    tr = np.zeros(N, bool); tr[perm[: N // 2]] = True
    va = np.zeros(N, bool); va[perm[N // 2: 3 * N // 4]] = True
    te = np.zeros(N, bool); te[perm[3 * N // 4:]] = True
    prob = rng.uniform(0.2, 1.0, size=ei.shape[1]).astype(np.float32)
    prob = prob / prob.sum()
    g = Graph.build(x, ei, y, tr, va, te, prob=prob, num_classes=C)
    e = ei.shape[1]
    idx = np.sort(rng.choice(e, size=Q, replace=False)).astype(np.int32)
    rand_idx = np.sort(rng.choice(e, size=Q, replace=False)).astype(np.int32)
    return g, idx, rand_idx


# ------------------------------------------------- torch reference oracle


def _t(a):
    return torch.tensor(np.asarray(a, np.float64))


def gcn_conv_t(x, ei, ew, W, b):
    """PyG GCNConv forward (normalize=True, add_self_loops=True,
    fill_value=1.0), flow source->target: ei[0]=j (source), ei[1]=i."""
    n = x.shape[0]
    xw = x @ W
    loop = torch.arange(n)
    src = torch.cat([ei[0], loop])
    dst = torch.cat([ei[1], loop])
    w = torch.cat([ew if ew is not None else torch.ones(ei.shape[1]),
                   torch.ones(n)])
    deg = torch.zeros(n).index_add_(0, dst, w)
    dis = deg.pow(-0.5)
    dis[torch.isinf(dis)] = 0.0
    norm = dis[src] * w * dis[dst]
    msgs = xw[src] * norm[:, None]
    out = torch.zeros_like(xw).index_add_(0, dst, msgs)
    return out + b


def scorer_encode_t(P, x, prop_ei):
    h = F.relu(gcn_conv_t(x, prop_ei, None, P["edge_prob_mlp.gcn1.weight"],
                          P["edge_prob_mlp.gcn1.bias"]))
    return F.relu(gcn_conv_t(h, prop_ei, None,
                             P["edge_prob_mlp.gcn2.weight"],
                             P["edge_prob_mlp.gcn2.bias"]))


def scorer_score_t(P, h, score_ei):
    hu, hv = h[score_ei[0]], h[score_ei[1]]
    feats = torch.cat([hu * hv, hu - hv], dim=1)
    z = F.relu(feats @ P["edge_prob_mlp.fc1.weight"]
               + P["edge_prob_mlp.fc1.bias"])
    return torch.sigmoid(
        z @ P["edge_prob_mlp.fc2.weight"]
        + P["edge_prob_mlp.fc2.bias"]).squeeze(-1)


def gnn_t(P, x, ei, ew):
    h = F.relu(gcn_conv_t(x, ei, ew, P["gcn1.weight"], P["gcn1.bias"]))
    return gcn_conv_t(h, ei, ew, P["gcn2.weight"], P["gcn2.bias"])


def micro_f1_t(logits, y, mask):
    return (logits.argmax(1)[mask] == y[mask]).double().mean().item()


def reg1_t(edge_probs, sampled_ei, y, train_mask):
    src, dst = sampled_ei
    both = train_mask[src] & train_mask[dst]
    same = y[src] == y[dst]
    labels = same[both].double()
    if labels.sum().item() > 1:
        return F.binary_cross_entropy(edge_probs[both], labels)
    return torch.zeros(())


def reg2_t(edge_probs, sampled_ei, emb):
    cos = F.cosine_similarity(emb[sampled_ei[0]], emb[sampled_ei[1]], dim=-1)
    return F.mse_loss(edge_probs, cos)


class TorchOracle:
    """Reference model + dual optimizers on one frozen-sample batch."""

    def __init__(self, flax_params, cfg: Config, g, idx, rand_idx):
        p = flax_params["params"]

        def dense(d):                      # flax Dense -> (in,out) W
            return d["kernel"], d["bias"]
        P = {}
        P["gcn1.weight"] = _t(p["gcn1"]["lin"]["kernel"])
        P["gcn1.bias"] = _t(p["gcn1"]["bias"])
        P["gcn2.weight"] = _t(p["gcn2"]["lin"]["kernel"])
        P["gcn2.bias"] = _t(p["gcn2"]["bias"])
        ep = p["edge_prob_mlp"]
        P["edge_prob_mlp.gcn1.weight"] = _t(ep["gcn1"]["lin"]["kernel"])
        P["edge_prob_mlp.gcn1.bias"] = _t(ep["gcn1"]["bias"])
        P["edge_prob_mlp.gcn2.weight"] = _t(ep["gcn2"]["lin"]["kernel"])
        P["edge_prob_mlp.gcn2.bias"] = _t(ep["gcn2"]["bias"])
        P["edge_prob_mlp.fc1.weight"] = _t(ep["head"]["fc1"]["kernel"])
        P["edge_prob_mlp.fc1.bias"] = _t(ep["head"]["fc1"]["bias"])
        P["edge_prob_mlp.fc2.weight"] = _t(ep["head"]["fc2"]["kernel"])
        P["edge_prob_mlp.fc2.bias"] = _t(ep["head"]["fc2"]["bias"])
        for v in P.values():
            v.requires_grad_(True)
        self.P = P
        self.cfg = cfg
        self.x = _t(g.x)
        self.ei = torch.tensor(np.asarray(g.edge_index, np.int64))
        self.y = torch.tensor(np.asarray(g.y, np.int64))
        self.train_mask = torch.tensor(np.asarray(g.train_mask))
        self.prob = _t(g.prob)
        self.idx = torch.tensor(np.asarray(idx, np.int64))
        self.rand_idx = torch.tensor(np.asarray(rand_idx, np.int64))
        # the reference's three name-filtered Adams (main.py:98-123);
        # 'gcn' matches the scorer's encoder too — the overlap quirk
        self.opt_gnn = torch.optim.Adam(
            [v for k, v in P.items() if "gcn" in k], lr=cfg.lr)
        self.opt_edge = torch.optim.Adam(
            [v for k, v in P.items() if "edge_prob_mlp" in k], lr=cfg.lr)
        self.opt_all = torch.optim.Adam(
            list(P.values()), lr=cfg.lr, weight_decay=cfg.weight_decay)

    def _zero(self):
        self.opt_gnn.zero_grad()
        self.opt_edge.zero_grad()
        self.opt_all.zero_grad()

    def step_learned(self, pipeline: str):
        """One reference learned-mode step (E > q branch); returns
        (loss, gate)."""
        cfg = self.cfg
        self._zero()
        rand_ei = self.ei[:, self.rand_idx]
        prop_ei = rand_ei if (cfg.conditional or cfg.sparse_edge_mlp) \
            else self.ei
        sampled_ei = self.ei[:, self.idx]

        if pipeline == "two_pass":
            with torch.no_grad():
                scorer_score_t(self.P, scorer_encode_t(
                    self.P, self.x, prop_ei), self.ei)
            # pass 3: grad re-score; the encoder propagates on the SAMPLED
            # subgraph (training_two_pass.py:75-77)
            h3 = scorer_encode_t(self.P, self.x, sampled_ei)
            edge_probs_sampled = scorer_score_t(self.P, h3, sampled_ei)
            weights = edge_probs_sampled
        elif pipeline == "straight_through":
            h = scorer_encode_t(self.P, self.x, prop_ei)
            probs_full = scorer_score_t(self.P, h, self.ei)
            samples = probs_full / (probs_full.sum() + 1e-12)
            samples = (1 - cfg.degree_bias_coef) * samples \
                + cfg.degree_bias_coef * self.prob
            one_hot = torch.zeros_like(samples)
            one_hot.scatter_(0, self.idx, 1.0)
            st = (one_hot - samples).detach() + samples
            weights = (probs_full * st)[self.idx].clamp(0.0, 1.0)
        elif pipeline == "hybrid":
            h = scorer_encode_t(self.P, self.x, prop_ei)
            probs_full = scorer_score_t(self.P, h, self.ei)
            weights = probs_full[self.idx]
        else:
            raise ValueError(pipeline)

        learned_out = gnn_t(self.P, self.x, sampled_ei, weights)
        gate = True
        if cfg.conditional:
            random_out = gnn_t(self.P, self.x, rand_ei, None)
            gate = micro_f1_t(learned_out, self.y, self.train_mask) > \
                micro_f1_t(random_out, self.y, self.train_mask)
        if gate:
            loss = F.cross_entropy(learned_out[self.train_mask],
                                   self.y[self.train_mask])
            if cfg.reg1:
                loss = loss + cfg.regularizer1_coef * reg1_t(
                    weights, sampled_ei, self.y, self.train_mask)
            if cfg.reg2:
                loss = loss + cfg.consist_reg_coef * reg2_t(
                    weights, sampled_ei, learned_out)
            loss.backward()
            self.opt_edge.step()
            self.opt_gnn.step()
        else:
            loss = F.cross_entropy(random_out[self.train_mask],
                                   self.y[self.train_mask])
            loss.backward()
            self.opt_gnn.step()
        return float(loss), gate

    def loss_and_grads(self, pipeline: str):
        """Loss + per-param gradients of one reference step (no optimizer
        update) — the sharp parity instrument: Adam amplifies f32-vs-f64
        noise on near-zero-gradient coordinates to +/-lr per step (sign
        flips in g/|g|), so post-update params can only be compared in an
        lr-wide band; raw gradients compare tightly."""
        state = {k: v.detach().clone() for k, v in self.P.items()}
        loss, gate = self.step_learned(pipeline)  # grads populated pre-step
        grads = {k: (v.grad.detach().clone() if v.grad is not None
                     else torch.zeros_like(v)) for k, v in self.P.items()}
        with torch.no_grad():                     # undo the Adam update
            for k, v in self.P.items():
                v.copy_(state[k])
        self.opt_gnn = torch.optim.Adam(
            [v for k, v in self.P.items() if "gcn" in k], lr=self.cfg.lr)
        self.opt_edge = torch.optim.Adam(
            [v for k, v in self.P.items() if "edge_prob_mlp" in k],
            lr=self.cfg.lr)
        return loss, gate, grads

    def step_baseline(self, mode: str):
        """random/edge modes with a frozen subgraph; full mode
        (training_hybrid.py:149-180): single CE forward + third Adam."""
        self._zero()
        ei = self.ei if mode == "full" else self.ei[:, self.idx]
        out = gnn_t(self.P, self.x, ei, None)
        loss = F.cross_entropy(out[self.train_mask], self.y[self.train_mask])
        loss.backward()
        self.opt_all.step()
        return float(loss)


# ------------------------------------------ frozen sampling for this repo


def _freeze_sampling(monkeypatch, idx, rand_idx):
    """Replace the samplers in train.pipelines with fixed-index versions
    that keep the exact weight formulas (sparsify/sampling.py)."""
    import sgs_gnn_tpu.train.pipelines as pl
    from sgs_gnn_tpu.sparsify.sampling import _normalized
    idx = jnp.asarray(idx, jnp.int32)
    rand_idx = jnp.asarray(rand_idx, jnp.int32)

    def sample_edges(key, edge_probs, prior, q, beta, istest=False,
                     edge_mask=None, approx=False, bf16=True):
        samples = _normalized(edge_probs, edge_mask)
        if not istest:
            prior_ = jnp.where(edge_mask, prior, 0.0) \
                if edge_mask is not None else prior
            samples = (1.0 - beta) * samples + beta * prior_
        sel = samples[idx]
        st = jax.lax.stop_gradient(1.0 - sel) + sel
        return idx, jnp.clip(edge_probs[idx] * st, 0.0, 1.0)

    monkeypatch.setattr(pl, "sample_edges", sample_edges)
    monkeypatch.setattr(pl, "sample_prior_edges",
                        lambda *a, **k: rand_idx)
    monkeypatch.setattr(pl, "random_edges", lambda *a, **k: idx)


NAME_MAP = {
    "params/gcn1/lin/kernel": "gcn1.weight",
    "params/gcn1/bias": "gcn1.bias",
    "params/gcn2/lin/kernel": "gcn2.weight",
    "params/gcn2/bias": "gcn2.bias",
    "params/edge_prob_mlp/gcn1/lin/kernel": "edge_prob_mlp.gcn1.weight",
    "params/edge_prob_mlp/gcn1/bias": "edge_prob_mlp.gcn1.bias",
    "params/edge_prob_mlp/gcn2/lin/kernel": "edge_prob_mlp.gcn2.weight",
    "params/edge_prob_mlp/gcn2/bias": "edge_prob_mlp.gcn2.bias",
    "params/edge_prob_mlp/head/fc1/kernel": "edge_prob_mlp.fc1.weight",
    "params/edge_prob_mlp/head/fc1/bias": "edge_prob_mlp.fc1.bias",
    "params/edge_prob_mlp/head/fc2/kernel": "edge_prob_mlp.fc2.weight",
    "params/edge_prob_mlp/head/fc2/bias": "edge_prob_mlp.fc2.bias",
}


def _flat(tree):
    return {"/".join(str(getattr(p, "key", p)) for p in path): leaf
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _cfg(pipeline="hybrid", **kw):
    kw = dict(dict(conditional=True, reg1=True, reg2=True), **kw)
    return Config(pipeline=pipeline, mode="learned", nhid=HID,
                  drop_rate=0.0, lr=0.01, donate=False, **kw)


def _flax_setup(cfg, g):
    model = get_model(cfg.GNN, F_IN, cfg.nhid, C, cfg.drop_rate,
                      cfg.edge_mlp_type)
    params = init_params(model, jax.random.PRNGKey(3), g.x, g.senders,
                         g.receivers)
    return model, params


# ------------------------------------------------------------------ tests


def test_activation_parity():
    """Scorer embeddings, edge probabilities, and GNN logits match the
    torch oracle layer by layer."""
    g, idx, rand_idx = _graph()
    cfg = _cfg()
    model, params = _flax_setup(cfg, g)
    o = TorchOracle(params, cfg, g, idx, rand_idx)

    h_j = model.apply(params, g.x, g.senders, g.receivers, True,
                      method="encode_scorer")
    h_t = scorer_encode_t(o.P, o.x, o.ei)
    np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)

    probs_j = model.apply(params, g.x, g.senders, g.receivers, g.senders,
                          g.receivers, True, method="score_edges")
    probs_t = scorer_score_t(o.P, h_t, o.ei)
    np.testing.assert_allclose(np.asarray(probs_j),
                               probs_t.detach().numpy(),
                               rtol=1e-4, atol=1e-6)

    w = jnp.asarray(probs_j)[idx]
    out_j = model.apply(params, g.x, g.senders[idx], g.receivers[idx], w,
                        deterministic=True)
    out_t = gnn_t(o.P, o.x, o.ei[:, torch.tensor(np.asarray(idx, np.int64))],
                  probs_t[torch.tensor(np.asarray(idx, np.int64))])
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pipeline,rescore", [
    ("hybrid", False), ("hybrid", True), ("two_pass", False),
    ("straight_through", False)])
def test_trajectory_parity(monkeypatch, pipeline, rescore):
    """5 frozen-sample training steps: loss, gate decision, and parameter
    trajectories match the torch reference step for every pipeline.

    Seed 4 yields a MIXED gate sequence (both conditional branches execute:
    the full reg1+reg2 dual-optimizer update AND the random-path
    gnn-only update), asserted below so the harness cannot silently lose
    its branch coverage."""
    g, idx, rand_idx = _graph(seed=4)
    cfg = _cfg(pipeline, hybrid_rescore=rescore)
    model, params = _flax_setup(cfg, g)
    o = TorchOracle(params, cfg, g, idx, rand_idx)
    _freeze_sampling(monkeypatch, idx, rand_idx)

    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, Q, max_epoch=5)

    gates_j, gates_t = [], []
    for ep in range(5):
        params, opt_state, m = step(params, opt_state, g, jnp.asarray(ep),
                                    jax.random.PRNGKey(100 + ep))
        loss_t, gate_t = o.step_learned(pipeline)
        loss_j = float(m.loss)
        # once the edge group has Adam-stepped, params sit in the lr-wide
        # sign-flip band (see below) and losses inherit ~1e-3 of that
        assert abs(loss_j - loss_t) <= 2e-3 * max(1.0, abs(loss_t)), (
            f"step {ep}: loss {loss_j} vs oracle {loss_t}")
        gates_j.append(bool(m.conditional_update > 0.5))
        gates_t.append(gate_t)
    assert gates_j == gates_t, (gates_j, gates_t)
    assert any(gates_j) and not all(gates_j), (
        f"gate sequence {gates_j} exercises only one conditional branch — "
        f"pick a fixture seed that mixes them")

    flat = _flat(params)
    assert set(flat) == set(NAME_MAP), (set(flat), set(NAME_MAP))
    # Adam amplifies f32-vs-f64 noise on near-zero-gradient coordinates to
    # +/-lr per flipped sign of g/|g| (first-step update ~ -lr*sign(g)), so
    # post-update params can only be compared within an lr-wide band over 5
    # steps; gradient-level parity below is the tight check.
    for jname, tname in NAME_MAP.items():
        np.testing.assert_allclose(
            np.asarray(flat[jname]), o.P[tname].detach().numpy(),
            rtol=1e-3, atol=5 * cfg.lr,
            err_msg=f"{jname} diverged from oracle {tname} after 5 steps")


@pytest.mark.parametrize("pipeline,rescore,conditional", [
    ("hybrid", False, True), ("hybrid", True, True), ("hybrid", False, False),
    ("two_pass", False, True), ("two_pass", False, False),
    ("straight_through", False, True), ("straight_through", False, False)])
def test_gradient_parity(monkeypatch, pipeline, rescore, conditional):
    """Per-parameter GRADIENT parity of one frozen-sample step against the
    f64 torch oracle — the tight check (no Adam noise amplification).
    conditional=True at seed 4 lands in the gate-FAIL branch (random-path
    CE, zero scorer grads); conditional=False always takes the full
    reg1+reg2 branch — together both sides of training_hybrid.py:98-141."""
    g, idx, rand_idx = _graph(seed=4)
    cfg = _cfg(pipeline, hybrid_rescore=rescore, conditional=conditional)
    model, params = _flax_setup(cfg, g)
    o = TorchOracle(params, cfg, g, idx, rand_idx)
    _freeze_sampling(monkeypatch, idx, rand_idx)

    from sgs_gnn_tpu.train.pipelines import make_learned_loss
    loss_fn = make_learned_loss(cfg, model, Q)
    (loss_j, (gate_j, _, _)), grads_j = jax.value_and_grad(
        loss_fn, has_aux=True)(params, g, jax.random.PRNGKey(0))
    loss_t, gate_t, grads_t = o.loss_and_grads(pipeline)
    assert bool(gate_j) == gate_t
    if conditional:
        assert not gate_t, "seed 4 must land in the gate-fail branch"
    assert abs(float(loss_j) - loss_t) <= 1e-5 * max(1.0, abs(loss_t))
    flat_g = _flat(grads_j)
    for jname, tname in NAME_MAP.items():
        gj = np.asarray(flat_g[jname], np.float64)
        gt = grads_t[tname].numpy()
        scale = max(np.abs(gt).max(), 1e-3)   # atol floor per tensor
        np.testing.assert_allclose(
            gj, gt, rtol=2e-3, atol=2e-5 * scale,
            err_msg=f"grad {jname} != oracle {tname} "
                    f"(pipeline={pipeline} rescore={rescore} "
                    f"conditional={conditional})")


def test_baseline_mode_trajectory_parity(monkeypatch):
    """random mode: frozen-subgraph CE + the third (weight-decay) Adam."""
    g, idx, rand_idx = _graph(seed=2)
    cfg = _cfg().replace(mode="random", conditional=False)
    model, params = _flax_setup(cfg, g)
    o = TorchOracle(params, cfg, g, idx, rand_idx)
    _freeze_sampling(monkeypatch, idx, rand_idx)

    opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
    opt_state = opt.init(params)
    step = make_train_step(cfg, model, opt, Q, max_epoch=5)
    for ep in range(5):
        params, opt_state, m = step(params, opt_state, g, jnp.asarray(ep),
                                    jax.random.PRNGKey(200 + ep))
        loss_t = o.step_baseline("random")
        assert abs(float(m.loss) - loss_t) <= 1e-4 * max(1.0, abs(loss_t))
