"""Dual-optimizer scheme with gated, name-filtered Adam groups.

The reference builds three torch Adam optimizers over name-filtered parameter
groups (reference main.py:98-123):

  * ``optimizer_gnn``       — params whose name contains 'gcn' (GCN/Cheb),
                              'GIN', or 'GAT'
  * ``optimizer_edge_prob`` — params whose name contains 'edge_prob_mlp'
  * ``optimizer``           — all params, with weight decay (used by the
                              random/edge/full modes)

and steps them conditionally per batch (training_hybrid.py:136-141,159):
gate passes -> edge step then gnn step; gate fails -> gnn step only.

Two quirks preserved on purpose:
  * the groups OVERLAP: with a GCN/GSAGE scorer, 'edge_prob_mlp/gcn1/...'
    matches BOTH filters, so those params receive the sum of both Adam
    updates when the gate passes (Adam's update depends only on grads and
    moments, so sequential steps == summed updates).
  * a skipped step does not advance that group's moments or step count
    (torch semantics) — implemented with jnp.where-selected state.

Everything is expressed as pure functions over pytrees so the whole update
lives inside one jit with `lax`-free boolean gating (both branches computed,
results selected) — the jit-friendly form of the reference's data-dependent
optimizer selection (SURVEY.md section 7 "Conditional gate under jit").
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


def _path_name(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def gnn_filter_for(gnn: str) -> Callable[[str], bool]:
    """Name filter replicating reference main.py:100/103/106/109."""
    token = {"GCN": "gcn", "Cheb": "gcn", "GIN": "GIN", "GAT": "GAT"}[gnn]
    return lambda name: token in name


def edge_filter(name: str) -> bool:
    return "edge_prob_mlp" in name


def make_mask(params, name_pred: Callable[[str], bool]):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(name_pred(_path_name(path))), params)


class AdamGroupState(NamedTuple):
    count: jax.Array   # scalar int32
    mu: Any            # pytree like params
    nu: Any            # pytree like params


class DualOptState(NamedTuple):
    gnn: AdamGroupState
    edge: AdamGroupState
    all: AdamGroupState


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def init_dual_opt(params) -> DualOptState:
    def grp():
        return AdamGroupState(jnp.zeros((), jnp.int32),
                              _zeros_like_tree(params),
                              _zeros_like_tree(params))
    return DualOptState(gnn=grp(), edge=grp(), all=grp())


def _adam_group_update(state: AdamGroupState, grads, params, mask, do,
                       lr: float, b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, weight_decay: float = 0.0):
    """One gated, masked Adam step. ``do`` is a traced bool scalar; ``mask``
    a static pytree of python bools. Returns (new_state, update_tree) where
    updates are zero outside the mask or when gated off."""
    do_f = jnp.asarray(do, jnp.float32)
    count = state.count + jnp.asarray(do, jnp.int32)
    t = jnp.maximum(count, 1).astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def leaf(m, v, g, p, in_group):
        if not in_group:
            return m, v, jnp.zeros_like(p)
        if weight_decay:
            g = g + weight_decay * p
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * (g * g)
        m_sel = do_f * m_new + (1.0 - do_f) * m
        v_sel = do_f * v_new + (1.0 - do_f) * v
        upd = -lr * (m_sel / bc1) / (jnp.sqrt(v_sel / bc2) + eps)
        return m_sel, v_sel, do_f * upd

    flat_m, treedef = jax.tree_util.tree_flatten(state.mu)
    flat_v = jax.tree_util.tree_leaves(state.nu)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_mask = jax.tree_util.tree_leaves(mask)
    out_m, out_v, out_u = [], [], []
    for m, v, g, p, im in zip(flat_m, flat_v, flat_g, flat_p, flat_mask):
        nm, nv, u = leaf(m, v, g, p, im)
        out_m.append(nm); out_v.append(nv); out_u.append(u)
    new_state = AdamGroupState(
        count,
        jax.tree_util.tree_unflatten(treedef, out_m),
        jax.tree_util.tree_unflatten(treedef, out_v))
    updates = jax.tree_util.tree_unflatten(treedef, out_u)
    return new_state, updates


@dataclasses.dataclass(frozen=True)
class DualOptimizer:
    """Holds the static masks + hyperparams; all methods are jit-safe."""
    lr: float
    weight_decay: float
    gnn_mask: Any      # static pytrees of python bools
    edge_mask: Any
    all_mask: Any

    @staticmethod
    def create(params, gnn: str, lr: float, weight_decay: float
               ) -> "DualOptimizer":
        return DualOptimizer(
            lr=lr, weight_decay=weight_decay,
            gnn_mask=make_mask(params, gnn_filter_for(gnn)),
            edge_mask=make_mask(params, edge_filter),
            all_mask=jax.tree_util.tree_map(lambda _: True, params))

    def init(self, params) -> DualOptState:
        return init_dual_opt(params)

    def step_learned(self, params, grads, state: DualOptState, update_edge):
        """Learned-mode update: gnn group always steps, edge group steps only
        when ``update_edge`` (the conditional gate) is true
        (reference training_hybrid.py:135-141)."""
        new_edge, upd_e = _adam_group_update(
            state.edge, grads, params, self.edge_mask, update_edge, self.lr)
        new_gnn, upd_g = _adam_group_update(
            state.gnn, grads, params, self.gnn_mask, True, self.lr)
        params = jax.tree_util.tree_map(
            lambda p, a, b: p + a + b, params, upd_e, upd_g)
        return params, DualOptState(gnn=new_gnn, edge=new_edge, all=state.all)

    def step_gnn_only(self, params, grads, state: DualOptState):
        """Small-batch path (E <= q): only optimizer_gnn steps
        (reference training_hybrid.py:142-147)."""
        new_gnn, upd_g = _adam_group_update(
            state.gnn, grads, params, self.gnn_mask, True, self.lr)
        params = jax.tree_util.tree_map(lambda p, a: p + a, params, upd_g)
        return params, state._replace(gnn=new_gnn)

    def step_all(self, params, grads, state: DualOptState):
        """random/edge/full modes: the third optimizer, with weight decay
        (reference main.py:123, training_hybrid.py:159/173/180)."""
        new_all, upd = _adam_group_update(
            state.all, grads, params, self.all_mask, True, self.lr,
            weight_decay=self.weight_decay)
        params = jax.tree_util.tree_map(lambda p, a: p + a, params, upd)
        return params, state._replace(all=new_all)
