"""COO SpMM: y[r] = sum over edges e with receivers[e]==r of w[e] * x[senders[e]].

This is the hot kernel of every GNN forward/backward (the reference leans on
cuSPARSE / torch_sparse SpMM inside PyG convs, reference model.py:5). Two
implementations share one API:

  * ``spmm_xla``   — gather + segment_sum; XLA compiles this to a sorted
                     scatter-add. Correctness baseline; runs anywhere.
  * ``spmm_pallas``— edge-blocked Pallas TPU kernel (ops/spmm_pallas.py) for
                     graphs where the scatter path is bandwidth-bound.

``spmm`` dispatches on backend and array placement. The VJP is the SpMM of
the transposed graph plus an SDDMM for the weight gradient:

    dL/dx[s]  = sum_{e: senders[e]=s} w[e] * g[receivers[e]]   (transpose SpMM)
    dL/dw[e]  = <x[senders[e]], g[receivers[e]]>               (SDDMM)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

def _scatter_rows(vals, ids, num_segments):
    """Segment-sum (E, F) rows by ids, f32 accumulation. On TPU, when the
    kernel's true VMEM working set (one-hot panel + accumulator + input
    block, scatter_pallas.scatter_block_for) fits, route through the blocked
    one-hot MXU kernel (ops/scatter_pallas.py) — ~30% faster than XLA's
    serialized scatter at 200k x 256 (tools/microbench_encode.py), with the
    block auto-shrunk 1024->512->256 for mid-size N instead of falling off a
    cliff. bf16 rows keep the MXU fast path; f32 rows would pay
    HIGHEST-precision passes, so they stay on XLA."""
    from ..core.fastpath import pallas_enabled
    feat = vals.shape[-1]
    if (jax.default_backend() == "tpu" and vals.dtype == jnp.bfloat16
            and pallas_enabled()):
        from .scatter_pallas import scatter_add_pallas, scatter_block_for
        block = scatter_block_for(num_segments, feat, itemsize=2)
        if block is not None:
            return scatter_add_pallas(vals, ids, num_segments, block=block)
    return jax.ops.segment_sum(vals.astype(jnp.float32), ids,
                               num_segments=num_segments)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_core(num_nodes, senders, receivers, weights, x):
    return _spmm_fwd_impl(num_nodes, senders, receivers, weights, x)


def _spmm_fwd_impl(num_nodes, senders, receivers, weights, x):
    # multiply in x's (possibly bf16) dtype to halve HBM traffic; the
    # segment reduction accumulates in float32 either way — bf16
    # accumulation over high-degree nodes loses ~sqrt(deg) * 2^-8
    msgs = x[senders] * weights[:, None].astype(x.dtype)
    out = _scatter_rows(msgs, receivers, num_nodes)
    return out.astype(x.dtype)


def _spmm_fwd(num_nodes, senders, receivers, weights, x):
    out = _spmm_fwd_impl(num_nodes, senders, receivers, weights, x)
    return out, (senders, receivers, weights, x)


def _spmm_bwd(num_nodes, res, g):
    senders, receivers, weights, x = res
    # dx: route gradients backwards along reversed edges
    gw = g[receivers] * weights[:, None].astype(g.dtype)
    dx = _scatter_rows(gw, senders, num_nodes)
    # dw: SDDMM — per-edge inner product of endpoint feature/grad
    dw = jnp.sum(x[senders] * g[receivers], axis=-1).astype(weights.dtype)
    return (None, None, dw, dx.astype(x.dtype))


_spmm_core.defvjp(_spmm_fwd, _spmm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _spmm_unweighted(num_nodes, senders, receivers, x):
    return _scatter_rows(x[senders], receivers, num_nodes).astype(x.dtype)


def _spmm_unw_fwd(num_nodes, senders, receivers, x):
    return _spmm_unweighted(num_nodes, senders, receivers, x), \
        (senders, receivers)


def _spmm_unw_bwd(num_nodes, res, g):
    senders, receivers = res
    dx = _scatter_rows(g[receivers], senders, num_nodes)
    return (None, None, dx.astype(g.dtype))


_spmm_unweighted.defvjp(_spmm_unw_fwd, _spmm_unw_bwd)


def spmm_xla(senders, receivers, weights, x, num_nodes: int):
    """Weighted sparse-dense matmul via XLA segment_sum (with custom VJP).

    ``weights=None`` skips the per-edge multiply (plain adjacency SpMM) —
    GCN's symmetric normalization is node-separable, so the unweighted form
    plus node-level scaling covers the unweighted-conv hot path without
    touching an (E,)-sized array (models/layers.py GCNConv)."""
    if weights is None:
        return _spmm_unweighted(num_nodes, senders, receivers, x)
    return _spmm_core(num_nodes, senders, receivers, weights, x)


def spmm(senders, receivers, weights, x, num_nodes: int, backend: str = "auto"):
    """Dispatching SpMM. backend in {'auto', 'xla', 'pallas'}.

    'auto' picks the Pallas kernel on TPU for wide features, XLA otherwise.
    """
    if backend == "xla":
        return spmm_xla(senders, receivers, weights, x, num_nodes)
    if backend == "pallas":
        from .spmm_pallas import spmm_pallas
        if weights is None:
            weights = jnp.ones(senders.shape[0], dtype=jnp.float32)
        return spmm_pallas(senders, receivers, weights, x, num_nodes)
    # auto: default to the XLA path; the Pallas kernel is opted into by the
    # model layer once shapes are known to be profitable.
    return spmm_xla(senders, receivers, weights, x, num_nodes)
