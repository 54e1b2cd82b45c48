"""Pallas TPU kernel: blocked one-hot MXU row-select (dynamic gather).

``select_rows_pallas(table, idx)`` == ``table[idx]`` for a NARROW table
(num_rows x feat, feat <= ~128) — the reg2 consistency loss's access
pattern: two gathers of the (N, num_classes) GNN output at the q sampled
edge endpoints (train/losses.py consistency_loss). XLA lowers table[idx]
to per-row DMA at ~5-7 ns/row regardless of width
(tools/microbench_gather.py), so 2 x 200k-row gathers cost ~2.4 ms; the
one-hot select costs N*B*F MXU FLOPs per block — at N=2048, F<=128 that is
~0.17 ms per 200k-row gather, an order of magnitude under the DMA floor.

    per block b of B indices:  OH = onehot(idx_b)        (N x B)
                               out_b = OH^T-contracted dot with table

The pairing ``gather_rows`` (ops/edge_gather.py) keeps the DMA forward —
right for WIDE tables where N*B*F FLOPs exceed the DMA cost; this kernel
is the narrow-table complement. The custom VJP scatters cotangents back
with the one-hot scatter kernel (ops/scatter_pallas.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .scatter_pallas import (scatter_add_pallas, scatter_block_for,
                             _round_up)

_DN0 = (((0,), (0,)), ((), ()))      # contract dim0 x dim0


def _select_kernel(ids_ref, tab_ref, out_ref):
    ids = ids_ref[0, 0, :]                     # (B,) int32
    tab = tab_ref[:]                           # (Np, F)
    n = tab.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, ids.shape[0]), 0)
    oh = (iota == ids[None, :]).astype(tab.dtype)          # (Np, B)
    out_ref[0] = jax.lax.dot_general(
        oh, tab, _DN0, preferred_element_type=jnp.float32).astype(
            out_ref.dtype)                     # (B, F)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _select_rows_impl(table, idx, block: int = 1024,
                      interpret: bool = False):
    q = idx.shape[0]
    n, f = table.shape
    n_pad = _round_up(max(n, 8), 8)
    f_pad = _round_up(max(f, 128), 128)
    q_pad = _round_up(q, block)
    if (n_pad, f_pad) != (n, f):
        table = jnp.pad(table, ((0, n_pad - n), (0, f_pad - f)))
    if q_pad != q:
        idx = jnp.pad(idx, (0, q_pad - q))
    ids2 = idx.reshape(q_pad // block, 1, block).astype(jnp.int32)
    out = pl.pallas_call(
        _select_kernel,
        grid=(q_pad // block,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_pad, f_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, f_pad), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((q_pad // block, block, f_pad),
                                       table.dtype),
        interpret=interpret,
    )(ids2, table)
    return out.reshape(q_pad, f_pad)[:q, :f]


def _use_mxu_select(n: int, f: int) -> bool:
    from ..core.fastpath import pallas_enabled
    if jax.default_backend() != "tpu" or not pallas_enabled():
        return False
    # narrow tables only: one-hot FLOPs beat the per-row DMA latency floor
    # when N*F_pad stays small; and the whole padded table + one (Np, B)
    # panel must fit VMEM comfortably
    f_pad = _round_up(max(f, 128), 128)
    if f_pad > 256:
        return False
    n_pad = _round_up(max(n, 8), 8)
    vmem = n_pad * f_pad * 4 + n_pad * 1024 * 4 + 1024 * f_pad * 4
    return vmem <= 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _select_rows(num_rows, table, idx):
    return _select_rows_impl(table, idx)


def _select_fwd(num_rows, table, idx):
    return _select_rows_impl(table, idx), idx


def _select_bwd(num_rows, idx, g):
    f = g.shape[-1]
    gg = g.astype(jnp.bfloat16) if g.dtype == jnp.float32 else g
    block = scatter_block_for(num_rows, f, itemsize=2)
    if block is not None:
        dt = scatter_add_pallas(gg, idx, num_rows, block=block)
    else:
        dt = jax.ops.segment_sum(g.astype(jnp.float32), idx,
                                 num_segments=num_rows)
    return dt.astype(g.dtype), None


_select_rows.defvjp(_select_fwd, _select_bwd)


def gather_rows_narrow(table, idx):
    """table[idx] for a NARROW table, MXU one-hot on TPU, plain gather
    elsewhere. Differentiable in ``table`` (one-hot scatter backward)."""
    n, f = table.shape
    if _use_mxu_select(n, f):
        return _select_rows(n, table, idx)
    from .edge_gather import gather_rows
    return gather_rows(table, idx)
