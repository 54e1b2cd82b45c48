"""Row gather with a TPU-optimized scatter-add backward.

``gather_rows(table, idx)`` == ``table[idx]`` in the forward pass; the
backward accumulates per-row gradients back into the table:

    d table = scatter_add(d out, idx)

XLA lowers that scatter to a serialized kernel (~13 ms for 1M x 256 on
v5e); on TPU, when the accumulator fits comfortably in VMEM, we route it
through the blocked one-hot MXU kernel (ops/scatter_pallas.py, ~10 ms), and
— when the caller declares idx sorted with a static narrow band
(``sorted_band`` from ``required_band``) — through the banded kernel
(~5 ms). This is the hot path of the edge scorer's backward: two of these
scatters per training step at E ~= 1M (SURVEY.md section 7 "Segment ops
with uneven degree distributions"); sorting the static edge list by
destination at graph build makes the destination-side scatter banded
(PERF.md roadmap item 2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gather_rows(num_rows, sorted_band, table, idx):
    return table[idx]


def _gather_fwd(num_rows, sorted_band, table, idx):
    return table[idx], idx


def _gather_bwd(num_rows, sorted_band, idx, g):
    feat = g.shape[-1]
    orig_dtype = g.dtype
    from ..core.fastpath import pallas_enabled
    block = None
    if jax.default_backend() == "tpu" and pallas_enabled():
        # VMEM fit is decided by the kernels' true working-set model
        # (scatter_pallas.scatter_block_for), not just the accumulator; a
        # band computed at block=1024 stays a valid bound for the smaller
        # nested blocks, so shrinking block never drops contributions.
        from .scatter_pallas import (scatter_block_for,
                                     sorted_scatter_block_for)
        if sorted_band > 0:
            block = sorted_scatter_block_for(num_rows, feat, sorted_band)
        else:
            block = scatter_block_for(num_rows, feat, itemsize=2)
    if block is not None:
        # Truncate f32 cotangents to bf16 before the kernel: the MXU dot
        # would truncate its operands to bf16 at DEFAULT precision anyway
        # (accumulation stays f32), and bf16 vals halve the HBM traffic and
        # kernel VMEM footprint. Matches standard bf16-gradient training.
        if g.dtype == jnp.float32:
            g = g.astype(jnp.bfloat16)
        if sorted_band > 0:
            from .scatter_pallas import scatter_add_sorted_pallas
            dt = scatter_add_sorted_pallas(g, idx, num_rows,
                                           band=sorted_band, block=block)
        else:
            from .scatter_pallas import scatter_add_pallas
            dt = scatter_add_pallas(g, idx, num_rows, block=block)
    else:
        sorted_hint = sorted_band > 0
        dt = jax.ops.segment_sum(g.astype(jnp.float32), idx,
                                 num_segments=num_rows,
                                 indices_are_sorted=sorted_hint)
    return dt.astype(orig_dtype), None


_gather_rows.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(table, idx, sorted_band: int = 0):
    """table[idx] with a fast TPU scatter-add backward.

    ``sorted_band`` > 0 asserts idx is non-decreasing with the given
    narrow-band bound (``scatter_pallas.required_band(idx)``); wrong bands
    silently DROP gradient contributions, so only pass values computed from
    the same static index array.
    """
    return _gather_rows(table.shape[0], int(sorted_band), table, idx)
