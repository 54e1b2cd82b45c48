"""Row gather with a TPU-optimized scatter-add backward.

``gather_rows(table, idx)`` == ``table[idx]`` in the forward pass; the
backward accumulates per-row gradients back into the table:

    d table = scatter_add(d out, idx)

XLA lowers that scatter to a serialized kernel (~12 ms for 1M x 256 on
v5e); on TPU, when the accumulator fits comfortably in VMEM, we route it
through the blocked one-hot MXU kernel (ops/scatter_pallas.py, ~7 ms).
This is the hot path of the edge scorer's backward: two of these scatters
per training step at E ~= 1M (SURVEY.md section 7 "Segment ops with uneven
degree distributions").
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_VMEM_BUDGET_BYTES = 6 * 1024 * 1024


def _use_pallas_scatter(num_rows: int, feat: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    return num_rows * feat * 4 <= _VMEM_BUDGET_BYTES


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_rows(num_rows, table, idx):
    return table[idx]


def _gather_fwd(num_rows, table, idx):
    return table[idx], idx


def _gather_bwd(num_rows, idx, g):
    feat = g.shape[-1]
    if _use_pallas_scatter(num_rows, feat):
        from .scatter_pallas import scatter_add_pallas
        dt = scatter_add_pallas(g, idx, num_rows)
    else:
        dt = jax.ops.segment_sum(g.astype(jnp.float32), idx,
                                 num_segments=num_rows)
    return dt.astype(g.dtype), None


_gather_rows.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(table, idx):
    return _gather_rows(table.shape[0], table, idx)
