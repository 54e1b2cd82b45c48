"""Pallas TPU kernel: blocked one-hot MXU scatter-accumulate.

Computes ``out[n] = sum over items i with ids[i]==n of vals[i]`` — the
scatter-add at the heart of every GNN backward (d h accumulation from
per-edge gradients) and of SpMM aggregation. XLA lowers this to a serialized
scatter on TPU; this kernel instead converts the scatter into MXU matmuls:

    per block b of B items:  OH = onehot(ids_b)          (N x B)
                             acc += OH @ vals_b           (MXU, f32 acc)

The grid walks edge blocks sequentially; the (N, F) accumulator lives in
VMEM the whole time (requires N*F*4 bytes <~ 8 MB — always true for cluster
partitions, whose node counts are ~2k). FLOP cost is N*F*2 per item —
wasteful in FLOPs but MXU FLOPs are nearly free at these sizes, and it
removes the scatter serialization entirely.

Used by the custom VJPs in ops/edge_gather.py; falls back to
jax.ops.segment_sum on non-TPU backends or when the accumulator exceeds
VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _scatter_kernel(ids_ref, vals_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[0, 0, :]                   # (B,) int32
    vals = vals_ref[0]                       # (B, F)
    n = out_ref.shape[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, ids.shape[0]), 0)
    oh = (iota_n == ids[None, :]).astype(vals.dtype)   # (N, B)
    out_ref[:] += jax.lax.dot(oh, vals,
                              preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_segments", "block",
                                             "interpret"))
def scatter_add_pallas(vals, ids, num_segments: int, block: int = 1024,
                       interpret: bool = False):
    """One-hot MXU scatter-add. vals (E, F), ids (E,) int32 ->
    (num_segments, F) float32. E is padded to a block multiple internally;
    padding rows scatter zeros to segment 0."""
    e, f = vals.shape
    n_pad = _round_up(max(num_segments, 8), 8)
    e_pad = _round_up(e, block)
    if e_pad != e:
        vals = jnp.pad(vals, ((0, e_pad - e), (0, 0)))
        ids = jnp.pad(ids, (0, e_pad - e))
    ids2 = ids.reshape(e_pad // block, 1, block).astype(jnp.int32)
    # reshape to expose the block dim for BlockSpec mapping
    vals2 = vals.reshape(e_pad // block, block, f)

    out = pl.pallas_call(
        _scatter_kernel,
        grid=(e_pad // block,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((1, block, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, f), lambda i: (0, 0),
                               memory_space=pltpu.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(ids2, vals2)
    return out[:num_segments]
