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


# ---------------------------------------------------------------------------
# VMEM working-set model — the single source of truth for "does the one-hot
# kernel fit?". The scoped-vmem limit on v5e is 16 MB; the kernel's true
# working set is NOT just the f32 accumulator (the round-3 gate's mistake,
# which shipped a compile-time OOM at N=6128/F=256/block=1024 — see
# logs/quality_SyntheticLarge_hybrid_tpu.log): it also holds the
# (N_pad, block) one-hot panel built per block, the input block, and the
# ids block. We budget 12 MB (the measured allocator overhead is ~-7% vs
# this model, so 12 MB modeled keeps real usage ~< 13 MB) and auto-shrink
# the block 1024 -> 512 -> 256 before falling off to XLA.
# ---------------------------------------------------------------------------

_SCATTER_VMEM_BUDGET = 12 * 1024 * 1024
_SCATTER_BLOCKS = (1024, 512, 256)


def scatter_vmem_bytes(num_segments: int, feat: int, itemsize: int,
                       block: int) -> int:
    """Modeled scoped-VMEM working set of ``scatter_add_pallas`` for one
    grid step: one-hot panel + f32 accumulator + input vals block + ids."""
    n_pad = _round_up(max(num_segments, 8), 8)
    onehot = n_pad * block * itemsize
    acc = n_pad * feat * 4
    vals_blk = block * feat * itemsize
    ids_blk = block * 4
    return onehot + acc + vals_blk + ids_blk


def scatter_block_for(num_segments: int, feat: int, itemsize: int = 2):
    """Largest block in {1024, 512, 256} whose modeled working set fits the
    VMEM budget, or None when even block=256 does not fit (caller must fall
    back to XLA's serialized scatter)."""
    for block in _SCATTER_BLOCKS:
        if scatter_vmem_bytes(num_segments, feat, itemsize,
                              block) <= _SCATTER_VMEM_BUDGET:
            return block
    return None


def sorted_scatter_vmem_bytes(band: int, feat: int, itemsize: int,
                              block: int, num_segments: int) -> int:
    """Working set of ``scatter_add_sorted_pallas``: banded one-hot +
    full f32 accumulator (+ band slack rows) + input block."""
    n_pad = _round_up(max(num_segments, 8), 8) + _round_up(max(band, 8), 8)
    onehot = band * block * itemsize
    acc = n_pad * feat * 4
    vals_blk = block * feat * itemsize
    return onehot + acc + vals_blk + block * 4


def sorted_scatter_block_for(num_segments: int, feat: int, band: int,
                             itemsize: int = 2):
    """Block choice for the banded kernel under the same budget."""
    for block in _SCATTER_BLOCKS:
        if sorted_scatter_vmem_bytes(band, feat, itemsize, block,
                                     num_segments) <= _SCATTER_VMEM_BUDGET:
            return block
    return None


# ---------------------------------------------------------------------------
# Sorted narrow-band kernel
#
# When ids are sorted, a block of B consecutive items touches a *contiguous*
# range of segments whose width ("band") is last-first+1 — tiny for the
# high-average-degree partitions this framework trains on (e.g. ~3 nodes per
# 1024-edge block on Reddit clusters). Building the one-hot only over that
# band cuts the MXU work from N*B*F to band*B*F per block and leaves the
# kernel HBM-bandwidth-bound. The band is data-dependent but static per
# graph: callers compute it once on the host at graph build
# (`required_band`) and the kernel specializes to it.
# ---------------------------------------------------------------------------


def _make_sorted_kernel(band: int):
    def kernel(starts_ref, ids_ref, vals_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        start = pl.multiple_of(starts_ref[b], 8)
        ids = ids_ref[0, 0, :]               # (B,) int32, sorted
        vals = vals_ref[0]                   # (B, F)
        lids = ids - start                   # local offsets; out-of-band
        iota_b = jax.lax.broadcasted_iota(   # (incl. padding) match no row
            jnp.int32, (band, lids.shape[0]), 0)
        oh = (iota_b == lids[None, :]).astype(vals.dtype)   # (band, B)
        # MXU truncates f32 operands to bf16 at default precision; the
        # one-hot side is exact either way, so only f32 vals need HIGHEST
        prec = (jax.lax.Precision.HIGHEST if vals.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        part = jax.lax.dot(oh, vals, precision=prec,
                           preferred_element_type=jnp.float32)
        sl = pl.ds(start, band)
        out_ref[sl, :] += part

    return kernel


def required_band(ids_sorted, block: int = 1024, align: int = 8) -> int:
    """Max segment span of any `block`-item window of the sorted id array,
    measured from the window's `align`-aligned origin; host-side, static
    per graph. Returns a multiple of `align`."""
    import numpy as np
    ids_sorted = np.asarray(ids_sorted)
    e = ids_sorted.shape[0]
    if e == 0:
        return align
    e_pad = _round_up(e, block)
    ids_p = np.concatenate(
        [ids_sorted, np.full(e_pad - e, ids_sorted[-1], ids_sorted.dtype)])
    firsts = ids_p[::block] // align * align
    lasts = ids_p[block - 1::block]
    span = int((lasts - firsts).max()) + 1
    return _round_up(max(span, align), align)


@functools.partial(jax.jit, static_argnames=("num_segments", "band", "block",
                                             "interpret"))
def scatter_add_sorted_pallas(vals, ids_sorted, num_segments: int,
                              band: int = 256, block: int = 1024,
                              interpret: bool = False):
    """Narrow-band scatter-add over SORTED ids. vals (E, F), ids (E,) int32
    non-decreasing -> (num_segments, F) float32. `band` must be >=
    required_band(ids, block) or contributions outside the band are DROPPED
    (padding relies on exactly this: ids padded with num_segments+band never
    match a band row)."""
    e, f = vals.shape
    band = min(_round_up(band, 8), 1 << 30)
    n_pad = _round_up(max(num_segments, 8), 8) + band  # slack for band slices
    e_pad = _round_up(e, block)
    if e_pad != e:
        vals = jnp.pad(vals, ((0, e_pad - e), (0, 0)))
        ids_sorted = jnp.pad(ids_sorted, (0, e_pad - e),
                             constant_values=num_segments + band)
    nblocks = e_pad // block
    ids2 = ids_sorted.reshape(nblocks, 1, block).astype(jnp.int32)
    vals2 = vals.reshape(nblocks, block, f)
    # aligned band origin per block, clamped so the ds stays in bounds
    starts = jnp.minimum(ids2[:, 0, 0] // 8 * 8,
                         jnp.int32(n_pad - band)).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i, s: (i, 0, 0)),
            pl.BlockSpec((1, block, f), lambda i, s: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, f), lambda i, s: (0, 0)),
    )
    out = pl.pallas_call(
        _make_sorted_kernel(band),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(starts, ids2, vals2)
    return out[:num_segments]


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
    prec = (jax.lax.Precision.HIGHEST if vals.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[:] += jax.lax.dot(oh, vals, precision=prec,
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
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
            pl.BlockSpec((1, block, f), lambda i: (i, 0, 0),
                         memory_space=pl.ANY
                         if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, f), lambda i: (0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(ids2, vals2)
    return out[:num_segments]


# ---------------------------------------------------------------------------
# Scalar segment-sum (degree / weighted-degree) kernel
#
# deg[n] = sum over items i with ids[i]==n of w[i]. XLA lowers this scalar
# scatter to a serialized kernel (~4.5 ms at 200k items on v5e); here the
# one-hot trick again: oh (N x B) @ broadcast(w, (B, 128)) accumulates every
# lane to the same per-segment sum, and lane 0 is the answer. In-kernel
# broadcast means HBM traffic is just ids + w. Exact for unweighted counts
# (0/1 x 1 products, f32 accumulation); weighted sums round w to bf16 —
# consistent with the bf16 matmul precision used everywhere on TPU.
# ---------------------------------------------------------------------------


def _scalar_kernel(ids_ref, w_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[0, 0, :]                   # (B,) int32
    w_row = w_ref[0].astype(jnp.bfloat16)    # (1, B) — stays 2D: Mosaic
    n = out_ref.shape[0]                     # cannot reshape 1D -> 2D
    b = ids.shape[0]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, b), 0)
    # fold the weights into the one-hot rows, then row-sum via a dot with
    # a constant ones matrix (every output lane gets the same sum)
    oh_w = (iota_n == ids[None, :]).astype(jnp.bfloat16) * w_row  # (N, B)
    out_ref[:] += jax.lax.dot(oh_w, jnp.ones((b, 128), jnp.bfloat16),
                              preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_segments", "block",
                                             "interpret"))
def _segment_sum_scalar_pallas(w, ids, num_segments: int, block: int = 1024,
                               interpret: bool = False):
    e = w.shape[0]
    n_pad = _round_up(max(num_segments, 8), 8)
    e_pad = _round_up(e, block)
    if e_pad != e:
        w = jnp.pad(w, (0, e_pad - e))          # zero weight on padding
        ids = jnp.pad(ids, (0, e_pad - e))
    ids2 = ids.reshape(e_pad // block, 1, block).astype(jnp.int32)
    w2 = w.reshape(e_pad // block, 1, block)
    out = pl.pallas_call(
        _scalar_kernel,
        grid=(e_pad // block,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=interpret,
    )(ids2, w2)
    return out[:num_segments, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _segment_sum_scalar(num_segments, w, ids):
    return _segment_sum_scalar_impl(num_segments, w, ids)


def _segment_sum_scalar_impl(num_segments, w, ids):
    # same working-set model as the row kernel: the bf16 one-hot panel
    # (n_pad x block) dominates at large N, the f32 out is (n_pad x 128),
    # and the in-kernel ones matrix matches the vals-block term
    from ..core.fastpath import pallas_enabled
    block = scatter_block_for(num_segments, 128, itemsize=2)
    if (jax.default_backend() == "tpu" and block is not None
            and pallas_enabled()):
        return _segment_sum_scalar_pallas(w, ids, num_segments, block=block)
    return jax.ops.segment_sum(w.astype(jnp.float32), ids,
                               num_segments=num_segments)


def _segment_sum_scalar_fwd(num_segments, w, ids):
    return _segment_sum_scalar_impl(num_segments, w, ids), ids


def _segment_sum_scalar_bwd(num_segments, ids, g):
    return (g[ids], None)


_segment_sum_scalar.defvjp(_segment_sum_scalar_fwd, _segment_sum_scalar_bwd)


def segment_sum_scalar(w, ids, num_segments: int):
    """Scalar segment-sum (E,) -> (num_segments,) f32, TPU-fast.

    The hot op of GCN degree normalization (ops/gcn_norm.py). Linear in w
    with a gather backward; ids are non-differentiable.
    """
    return _segment_sum_scalar(num_segments, w, ids)
