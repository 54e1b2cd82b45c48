"""Fused sampled-edge score-head kernel (Pallas TPU), forward + backward.

The hybrid fast path's gradient head re-runs the score MLP on the q sampled
edges (train/pipelines.py, reference training_hybrid.py:86: gradients only
ever reach the scorer through probs_full[idx]).  The XLA lowering costs
~9 ms at q=200k, F=256 on v5e: two per-row-DMA endpoint gathers (~2.4 ms),
HBM round-trips for the (q, 2F) features and (q, K) activations, and two
one-hot MXU scatter-adds for dh (~4-5 ms).  The sampled indices are dynamic
and UNSORTED, so neither the banded scatter nor the static tile layout of
ops/score_tiles.py applies.

This kernel keeps the whole (N, F) embedding table VMEM-resident (cluster
partitions have N ~= 2k) and fuses per edge block:

    one-hot(N, B) selects on the MXU  ->  hu, hv            (no DMA gathers)
    z = (hu*hv) @ W1a + (hu-hv) @ W1b + b1; relu; dropout   (no concat)
    p = sigmoid(z @ w2 + b2)

The backward kernel receives dp, RECOMPUTES the forward per block (the
dropout mask is regenerated from the same per-block PRNG seed — remat by
construction, so `--hybrid_checkpoint` is subsumed), and accumulates
  dh   += OHs @ dhu + OHr @ dhv        (VMEM accumulator, one HBM write)
  dW1a += (hu*hv)^T dz   dW1b += (hu-hv)^T dz   db1, dw2, db2
across the sequential grid.  The (q, F) hu/hv gathered rows DO round-trip
HBM as residuals by design (the backward reuses them instead of re-running
the two one-hot selects — an A/B-measured recompute-vs-traffic win); all
other intermediates (z, activations, one-hot panels) stay in VMEM.

FLOP cost is N*F*2 per edge per one-hot op (4 per edge over fwd+bwd) —
the standing one-hot tax for dynamic indices (PERF.md: Mosaic cannot
express per-row dynamic VMEM gather) — but HBM traffic drops to the ids,
dp, and one dh write, and all four gather/scatter ops plus the head ride a
single kernel launch per pass.

r5 sorted-head fast path: when the caller samples in sorted order
(train/pipelines.py sorts the q sampled indices — ascending tile slots
put SENDERS in near-sorted order under the sender-tile-major layout of
ops/score_tiles.py, ascending edge ids put RECEIVERS in sorted order on
the receiver-sorted edge list), the near-sorted side's two one-hot ops run
BANDED: a per-block 8-aligned band origin rides scalar prefetch and the
panel shrinks to (band, B) — band/N of the FLOPs (1/8 at the bench shapes,
A/B-measured 33.3 -> 35.4M edges/s including the ~1.6 ms in-step sort).
An in-graph coverage predicate (_band_starts) dispatches the step to the
full-N kernel whenever any block's span exceeds the band: a pathological
sample is slow, never wrong.

Dropout uses the in-kernel TPU PRNG (pltpu.prng_random_bits), a different
stream than flax's jax.random — statistically equivalent noise; identical
bits are regenerated in the backward so the VJP is exact for the sampled
function (same contract as ops/score_tiles.py's forward kernel).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


_VMEM_BUDGET = 14 * 1024 * 1024


def fused_head_block(n: int, f: int, k: int):
    """Largest edge-block size whose working set fits VMEM, or None.

    TPU backend, MXU-aligned head widths, and the BACKWARD pass's working
    set — the peak of the two — within the VMEM budget: two one-hot
    panels, the h table + f32 dh accumulator, the activation buffers, plus
    the dW1a/dW1b f32 accumulators and the hu/hv-residual and dp blocks
    the backward keeps resident.  The 14MB budget leaves ~2MB of the 16MB
    scoped-vmem limit as headroom (the bench config N=2048/F=K=256 models
    at 13.6MB at block=512 and compiles/runs on v5e).  When block=512 does
    not fit (e.g. the Reddit-scale N=2312 partitions after the r5
    cap-slack retune), smaller blocks are tried — the one-hot FLOPs per
    edge are block-independent (N*F*2), only panel memory and grid length
    change.  ``SGS_FUSED_HEAD=off|on`` overrides the auto decision (A/B
    escape hatch; `on` still requires TPU + fit)."""
    import os
    from ..core.fastpath import pallas_enabled
    override = os.environ.get("SGS_FUSED_HEAD", "auto").lower()
    if override == "off" or not pallas_enabled():
        return None
    if jax.default_backend() != "tpu":
        return None
    if f % 128 != 0 or k % 128 != 0:
        return None
    n_pad = _round_up(max(n, 8), 8)
    for block in (512, 256, 128):
        onehots = 2 * n_pad * block * 2
        tables = n_pad * f * (2 + 4)      # h (bf16) + dh accumulator (f32)
        buffers = 8 * block * max(f, k) * 4
        weights = 2 * f * k * 2 + 2 * k * 4 + f * 4  # W1a/W1b + b1/w2/b2
        bwd_acc = 2 * f * k * 4                      # dW1a/dW1b f32
        bwd_blocks = 3 * block * max(f, k) * 4       # hu, hv residuals + dp
        if (onehots + tables + buffers + weights + bwd_acc
                + bwd_blocks <= _VMEM_BUDGET):
            return block
    return None


def use_fused_sampled_head(n: int, f: int, k: int, block: int = 512) -> bool:
    """Back-compat boolean gate (see fused_head_block)."""
    return fused_head_block(n, f, k) is not None


def _dropout_consts(drop_rate: float):
    keep = 1.0 - drop_rate
    thresh = np.uint32(min(int(drop_rate * (1 << 32)), (1 << 32) - 1))
    return keep, thresh


def _onehot(ids, n, dtype):
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, ids.shape[0]), 0)
    return (iota == ids[None, :]).astype(dtype)          # (N, B)


_DN0 = (((0,), (0,)), ((), ()))      # contract dim0 x dim0


def _make_fwd_kernel(bk: int, k: int, drop_rate: float, band: int = 0):
    """Forward kernel. ``band`` > 0 = the sid side is near-sorted and a
    per-block band start is supplied (starts_ref, SMEM): the sid one-hot
    shrinks from (Np, B) to (band, B) and selects from a dynamic band slice
    of h — the r5 sorted-head fast path (PERF.md). Out-of-band sids match
    no one-hot row and are silently dropped, so callers must dispatch to
    the band=0 kernel whenever the step's measured span exceeds ``band``
    (_fwd_call's lax.cond does exactly that)."""
    keep, thresh = _dropout_consts(drop_rate)

    def kernel(*refs):
        if band > 0:
            starts_ref = refs[0]
            refs = refs[1:]
        (seed_ref, sid_ref, rid_ref, h_ref, w1a_ref, w1b_ref, b1_ref,
         w2_ref, b2_ref, out_ref, hu_ref, hv_ref) = refs
        i = pl.program_id(0)
        sid = sid_ref[0, 0, :]                    # (B,) int32
        rid = rid_ref[0, 0, :]
        h = h_ref[:]                              # (Np, F)
        n = h.shape[0]
        if band > 0:
            start = pl.multiple_of(starts_ref[i], 8)
            hb = h_ref[pl.ds(start, band), :]     # (band, F)
            ohs = _onehot(sid - start, band, h.dtype)
            hu = jax.lax.dot_general(ohs, hb, _DN0,
                                     preferred_element_type=jnp.float32)
        else:
            ohs = _onehot(sid, n, h.dtype)        # (Np, B)
            hu = jax.lax.dot_general(ohs, h, _DN0,
                                     preferred_element_type=jnp.float32)
        ohr = _onehot(rid, n, h.dtype)
        hv = jax.lax.dot_general(ohr, h, _DN0,
                                 preferred_element_type=jnp.float32)
        hu = hu.astype(h.dtype)                   # (B, F)
        hv = hv.astype(h.dtype)
        # residuals: the backward kernel reuses the gathered rows instead of
        # re-running the two one-hot selects (the A/B-measured recompute tax)
        hu_ref[0] = hu
        hv_ref[0] = hv
        z = jax.lax.dot(hu * hv, w1a_ref[:],
                        preferred_element_type=jnp.float32)
        z += jax.lax.dot(hu - hv, w1b_ref[:],
                         preferred_element_type=jnp.float32)
        z += b1_ref[0, :][None, :].astype(jnp.float32)
        z = jnp.maximum(z, 0.0)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + i)
            bits = pltpu.bitcast(pltpu.prng_random_bits((bk, k)), jnp.uint32)
            z = jnp.where(bits >= thresh, z * (1.0 / keep), 0.0)
        w2 = w2_ref[0, :][None, :].astype(jnp.float32)
        logit = jnp.sum(z * w2, axis=1) + b2_ref[0, 0]
        out_ref[0, 0, :] = jax.nn.sigmoid(logit)

    return kernel


def _make_bwd_kernel(bk: int, k: int, drop_rate: float, band: int = 0):
    """Backward kernel. ``band`` > 0 turns the sid-side dh scatter into a
    banded accumulate (one-hot (band, B) into dh[start:start+band]) — same
    coverage contract as the forward's banded select."""
    keep, thresh = _dropout_consts(drop_rate)

    def kernel(*refs):
        if band > 0:
            starts_ref = refs[0]
            refs = refs[1:]
        (seed_ref, sid_ref, rid_ref, dp_ref, hu_ref, hv_ref,
         w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref,
         dh_ref, dw1a_ref, dw1b_ref, db1_ref, dw2_ref, db2_ref) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
            dw1b_ref[:] = jnp.zeros_like(dw1b_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dw2_ref[:] = jnp.zeros_like(dw2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        sid = sid_ref[0, 0, :]
        rid = rid_ref[0, 0, :]
        n = dh_ref.shape[0]
        hu = hu_ref[0]                            # (B, F) residuals from fwd
        hv = hv_ref[0]
        if band > 0:
            start = pl.multiple_of(starts_ref[i], 8)
            ohs = _onehot(sid - start, band, hu.dtype)   # (band, B)
        else:
            ohs = _onehot(sid, n, hu.dtype)       # (Np, B): for dh scatters
        ohr = _onehot(rid, n, hu.dtype)
        prod = hu * hv
        diff = hu - hv
        w1a = w1a_ref[:]
        w1b = w1b_ref[:]
        z1 = jax.lax.dot(prod, w1a, preferred_element_type=jnp.float32)
        z1 += jax.lax.dot(diff, w1b, preferred_element_type=jnp.float32)
        z1 += b1_ref[0, :][None, :].astype(jnp.float32)
        zr = jnp.maximum(z1, 0.0)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + i)
            bits = pltpu.bitcast(pltpu.prng_random_bits((bk, k)), jnp.uint32)
            keepmask = bits >= thresh
            zd = jnp.where(keepmask, zr * (1.0 / keep), 0.0)
        else:
            zd = zr
        w2 = w2_ref[0, :][None, :].astype(jnp.float32)    # (1, K)
        logit = jnp.sum(zd * w2, axis=1) + b2_ref[0, 0]
        p = jax.nn.sigmoid(logit)
        dlogit = dp_ref[0, 0, :] * p * (1.0 - p)          # (B,) f32

        db2_ref[:] += jnp.broadcast_to(jnp.sum(dlogit), db2_ref.shape)
        dw2_ref[0, :] += jnp.sum(zd * dlogit[:, None], axis=0)
        dzd = dlogit[:, None] * w2                        # (B, K)
        if drop_rate > 0.0:
            dzr = jnp.where(keepmask, dzd * (1.0 / keep), 0.0)
        else:
            dzr = dzd
        dz1 = jnp.where(z1 > 0.0, dzr, 0.0)               # (B, K) f32
        db1_ref[0, :] += jnp.sum(dz1, axis=0)
        dz1c = dz1.astype(hu.dtype)
        # weight grads: contract over the edge-block axis
        dw1a_ref[:] += jax.lax.dot_general(
            prod, dz1c, _DN0, preferred_element_type=jnp.float32)
        dw1b_ref[:] += jax.lax.dot_general(
            diff, dz1c, _DN0, preferred_element_type=jnp.float32)
        # input grads: contract over K
        dnk = (((1,), (1,)), ((), ()))
        dprod = jax.lax.dot_general(dz1c, w1a, dnk,
                                    preferred_element_type=jnp.float32)
        ddiff = jax.lax.dot_general(dz1c, w1b, dnk,
                                    preferred_element_type=jnp.float32)
        dhu = (dprod * hv.astype(jnp.float32) + ddiff).astype(hu.dtype)
        dhv = (dprod * hu.astype(jnp.float32) - ddiff).astype(hu.dtype)
        if band > 0:
            sl = pl.ds(start, band)
            dh_ref[sl, :] += jax.lax.dot(ohs, dhu,
                                         preferred_element_type=jnp.float32)
        else:
            dh_ref[:] += jax.lax.dot(ohs, dhu,
                                     preferred_element_type=jnp.float32)
        dh_ref[:] += jax.lax.dot(ohr, dhv,
                                 preferred_element_type=jnp.float32)

    return kernel


def _pad_inputs(sid, rid, dp=None, block=512):
    q = sid.shape[0]
    q_pad = _round_up(q, block)
    if q_pad != q:
        # edge-replicate the ids: keeps the last block's band narrow for
        # the sorted-head path (zero-padding would blow its span every
        # step); harmless for the full kernel (padding slots' fwd outputs
        # are sliced off and their bwd cotangent is zero)
        sid = jnp.pad(sid, (0, q_pad - q), mode="edge")
        rid = jnp.pad(rid, (0, q_pad - q), mode="edge")
        if dp is not None:
            dp = jnp.pad(dp, (0, q_pad - q))          # zero cotangent
    nb = q_pad // block
    sid2 = sid.reshape(nb, 1, block).astype(jnp.int32)
    rid2 = rid.reshape(nb, 1, block).astype(jnp.int32)
    dp2 = None if dp is None else dp.reshape(nb, 1, block)
    return sid2, rid2, dp2, nb


def _band_starts(sid2, n_rows: int, band: int):
    """Per-block aligned band origins + the step's coverage predicate.

    Correctness contract of the banded kernels: every id in block b must
    fall in [starts[b], starts[b] + band). starts is the 8-aligned block
    minimum (clamped so the dynamic slice stays in bounds); ``ok`` is True
    iff the contract holds for EVERY block this step — the caller
    dispatches to the full-N kernel otherwise, so a pathological sample is
    slow, never wrong."""
    ids = sid2[:, 0, :]                               # (nb, block)
    bmin = jnp.min(ids, axis=1)
    bmax = jnp.max(ids, axis=1)
    starts = jnp.clip(bmin // 8 * 8, 0, n_rows - band).astype(jnp.int32)
    ok = jnp.all(bmax - starts + 1 <= band)
    return starts, ok


def _smem_spec(interpret, scalar_arg: bool = False):
    space = pl.ANY if interpret else pltpu.SMEM
    if scalar_arg:        # under PrefetchScalarGridSpec index maps take s
        return pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=space)
    return pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=space)


def _common_specs(block, f, k, interpret):
    idx = pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0))
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))
    return idx, full


@functools.partial(jax.jit, static_argnames=("block", "drop_rate", "band",
                                             "interpret"))
def _fwd_call(h, w1a, w1b, b1, w2, b2, sid, rid, seed,
              block: int, drop_rate: float, band: int = 0,
              interpret: bool = False):
    q = sid.shape[0]
    f = h.shape[1]
    k = w1a.shape[1]
    sid2, rid2, _, nb = _pad_inputs(sid, rid, block=block)
    idx, full = _common_specs(block, f, k, interpret)
    blkf = pl.BlockSpec((1, block, f), lambda i: (i, 0, 0))
    out_shape = [jax.ShapeDtypeStruct((nb, 1, block), jnp.float32),
                 jax.ShapeDtypeStruct((nb, block, f), h.dtype),
                 jax.ShapeDtypeStruct((nb, block, f), h.dtype)]

    def call_full(_starts):
        return pl.pallas_call(
            _make_fwd_kernel(block, k, drop_rate, 0),
            grid=(nb,),
            in_specs=[_smem_spec(interpret), idx, idx, full(h.shape[0], f),
                      full(f, k), full(f, k), full(1, k), full(1, k),
                      full(1, 1)],
            out_specs=[pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
                       blkf, blkf],
            out_shape=out_shape,
            interpret=interpret,
        )(seed, sid2, rid2, h, w1a, w1b, b1, w2, b2)

    def call_banded(starts):
        # per-block band origins ride scalar prefetch (packed SMEM — a
        # plain (nb, 1) SMEM input is lane-padded 128x and blows the SMEM
        # budget at Reddit-scale nb)
        idx_s = pl.BlockSpec((1, 1, block), lambda i, s: (i, 0, 0))
        blkf_s = pl.BlockSpec((1, block, f), lambda i, s: (i, 0, 0))
        full_s = lambda a, b: pl.BlockSpec((a, b), lambda i, s: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[_smem_spec(interpret, scalar_arg=True), idx_s, idx_s,
                      full_s(h.shape[0], f), full_s(f, k), full_s(f, k),
                      full_s(1, k), full_s(1, k), full_s(1, 1)],
            out_specs=[pl.BlockSpec((1, 1, block), lambda i, s: (i, 0, 0)),
                       blkf_s, blkf_s],
        )
        return pl.pallas_call(
            _make_fwd_kernel(block, k, drop_rate, band),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(starts, seed, sid2, rid2, h, w1a, w1b, b1, w2, b2)

    if band > 0 and band < h.shape[0]:
        starts, ok = _band_starts(sid2, h.shape[0], band)
        out, hu, hv = jax.lax.cond(ok, call_banded, call_full, starts)
    else:
        out, hu, hv = call_full(None)
    return out.reshape(nb * block)[:q], hu, hv


@functools.partial(jax.jit, static_argnames=("n_pad", "block", "drop_rate",
                                             "band", "interpret"))
def _bwd_call(hu, hv, w1a, w1b, b1, w2, b2, sid, rid, seed, dp,
              n_pad: int, block: int, drop_rate: float, band: int = 0,
              interpret: bool = False):
    f = hu.shape[-1]
    k = w1a.shape[1]
    sid2, rid2, dp2, nb = _pad_inputs(sid, rid, dp.astype(jnp.float32),
                                      block=block)
    idx, full = _common_specs(block, f, k, interpret)
    blkf = pl.BlockSpec((1, block, f), lambda i: (i, 0, 0))

    out_shape = [jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                 jax.ShapeDtypeStruct((f, k), jnp.float32),
                 jax.ShapeDtypeStruct((f, k), jnp.float32),
                 jax.ShapeDtypeStruct((1, k), jnp.float32),
                 jax.ShapeDtypeStruct((1, k), jnp.float32),
                 jax.ShapeDtypeStruct((1, 128), jnp.float32)]

    def call_full(_starts):
        return pl.pallas_call(
            _make_bwd_kernel(block, k, drop_rate, 0),
            grid=(nb,),
            in_specs=[_smem_spec(interpret), idx, idx, idx, blkf, blkf,
                      full(f, k), full(f, k), full(1, k), full(1, k),
                      full(1, 1)],
            out_specs=[full(n_pad, f), full(f, k), full(f, k), full(1, k),
                       full(1, k), full(1, 128)],
            out_shape=out_shape,
            interpret=interpret,
        )(seed, sid2, rid2, dp2, hu, hv, w1a, w1b, b1, w2, b2)

    def call_banded(starts):
        idx_s = pl.BlockSpec((1, 1, block), lambda i, s: (i, 0, 0))
        blkf_s = pl.BlockSpec((1, block, f), lambda i, s: (i, 0, 0))
        full_s = lambda a, b: pl.BlockSpec((a, b), lambda i, s: (0, 0))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[_smem_spec(interpret, scalar_arg=True), idx_s, idx_s,
                      idx_s, blkf_s, blkf_s,
                      full_s(f, k), full_s(f, k), full_s(1, k),
                      full_s(1, k), full_s(1, 1)],
            out_specs=[full_s(n_pad, f), full_s(f, k), full_s(f, k),
                       full_s(1, k), full_s(1, k), full_s(1, 128)],
        )
        return pl.pallas_call(
            _make_bwd_kernel(block, k, drop_rate, band),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(starts, seed, sid2, rid2, dp2, hu, hv, w1a, w1b, b1, w2, b2)

    if band > 0 and band < n_pad:
        # same starts/predicate as the forward (recomputed from the same
        # padded ids — deterministic), so fwd and bwd take the same branch
        starts, ok = _band_starts(sid2, n_pad, band)
        outs = jax.lax.cond(ok, call_banded, call_full, starts)
    else:
        outs = call_full(None)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _score_sampled(h, w1a, w1b, b1, w2, b2, sid, rid,
                   block, drop_rate, band, interpret, seed):
    out, _, _ = _fwd_call(h, w1a, w1b, b1, w2, b2, sid, rid, seed,
                          block, drop_rate, band, interpret)
    return out


def _score_sampled_fwd(h, w1a, w1b, b1, w2, b2, sid, rid,
                       block, drop_rate, band, interpret, seed):
    out, hu, hv = _fwd_call(h, w1a, w1b, b1, w2, b2, sid, rid, seed,
                            block, drop_rate, band, interpret)
    # zero-size token: carries h's row count + dtype into the bwd rule
    # (custom_vjp residuals must be arrays)
    h_tok = jnp.zeros((h.shape[0], 0), h.dtype)
    return out, (h_tok, hu, hv, w1a, w1b, b1, w2, b2, sid, rid, seed)


def _score_sampled_bwd(block, drop_rate, band, interpret, res, dp):
    h_tok, hu, hv, w1a, w1b, b1, w2, b2, sid, rid, seed = res
    n_pad, h_dtype = h_tok.shape[0], h_tok.dtype
    dh, dw1a, dw1b, db1, dw2, db2 = _bwd_call(
        hu, hv, w1a, w1b, b1, w2, b2, sid, rid, seed, dp,
        n_pad, block, drop_rate, band, interpret)
    return (dh.astype(h_dtype), dw1a.astype(w1a.dtype),
            dw1b.astype(w1b.dtype), db1.reshape(b1.shape).astype(b1.dtype),
            dw2.reshape(w2.shape).astype(w2.dtype),
            db2[0, :1].reshape(b2.shape).astype(b2.dtype),
            None, None, None)


_score_sampled.defvjp(_score_sampled_fwd, _score_sampled_bwd)


#: static band width of the sorted-head fast path (rows; multiple of 8).
#: 256 covers the p99 block span with ~10x margin on the bench partition
#: profile (tools/microbench_sort.py) while cutting the sid-side one-hot
#: FLOPs by n_pad/256 (8x at N=2048); a step whose sample exceeds it
#: falls back to the full kernel via the in-graph coverage predicate.
DEFAULT_HEAD_BAND = 256


def score_head_sampled(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                       senders, receivers, *, drop_rate: float = 0.0,
                       seed=0, block: int = 512, sorted_side: str = "",
                       band: int = DEFAULT_HEAD_BAND,
                       interpret: bool = False):
    """Differentiable fused score head over dynamic edge indices.

    ``h`` is (N, F) node embeddings (any float dtype; bf16 on the TPU hot
    path); fc1_kernel is the (2F, K) concat-layout kernel whose
    product/difference halves are split in-kernel (no concat is formed);
    fc2_kernel is (K, 1).  Returns (q,) float32 probabilities ==
    sigmoid(fc2(drop(relu(fc1([h_u*h_v || h_u-h_v]))))) and differentiates
    w.r.t. h and all four head parameters (indices/seed get no cotangent).
    Gate with `use_fused_sampled_head` — the one-hot working set must fit
    VMEM.

    ``sorted_side`` ('senders' | 'receivers' | '') declares that one
    endpoint array is NEAR-sorted (non-decreasing up to a per-block jitter
    < ``band`` rows — e.g. sampled indices sorted ascending over a
    receiver-sorted edge list, or over the sender-tile-major tile layout):
    that side's one-hot select/scatter then runs banded ((band, B) panels
    instead of (N, B)), with an in-graph coverage check falling back to
    the full kernel on any step whose sample violates the band — slow,
    never wrong.  The receiver-side variant rides the same kernel with the
    endpoints swapped and the difference half of fc1 negated
    ((hv-hu) @ -W1b == (hu-hv) @ W1b; the product half is symmetric)."""
    f = h.shape[1]
    n_pad = _round_up(max(h.shape[0], 8), 8)
    if n_pad != h.shape[0]:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))
    w1a = fc1_kernel[:f].astype(h.dtype)
    w1b = fc1_kernel[f:].astype(h.dtype)
    if sorted_side == "receivers":
        senders, receivers = receivers, senders
        w1b = -w1b
    use_band = _round_up(int(band), 8) if sorted_side in ("senders",
                                                          "receivers") else 0
    b1 = fc1_bias.reshape(1, -1).astype(jnp.float32)
    w2 = fc2_kernel.reshape(1, -1).astype(jnp.float32)
    b2 = fc2_bias.reshape(1, 1).astype(jnp.float32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return _score_sampled(h, w1a, w1b, b1, w2, b2,
                          senders.astype(jnp.int32),
                          receivers.astype(jnp.int32),
                          int(block), float(drop_rate), use_band,
                          bool(interpret), seed)


def score_head_sampled_reference(h, fc1_kernel, fc1_bias, fc2_kernel,
                                 fc2_bias, senders, receivers):
    """Pure-jnp f32 oracle (deterministic) for parity tests."""
    hu = h[senders].astype(jnp.float32)
    hv = h[receivers].astype(jnp.float32)
    f = h.shape[1]
    z = (hu * hv) @ fc1_kernel[:f].astype(jnp.float32) \
        + (hu - hv) @ fc1_kernel[f:].astype(jnp.float32) \
        + fc1_bias.reshape(-1)
    z = jnp.maximum(z, 0.0)
    logit = z @ fc2_kernel.reshape(-1).astype(jnp.float32) \
        + fc2_bias.reshape(-1)[0]
    return jax.nn.sigmoid(logit)
