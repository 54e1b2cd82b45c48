"""Fused tile-pair edge-score kernel (Pallas TPU).

The hybrid pipeline's hottest op is the detached full-edge-set scoring pass
that drives sampling (train/pipelines.py, reference training_hybrid.py:51-64
with the gradient flowing only through sampled edges per :86): for every
edge (u, v), p = sigmoid(fc2(relu(fc1([h_u*h_v || h_u-h_v])))). The XLA
lowering materializes two (E, F) endpoint gathers plus an (E, 2F) concat in
HBM (~13 ms at E=1M, F=256 on v5e). This kernel keeps everything
VMEM-resident:

  * Host-side (once per static edge list): edges are bucketed by the TILE
    PAIR (sender_row_tile, receiver_row_tile) with T-row tiles, each
    bucket padded to a block multiple. Every B-edge block then touches
    exactly ONE (T, F) tile of h per endpoint side.
  * Kernel (grid over blocks, scalar-prefetched tile ids drive the h-tile
    BlockSpecs): one-hot(B, T) selects built from local ids on the MXU
    replace the gathers; the score head's fc1 is split into its product
    half W1a and difference half W1b so no concat is formed:
        z = (h_u*h_v) @ W1a + (h_u - h_v) @ W1b + b1.
    Cost per block: 2 selects (B*T*F) + 2 head matmuls (B*F*K) — compute
    bound on the MXU instead of HBM-gather bound.

Scores come out in TILE order; sampling is order-invariant, so callers
sample in tile space (tile_prob/tile_mask are the prior/mask permuted at
build time) and translate only the q winners back with tile_perm — the
full-E inverse permutation is never materialized.

The head's dropout (reference model.py:32 between relu and fc2) uses the
in-kernel TPU PRNG (pltpu.prng_random_bits), a different stream than flax's
jax.random dropout — statistically equivalent noise on a pass whose only
consumer is the sampler.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


class TileIndex(NamedTuple):
    """Host-built static index (numpy) for the tile-pair kernel."""
    ls: np.ndarray        # (Ep,) int32 sender id local to its T-row tile
    lr: np.ndarray        # (Ep,) int32 receiver id local to its tile
    su: np.ndarray        # (nblocks,) int32 sender tile index per block
    rv: np.ndarray        # (nblocks,) int32 receiver tile index per block
    perm: np.ndarray      # (Ep,) int32 original edge id (0 on padding)
    valid: np.ndarray     # (Ep,) bool, False on padding slots
    t: int                # tile rows
    b: int                # edges per block
    n_pad: int            # node count padded to a tile multiple


def build_tile_index(senders, receivers, num_nodes: int, t: int = 128,
                     b: int = 512,
                     max_overhead: float = 1.35) -> Optional[TileIndex]:
    """Bucket edges by (sender//t, receiver//t); pad buckets to b-multiples.

    Returns None when the padded layout would exceed ``max_overhead`` x E
    (many near-empty tile pairs — large-N graphs should score via the XLA
    path instead).

    Defaults t=128/b=512 are the measured optimum on the bench partition
    (r4 sweep, tools/profile_r4.py tile: 31.43 ms/step vs 31.92 at
    t=256/b=1024 — halving t halves the one-hot select FLOPs; t=64 loses
    to slot-padding overhead at 1.28x)."""
    s = np.asarray(senders, np.int64)
    r = np.asarray(receivers, np.int64)
    e = s.shape[0]
    if e == 0:
        return None
    n_pad = _round_up(max(num_nodes, t), t)
    nt = n_pad // t
    pair = (s // t) * nt + (r // t)
    order = np.argsort(pair, kind="stable").astype(np.int64)
    pair_sorted = pair[order]
    uniq, counts = np.unique(pair_sorted, return_counts=True)
    padded = (np.ceil(counts / b).astype(np.int64)) * b
    total = int(padded.sum())
    if total > max_overhead * e:
        return None
    ls = np.zeros(total, np.int32)
    lr = np.zeros(total, np.int32)
    perm = np.zeros(total, np.int32)
    valid = np.zeros(total, bool)
    su = np.empty(total // b, np.int32)
    rv = np.empty(total // b, np.int32)
    off_in = 0
    off_out = 0
    blk = 0
    for pid, c, pc in zip(uniq, counts, padded):
        sel = order[off_in:off_in + c]
        ls[off_out:off_out + c] = (s[sel] % t).astype(np.int32)
        lr[off_out:off_out + c] = (r[sel] % t).astype(np.int32)
        perm[off_out:off_out + c] = sel.astype(np.int32)
        valid[off_out:off_out + c] = True
        nb = int(pc // b)
        su[blk:blk + nb] = int(pid // nt)
        rv[blk:blk + nb] = int(pid % nt)
        off_in += c
        off_out += int(pc)
        blk += nb
    return TileIndex(ls=ls, lr=lr, su=su, rv=rv, perm=perm, valid=valid,
                     t=t, b=b, n_pad=int(n_pad))


def _make_kernel(t: int, bk: int, k: int, drop_rate: float):
    keep = 1.0 - drop_rate
    # dropout threshold in uint32 space: drop when bits < rate * 2^32
    thresh = np.uint32(min(int(drop_rate * (1 << 32)), (1 << 32) - 1))

    def kernel(su_ref, rv_ref, seed_ref, ls_ref, lr_ref, hs_ref, hr_ref,
               w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref, out_ref):
        ls = ls_ref[0, 0, :]                      # (B,) int32
        lr = lr_ref[0, 0, :]
        hs = hs_ref[:]                            # (T, F)
        hr = hr_ref[:]
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (t, bk), 0)
        ohs = (iota_t == ls[None, :]).astype(hs.dtype)   # (T, B)
        ohr = (iota_t == lr[None, :]).astype(hr.dtype)
        dn = (((0,), (0,)), ((), ()))             # contract dim0 x dim0
        hu = jax.lax.dot_general(ohs, hs, dn,
                                 preferred_element_type=jnp.float32)
        hv = jax.lax.dot_general(ohr, hr, dn,
                                 preferred_element_type=jnp.float32)
        hu = hu.astype(hs.dtype)                  # (B, F)
        hv = hv.astype(hs.dtype)
        z = jax.lax.dot(hu * hv, w1a_ref[:],
                        preferred_element_type=jnp.float32)
        z += jax.lax.dot(hu - hv, w1b_ref[:],
                         preferred_element_type=jnp.float32)
        z += b1_ref[0, :][None, :].astype(jnp.float32)
        z = jnp.maximum(z, 0.0)
        if drop_rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.bitcast(pltpu.prng_random_bits((bk, k)), jnp.uint32)
            z = jnp.where(bits >= thresh, z * (1.0 / keep), 0.0)
        w2 = w2_ref[0, :][None, :].astype(jnp.float32)   # (1, K)
        logit = jnp.sum(z * w2, axis=1) + b2_ref[0, 0]   # (B,)
        out_ref[0, 0, :] = jax.nn.sigmoid(logit)

    return kernel


@functools.partial(jax.jit, static_argnames=("t", "bk", "drop_rate",
                                             "interpret"))
def _score_tiles_call(h, w1a, w1b, b1, w2, b2, ls, lr, su, rv, seed,
                      t: int, bk: int, drop_rate: float,
                      interpret: bool = False):
    ep = ls.shape[0]
    f = h.shape[1]
    k = w1a.shape[1]
    nblocks = ep // bk
    ls2 = ls.reshape(nblocks, 1, bk)
    lr2 = lr.reshape(nblocks, 1, bk)
    b1_2 = b1.reshape(1, k)
    w2_2 = w2.reshape(1, k)
    b2_2 = b2.reshape(1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda i, su, rv, sd: (i, 0, 0)),
            pl.BlockSpec((1, 1, bk), lambda i, su, rv, sd: (i, 0, 0)),
            pl.BlockSpec((t, f), lambda i, su, rv, sd: (su[i], 0)),
            pl.BlockSpec((t, f), lambda i, su, rv, sd: (rv[i], 0)),
            pl.BlockSpec((f, k), lambda i, su, rv, sd: (0, 0)),
            pl.BlockSpec((f, k), lambda i, su, rv, sd: (0, 0)),
            pl.BlockSpec((1, k), lambda i, su, rv, sd: (0, 0)),
            pl.BlockSpec((1, k), lambda i, su, rv, sd: (0, 0)),
            pl.BlockSpec((1, 1), lambda i, su, rv, sd: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bk), lambda i, su, rv, sd: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _make_kernel(t, bk, k, drop_rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, 1, bk), jnp.float32),
        interpret=interpret,
    )(su, rv, seed, ls2, lr2, h, h, w1a, w1b, b1_2, w2_2, b2_2)
    return out.reshape(ep)


def score_head_tiles(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                     tile_ls, tile_lr, tile_su, tile_rv, *, t: int, bk: int,
                     drop_rate: float = 0.0, seed=0,
                     interpret: bool = False):
    """Score every tile-indexed edge slot. Returns (Ep,) f32 probabilities
    in TILE order (use TileIndex.perm to map winners back).

    ``h`` is (N, F); it is padded here to the tile multiple ``n_pad``
    implied by the su/rv contents (max tile id + 1). fc1_kernel is the
    (2F, K) concat-layout kernel of the score head; its product/difference
    halves are split for the no-concat formulation. Forward-only: wrap in
    stop_gradient by construction (no VJP is defined)."""
    f = h.shape[1]
    # the pass is detached by design (it only drives sampling) and
    # pallas_call has no JVP rule — sever the tangents at the INPUTS
    h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias = jax.lax.stop_gradient(
        (h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias))
    n_pad = _round_up(h.shape[0], t)
    if n_pad != h.shape[0]:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))
    w1a = fc1_kernel[:f].astype(h.dtype)
    w1b = fc1_kernel[f:].astype(h.dtype)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    return _score_tiles_call(
        h, w1a, w1b, fc1_bias.astype(jnp.float32),
        fc2_kernel.reshape(-1).astype(jnp.float32),
        fc2_bias.reshape(-1).astype(jnp.float32), tile_ls, tile_lr,
        tile_su, tile_rv, seed, t=t, bk=bk, drop_rate=float(drop_rate),
        interpret=interpret)


def score_head_tiles_fallback(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                              tile_ls, tile_lr, tile_su, tile_rv, *,
                              t: int, bk: int, drop_rate: float = 0.0,
                              seed=0):
    """Pure-jnp tile scoring for non-TPU backends (tests / CPU runs):
    same math and tile-order output as the Pallas kernel; dropout drawn
    from jax.random instead of the in-kernel TPU PRNG. Interpret-mode
    pallas_call does not support scalar-prefetch grids under jit, so this
    is the portable path."""
    probs_logit = _tiles_math(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                              tile_ls, tile_lr, tile_su, tile_rv, t=t, bk=bk,
                              drop_rate=drop_rate, seed=seed)
    return jax.lax.stop_gradient(probs_logit)


def _tiles_math(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                tile_ls, tile_lr, tile_su, tile_rv, *, t: int, bk: int,
                drop_rate: float = 0.0, seed=0):
    ep = tile_ls.shape[0]
    blk = jnp.arange(ep) // bk
    gs = tile_su[blk] * t + tile_ls
    gr = tile_rv[blk] * t + tile_lr
    n_pad = _round_up(h.shape[0], t)
    if n_pad != h.shape[0]:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))
    hu = h[gs]
    hv = h[gr]
    f = h.shape[1]
    z = ((hu * hv) @ fc1_kernel[:f].astype(h.dtype)).astype(jnp.float32) \
        + ((hu - hv) @ fc1_kernel[f:].astype(h.dtype)).astype(jnp.float32) \
        + fc1_bias
    z = jnp.maximum(z, 0.0)
    if drop_rate > 0.0:
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - drop_rate, z.shape)
        z = jnp.where(keep, z / (1.0 - drop_rate), 0.0)
    logit = z @ fc2_kernel.reshape(-1).astype(jnp.float32) + \
        fc2_bias.reshape(-1)[0]
    return jax.nn.sigmoid(logit)


def score_head_tiles_reference(h, fc1_kernel, fc1_bias, fc2_kernel, fc2_bias,
                               tile_ls, tile_lr, tile_su, tile_rv, *,
                               t: int, bk: int):
    """Pure-jnp oracle of the kernel (deterministic, no dropout) for tests."""
    ep = tile_ls.shape[0]
    nblocks = ep // bk
    blk = jnp.arange(ep) // bk
    gs = tile_su[blk] * t + tile_ls
    gr = tile_rv[blk] * t + tile_lr
    n_pad = _round_up(h.shape[0], t)
    if n_pad != h.shape[0]:
        h = jnp.pad(h, ((0, n_pad - h.shape[0]), (0, 0)))
    hu = h[gs].astype(jnp.float32)
    hv = h[gr].astype(jnp.float32)
    f = h.shape[1]
    z = (hu * hv) @ fc1_kernel[:f].astype(jnp.float32) \
        + (hu - hv) @ fc1_kernel[f:].astype(jnp.float32) + fc1_bias
    z = jnp.maximum(z, 0.0)
    logit = z @ fc2_kernel.reshape(-1).astype(jnp.float32) + \
        fc2_bias.reshape(-1)[0]
    return jax.nn.sigmoid(logit)
