"""Fused edge-blocked SpMM Pallas TPU kernel.

Computes ``y[r] = sum over edges e with receivers[e]==r of w[e]*x[senders[e]]``
— the neighborhood aggregation the reference gets from cuSPARSE / PyG sparse
matmul inside its convs (reference model.py:5) — in ONE pass over edge blocks
with the dense operands resident in VMEM:

    per block b of B edges:
        G   = onehot(senders_b)            (B, N)
        M   = (G @ x) * w_b[:, None]       (MXU gather + weighting, VMEM only)
        S   = onehot(receivers_b)          (N, B)
        acc += S @ M                       (MXU scatter, f32 accumulation)

Unlike the two-step XLA path (gather materializes the (E, F) message matrix
in HBM, then a scatter reads it back), the fused kernel's HBM traffic is just
the edge lists + weights: x is loaded once and the (N, F) accumulator never
leaves VMEM. FLOP cost is 2*N*F*2 per edge — MXU one-hot FLOPs traded for
the eliminated (E, F) round trip, profitable when E >> N (high average
degree), which is exactly the cluster-partition regime this framework trains
on (~500 edges/node on Reddit parts).

Requires x and the accumulator to fit VMEM together:
N*F*(bytes(x) + 4) <= ~10 MB — true for METIS cluster partitions (~2k nodes).
``spmm(backend="pallas")`` (ops/spmm.py) falls back to the XLA path when the
bound is exceeded.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _round_up(x, m):
    return (x + m - 1) // m * m


def _spmm_kernel(s_ref, r_ref, w_ref, x_ref, out_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    senders = s_ref[0, 0, :]                  # (B,) int32
    receivers = r_ref[0, 0, :]                # (B,) int32
    w = w_ref[0]                              # (1, B)
    x = x_ref[:]                              # (N, F)
    n = x.shape[0]
    bsz = senders.shape[0]
    # MXU truncates f32 operands to bf16 at default precision; one-hot sides
    # are exact either way, so only f32 features need HIGHEST
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # gather x[senders] as a one-hot matmul, folding the edge weight into the
    # one-hot rows so no separate (B, F) multiply is needed
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (bsz, n), 1)
    gh = (iota_g == senders[:, None]).astype(x.dtype) * w.reshape(bsz, 1)
    msgs = jax.lax.dot(gh, x, precision=prec,
                       preferred_element_type=jnp.float32)    # (B, F)
    # scatter into receivers
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (n, bsz), 0)
    sh = (iota_s == receivers[None, :]).astype(msgs.dtype)
    out_ref[:] += jax.lax.dot(sh, msgs, precision=jax.lax.Precision.HIGHEST
                              if msgs.dtype == jnp.float32 else prec,
                              preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_nodes", "block",
                                             "interpret"))
def _spmm_pallas_impl(senders, receivers, weights, x, num_nodes: int,
                      block: int = 1024, interpret: bool = False):
    e = senders.shape[0]
    n, f = x.shape
    assert n == num_nodes
    n_pad = _round_up(max(n, 8), 8)
    e_pad = _round_up(max(e, block), block)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    if e_pad != e:
        # padding edges carry zero weight -> contribute nothing to node 0
        senders = jnp.pad(senders, (0, e_pad - e))
        receivers = jnp.pad(receivers, (0, e_pad - e))
        weights = jnp.pad(weights, (0, e_pad - e))
    nblocks = e_pad // block
    s2 = senders.reshape(nblocks, 1, block).astype(jnp.int32)
    r2 = receivers.reshape(nblocks, 1, block).astype(jnp.int32)
    w2 = weights.reshape(nblocks, 1, block).astype(x.dtype)

    out = pl.pallas_call(
        _spmm_kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, block), lambda i: (i, 0, 0)),
            pl.BlockSpec((n_pad, f), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_pad, f), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
        interpret=interpret,
    )(s2, r2, w2, x)
    return out[:num_nodes]


def fits_vmem(num_nodes: int, feat: int, itemsize: int) -> bool:
    """Whether the fused kernel's dense residents (x + f32 accumulator) fit
    the VMEM budget."""
    return num_nodes * feat * (itemsize + 4) <= _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm_pallas_core(num_nodes, interpret, senders, receivers, weights, x):
    return _spmm_pallas_impl(senders, receivers, weights, x, num_nodes,
                             interpret=interpret).astype(x.dtype)


def _spmm_pallas_fwd(num_nodes, interpret, senders, receivers, weights, x):
    out = _spmm_pallas_core(num_nodes, interpret, senders, receivers,
                            weights, x)
    return out, (senders, receivers, weights, x)


def _spmm_pallas_bwd(num_nodes, interpret, res, g):
    senders, receivers, weights, x = res
    # dx: transpose-graph SpMM — same fused kernel with edges reversed
    dx = _spmm_pallas_impl(receivers, senders, weights, g.astype(x.dtype),
                           num_nodes, interpret=interpret)
    # dw: SDDMM — per-edge inner product of endpoint feature/grad
    dw = jnp.sum(x[senders] * g[receivers], axis=-1).astype(weights.dtype)
    return (None, None, dw, dx.astype(x.dtype))


_spmm_pallas_core.defvjp(_spmm_pallas_fwd, _spmm_pallas_bwd)


def spmm_pallas(senders, receivers, weights, x, num_nodes: int,
                interpret: bool = False):
    """Fused Pallas SpMM with custom VJP (transpose SpMM + SDDMM backward).

    Falls back to the XLA segment-sum path when the dense residents exceed
    VMEM or when not running on TPU (and not interpreting).
    """
    from ..core.fastpath import pallas_enabled
    on_tpu = jax.default_backend() == "tpu" and pallas_enabled()
    if (not (on_tpu or interpret)
            or not fits_vmem(num_nodes, x.shape[-1], x.dtype.itemsize)):
        from .spmm import spmm_xla
        return spmm_xla(senders, receivers, weights, x, num_nodes)
    return _spmm_pallas_core(num_nodes, interpret, senders, receivers,
                             weights, x)
