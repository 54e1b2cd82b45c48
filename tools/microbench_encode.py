"""Microbenchmark the scorer-encoder primitives at bench scale.

encode = 2 x GCNConv over a 200k-edge random subgraph of a 2048-node
partition. Isolates: gcn_norm (degree scatter), spmm fwd, spmm fwd+bwd,
Dense, XLA row gathers at 1M/200k, dropout rng.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

N, E_FULL, Q, F_IN, F_H = 2048, 1_000_000, 200_000, 602, 256
ITERS = 20
rng = np.random.default_rng(0)
w = rng.pareto(1.5, N) + 1.0
p = w / w.sum()
s_np = rng.choice(N, Q, p=p).astype(np.int32)
r_np = rng.choice(N, Q, p=p).astype(np.int32)
s = jnp.asarray(s_np); r = jnp.asarray(r_np)
x = jnp.asarray(rng.normal(size=(N, F_IN)).astype(np.float32))
h = jnp.asarray(rng.normal(size=(N, F_H)).astype(np.float32), jnp.bfloat16)
h_big_ids = jnp.asarray(rng.choice(N, E_FULL).astype(np.int32))


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry.astype(a.dtype) * 0)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(leaf.reshape(-1)[0]) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    _ = float(loop(args))
    t0 = time.perf_counter()
    _ = float(loop(args))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:52s} {dt*1e3:8.3f} ms")
    return dt


from sgs_gnn_tpu.ops.gcn_norm import gcn_norm
from sgs_gnn_tpu.ops.spmm import spmm_xla

timeit("gcn_norm (200k edges)", lambda hh: gcn_norm(s, r, None, N)[2] + hh[0, 0].astype(jnp.float32), h)
timeit("spmm fwd (200k x 256 bf16)",
       lambda hh: spmm_xla(s, r, jnp.ones(Q), hh, N), h)


def spmm_grad(hh):
    def loss(v):
        return jnp.sum(spmm_xla(s, r, jnp.ones(Q), v, N).astype(jnp.float32))
    return jax.grad(loss)(hh)


timeit("spmm fwd+bwd (200k x 256 bf16)", spmm_grad, h)
timeit("dense 2048x602->256 bf16",
       lambda xx: xx.astype(jnp.bfloat16) @ jnp.zeros((F_IN, F_H), jnp.bfloat16), x)
timeit("row gather (1M, 256) bf16", lambda hh: hh[h_big_ids], h)
timeit("row gather (200k, 256) bf16", lambda hh: hh[s], h)
timeit("segment_sum (200k, 256) unsorted",
       lambda hh: jax.ops.segment_sum(hh[s].astype(jnp.float32), r,
                                      num_segments=N), h)
from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_pallas
timeit("pallas one-hot scatter (200k x 256)",
       lambda hh: scatter_add_pallas(hh[s], r, N), h)


def full_encode(hh):
    # emulate EdgeProbGCN.encode: 2 x (norm + dense + spmm)
    sn, rn, wn = gcn_norm(s, r, None, N)
    z = (hh @ jnp.zeros((F_H, F_H), jnp.bfloat16))
    z = spmm_xla(sn, rn, wn, z, N)
    sn2, rn2, wn2 = gcn_norm(s, r, None, N)
    z = (z @ jnp.zeros((F_H, F_H), jnp.bfloat16))
    z = spmm_xla(sn2, rn2, wn2, z, N)
    return z


timeit("2-layer norm+dense+spmm (emulated encode)", full_encode, h)
