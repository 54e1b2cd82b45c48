"""Why does a 2-layer GCN forward on a 200k-edge subgraph cost ~8-10 ms?

Decomposes GCNConv on the bench partition's random 200k-edge subgraph:
gcn_norm_terms (two scalar segment sums + gathers), the x@W projection,
and the SpMM (gather rows + scatter-add), each timed in isolation.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_partition
from sgs_gnn_tpu.ops.spmm import spmm
from sgs_gnn_tpu.ops.gcn_norm import gcn_norm_terms

print = functools.partial(print, flush=True)
ITERS = 20
Q = 200_000


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry * 0).astype(a.dtype)
                if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
                else a, args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(jnp.sum(leaf) * 1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    carry = loop(args)
    _ = float(carry)
    t0 = time.perf_counter()
    carry = loop(args)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt*1e3:8.3f} ms")
    return dt


def main():
    print(f"backend={jax.default_backend()}")
    g = build_partition()
    n = g.num_nodes
    key = jax.random.PRNGKey(7)
    from sgs_gnn_tpu.sparsify import sample_prior_edges
    rand_idx = sample_prior_edges(key, g.prob, Q, g.edge_mask, approx=True)
    s = g.senders[rand_idx]
    r = g.receivers[rand_idx]
    x = jax.random.normal(key, (n, 602), jnp.float32)
    w = jax.random.normal(key, (602, 256), jnp.bfloat16)
    xw = (x.astype(jnp.bfloat16) @ w).astype(jnp.bfloat16)

    timeit("gcn_norm_terms on 200k rand edges", lambda ss: gcn_norm_terms(
        s, r, None, n)[0] + ss[0] * 0, jnp.zeros(1))

    nrm, _ = gcn_norm_terms(s, r, None, n)

    timeit("x @ W (2048x602x256 bf16)", lambda x_: x_.astype(jnp.bfloat16) @ w, x)
    timeit("spmm auto 200k edges (fwd)", lambda v: spmm(s, r, nrm, v, n), xw)
    timeit("gather rows 200k x 256 bf16", lambda v: v[s], xw)
    msgs = xw[s] * nrm[:, None].astype(jnp.bfloat16)
    timeit("segment_sum scatter 200k x 256 (xla)",
           lambda m: jax.ops.segment_sum(m.astype(jnp.float32), r,
                                         num_segments=n), msgs)
    from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_pallas
    timeit("scatter_add_pallas one-hot 200k x 256",
           lambda m: scatter_add_pallas(m, r, n), msgs)

    def full_conv(v):
        nrm2, loop2 = gcn_norm_terms(s, r, None, n)
        out = spmm(s, r, nrm2, v, n)
        return out.astype(jnp.float32) + loop2[:, None] * v.astype(jnp.float32)

    timeit("full GCNConv aggregation (norm+spmm+loop)", full_conv, xw)

    # same on the FULL sorted 1M edge list with band
    timeit("spmm auto 1M sorted edges (fwd)",
           lambda v: spmm(g.senders, g.receivers,
                          jnp.ones(g.num_edges, jnp.float32), v, n), xw)


if __name__ == "__main__":
    main()
