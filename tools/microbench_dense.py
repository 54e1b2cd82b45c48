"""Dense-subgraph path feasibility: cost of building a (N, N) adjacency from
q sampled edges + dense-matmul message passing, vs the sparse gather/scatter
SpMM. METIS partitions are tiny in node count (N ~ 2k for Reddit-scale
parts), so A is only N^2 = 4M entries — the MXU regime."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
ITERS = 100


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry * 0).astype(a.dtype)
                if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
                else a, args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(jnp.sum(leaf.astype(jnp.float32)) * 1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    carry = loop(args)
    _ = float(carry)
    t0 = time.perf_counter()
    carry = loop(args)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:58s} {dt*1e3:8.3f} ms/iter")
    return dt


def main():
    print(f"backend={jax.default_backend()}  len={ITERS}")
    key = jax.random.PRNGKey(0)
    Q, N, F = 200_000, 2048, 256
    s = jax.random.randint(key, (Q,), 0, N, jnp.int32)
    r = jax.random.randint(jax.random.fold_in(key, 1), (Q,), 0, N, jnp.int32)
    flat = (r * N + s).astype(jnp.int32)
    w = jax.random.uniform(jax.random.fold_in(key, 2), (Q,), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 3), (N, F), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    x602 = jax.random.normal(jax.random.fold_in(key, 4), (N, 602),
                             jnp.bfloat16)

    def build_flat(flat_f, w_):
        f = flat_f.astype(jnp.int32)
        return jnp.zeros((N * N,), jnp.float32).at[f].add(w_).reshape(N, N)

    timeit("A build: .at[flat].add(w) into N^2 f32", build_flat,
           flat.astype(jnp.float32), w)

    def build_seg(flat_f, w_):
        f = flat_f.astype(jnp.int32)
        return jax.ops.segment_sum(w_, f, num_segments=N * N).reshape(N, N)

    timeit("A build: segment_sum into N^2", build_seg,
           flat.astype(jnp.float32), w)

    def build_ones(flat_f):
        f = flat_f.astype(jnp.int32)
        return jnp.zeros((N * N,), jnp.float32).at[f].add(1.0).reshape(N, N)

    timeit("A build: unweighted ones", build_ones, flat.astype(jnp.float32))

    a = build_flat(flat.astype(jnp.float32), w)
    ab = a.astype(jnp.bfloat16)

    timeit("dense A @ X  (N=2048, F=256, f32)", lambda a_, x_: a_ @ x_, a, x)
    timeit("dense A @ X  (bf16)", lambda a_, x_: a_ @ x_, ab, xb)
    timeit("dense A @ X  (bf16, F=602)", lambda a_, x_: a_ @ x_, ab, x602)

    def build_and_4spmm(flat_f, w_, x_):
        f = flat_f.astype(jnp.int32)
        a_ = jnp.zeros((N * N,), jnp.float32).at[f].add(w_) \
            .reshape(N, N).astype(jnp.bfloat16)
        h = x_
        for _ in range(4):
            h = a_ @ h
        return h

    timeit("A build + 4 dense SpMMs (the whole rand-graph story)",
           build_and_4spmm, flat.astype(jnp.float32), w, xb)

    # VJP cost of the build (gather dA at flat) — the A_sampled w-gradient
    def build_vjp(flat_f, w_):
        f = flat_f.astype(jnp.int32)
        def g(w__):
            a_ = jnp.zeros((N * N,), jnp.float32).at[f].add(w__)
            return jnp.sum(a_ * a_)
        return jax.grad(g)(w_)

    timeit("A build fwd+bwd (scatter + gather-at-flat VJP)", build_vjp,
           flat.astype(jnp.float32), w)

    # sparse baseline for the same op: gather rows + one-hot scatter
    from sgs_gnn_tpu.ops.spmm import spmm

    def sparse_spmm(x_, w_):
        return spmm(s, r, w_, x_, N)

    timeit("sparse SpMM 200k edges (current path)", sparse_spmm, xb, w)


if __name__ == "__main__":
    main()
