"""Packed vs separate per-edge gathers (len=200 scans, past the harness
fixed overhead): can one (E, k) row gather replace k separate 1D gathers?"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
ITERS = 200


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
    E, Q, N = 1_000_000, 200_000, 2048
    s = jax.random.randint(key, (E,), 0, N, jnp.int32)
    r = jax.random.randint(key, (E,), 0, N, jnp.int32)
    p = jax.random.uniform(key, (E,), jnp.float32)
    idx = jax.random.randint(key, (Q,), 0, E, jnp.int32)
    idx_sorted = jnp.sort(idx)
    pack2 = jnp.stack([s, r], axis=1)                     # (E, 2) int32
    pack4 = jnp.stack([s, r, p.view(jnp.int32),
                       jnp.ones(E, jnp.int32)], axis=1)   # (E, 4)
    pack128 = jnp.tile(pack4, (1, 32))                    # (E, 128)

    fidx = idx.astype(jnp.float32)
    fidx_sorted = idx_sorted.astype(jnp.float32)
    packed1 = s * N + r  # (E,) int32 single-word pack (N*N < 2^31 here)

    def g1d(s_, r_, f):
        i = f.astype(jnp.int32)
        return s_[i] + r_[i]

    timeit("2 separate 1D gathers (s[idx], r[idx])", g1d, s, r, fidx)
    timeit("2 separate 1D gathers, presorted idx", g1d, s, r, fidx_sorted)
    timeit("1 packed int32 gather (s*N+r)[idx] + unpack",
           lambda p_, f: (lambda v: v // N + v % N)(
               p_[f.astype(jnp.int32)]), packed1, fidx)
    timeit("packed (E,2) row gather", lambda p_, f: p_[f.astype(jnp.int32)],
           pack2, fidx)
    timeit("packed (E,4) row gather", lambda p_, f: p_[f.astype(jnp.int32)],
           pack4, fidx)
    timeit("packed (E,128) row gather", lambda p_, f: p_[f.astype(jnp.int32)],
           pack128, fidx)
    timeit("take_along_axis 1D", lambda s_, f: jnp.take(s_, f.astype(jnp.int32)),
           s, fidx)
    # gather from a 256-wide bf16 table (the score-head shape, for reference)
    h = jax.random.normal(key, (N, 256), jnp.bfloat16)

    def head_gathers(h_, s_, r_, f):
        i = f.astype(jnp.int32)
        return h_[s_[i]] + h_[r_[i]]

    timeit("(N,256) bf16 row gather x2 (head endpoint gathers)",
           head_gathers, h, s, r, fidx)
    timeit("(N,256) bf16 row gather x2, presorted idx",
           head_gathers, h, s, r, fidx_sorted)


if __name__ == "__main__":
    main()
