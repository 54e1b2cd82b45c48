"""Calibrate the in-jit scan timing harness: is there a per-iteration floor?

Times a trivial op (x @ W, 0.63 GFLOP) at scan lengths 20 and 200, plus an
almost-empty body. If ms/iter is constant across lengths the number is
real per-iteration cost; if it shrinks, the short-scan numbers carry a
fixed overhead.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def timeit(name, fn, iters, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry * 0).astype(a.dtype)
                if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
                else a, args))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.float32(jnp.sum(leaf) * 1e-30), None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    carry = loop(args)
    _ = float(carry)
    t0 = time.perf_counter()
    carry = loop(args)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:58s} {dt*1e3:8.3f} ms/iter  (len={iters})")
    return dt


def main():
    print(f"backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2048, 602), jnp.float32)
    w = jax.random.normal(key, (602, 256), jnp.bfloat16)
    big = jax.random.normal(key, (1_000_000,), jnp.float32)
    idx = jax.random.randint(key, (200_000,), 0, 1_000_000, jnp.int32)
    xw = jax.random.normal(key, (2048, 256), jnp.bfloat16)
    ridx = jax.random.randint(key, (200_000,), 0, 2048, jnp.int32)

    for iters in (20, 200):
        timeit("x + 1 (2048x602)", lambda a: a + 1.0, iters, x)
        timeit("x @ W (2048x602x256 bf16)",
               lambda a: a.astype(jnp.bfloat16) @ w, iters, x)
        timeit("1D gather 200k from 1M f32", lambda a: a[idx], iters, big)
        timeit("row gather 200k x 256 bf16 from 2048", lambda a: a[ridx],
               iters, xw)


if __name__ == "__main__":
    main()
