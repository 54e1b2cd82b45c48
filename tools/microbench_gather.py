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

    def g1d(f):
        i = f.astype(jnp.int32)
        return s[i] + r[i]

    timeit("2 separate 1D gathers (s[idx], r[idx])", g1d, fidx)
    timeit("1D gather sorted idx", lambda f: s[jnp.sort(f.astype(jnp.int32))],
           fidx)
    timeit("packed (E,2) row gather", lambda f: pack2[f.astype(jnp.int32)],
           fidx)
    timeit("packed (E,4) row gather", lambda f: pack4[f.astype(jnp.int32)],
           fidx)
    timeit("packed (E,128) row gather", lambda f: pack128[f.astype(jnp.int32)],
           fidx)
    # one-hot via MXU: select Q of E scalars... not viable at E=1M. skip.
    # take_along_axis variant
    timeit("take_along_axis 1D", lambda f: jnp.take(s, f.astype(jnp.int32)),
           fidx)


if __name__ == "__main__":
    main()
