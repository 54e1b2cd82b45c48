"""Tile-pair score kernel vs the XLA gather+concat head at bench shapes."""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_partition
from sgs_gnn_tpu.ops.score_tiles import (build_tile_index, score_head_tiles,
                                         score_head_tiles_reference)

print = functools.partial(print, flush=True)
ITERS = 50


def timeit(name, fn, *args):
    @jax.jit
    def loop(args):
        def body(carry, _):
            out = fn(*jax.tree_util.tree_map(
                lambda a: (a + carry * 0).astype(a.dtype)
                if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
                else a, args))
            return jnp.float32(jnp.sum(out.astype(jnp.float32)) * 1e-30), None
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
    g = build_partition()
    N = g.num_nodes
    F = K = 256
    rng = np.random.default_rng(0)
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    for t, b in ((256, 1024), (256, 512), (512, 1024), (128, 512)):
        ti = build_tile_index(s, r, N, t=t, b=b)
        ov = ti.ls.shape[0] / s.shape[0] if ti else float("nan")
        print(f"tile t={t} b={b}: blocks={0 if ti is None else ti.su.shape[0]}"
              f" overhead={ov:.3f}")
    ti = build_tile_index(s, r, N, t=256, b=1024)

    h = jnp.asarray(rng.normal(size=(N, F)), jnp.bfloat16)
    fc1k = jnp.asarray(rng.normal(size=(2 * F, K)) * 0.05, jnp.float32)
    fc1b = jnp.zeros((K,), jnp.float32)
    fc2k = jnp.asarray(rng.normal(size=(K, 1)) * 0.05, jnp.float32)
    fc2b = jnp.zeros((1,), jnp.float32)
    tls, tlr = jnp.asarray(ti.ls), jnp.asarray(ti.lr)
    tsu, trv = jnp.asarray(ti.su), jnp.asarray(ti.rv)

    def tiles(h_):
        return score_head_tiles(h_, fc1k, fc1b, fc2k, fc2b, tls, tlr,
                                tsu, trv, t=ti.t, bk=ti.b, drop_rate=0.0)

    def tiles_drop(h_):
        return score_head_tiles(h_, fc1k, fc1b, fc2k, fc2b, tls, tlr,
                                tsu, trv, t=ti.t, bk=ti.b, drop_rate=0.2,
                                seed=7)

    def xla_head(h_):
        hu = h_[g.senders].astype(jnp.bfloat16)
        hv = h_[g.receivers].astype(jnp.bfloat16)
        feats = jnp.concatenate([hu * hv, hu - hv], axis=-1)
        z = jnp.maximum(feats @ fc1k.astype(jnp.bfloat16)
                        + fc1b.astype(jnp.bfloat16), 0)
        return jax.nn.sigmoid((z @ fc2k.astype(jnp.bfloat16)
                               ).astype(jnp.float32)[:, 0] + fc2b[0])

    # correctness spot check (no dropout) on TPU
    p_t = np.asarray(tiles(h))
    p_x = np.asarray(xla_head(h))
    v = np.asarray(ti.valid)
    back = np.zeros(s.shape[0], np.float32)
    back[np.asarray(ti.perm)[v]] = p_t[v]
    print("kernel-vs-xla max |dp|:", np.abs(back - p_x).max())

    timeit("xla gather+concat head (1M edges)", xla_head, h)
    timeit("tile-pair kernel (1M edges, no dropout)", tiles, h)
    timeit("tile-pair kernel (1M edges, dropout 0.2)", tiles_drop, h)

    ti2 = build_tile_index(s, r, N, t=256, b=512)
    tls2, tlr2 = jnp.asarray(ti2.ls), jnp.asarray(ti2.lr)
    tsu2, trv2 = jnp.asarray(ti2.su), jnp.asarray(ti2.rv)
    timeit("tile-pair kernel t=256 b=512", lambda h_: score_head_tiles(
        h_, fc1k, fc1b, fc2k, fc2b, tls2, tlr2, tsu2, trv2, t=256, bk=512,
        drop_rate=0.0), h)
    ti3 = build_tile_index(s, r, N, t=128, b=512)
    timeit("tile-pair kernel t=128 b=512", lambda h_: score_head_tiles(
        h_, fc1k, fc1b, fc2k, fc2b, jnp.asarray(ti3.ls), jnp.asarray(ti3.lr),
        jnp.asarray(ti3.su), jnp.asarray(ti3.rv), t=128, bk=512,
        drop_rate=0.0), h)


if __name__ == "__main__":
    main()
