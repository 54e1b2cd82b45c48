"""Microbench: device-side sort of sampled edge indices + band-span stats.

Decides the r5 banded-fused-head design (VERDICT r4 #8): sorting the q
sampled tile indices makes the sender side near-sorted (tile layout is
sender-tile-major, ops/score_tiles.py build_tile_index), enabling a
narrow-band one-hot select/scatter in ops/score_sampled.py. Worth it only
if the sort costs << the ~3 ms of one-hot FLOPs it saves.

Prints: sort ms (values-only jnp.sort of (q,) int32), and the per-block
sender/receiver span distribution of a sorted sample on a bench-shaped
graph (N=2048, E=1M, q=200k, t=128/b=512 tile layout).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    # data-dependent readback to defeat tunnel queueing
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    n, e, q, t, b = 2048, 1_000_000, 200_000, 128, 512
    # community-ish graph like the bench partition
    senders = rng.integers(0, n, e).astype(np.int32)
    receivers = ((senders // 64) * 64
                 + rng.integers(0, 64, e)).astype(np.int32)

    from sgs_gnn_tpu.ops.score_tiles import build_tile_index
    ti = build_tile_index(senders, receivers, n, t=t, b=b)
    print(f"tile slots: {ti.ls.shape[0]} (pad overhead "
          f"{ti.ls.shape[0] / e:.3f})")

    idx = jnp.asarray(rng.choice(ti.ls.shape[0], q, replace=False)
                      .astype(np.int32))
    sort_jit = jax.jit(jnp.sort)
    ms = timed(sort_jit, idx)
    print(f"jnp.sort (q={q}) : {ms:.3f} ms")

    karg = jax.jit(lambda a: jnp.argsort(a))
    ms = timed(karg, idx)
    print(f"jnp.argsort      : {ms:.3f} ms")

    # span stats: sort idx, gather global sender/receiver ids, block spans
    gs = ti.su[np.arange(ti.ls.shape[0]) // b] * t + ti.ls
    gr = ti.rv[np.arange(ti.ls.shape[0]) // b] * t + ti.lr
    idx_s = np.sort(np.asarray(idx))
    for name, ids in (("sender", gs[idx_s]), ("receiver", gr[idx_s])):
        for blk in (512, 1024):
            qq = (q + blk - 1) // blk * blk
            ids_p = np.concatenate([ids, np.full(qq - q, ids[-1],
                                                 ids.dtype)])
            w = ids_p.reshape(-1, blk)
            span = w.max(1) - (w.min(1) // 8 * 8) + 1
            print(f"{name:<9} B={blk}: span p50={np.percentile(span, 50):.0f} "
                  f"p99={np.percentile(span, 99):.0f} max={span.max()}")


if __name__ == "__main__":
    main()
