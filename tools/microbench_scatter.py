"""Microbenchmark: scatter-add candidates for the score-head backward.

dh accumulation: vals (E, F) bf16, ids (E,) int32 in [0, N) -> (N, F) f32.
Bench scale (PERF.md): E=1M, N=2048, F=256, power-law-ish degrees.

Timing methodology: the remote-tunnel TPU can underreport via
block_until_ready and every host readback pays tunnel RTT, so each
candidate is wrapped in an in-jit lax.scan of ITERS data-chained
iterations with a single readback at the end (PERF.md methodology note).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from sgs_gnn_tpu.ops.scatter_pallas import scatter_add_pallas

E, N, F = 1_000_000, 2048, 256
ITERS = 20
rng = np.random.default_rng(0)
w = rng.pareto(1.2, N) + 1.0
p = w / w.sum()
ids_np = rng.choice(N, size=E, p=p).astype(np.int32)
vals_np = rng.normal(size=(E, F)).astype(np.float32)

order = np.argsort(ids_np, kind="stable")
ids_sorted_np = ids_np[order]
vals_sorted_np = vals_np[order]
perm_np = order.astype(np.int32)

vals = jnp.asarray(vals_np, dtype=jnp.bfloat16)
vals_sorted = jnp.asarray(vals_sorted_np, dtype=jnp.bfloat16)
ids = jnp.asarray(ids_np)
ids_sorted = jnp.asarray(ids_sorted_np)
perm = jnp.asarray(perm_np)

ref = np.zeros((N, F), np.float32)
np.add.at(ref, ids_np, vals_np.astype(np.float32))


def timeit(name, fn, vals_in, *args):
    """fn(vals, *args) -> (N, F). Scanned ITERS times with data chaining."""

    @jax.jit
    def loop(vals_in):
        def body(carry, _):
            out = fn(vals_in + carry.astype(vals_in.dtype) * 0.0, *args)
            return jnp.float32(out[0, 0]) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry, fn(vals_in, *args)

    carry, out = loop(vals_in)
    jax.block_until_ready((carry, out))
    t0 = time.perf_counter()
    carry, out = loop(vals_in)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / (ITERS + 1)
    err = np.abs(np.asarray(out, np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"{name:44s} {dt*1e3:8.3f} ms   rel_err={err:.2e}")
    return dt


def seg_unsorted(vals, ids):
    return jax.ops.segment_sum(vals.astype(jnp.float32), ids, num_segments=N)


def seg_sorted(vals_sorted, ids_sorted):
    return jax.ops.segment_sum(vals_sorted.astype(jnp.float32), ids_sorted,
                               num_segments=N, indices_are_sorted=True)


def pallas_onehot(vals, ids):
    return scatter_add_pallas(vals, ids, N)


def seg_sorted_permuted(vals, perm, ids_sorted):
    return jax.ops.segment_sum(vals[perm].astype(jnp.float32), ids_sorted,
                               num_segments=N, indices_are_sorted=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  E={E} N={N} F={F}  iters={ITERS}")
    timeit("segment_sum unsorted (XLA scatter)", seg_unsorted, vals, ids)
    timeit("segment_sum sorted hint", seg_sorted, vals_sorted, ids_sorted)
    timeit("pallas one-hot MXU (current)", pallas_onehot, vals, ids)
    timeit("perm-gather + sorted segment_sum", seg_sorted_permuted, vals,
           perm, ids_sorted)
    from sgs_gnn_tpu.ops.scatter_pallas import (scatter_add_sorted_pallas,
                                                required_band)
    band = required_band(ids_sorted_np, block=1024)
    print(f"required band @ block=1024: {band}")
    timeit(f"pallas band kernel (sorted, band={band})",
           lambda v, i: scatter_add_sorted_pallas(v, i, N, band=band),
           vals_sorted, ids_sorted)
    timeit("perm-gather + pallas band kernel",
           lambda v, p_, i: scatter_add_sorted_pallas(v[p_], i, N, band=band),
           vals, perm, ids_sorted)
