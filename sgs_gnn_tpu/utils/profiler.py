"""Segment profiler — TPU-native equivalent of the reference's
GpuMemoryProfiler (reference utils.py:13-79; printed main.py:171-207).

The reference brackets four named segments (edge_mlp_pre, edge_score,
gnn_forward, backward) with cuda.synchronize + max_memory_allocated deltas.
Under XLA those segments fuse into one executable, so per-segment memory
deltas are measured by running the segment's computation stand-alone
(`profile_segments`), and live memory comes from the PJRT allocator stats
(`device_memory_mb`). Wall timing uses data-dependent host readbacks, which
are the only reliable sync points through remote-tunnel backends.

For deep dives, `trace` wraps jax.profiler for TensorBoard-viewable traces.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def device_memory_mb(device=None) -> Optional[Dict[str, float]]:
    """Current/peak device memory from PJRT allocator stats (the analogue of
    torch.cuda.memory_allocated / max_memory_allocated)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    out = {}
    for k_src, k_dst in (("bytes_in_use", "allocated_mb"),
                         ("peak_bytes_in_use", "peak_mb"),
                         ("bytes_limit", "limit_mb")):
        if k_src in stats:
            out[k_dst] = stats[k_src] / (1024 ** 2)
    return out or None


def timed(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Wall-time a jitted function with forced host readback of a scalar
    derived from its output (sum of first leaf). Returns seconds/iter."""
    def scalarize(out):
        leaves = jax.tree_util.tree_leaves(out)
        return jnp.sum(leaves[0]) if leaves else jnp.zeros(())

    probe = jax.jit(lambda *a: scalarize(fn(*a)))
    for _ in range(warmup):
        float(probe(*args))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(iters):
        acc += float(probe(*args))
    return (time.perf_counter() - t0) / iters


class SegmentTimer:
    """Named-segment wall timer with the reference's four segment names as
    conventions; aggregates like GpuMemoryProfiler.summarize_epoch."""

    SEGMENTS = ("edge_mlp_pre", "edge_score", "gnn_forward", "backward")

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._records: Dict[str, list] = {}

    def record(self, name: str, seconds: float):
        if self.enabled:
            self._records.setdefault(name, []).append(seconds)

    def time_segment(self, name: str, fn: Callable, *args, iters: int = 3):
        if not self.enabled:
            return None
        dt = timed(fn, *args, iters=iters)
        self.record(name, dt)
        return dt

    def summarize(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, rows in self._records.items():
            out[name] = {
                "mean_ms": float(np.mean(rows)) * 1e3,
                "max_ms": float(np.max(rows)) * 1e3,
                "calls": len(rows),
            }
        return out

    def report(self, prefix: str = "[profile]", log_fn=print):
        s = self.summarize()
        parts = [f"{n}: mean_ms={v['mean_ms']:.2f} max_ms={v['max_ms']:.2f} "
                 f"calls={v['calls']}" for n, v in s.items()]
        log_fn(f"{prefix} " + " | ".join(parts))


def make_segment_profiler(cfg, model, q: int):
    """Per-epoch segment breakdown for ``--gpu_profile`` — the analogue of
    the reference's GpuMemoryProfiler four named segments (reference
    utils.py:13-79, printed main.py:171-207). Under XLA the segments fuse
    into one train-step executable, so each is timed stand-alone as its own
    jitted computation with a host readback as the sync point (the honest
    TPU equivalent of the reference's cuda.synchronize brackets; per-segment
    *memory* deltas are not observable inside a fused executable).

    Returns ``profile(params, g, key) -> {segment_name: ms}`` with the
    reference's segment names (SegmentTimer.SEGMENTS). For non-learned
    modes only gnn_forward/backward are meaningful (no edge scorer runs).
    """
    import jax.numpy as jnp

    learned = cfg.mode == "learned"
    use_rand = cfg.conditional or cfg.sparse_edge_mlp

    from ..sparsify.sampling import sample_prior_edges, sample_edges

    def _prop_edges(g, key):
        if learned and use_rand and g.num_edges > q:
            idx = sample_prior_edges(key, g.prob, q, g.edge_mask,
                                     approx=cfg.approx_topk)
            return g.senders[idx], g.receivers[idx]
        return g.senders, g.receivers

    @jax.jit
    def seg_pre(params, g, key):
        s, r = _prop_edges(g, key)
        return model.apply(params, g.x, s, r, False, rngs={"dropout": key},
                           method="encode_scorer")

    @jax.jit
    def seg_score(params, h, g, key):
        return model.apply(params, h, g.senders, g.receivers, False,
                           rngs={"dropout": key},
                           method="score_from_embeddings")

    @jax.jit
    def seg_sample(probs, g, key):
        if g.num_edges > q:
            idx, _ = sample_edges(key, probs, g.prob, q, cfg.degree_bias_coef,
                                  edge_mask=g.edge_mask,
                                  approx=cfg.approx_topk)
            return g.senders[idx], g.receivers[idx]
        return g.senders, g.receivers

    @jax.jit
    def seg_gnn(params, g, s, r, key):
        return model.apply(params, g.x, s, r, None, deterministic=False,
                           rngs={"dropout": key})

    loss_fn = None
    if learned:
        from ..train.pipelines import make_learned_loss
        loss_fn = make_learned_loss(cfg, model, q)

    @jax.jit
    def seg_backward(params, g, key):
        if learned and g.num_edges > q:
            grads = jax.grad(lambda p: loss_fn(p, g, key)[0])(params)
        else:
            from ..train.losses import masked_cross_entropy

            def ce(p):
                out = model.apply(p, g.x, g.senders, g.receivers, None,
                                  deterministic=False,
                                  rngs={"dropout": key})
                return masked_cross_entropy(out, g.y, g.train_mask)

            grads = jax.grad(ce)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    def _peak_mb():
        try:
            stats = jax.devices()[0].memory_stats()
        except Exception:
            return None
        if not stats or "peak_bytes_in_use" not in stats:
            return None
        return stats["peak_bytes_in_use"] / (1024 ** 2)

    # XLA's compiler-reported working set per segment executable
    # (temp + output buffers) — the fallback memory metric where the PJRT
    # allocator exposes no stats (remote-tunnel TPU backends return None
    # from memory_stats). Computed once per (segment, shapes) and cached;
    # the AOT lower/compile shares the jit cache for identical shapes.
    _xla_mb_cache: Dict[int, float] = {}

    def _xla_mb(fn, args):
        key = id(fn)
        if key not in _xla_mb_cache:
            try:
                ana = fn.lower(*args).compile().memory_analysis()
                _xla_mb_cache[key] = (
                    (getattr(ana, "temp_size_in_bytes", 0)
                     + getattr(ana, "output_size_in_bytes", 0)) / (1024 ** 2))
            except Exception:
                _xla_mb_cache[key] = 0.0
        return _xla_mb_cache[key]

    def _timed_call(fn, *args):
        p0 = _peak_mb()
        t0 = time.perf_counter()
        out = fn(*args)
        # readback of (the first leaf of) the result is the sync point
        first = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jax.device_get(first)).reshape(-1)[:1]
        dt = (time.perf_counter() - t0) * 1e3
        p1 = _peak_mb()
        # peak-increment MB over the running allocator high-water mark —
        # the reference's per-segment metric (reference utils.py:30-43:
        # max_memory_allocated deltas around each bracketed segment). PJRT
        # peaks are monotone, so later identical segments report 0 once the
        # high-water mark is established, exactly like the reference's
        # steady-state epochs. Falls back to XLA's static memory analysis
        # of the segment executable when the allocator reports nothing.
        if p0 is not None and p1 is not None:
            mb = max(0.0, p1 - p0)
        else:
            mb = _xla_mb(fn, args)
        return out, dt, mb

    def profile(params, g, key):
        ms, mb = {}, {}
        if learned:
            h, ms["edge_mlp_pre"], mb["edge_mlp_pre"] = _timed_call(
                seg_pre, params, g, key)
            probs, ms["edge_score"], mb["edge_score"] = _timed_call(
                seg_score, params, h, g, key)
            (s, r), _, _ = _timed_call(seg_sample, probs, g, key)
        else:
            ms["edge_mlp_pre"] = ms["edge_score"] = 0.0
            mb["edge_mlp_pre"] = mb["edge_score"] = 0.0
            s, r = g.senders, g.receivers
        _, ms["gnn_forward"], mb["gnn_forward"] = _timed_call(
            seg_gnn, params, g, s, r, key)
        _, ms["backward"], mb["backward"] = _timed_call(
            seg_backward, params, g, key)
        return ms, mb

    return profile


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context for TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
