"""Persistent XLA compilation cache setup.

First compiles through the remote TPU tunnel are expensive (minutes for the
full training step); the persistent cache keys serialized executables by
HLO hash so every later process — the quality sweeps' one-process-per-config
protocol, bench.py, resumed runs — skips straight to execution.  Call
``enable()`` before the first array/computation is created (idempotent,
no-op if the cache dir cannot be created or jax is already initialized
past the point of caring).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> str | None:
    cache_dir = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                            _DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # cache even when compile time is mostly spent remotely
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
