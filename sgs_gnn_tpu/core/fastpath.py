"""Process-wide switch for the Pallas TPU fast paths.

The Pallas kernels (one-hot scatter, fused sampled head, tile scorer,
Pallas SpMM) carry no GSPMD partitioning rules: under tensor-parallel
parameter shardings (parallel/tensor_parallel.py) a pallas_call inside the
jitted step would either fail to partition or force XLA to all-gather its
operands — silently undoing the sharding. ``shard_params_tp`` therefore
disables the Pallas routes for the process; every kernel engage-gate
consults ``pallas_enabled()`` at trace time. Partition-DP via shard_map
replicates the step per device, which is also outside these kernels'
supported layouts, so the drivers' sharded paths score via XLA too
(run/driver.py want_tile_index).

The switch is trace-time state: flip it before jitting (re-tracing) the
affected step. Sharded and unsharded params produce distinct compilation
cache entries, so a step traced with the flag on is never reused for
TP-sharded arguments.
"""
from __future__ import annotations

import contextlib

_pallas_enabled = True


def pallas_enabled() -> bool:
    """Are the Pallas TPU fast paths allowed to engage?"""
    return _pallas_enabled


def set_pallas_enabled(on: bool) -> None:
    global _pallas_enabled
    _pallas_enabled = bool(on)


@contextlib.contextmanager
def pallas_disabled():
    """Temporarily force the XLA fallbacks (tests, TP certification)."""
    prev = _pallas_enabled
    set_pallas_enabled(False)
    try:
        yield
    finally:
        set_pallas_enabled(prev)
