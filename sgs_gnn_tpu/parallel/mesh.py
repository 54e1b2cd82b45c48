"""Device mesh construction.

The reference has no distributed backend at all (single `--device cuda:0`,
reference parser.py:87); scaling beyond one chip is a new first-class
capability of this framework (SURVEY.md section 2.5). The mesh carries one
axis, ``data``, over which cluster partitions are sharded; gradients ride
ICI via psum inside shard_map.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
