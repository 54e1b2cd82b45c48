"""Multi-host execution: jax.distributed over ICI x DCN.

The reference is strictly single-device (`--device cuda:0`, reference
parser.py:87). This module is the framework's communication backend
(SURVEY.md section 2.5): one JAX process per host, a global mesh whose
``data`` axis spans every chip of every host, and per-host loading of each
host's own partition group. Gradient psums ride ICI within a host slice and
DCN across hosts — XLA picks the collective implementation from the mesh.

Wiring (run/driver.py):

  * ``init_distributed(cfg)`` — idempotent ``jax.distributed.initialize``
    from --coordinator_address/--num_processes/--process_id (or their env
    defaults). Must run before the first JAX computation.
  * ``local_slot_indices(mesh)`` — which positions of the mesh's data axis
    this process owns; the driver loads ONLY those partitions.
  * ``stack_local_to_global(graphs, mesh)`` — assemble the globally-sharded
    stacked batch from process-local partition Graphs via
    ``jax.make_array_from_process_local_data`` (no cross-host data motion:
    each shard is produced on the host that owns it).

Validated without hardware by tools/multihost_dryrun.py: N CPU processes on
localhost (Gloo collectives), run by tests/test_multihost.py.
"""
from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def init_distributed(coordinator_address: str = "", num_processes: int = 1,
                     process_id: int = 0) -> None:
    """Idempotent jax.distributed.initialize. Arguments fall back to the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) when empty; single-process configs are a no-op."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", "")
    num_processes = num_processes or int(os.environ.get(
        "JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    if not coordinator_address:
        raise ValueError("multihost run needs --coordinator_address "
                         "(host:port of process 0)")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    _INITIALIZED = True


def is_primary() -> bool:
    """True on the process that should own logging / CSV / checkpoints."""
    return jax.process_index() == 0


def make_global_mesh(axis_name: str = "data") -> Mesh:
    """Mesh over ALL devices of ALL processes, in jax.devices() order
    (hosts contiguous -> the data axis maps partitions host-locally and
    gradient reduction forms an ICI-then-DCN tree)."""
    return Mesh(np.array(jax.devices()), (axis_name,))


def local_slot_indices(mesh: Mesh) -> List[int]:
    """Positions along the mesh's (flat) device axis owned by this process.
    The driver loads exactly these partition slots of every super-step."""
    me = jax.process_index()
    return [i for i, d in enumerate(mesh.devices.flat)
            if d.process_index == me]


def stack_local_to_global(graphs: Sequence, mesh: Mesh, axis: str = "data"):
    """Stack this process's partition Graphs (one per local mesh slot, in
    local_slot_indices order) into the GLOBAL (n_global, ...) sharded batch.

    Uses make_array_from_process_local_data so each host contributes only
    its own shards; remote shards are never materialized locally."""
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *graphs)
    sharding = NamedSharding(mesh, P(axis))
    n_global = mesh.devices.size

    def put(a):
        return jax.make_array_from_process_local_data(
            sharding, a, (n_global,) + a.shape[1:])

    return jax.tree_util.tree_map(put, stacked)
