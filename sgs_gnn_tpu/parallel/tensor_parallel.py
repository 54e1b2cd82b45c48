"""Feature-dimension sharding — the TP analogue (SURVEY.md section 2.5/7).

For very wide ``nhid`` the hidden dimension itself can be sharded over a
mesh axis, Megatron-style, using pure GSPMD: annotate the PARAMETER
shardings over a ``("data", "model")`` mesh and let XLA propagate
activation shardings and insert the collectives (one psum per row-sharded
contraction). No step-function changes — the existing jitted
`train.make_train_step` compiles to an SPMD program the moment its params
are placed with these shardings. This is the scaling-book recipe (pick a
mesh, annotate, let XLA insert collectives), deliberately NOT a shard_map
re-implementation: correctness is GSPMD-guaranteed for any annotation.

Layer pairing (reference 2-layer shapes, model.py:147-164 / 91-133):

  column-sharded (kernel (in, H) -> P(None, "model"), bias -> P("model")):
      backbone gcn1, scorer gcn1/fcdim/lin_l/lin_r, head fc1, GIN mlp_lin1
  row-sharded   (kernel (H, out) -> P("model", None), bias replicated):
      backbone gcn2, scorer gcn2, head fc2, GIN mlp_lin2

Everything between a column/row pair (relu, dropout, degree scaling,
segment aggregation) is per-feature-column elementwise, so activations
stay column-sharded with zero communication; XLA inserts exactly the
all-reduce of the row-sharded contraction outputs. Parameters whose layout
has no profitable split (GAT attention vectors, scalars) stay replicated.

Composes with partition data-parallelism: build the mesh with dp > 1 and
shard stacked partition batches over "data" while params shard over
"model".
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# layer names whose kernel is column-sharded (output dim = nhid)
_COL = {"gcn1", "fcdim", "fc1", "mlp_lin1", "lin_l", "lin_r"}
# layer names whose kernel is row-sharded (input dim = nhid)
_ROW = {"gcn2", "fc2", "mlp_lin2"}


def make_dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """("data", "model") mesh over dp*tp devices."""
    devices = np.asarray(devices if devices is not None
                         else jax.devices()[: dp * tp])
    assert devices.size == dp * tp, (devices.size, dp, tp)
    return Mesh(devices.reshape(dp, tp), axis_names=("data", "model"))


def _names(path):
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(k.key)
    return out


def _owner(names):
    for n in reversed(names):
        if n in _COL or n in _ROW:
            return n
    return None


def tp_param_spec(path, leaf) -> P:
    """PartitionSpec for one parameter leaf under hidden-dim sharding."""
    names = _names(path)
    owner = _owner(names)
    if owner is None:
        return P()
    kind = names[-1]
    if kind == "kernel" and leaf.ndim == 2:
        return P(None, "model") if owner in _COL else P("model", None)
    if kind == "bias" and leaf.ndim == 1:
        # column-sharded layers emit (N, H/tp): their bias shards with the
        # output; row-sharded layers psum to a replicated output
        return P("model") if owner in _COL else P()
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a parameter pytree with hidden-dim (TP) shardings on `mesh`.

    Every hidden-sized axis must divide the "model" axis length. Returns
    the sharded pytree; feed it to the UNCHANGED jitted train step and XLA
    compiles the SPMD program (activation shardings + collectives derived
    automatically).

    Side effect: disables the Pallas fast paths for the process
    (core/fastpath.py) — pallas_call kernels carry no GSPMD partitioning
    rule, so under a "model"-axis sharding they would fail to partition or
    silently all-gather their operands. The TP step re-traces with the XLA
    fallbacks, which GSPMD partitions correctly for any annotation."""
    from ..core.fastpath import set_pallas_enabled
    set_pallas_enabled(False)
    tp = mesh.shape["model"]

    def place(path, leaf):
        spec = tp_param_spec(path, leaf)
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % tp != 0:
                raise ValueError(
                    f"param {'/'.join(_names(path))} dim {dim} size "
                    f"{leaf.shape[dim]} not divisible by tp={tp}")
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
