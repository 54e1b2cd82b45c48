"""Debug checks: the functional-JAX analogue of sanitizers.

The reference has no race detection or sanitizers (SURVEY.md section 5 —
none needed under torch's eager model either). In this framework the
equivalent safety nets are:

  * ``validate_graph`` — host-side structural invariants of a Graph batch
    (index bounds, mask disjointness, prior normalization). Run once per
    batch at preparation time, not on the train path.
  * ``checked`` — wraps a jitted function with jax.experimental.checkify
    (index OOB + NaN + div-by-zero checks) for debugging miscompiles or
    bad data; ~2x slower, never on by default.
  * NaN scanning of pytrees (``find_nans``) for post-mortem use.
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np
import jax


def validate_graph(g, name: str = "graph") -> None:
    """Raise ValueError on malformed Graph batches."""
    n, e = g.num_nodes, g.num_edges
    s = np.asarray(g.senders)
    r = np.asarray(g.receivers)
    problems = []
    if s.min(initial=0) < 0 or s.max(initial=0) >= n:
        problems.append(f"senders out of range [0,{n})")
    if r.min(initial=0) < 0 or r.max(initial=0) >= n:
        problems.append(f"receivers out of range [0,{n})")
    tm = np.asarray(g.train_mask)
    vm = np.asarray(g.val_mask)
    te = np.asarray(g.test_mask)
    if (tm & vm).any() or (vm & te).any() or (tm & te).any():
        problems.append("train/val/test masks overlap")
    prob = np.asarray(g.prob)
    if not np.isfinite(prob).all() or (prob < 0).any():
        problems.append("prior has negative or non-finite entries")
    mask = np.asarray(g.edge_mask)
    if prob[~mask].sum() > 1e-6:
        problems.append("padding edges carry prior probability")
    y = np.asarray(g.y)
    if g.num_classes and (y.min() < 0 or y.max() >= g.num_classes):
        problems.append(f"labels out of range [0,{g.num_classes})")
    if g.receiver_band:
        # a stale/undersized band makes scatter_add_sorted_pallas silently
        # DROP gradient contributions (ops/scatter_pallas.py band contract) —
        # fail loudly here instead
        from ..ops.scatter_pallas import required_band
        if e and (np.diff(r) < 0).any():
            problems.append("receiver_band set but receivers are not sorted")
        elif e and required_band(r) > g.receiver_band:
            problems.append(
                f"receiver_band={g.receiver_band} < required_band="
                f"{required_band(r)}; banded scatter would drop contributions")
    if problems:
        raise ValueError(f"{name}: " + "; ".join(problems))


def checked(fn: Callable) -> Callable:
    """checkify-wrapped jitted fn: raises on index OOB / NaN / div0."""
    from jax.experimental import checkify

    errors = (checkify.index_checks | checkify.nan_checks
              | checkify.div_checks)
    cfn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = jax.jit(cfn)(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def find_nans(tree: Any) -> list:
    """Paths of pytree leaves containing NaN/inf — post-mortem helper."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and \
                not np.isfinite(arr).all():
            bad.append("/".join(str(getattr(p, "key", p)) for p in path))
    return bad
