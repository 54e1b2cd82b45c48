"""Dense-subgraph message passing: adjacency densification for tiny node
sets.

METIS cluster partitions at the reference's scale are edge-heavy but
node-light (~1M directed edges over ~2k nodes, BASELINE.md Reddit): N^2 is a
few million entries — squarely in MXU territory. Per-edge gather/scatter on
TPU costs ~5-7 ns PER ROW regardless of width (tools/microbench_gather.py),
so a q=200k-edge sparse SpMM is ~2.3 ms while the same aggregation as a
dense (N,N) @ (N,F) matmul is ~0.33 ms and the one-time adjacency build is
~2.2 ms (tools/microbench_dense.py). Since the hybrid step runs ~12
SpMM-equivalents over the SAME two subgraphs (scorer encoder fwd+bwd, gate
GNN fwd+bwd, main GNN fwd+bwd), densifying each subgraph once per step and
reusing the matrix collapses ~20 ms of gather/scatter into ~5 ms of matmuls.

This replaces what the reference gets from cuSPARSE/torch_scatter SpMM
(reference model.py:5) — on TPU the roofline answer for small-N subgraphs is
"dense is the new sparse".

``DenseEdges`` is passed IN PLACE of the `senders` argument through the
existing layer signatures (receivers/edge_weight then ignored), so every
backbone/scorer call site works unchanged; layers dispatch on type.

Row convention: ``adj[r, s] = sum of weights of edges s -> r`` — messages
flow sender -> receiver, row index = destination, matching
``spmm(senders, receivers, w, x, n) == adj @ x``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass, data_fields=["adj"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class DenseEdges:
    """A densified subgraph: adj[r, s] = total edge weight s -> r (float32,
    no self-loops added — layers add their own, same as the COO path)."""
    adj: jax.Array  # (N, N) float32

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]


def dense_adj(senders, receivers, n: int, weights=None, valid=None
              ) -> DenseEdges:
    """Scatter an edge list into a dense (N, N) adjacency.

    ``weights`` may be differentiable — the scatter-add's VJP is a gather of
    the cotangent matrix at the same flat indices, which XLA emits natively.
    ``valid`` (bool per edge) zeroes padding selections. Duplicate edges
    accumulate, matching sparse SpMM semantics.
    """
    flat = receivers.astype(jnp.int32) * n + senders.astype(jnp.int32)
    w = jnp.ones(senders.shape[0], jnp.float32) if weights is None \
        else weights.astype(jnp.float32)
    if valid is not None:
        w = jnp.where(valid, w, 0.0)
    a = jnp.zeros((n * n,), jnp.float32).at[flat].add(w)
    return DenseEdges(adj=a.reshape(n, n))


def dense_supported(gnn: str, edge_mlp_type: str) -> bool:
    """Backbone/scorer combinations with a dense layer route (every
    backbone: GAT runs a multiplicity-weighted masked dense row softmax,
    models/layers.py GATConv)."""
    return gnn in ("GCN", "GIN", "Cheb", "GAT") and \
        edge_mlp_type in ("GCN", "MLP", "GSAGE")


def use_dense_subgraph(cfg, n: int, num_edges: int) -> bool:
    """Static (trace-time) decision: densify per-step subgraphs?

    On for small node counts where N^2 is a few-MB matrix and the edge count
    is large enough that per-row DMA dominates the sparse path. 'auto' keeps
    CPU backends on the sparse path (XLA:CPU dense matmul at N^2 is slower
    than its scatter); 'on' forces the dense route on any backend —
    tests/test_train.py::test_dense_subgraph_parity pins sparse/dense
    loss+grad parity that way on CPU.
    """
    if cfg.dense_subgraph == "off":
        return False
    if not dense_supported(cfg.GNN, cfg.edge_mlp_type):
        return False
    ok = 0 < n <= cfg.dense_threshold and n * n < 2 ** 31
    if cfg.dense_subgraph == "on":
        return ok
    # auto: require TPU and enough edges to amortize the build
    return ok and num_edges >= 4 * n and jax.default_backend() == "tpu"
