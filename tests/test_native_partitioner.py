"""Native C++ partitioner: build, balance, cut quality vs random."""
import numpy as np
import pytest

from sgs_gnn_tpu.data import sbm_graph, to_undirected
from sgs_gnn_tpu.data.native_partitioner import greedy_partition, cut_edges
from sgs_gnn_tpu.data.partition import partition_nodes


def test_native_partitioner_builds_and_balances():
    x, ei, y, _ = sbm_graph(n=1000, num_classes=4, deg=10, h=0.9, seed=0)
    ei = to_undirected(ei)
    part = greedy_partition(ei, 1000, 4)
    assert part.shape == (1000,)
    sizes = np.bincount(part, minlength=4)
    assert sizes.min() > 0
    # balance is degree-weighted with a 1.35x node cap (padding cost is
    # driven by EDGE skew; node skew only pads the cheap x rows)
    assert sizes.max() <= int(np.ceil(1000 / 4 * 1.35 * 1.02) + 2)


def test_native_cut_beats_random():
    x, ei, y, _ = sbm_graph(n=1200, num_classes=6, deg=12, h=0.95, seed=1)
    ei = to_undirected(ei)
    part = greedy_partition(ei, 1200, 6)
    rng = np.random.default_rng(0)
    rand_part = rng.integers(0, 6, 1200).astype(np.int32)
    cut_native = cut_edges(ei, part)
    cut_random = cut_edges(ei, rand_part)
    # random cut ~ (1 - 1/6) of edges; the greedy cut must be much smaller
    assert cut_native < 0.6 * cut_random, (cut_native, cut_random)


def test_partition_nodes_native_path():
    x, ei, y, _ = sbm_graph(n=500, num_classes=2, deg=8, seed=2)
    ei = to_undirected(ei)
    part = partition_nodes(ei, 500, 4, method="native")
    assert set(np.unique(part)) <= {0, 1, 2, 3}
    sizes = np.bincount(part, minlength=4)
    assert sizes.min() > 0
