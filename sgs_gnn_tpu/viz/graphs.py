"""Full-vs-sampled graph visualization + heterophily reporting
(reference utils.py:291-398, visualization_utils/graph.py)."""
from __future__ import annotations

from typing import Optional

import numpy as np


def count_edges_with_different_labels(senders, receivers, y):
    """Heterophilic-edge count of a (sub)graph (reference utils.py:291-342,
    used to report the homophily of the sampled graph vs the original)."""
    senders = np.asarray(senders); receivers = np.asarray(receivers)
    y = np.asarray(y)
    diff = int(np.sum(y[senders] != y[receivers]))
    total = len(senders)
    return {"different": diff, "same": total - diff, "total": total,
            "heterophily": diff / total if total else 0.0}


def visualize_graphs_side_by_side(full_edges, sampled_edges, y, pos=None,
                                  max_nodes: int = 300,
                                  path: Optional[str] = None):
    """Draw the full graph and the sampled sparse subgraph side by side,
    nodes colored by label (reference `visualize`, utils.py:370-398).
    Graphs larger than max_nodes are truncated to the first max_nodes nodes
    for legibility."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import networkx as nx

    y = np.asarray(y)
    n = min(len(y), max_nodes)

    def build(es):
        g = nx.Graph()
        g.add_nodes_from(range(n))
        s, r = np.asarray(es[0]), np.asarray(es[1])
        keep = (s < n) & (r < n)
        g.add_edges_from(zip(s[keep].tolist(), r[keep].tolist()))
        return g

    g_full, g_samp = build(full_edges), build(sampled_edges)
    if pos is None:
        pos = nx.spring_layout(g_full, seed=0)
    fig, axes = plt.subplots(1, 2, figsize=(16, 7))
    for ax, g, title in ((axes[0], g_full, "full graph"),
                         (axes[1], g_samp, "sampled subgraph")):
        nx.draw(g, pos, ax=ax, node_color=y[:n], cmap="tab10",
                node_size=30, width=0.4, alpha=0.8)
        het = count_edges_with_different_labels(
            *np.array(list(g.edges)).T.reshape(2, -1), y) if g.number_of_edges() \
            else {"heterophily": 0.0}
        ax.set_title(f"{title} (het {het['heterophily']:.3f})")
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight"); plt.close(fig)
        return path
    return fig
