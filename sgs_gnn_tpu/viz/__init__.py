from .embeddings import extract_embeddings, reduce_2d, plot_embeddings_2d
from .curves import plot_learning_curves, plot_probs, plot_hist
from .graphs import (visualize_graphs_side_by_side,
                     count_edges_with_different_labels)

__all__ = [
    "extract_embeddings", "reduce_2d", "plot_embeddings_2d",
    "plot_learning_curves", "plot_probs", "plot_hist",
    "visualize_graphs_side_by_side", "count_edges_with_different_labels",
]
