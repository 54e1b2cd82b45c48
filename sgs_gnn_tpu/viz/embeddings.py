"""Embedding extraction + 2-D reduction for publication figures.

Mirrors the reference's visualization_utils/embeddings.py: pull hidden
representations out of a trained backbone, reduce with PCA or t-SNE, and
scatter-plot colored by label. Offline analysis only — never on the train
path.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax


def extract_embeddings(model, params, graph, layer: str = "hidden"):
    """First-layer hidden embeddings (the analogue of the reference's
    `model.gcn1` hook, visualization_utils/embeddings.py). ``layer`` is
    'hidden' (post first conv + relu) or 'logits'."""
    if layer == "logits":
        return np.asarray(model.apply(params, graph.x, graph.senders,
                                      graph.receivers, deterministic=True))

    # run only the first conv: reuse the module's bound submodule
    def first_layer(mod, x, s, r):
        conv = getattr(mod, "gcn1", None) or getattr(mod, "GIN_conv1", None) \
            or getattr(mod, "GAT_conv1", None)
        return jax.nn.relu(conv(x, s, r))

    out = model.apply(params, graph.x, graph.senders, graph.receivers,
                      method=first_layer)
    return np.asarray(out)


def reduce_2d(embeddings: np.ndarray, method: str = "pca",
              seed: int = 0) -> np.ndarray:
    """PCA or t-SNE to 2 dims (reference visualization_utils/utils.py)."""
    if method == "pca":
        from sklearn.decomposition import PCA
        return PCA(n_components=2, random_state=seed).fit_transform(embeddings)
    if method == "tsne":
        from sklearn.manifold import TSNE
        return TSNE(n_components=2, random_state=seed,
                    init="pca").fit_transform(embeddings)
    raise ValueError(method)


def plot_embeddings_2d(embeddings_2d: np.ndarray, labels: np.ndarray,
                       title: str = "", path: Optional[str] = None,
                       mask: Optional[np.ndarray] = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if mask is not None:
        embeddings_2d, labels = embeddings_2d[mask], labels[mask]
    fig, ax = plt.subplots(figsize=(6, 6))
    sc = ax.scatter(embeddings_2d[:, 0], embeddings_2d[:, 1], c=labels,
                    cmap="tab10", s=6, alpha=0.7)
    ax.set_title(title)
    fig.colorbar(sc, ax=ax, shrink=0.8)
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return path
    return fig
