"""Learning-curve and probability plots (reference utils.py:91-160,
403-415). Headless (Agg) so they work on TPU hosts; every function can
save to a path instead of showing."""
from __future__ import annotations

from typing import Optional

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_learning_curves(run: int, train_f1, val_f1, test_f1,
                         path: Optional[str] = None):
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 5))
    xs = np.arange(len(train_f1))
    ax.plot(xs, train_f1, label="train")
    ax.plot(xs, val_f1, label="val")
    ax.plot(xs, test_f1, label="test")
    ax.set_xlabel("epoch"); ax.set_ylabel("micro-F1")
    ax.set_title(f"run {run}")
    ax.legend(); ax.grid(True, alpha=0.3)
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight"); plt.close(fig)
        return path
    return fig


def plot_probs(edge_probs, sampling_probs, path: Optional[str] = None):
    """Scatter of per-edge learned probs and sampling distribution
    (reference utils.py:91-115)."""
    plt = _plt()
    ep = np.asarray(edge_probs); sp = np.asarray(sampling_probs)
    fig, axes = plt.subplots(2, 1, figsize=(16, 6))
    axes[0].scatter(range(len(ep)), ep, s=2)
    axes[0].set_title("Edge Probs"); axes[0].grid(True)
    axes[1].scatter(range(len(sp)), sp, s=2)
    axes[1].set_title("Sampling Probs"); axes[1].grid(True)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150); plt.close(fig)
        return path
    return fig


def plot_hist(edge_probs, sampling_probs, ep_selected, sp_selected,
              path: Optional[str] = None):
    """Four-panel histogram: all/selected edge + sampling probs
    (reference utils.py:118-160)."""
    plt = _plt()
    panels = [(edge_probs, "Edge Probs"),
              (sampling_probs, "Sampling Probs"),
              (ep_selected, "Selected Edge Probs"),
              (sp_selected, "Selected Sampling Probs")]
    fig, axes = plt.subplots(4, 1, figsize=(16, 12))
    for ax, (v, t) in zip(axes, panels):
        ax.hist(np.asarray(v), bins=30, edgecolor="black")
        ax.set_title(t); ax.grid(True)
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150); plt.close(fig)
        return path
    return fig
