"""Losses and on-device metrics.

Everything stays on device — the reference syncs to CPU for sklearn micro-F1
twice per batch when the conditional gate is on (reference utils.py:163-169,
training_hybrid.py:94-95); here micro-F1 over single-label predictions is
computed as masked accuracy in jnp (mathematically identical).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_EPS = 1e-12


def masked_cross_entropy(logits, labels, mask):
    """Mean CE over masked nodes (reference `criterion(out[mask], y[mask])`,
    nn.CrossEntropyLoss at main.py:125)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    m = mask.astype(nll.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def micro_f1(logits, labels, mask):
    """Micro-averaged F1 == accuracy for single-label classification
    (sklearn f1_score(average='micro'); reference utils.py:163-169)."""
    preds = jnp.argmax(logits, axis=-1)
    hit = (preds == labels).astype(jnp.float32)
    m = mask.astype(jnp.float32)
    return jnp.sum(hit * m) / jnp.maximum(jnp.sum(m), 1.0)


@jax.custom_vjp
def _bce_clamped(p, labels):
    """Binary cross-entropy with torch.F.binary_cross_entropy's exact
    saturation semantics — forward clamps each log term at -100, backward
    divides by max(p*(1-p), 1e-12) (aten's binary_cross_entropy_backward)
    — so a sigmoid saturated to EXACTLY 0 or 1 in f32 (large logits,
    observed on high-variance 602-dim features) contributes a finite 100
    with a large-but-finite gradient.

    Needs a custom VJP: autodiff of any log-based form leaks NaN at p=0
    (the 0-cotangent of a clamp still multiplies log's 1/p=inf), and a
    clip floor must not be SUBNORMAL in f32 — the previous 1e-38 floor was
    flushed to zero by XLA (FTZ), so log(p) reached -inf and one saturated
    edge NaN'd the whole step's gradients through the conditional gate's
    0-cotangent jnp.where."""
    log_p = jnp.maximum(jnp.log(p), -100.0)
    log_1p = jnp.maximum(jnp.log(1.0 - p), -100.0)
    return -(labels * log_p + (1.0 - labels) * log_1p)


def _bce_clamped_fwd(p, labels):
    return _bce_clamped(p, labels), (p, labels)


def _bce_clamped_bwd(res, g):
    p, labels = res
    dp = g * (p - labels) / jnp.maximum(p * (1.0 - p), 1e-12)
    return dp, jnp.zeros_like(labels)


_bce_clamped.defvjp(_bce_clamped_fwd, _bce_clamped_bwd)


def assortative_bce(edge_probs, sampled_senders, sampled_receivers, y,
                    train_mask):
    """reg1 — homophily BCE over sampled train-train edges
    (reference training_hybrid.py:107-129).

    Edges whose endpoints are both train nodes get label 1 if same class
    else 0; BCE(edge_prob, label) averaged over those edges. The loss is
    zeroed unless the number of positive labels exceeds 1 (reference's
    ``torch.sum(valid_edge_labels).item() > 1`` gate) — reproduced with a
    traced boolean so the step stays jit-compiled.

    Note on the membership test: the reference checks
    ``isin(src, nonzero(train_mask))`` which equals ``train_mask[src]``.
    """
    both_train = train_mask[sampled_senders] & train_mask[sampled_receivers]
    same = (y[sampled_senders] == y[sampled_receivers])
    labels = same.astype(edge_probs.dtype)
    bce = _bce_clamped(edge_probs, labels)
    valid = both_train.astype(edge_probs.dtype)
    mean_bce = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    n_pos = jnp.sum(labels * valid)
    return jnp.where(n_pos > 1.0, mean_bce, 0.0)


def assortative_bce_flags(edge_probs, flags):
    """reg1 from pre-gathered static edge flags (Graph.edge_aux column 2:
    bit0 = both endpoints train, bit1 = same label). Same math as
    :func:`assortative_bce`, with the per-step y/train_mask gathers replaced
    by one packed aux-row gather done by the caller."""
    both_train = (flags & 1) > 0
    labels = ((flags >> 1) & 1).astype(edge_probs.dtype)
    bce = _bce_clamped(edge_probs, labels)
    valid = both_train.astype(edge_probs.dtype)
    mean_bce = jnp.sum(bce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    n_pos = jnp.sum(labels * valid)
    return jnp.where(n_pos > 1.0, mean_bce, 0.0)


def consistency_loss(edge_probs, sampled_senders, sampled_receivers,
                     node_embeddings, valid=None):
    """reg2 — MSE between sampled-edge probabilities and cosine similarity of
    the GNN output embeddings of the endpoints (reference utils.py:187-211).

    torch cosine_similarity clamps the denominator at eps=1e-8. ``valid``
    (optional bool mask over sampled edges) excludes padding selections from
    the mean — identity when every sampled edge is real.

    The two endpoint gathers go through ops/edge_gather.gather_rows so
    their backward rides the blocked one-hot MXU scatter instead of XLA's
    serialized scatter (4.0 ms -> 1.5 ms of the r3 bench step). The
    FORWARD stays a per-row DMA gather deliberately: an MXU one-hot
    select was A/B-measured SLOWER (3.3 ms vs 2.5 ms fwd+bwd at q=200k,
    N=2048, C=41, bf16) because building the (N, B) one-hot panel is
    VPU-bound compare work exceeding the DMA latency it replaces
    (r4 measurement, PERF.md).
    """
    from ..ops.edge_gather import gather_rows
    src = gather_rows(node_embeddings, sampled_senders)
    dst = gather_rows(node_embeddings, sampled_receivers)
    num = jnp.sum(src * dst, axis=-1)

    def safe_norm(v):
        # sqrt has an infinite derivative at 0; clamp the squared norm so an
        # exactly-zero embedding keeps finite gradients
        return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 1e-16))

    denom = jnp.maximum(safe_norm(src), 1e-8) * \
        jnp.maximum(safe_norm(dst), 1e-8)
    cos = num / denom
    sq = (edge_probs - cos) ** 2
    if valid is None:
        return jnp.mean(sq)
    m = valid.astype(sq.dtype)
    return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m), 1.0)
