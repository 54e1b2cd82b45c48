"""SparseGAT baseline: L0-regularized graph attention.

TPU-native re-implementation of the reference's comparison baseline
(reference Notebooks/1KDDSparseGAToptimized.ipynb: `l0_train`,
`GraphAttention`, `get_sparsegat_edge_weights`): per-edge hard-concrete
gates multiply attention coefficients, and an L0 penalty (the expected
number of open gates) pushes edges to exactly zero — a learned sparsifier.

Hard-concrete gate (Louizos et al. 2018):
    u ~ U(0,1);  s = sigmoid((log u - log(1-u) + log_alpha) / beta)
    s_bar = s * (zeta - gamma) + gamma;  z = clip(s_bar, 0, 1)
    L0 = sigmoid(log_alpha - beta * log(-gamma / zeta))
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.segment import segment_softmax

_GAMMA, _ZETA, _BETA = -0.1, 1.1, 0.66


def hard_concrete(key, log_alpha, deterministic: bool):
    if deterministic:
        s = jax.nn.sigmoid(log_alpha)
    else:
        u = jax.random.uniform(key, log_alpha.shape, minval=1e-6,
                               maxval=1.0 - 1e-6)
        s = jax.nn.sigmoid((jnp.log(u) - jnp.log1p(-u) + log_alpha) / _BETA)
    s_bar = s * (_ZETA - _GAMMA) + _GAMMA
    return jnp.clip(s_bar, 0.0, 1.0)


def l0_penalty(log_alpha):
    """Expected number of non-zero gates (the l0_train loss term)."""
    return jnp.sum(jax.nn.sigmoid(
        log_alpha - _BETA * jnp.log(-_GAMMA / _ZETA)))


class SparseGAT(nn.Module):
    """2-layer GAT with per-edge L0 gates shared across layers."""
    hidden_dim: int
    num_classes: int
    dropout_prob: float = 0.3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, senders, receivers, key, deterministic: bool = True):
        e = senders.shape[0]
        n = x.shape[0]
        log_alpha = self.param("log_alpha",
                               nn.initializers.normal(0.01), (e,))
        z = hard_concrete(key, log_alpha, deterministic)

        def gat_layer(x_in, feats, name):
            xw = nn.Dense(feats, use_bias=False, name=f"{name}_lin",
                          dtype=self.dtype)(x_in).astype(jnp.float32)
            att_s = self.param(f"{name}_att_src",
                               nn.initializers.glorot_uniform(), (1, feats))
            att_d = self.param(f"{name}_att_dst",
                               nn.initializers.glorot_uniform(), (1, feats))
            logits = (jnp.sum(xw * att_s, 1)[senders]
                      + jnp.sum(xw * att_d, 1)[receivers])
            logits = nn.leaky_relu(logits, 0.2)
            alpha = segment_softmax(logits, receivers, n) * z  # gated
            msgs = xw[senders] * alpha[:, None]
            return jax.ops.segment_sum(msgs, receivers, num_segments=n)

        h = nn.relu(gat_layer(x, self.hidden_dim, "gat1"))
        h = nn.Dropout(self.dropout_prob, deterministic=deterministic)(h)
        out = gat_layer(h, self.num_classes, "gat2")
        return out, l0_penalty(log_alpha)

    @staticmethod
    def edge_weights(params):
        """Deterministic gate values — the learned sparsification pattern
        (the analogue of get_sparsegat_edge_weights)."""
        la = params["params"]["log_alpha"]
        s = jax.nn.sigmoid(la) * (_ZETA - _GAMMA) + _GAMMA
        return jnp.clip(s, 0.0, 1.0)
