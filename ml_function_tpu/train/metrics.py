"""Streaming metrics: AUC (fixed-bin) + logloss, device-resident and
psum-able across hosts.

The reference evaluates with ``tf.keras.metrics.AUC`` at fit time
(``example/ctr_example/un_seq.py:61``) — a 200-threshold streaming AUC. Here
the accumulator is a pair of score histograms (default 4096 bins over
sigmoid(logit)), updated with one segment-sum per batch; the final AUC is the
exact rank statistic of the binned scores (trapezoidal, ties get 1/2). The
state is a tiny pytree, so multi-host eval is just a ``psum`` of histograms.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

N_BINS = 4096

MetricState = Dict[str, jax.Array]


def init_metrics(n_bins: int = N_BINS) -> MetricState:
    return {
        "pos_hist": jnp.zeros((n_bins,), jnp.float32),
        "neg_hist": jnp.zeros((n_bins,), jnp.float32),
        "loss_sum": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example binary cross-entropy on logits (stable)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def update_metrics(state: MetricState, logits: jax.Array, labels: jax.Array,
                   weights: jax.Array = None) -> MetricState:
    n_bins = state["pos_hist"].shape[0]
    p = jax.nn.sigmoid(logits)
    bins = jnp.clip((p * n_bins).astype(jnp.int32), 0, n_bins - 1)
    w = jnp.ones_like(labels) if weights is None else weights
    pos = jax.ops.segment_sum(labels * w, bins, n_bins)
    neg = jax.ops.segment_sum((1.0 - labels) * w, bins, n_bins)
    loss = jnp.sum(bce_with_logits(logits, labels) * w)
    return {
        "pos_hist": state["pos_hist"] + pos,
        "neg_hist": state["neg_hist"] + neg,
        "loss_sum": state["loss_sum"] + loss,
        "count": state["count"] + jnp.sum(w),
    }


def compute_auc(state: MetricState) -> jax.Array:
    pos, neg = state["pos_hist"], state["neg_hist"]
    # P(score_pos > score_neg) + 0.5 P(tie), over binned scores
    neg_below = jnp.cumsum(neg) - neg
    correct = jnp.sum(pos * neg_below) + 0.5 * jnp.sum(pos * neg)
    total = jnp.sum(pos) * jnp.sum(neg)
    return jnp.where(total > 0, correct / total, 0.5)


def compute_logloss(state: MetricState) -> jax.Array:
    return state["loss_sum"] / jnp.maximum(state["count"], 1.0)


def merge_metrics(a: MetricState, b: MetricState) -> MetricState:
    return jax.tree_util.tree_map(jnp.add, a, b)


def metrics_summary(state: MetricState) -> Dict[str, float]:
    return {
        "auc": float(compute_auc(state)),
        "logloss": float(compute_logloss(state)),
        "count": float(state["count"]),
    }
