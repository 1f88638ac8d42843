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


# ---------------------------------------------------------------------------
# Eval-side ranking/calibration metrics (host numpy — run on gathered
# predictions, not in the jitted step). The reference evaluates AUC only;
# production CTR eval also reports GAUC (per-user AUC, the metric DIN/DIEN
# report in their papers) and calibration.

def gauc(labels, probs, groups, min_size: int = 2):
    """Group-averaged AUC: impression-weighted mean of per-group AUCs over
    groups that contain both classes (Zhou et al., DIN §6.2). Returns
    (gauc, n_groups_used)."""
    import numpy as np

    labels = np.asarray(labels, np.float64).reshape(-1)
    probs = np.asarray(probs, np.float64).reshape(-1)
    groups = np.asarray(groups).reshape(-1)
    order = np.argsort(groups, kind="stable")
    labels, probs, groups = labels[order], probs[order], groups[order]
    bounds = np.flatnonzero(np.r_[True, groups[1:] != groups[:-1], True])
    total_w = 0.0
    acc = 0.0
    used = 0
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        y, p = labels[lo:hi], probs[lo:hi]
        n = hi - lo
        npos = y.sum()
        if n < min_size or npos == 0 or npos == n:
            continue
        r = np.empty(n)
        o = np.argsort(p, kind="stable")
        ps = p[o]
        # average ranks with ties
        rk = np.arange(1, n + 1, dtype=np.float64)
        ties = np.r_[True, ps[1:] != ps[:-1]]
        grp = np.cumsum(ties) - 1
        cnt = np.bincount(grp)
        csum = np.bincount(grp, weights=rk)
        r[o] = (csum / cnt)[grp]
        auc = (r[y > 0].sum() - npos * (npos + 1) / 2) / (npos * (n - npos))
        acc += n * auc
        total_w += n
        used += 1
    return (acc / total_w if total_w else 0.5), used


def calibration(labels, probs, n_bins: int = 20):
    """Predicted-vs-observed CTR: overall ratio (Σp/Σy — production
    calibration monitoring) and expected calibration error over equal-width
    probability bins."""
    import numpy as np

    labels = np.asarray(labels, np.float64).reshape(-1)
    probs = np.asarray(probs, np.float64).reshape(-1)
    ratio = probs.sum() / max(labels.sum(), 1e-12)
    bins = np.clip((probs * n_bins).astype(np.int64), 0, n_bins - 1)
    cnt = np.bincount(bins, minlength=n_bins).astype(np.float64)
    psum = np.bincount(bins, weights=probs, minlength=n_bins)
    ysum = np.bincount(bins, weights=labels, minlength=n_bins)
    nz = cnt > 0
    ece = float(np.sum(np.abs(psum[nz] - ysum[nz])) / max(len(labels), 1))
    return {"ratio": float(ratio), "ece": ece}


def retrieval_metrics(user_vecs, item_vecs, true_items, ks=(1, 10, 50)):
    """Recall-side eval for the two-tower/multi-interest families (DSSM
    `user_vec`/`item_vec`, MIND `interests`): hit-rate@K over a corpus.

    ``user_vecs`` (Q, D) or multi-interest (Q, I, D); ``item_vecs`` (N, D)
    the full candidate corpus; ``true_items`` (Q,) int corpus indices. Scores
    are inner products (max over the interest axis when present — MIND's
    serving rule: each interest queries the ANN index, best hit wins).
    Returns {"hit@K": ...} plus mean reciprocal rank.
    """
    import numpy as np

    u = np.asarray(user_vecs, np.float32)
    v = np.asarray(item_vecs, np.float32)
    t = np.asarray(true_items).reshape(-1)
    scores = u @ v.T if u.ndim == 2 else np.max(
        np.einsum("qid,nd->qin", u, v), axis=1)          # (Q, N)
    # rank of the true item per query (1-based; ties counted against us)
    true_s = scores[np.arange(len(t)), t]
    rank = 1 + np.sum(scores > true_s[:, None], axis=1)
    out = {f"hit@{k}": float(np.mean(rank <= k)) for k in ks}
    out["mrr"] = float(np.mean(1.0 / rank))
    return out
