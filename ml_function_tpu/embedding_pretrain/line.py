"""LINE: first- and second-order proximity embeddings in JAX.

Counterpart of the reference's Keras LINE (``kon/model/embedding/line.py:8-173``
and loss/model in ``walk_core_model.py:118-155``): alias-sampled positive
edges (weight-proportional), degree^0.75 negative nodes, logistic losses:
- order 1: σ(u_i·u_j) on undirected closeness;
- order 2: σ(u_i·c_j) with context vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.base import normal_init
from .alias import alias_sample, build_alias
from .graph import CSRGraph


@dataclass
class LineConfig:
    dim: int = 64
    order: str = "second"       # first | second | all
    negatives: int = 5
    learning_rate: float = 0.025
    batch_size: int = 1024
    steps: int = 2000
    seed: int = 0


def train_line(g: CSRGraph, cfg: LineConfig = LineConfig()) -> np.ndarray:
    rng = np.random.default_rng(cfg.seed)
    # positive edge sampler ∝ weight (reference edge alias, line.py:55-70)
    e_accept, e_alias = build_alias(g.weights)
    src_of_edge = np.searchsorted(g.indptr, np.arange(g.num_edges),
                                  side="right") - 1
    # negative node sampler ∝ degree^0.75 (line.py:72-80)
    deg = np.maximum(g.degrees(), 1).astype(np.float64) ** 0.75
    n_accept, n_alias = build_alias(deg)

    key = jax.random.PRNGKey(cfg.seed)
    k1, k2 = jax.random.split(key)
    dims = (g.num_nodes, cfg.dim)
    emb = normal_init(k1, dims, 0.5 / cfg.dim)
    ctx = jnp.zeros(dims, jnp.float32)
    lr = cfg.learning_rate
    use_first = cfg.order in ("first", "all")
    use_second = cfg.order in ("second", "all")

    @jax.jit
    def step(carry, batch):
        emb, ctx = carry
        src, dst, neg = batch  # (B,), (B,), (B, K)

        def loss_fn(tabs):
            emb, ctx = tabs
            v = jnp.take(emb, src, axis=0)
            total = 0.0
            if use_first:
                u = jnp.take(emb, dst, axis=0)
                un = jnp.take(emb, neg, axis=0)
                total += -(jnp.mean(jax.nn.log_sigmoid(jnp.sum(v * u, -1)))
                           + jnp.mean(jnp.sum(jax.nn.log_sigmoid(
                               -jnp.einsum("bd,bkd->bk", v, un)), -1)))
            if use_second:
                u = jnp.take(ctx, dst, axis=0)
                un = jnp.take(ctx, neg, axis=0)
                total += -(jnp.mean(jax.nn.log_sigmoid(jnp.sum(v * u, -1)))
                           + jnp.mean(jnp.sum(jax.nn.log_sigmoid(
                               -jnp.einsum("bd,bkd->bk", v, un)), -1)))
            return total

        loss, grads = jax.value_and_grad(loss_fn)((emb, ctx))
        return (emb - lr * grads[0], ctx - lr * grads[1]), loss

    carry = (emb, ctx)
    for _ in range(cfg.steps):
        e = alias_sample(e_accept, e_alias, rng, cfg.batch_size)
        src = src_of_edge[e]
        dst = g.indices[e]
        neg = alias_sample(n_accept, n_alias, rng,
                           (cfg.batch_size, cfg.negatives))
        carry, _ = step(carry, (jnp.asarray(src), jnp.asarray(dst),
                                jnp.asarray(neg)))
    return np.asarray(carry[0])
