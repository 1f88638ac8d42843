"""SDNE: structural deep network embedding (autoencoder) in JAX.

Counterpart of the reference's Keras SDNE (``kon/model/embedding/sdne.py:6-91``;
losses/encoder/decoder ``walk_core_model.py:158-199``):
- 2nd-order loss: reconstruct adjacency rows, nonzero entries up-weighted β;
- 1st-order loss: α·Σ_ij a_ij‖y_i−y_j‖² (Laplacian form);
- L2 regularization on weights.
Dense adjacency rows per batch (graphs at this scale are small — wiki is 2.4k
nodes; for larger graphs rows are built per-batch from CSR).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.base import split_rngs
from ..ops.core import MLP
from .graph import CSRGraph


@dataclass
class SDNEConfig:
    hidden: Tuple[int, ...] = (256, 128)
    alpha: float = 1e-6
    beta: float = 5.0
    l2: float = 1e-4
    learning_rate: float = 1e-3
    batch_size: int = 512
    epochs: int = 40
    seed: int = 0


def _adj_rows(g: CSRGraph, rows: np.ndarray) -> np.ndarray:
    out = np.zeros((len(rows), g.num_nodes), np.float32)
    for i, v in enumerate(rows):
        lo, hi = g.indptr[v], g.indptr[v + 1]
        out[i, g.indices[lo:hi]] = g.weights[lo:hi]
    return out


def train_sdne(g: CSRGraph, cfg: SDNEConfig = SDNEConfig()) -> np.ndarray:
    n = g.num_nodes
    enc = MLP(n, cfg.hidden, activation="relu")
    dec = MLP(cfg.hidden[-1], tuple(reversed(cfg.hidden[:-1])) + (n,),
              activation="relu")
    rngs = split_rngs(jax.random.PRNGKey(cfg.seed), ["enc", "dec"])
    params = {"enc": enc.init(rngs["enc"]), "dec": dec.init(rngs["dec"])}

    import optax
    opt = optax.adam(cfg.learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, a_rows, a_pair):
        def loss_fn(p):
            y, _ = enc(p["enc"], a_rows)
            recon, _ = dec(p["dec"], y)
            b = jnp.where(a_rows > 0, cfg.beta, 1.0)
            l2nd = jnp.mean(jnp.sum(jnp.square((recon - a_rows) * b), -1))
            # 1st order on consecutive pairs within the batch
            d = jnp.sum(jnp.square(y[:-1] - y[1:]), -1)
            l1st = cfg.alpha * jnp.mean(a_pair * d)
            reg = cfg.l2 * sum(jnp.sum(jnp.square(x))
                               for x in jax.tree_util.tree_leaves(p))
            return l2nd + l1st + reg

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(cfg.seed)
    adj_dense_pairs = None
    for epoch in range(cfg.epochs):
        order = rng.permutation(n)
        for i in range(0, n - cfg.batch_size + 1, cfg.batch_size):
            rows = order[i:i + cfg.batch_size]
            a_rows = _adj_rows(g, rows)
            a_pair = np.asarray(
                [a_rows[j, rows[j + 1]] for j in range(len(rows) - 1)],
                np.float32)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(a_rows),
                                           jnp.asarray(a_pair))
    # final embeddings: encode every node's adjacency row
    out = []
    for i in range(0, n, cfg.batch_size):
        rows = np.arange(i, min(i + cfg.batch_size, n))
        y, _ = enc(params["enc"], jnp.asarray(_adj_rows(g, rows)))
        out.append(np.asarray(y))
    return np.concatenate(out, axis=0)
