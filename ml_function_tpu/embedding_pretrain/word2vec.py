"""Skip-gram word2vec with negative sampling — in JAX, trainable on TPU.

Replaces the reference's gensim dependency
(``kon/model/embedding/backone_language_model.py:4-22``): same model
(skip-gram + negative sampling, unigram^0.75 noise distribution) but as a
jitted train step over (center, context) pairs — the walk corpus embeds on
the accelerator instead of gensim's C threads.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.base import normal_init


@dataclass
class Word2VecConfig:
    dim: int = 64
    negatives: int = 5
    # batched training (mean loss) → adaptive optimizer, not gensim's
    # per-sample SGD schedule
    learning_rate: float = 0.01
    batch_size: int = 4096
    epochs: int = 1
    min_steps: int = 400   # small corpora loop extra epochs up to this
    seed: int = 0
    # reference embedding-trainer callbacks (walk_core_model.py:203-227:
    # EarlyStopping + ReduceLROnPlateau + ModelCheckpoint(save_best_only)),
    # driven by the per-epoch mean loss (train/control.py):
    patience: int = 0            # stop after N non-improving epochs (0=off)
    plateau_factor: float = 0.0  # >0 enables LR reduction on plateau
    plateau_patience: int = 2
    min_lr: float = 1e-5
    keep_best: bool = True       # return the best-loss epoch's embeddings


def _noise_table(counts: np.ndarray, power: float = 0.75,
                 table_size: int = 1 << 20) -> np.ndarray:
    p = np.asarray(counts, np.float64) ** power
    p /= p.sum()
    return np.searchsorted(np.cumsum(p), np.random.default_rng(0).random(
        table_size)).astype(np.int32)


def train_word2vec(pairs: np.ndarray, vocab_size: int,
                   cfg: Word2VecConfig = Word2VecConfig()) -> np.ndarray:
    """(P, 2) (center, context) int32 pairs → (vocab_size, dim) embeddings."""
    rng = jax.random.PRNGKey(cfg.seed)
    r1, r2 = jax.random.split(rng)
    emb_in = normal_init(r1, (vocab_size, cfg.dim), 0.5 / cfg.dim)
    emb_out = jnp.zeros((vocab_size, cfg.dim), jnp.float32)

    counts = np.bincount(pairs[:, 0], minlength=vocab_size)
    noise = jnp.asarray(_noise_table(np.maximum(counts, 1)))

    neg_k = cfg.negatives
    import optax
    # inject_hyperparams so ReduceLROnPlateau can retune the LR between
    # epochs without retracing (train/optimizers.set_learning_rate)
    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=cfg.learning_rate)
    opt_state = opt.init((emb_in, emb_out))

    @jax.jit
    def step(carry, batch):
        emb_in, emb_out, opt_state, key = carry
        center, context = batch[:, 0], batch[:, 1]
        key, nk = jax.random.split(key)
        neg_idx = jax.random.randint(nk, (center.shape[0], neg_k), 0,
                                     noise.shape[0])
        negs = noise[neg_idx]                       # (B, K)

        def loss_fn(tabs):
            e_in, e_out = tabs
            v = jnp.take(e_in, center, axis=0)       # (B, D)
            u_pos = jnp.take(e_out, context, axis=0)
            u_neg = jnp.take(e_out, negs, axis=0)    # (B, K, D)
            pos = jax.nn.log_sigmoid(jnp.sum(v * u_pos, -1))
            neg = jax.nn.log_sigmoid(-jnp.einsum("bd,bkd->bk", v, u_neg))
            return -(jnp.mean(pos) + jnp.mean(jnp.sum(neg, -1)))

        loss, grads = jax.value_and_grad(loss_fn)((emb_in, emb_out))
        updates, opt_state = opt.update(grads, opt_state)
        emb_in, emb_out = optax.apply_updates((emb_in, emb_out), updates)
        return (emb_in, emb_out, opt_state, key), loss

    from ..train.control import EarlyStopping, ReduceLROnPlateau
    from ..train.optimizers import set_learning_rate

    stopper = (EarlyStopping(cfg.patience, monitor="loss")
               if cfg.patience else None)
    reducer = (ReduceLROnPlateau(base_lr=cfg.learning_rate,
                                 factor=cfg.plateau_factor,
                                 patience=cfg.plateau_patience,
                                 min_lr=cfg.min_lr, monitor="loss")
               if cfg.plateau_factor else None)

    carry = (emb_in, emb_out, opt_state, r2)
    bs = min(cfg.batch_size, len(pairs))
    n = max((len(pairs) // bs) * bs, bs)
    steps_per_epoch = max(n // bs, 1)
    epochs = max(cfg.epochs, -(-cfg.min_steps // steps_per_epoch))
    best = None
    best_loss = float("inf")
    for epoch in range(epochs):
        ep_losses = []
        for i in range(0, n - bs + 1, bs):
            carry, loss = step(carry, jnp.asarray(pairs[i:i + bs]))
            ep_losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(ep_losses)))
        if cfg.keep_best and mean_loss < best_loss:
            best_loss = mean_loss
            best = np.asarray(carry[0])
        if reducer is not None:
            new_lr = reducer.update(mean_loss, epoch)
            if new_lr is not None:
                carry = (carry[0], carry[1],
                         set_learning_rate(carry[2], new_lr), carry[3])
        if stopper is not None and stopper.update(mean_loss, epoch):
            break
    if cfg.keep_best and best is not None:
        return best
    return np.asarray(carry[0])


def embeddings_to_dict(emb: np.ndarray, node_names) -> Dict[str, np.ndarray]:
    """Match the reference API: ``transform() -> {node_name: vector}``
    (deepwalk.py:23-26)."""
    return {name: emb[i] for i, name in enumerate(node_names)}
