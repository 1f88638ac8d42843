"""Optimizers.

Reference trains with Keras ``adam`` + BCE (``un_seq.py:61``). Here: optax
factories plus a recsys-specific ``embedding_partitioned`` transform — a
different optimizer (typically Adagrad, the industry default for embedding
tables) on the fused tables than on the dense towers, selected by param path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class FTRLState(NamedTuple):
    z: optax.Params
    n: optax.Params


def ftrl(learning_rate: float = 0.05, beta: float = 1.0,
         lambda1: float = 0.0, lambda2: float = 0.0
         ) -> optax.GradientTransformation:
    """FTRL-Proximal (McMahan et al., KDD 2013 — "[FTRL] Ad Click
    Prediction: a View from the Trenches" on the reference's Next-Read
    shelf, paper/Next Read/). The classic sparse-CTR optimizer: per-
    coordinate adaptive rates + L1 proximal step that drives unused
    weights to EXACT zero (model compression for serving).

    w = 0                       if |z| ≤ λ1
        −(z − sign(z)λ1) / ((β + √n)/α + λ2)   otherwise
    """

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return FTRLState(z=zeros(), n=zeros())

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("ftrl requires params")

        def upd(g, z, n, w):
            n_new = n + jnp.square(g)
            sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / learning_rate
            z_new = z + g - sigma * w
            denom = (beta + jnp.sqrt(n_new)) / learning_rate + lambda2
            w_new = jnp.where(
                jnp.abs(z_new) <= lambda1,
                jnp.zeros_like(w),
                -(z_new - jnp.sign(z_new) * lambda1) / denom)
            return w_new - w, z_new, n_new

        out = jax.tree_util.tree_map(upd, grads, state.z, state.n, params)
        updates = jax.tree_util.tree_map(lambda t: t[0], out,
                                         is_leaf=lambda t: isinstance(t, tuple))
        z = jax.tree_util.tree_map(lambda t: t[1], out,
                                   is_leaf=lambda t: isinstance(t, tuple))
        n = jax.tree_util.tree_map(lambda t: t[2], out,
                                   is_leaf=lambda t: isinstance(t, tuple))
        return updates, FTRLState(z=z, n=n)

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr_schedule(name: str, base_lr: float, *, decay_steps: int = 10_000,
                     warmup_steps: int = 0, decay_rate: float = 0.96,
                     transition_steps: int = 1000, end_lr_frac: float = 0.0):
    """Step-based LR schedules (optax) — the counterpart of the reference's
    Keras LR callbacks (``walk_core_model.py:203-227`` uses
    ReduceLROnPlateau; eval-driven plateau reduction is host-side, see
    ``plateau_scale`` / ``fit(plateau=...)``)."""
    name = (name or "constant").lower()
    if name == "constant":
        return base_lr
    if name == "cosine":
        return optax.cosine_decay_schedule(base_lr, decay_steps,
                                           alpha=end_lr_frac)
    if name == "exponential":
        return optax.exponential_decay(base_lr, transition_steps, decay_rate)
    if name == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup_steps, decay_steps,
            end_value=base_lr * end_lr_frac)
    raise ValueError(f"unknown lr schedule {name!r}")


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3,
                   schedule: str = "", inject_lr: bool = False,
                   **kw) -> optax.GradientTransformation:
    """``schedule``: '' | cosine | exponential | warmup_cosine (step-based,
    kwargs forwarded to :func:`make_lr_schedule`). ``inject_lr=True`` wraps
    the factory in ``optax.inject_hyperparams`` so the host can retune the
    LR between steps (``set_learning_rate`` — the ReduceLROnPlateau
    mechanism); incompatible with a step schedule."""
    name = name.lower()
    factories = {"adam": optax.adam, "adagrad": optax.adagrad,
                 "sgd": optax.sgd, "adamw": optax.adamw, "ftrl": ftrl}
    if name not in factories:
        raise ValueError(f"unknown optimizer {name!r}")
    if schedule and inject_lr:
        raise ValueError("pick ONE of schedule= (step-based) or "
                         "inject_lr= (host-controlled plateau)")
    sched_kw = {k: kw.pop(k) for k in ("decay_steps", "warmup_steps",
                                       "decay_rate", "transition_steps",
                                       "end_lr_frac") if k in kw}
    lr = make_lr_schedule(schedule, learning_rate, **sched_kw) \
        if schedule else learning_rate
    if inject_lr:
        return optax.inject_hyperparams(factories[name])(
            learning_rate=learning_rate, **kw)
    return factories[name](lr, **kw)


def set_learning_rate(opt_state, lr: float):
    """Return ``opt_state`` with the injected learning_rate replaced (host-
    side, between steps). Requires the optimizer was built with
    ``inject_lr=True``."""
    if not hasattr(opt_state, "hyperparams") or \
            "learning_rate" not in opt_state.hyperparams:
        raise ValueError("optimizer was not built with inject_lr=True")
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def _is_table(path) -> bool:
    keys = [str(getattr(k, "key", getattr(k, "idx", ""))) for k in path]
    # all row-table column groups of FusedEmbedding (incl. mixed-width
    # "table{d}"/"linear{d}" sub-tables; align{d} routes to dense)
    return "embedding" in keys and any(
        k.startswith("table") or k.startswith("linear") for k in keys)


def embedding_partitioned(
    dense_opt: optax.GradientTransformation,
    table_opt: Optional[optax.GradientTransformation] = None,
    table_lr: float = 1e-2,
) -> optax.GradientTransformation:
    """Route embedding-table grads to ``table_opt`` (default Adagrad — no
    second moment buffer, halves the tables' optimizer memory vs Adam) and
    everything else to ``dense_opt``."""
    table_opt = table_opt or optax.adagrad(table_lr)

    def label_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "table" if _is_table(path) else "dense", params)

    return optax.multi_transform({"dense": dense_opt, "table": table_opt},
                                 label_fn)
