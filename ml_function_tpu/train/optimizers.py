"""Optimizers.

Reference trains with Keras ``adam`` + BCE (``un_seq.py:61``). Here: optax
factories plus a recsys-specific ``embedding_partitioned`` transform — a
different optimizer (typically Adagrad, the industry default for embedding
tables) on the fused tables than on the dense towers, selected by param path.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3,
                   **kw) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adam":
        return optax.adam(learning_rate, **kw)
    if name == "adagrad":
        return optax.adagrad(learning_rate, **kw)
    if name == "sgd":
        return optax.sgd(learning_rate, **kw)
    if name == "adamw":
        return optax.adamw(learning_rate, **kw)
    raise ValueError(f"unknown optimizer {name!r}")


def _is_table(path) -> bool:
    keys = [str(getattr(k, "key", getattr(k, "idx", ""))) for k in path]
    # both column groups of FusedEmbedding ("table" cross, "linear" 1st-order)
    return "embedding" in keys and ("table" in keys or "linear" in keys)


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
