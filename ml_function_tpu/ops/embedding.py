"""Fused embedding tables.

The reference builds one ``tf.keras.layers.Embedding`` per feature inside
``SparseEmbed`` (``kon/model/ctr_model/layer/interactive_layer/interactive_layer.py:189-247``),
which on TPU would mean F tiny gathers and F tiny tables. Here all vocabs are
concatenated into ONE ``(total_vocab, D)`` table (+ a ``(total_vocab, 1)``
linear table for first-order terms), and a whole ``(B, F)`` id matrix is
embedded with a single gather — one HBM-friendly op that XLA can fuse, and the
unit of row-sharding for the multi-host path (``parallel/embedding.py``).

Semantics preserved from the reference:
- id 0 of each vocab is the padding/unknown row (``mask_zero``,
  interactive_layer.py:205): sequence lookups return a mask and the padding
  row is zeroed at use sites;
- ``pre_weight`` warm-start (interactive_layer.py:216): ``init`` accepts
  per-vocab prebuilt matrices;
- per-feature L2 on embeddings (``emb_reg``, default 1e-8,
  data_prepare.py:96): exposed as ``l2_loss`` computed on the gathered rows
  (equivalent to Keras activity-style regularization on used rows and far
  cheaper than regularizing the full table every step).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.schema import FeatureSet
from .base import Params, normal_init, split_rngs


@dataclass(frozen=True)
class FusedEmbedding:
    """One fused cross-embedding table + one fused linear table over a
    FeatureSet's vocabs."""

    feature_set: FeatureSet
    with_linear: bool = True

    @property
    def dim(self) -> int:
        return self.feature_set.embed_dim

    def init(self, rng, pre_weight: Optional[Mapping[str, np.ndarray]] = None) -> Params:
        fs = self.feature_set
        rngs = split_rngs(rng, ["table", "linear"])
        table = normal_init(rngs["table"], (fs.total_vocab, self.dim),
                            stddev=0.05)
        if pre_weight:
            offs = fs.vocab_offsets
            rows = []
            tab = np.asarray(table)
            for name, w in pre_weight.items():
                w = np.asarray(w, dtype=np.float32)
                tab[offs[name]:offs[name] + w.shape[0], :] = w
            table = jnp.asarray(tab)
        p = {"table": table}
        if self.with_linear:
            p["linear"] = normal_init(rngs["linear"], (fs.total_vocab, 1),
                                      stddev=0.05)
        return p

    # ---- lookups --------------------------------------------------------
    #
    # When a mesh with model-axis > 1 is active (parallel.context), lookups
    # route through the collective mask+psum exchange over row-sharded
    # tables; otherwise they are a single local gather.

    def _sharded(self):
        from ..parallel import context as pctx
        if pctx.model_axis_size() > 1:
            from ..parallel.embedding import ShardedLookup
            return ShardedLookup(pctx.active_mesh(), self.feature_set)
        return None

    def sparse(self, params: Params, ids: jax.Array) -> jax.Array:
        """(B, F) ids → (B, F, D) cross embeddings. One gather for all fields."""
        sh = self._sharded()
        if sh is not None:
            return sh.sparse(params["table"], ids)
        offs = jnp.asarray(self.feature_set.sparse_offsets())
        return jnp.take(params["table"], ids + offs[None, :], axis=0)

    def sparse_linear(self, params: Params, ids: jax.Array) -> jax.Array:
        """(B, F) ids → (B, F) first-order weights."""
        sh = self._sharded()
        if sh is not None:
            return sh.sparse_linear(params["linear"], ids)
        offs = jnp.asarray(self.feature_set.sparse_offsets())
        return jnp.take(params["linear"], ids + offs[None, :], axis=0)[..., 0]

    def seq(self, params: Params, name: str, ids: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
        """(B, L) ids → ((B, L, D) embeddings with pad rows zeroed, (B, L) mask)."""
        sh = self._sharded()
        if sh is not None:
            return sh.seq(params["table"], name, ids)
        off = self.feature_set.seq_offset(name)
        mask = ids != 0
        emb = jnp.take(params["table"], ids + off, axis=0)
        return emb * mask[..., None], mask

    # ---- regularization -------------------------------------------------

    def l2_loss(self, params: Params, sparse_ids: Optional[jax.Array] = None,
                seq_ids: Optional[Mapping[str, jax.Array]] = None) -> jax.Array:
        """Sum of emb_l2 * ||rows used this step||^2 (per-spec coefficients)."""
        fs = self.feature_set
        total = jnp.asarray(0.0, jnp.float32)
        if sparse_ids is not None and len(fs.sparse):
            emb = self.sparse(params, sparse_ids)  # (B,F,D)
            coef = jnp.asarray([s.emb_l2 for s in fs.sparse], jnp.float32)
            total = total + jnp.sum(coef * jnp.sum(jnp.square(emb), axis=(0, 2)))
        if seq_ids:
            for name, ids in seq_ids.items():
                spec = fs.seq_spec(name)
                emb, _ = self.seq(params, name, ids)
                total = total + spec.emb_l2 * jnp.sum(jnp.square(emb))
        return total


# ---------------------------------------------------------------------------
# pooling helpers (reference SeqBaseLayer, behavior_layer.py:32-51)
# ---------------------------------------------------------------------------


def masked_sum_pool(seq: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, L, D), (B, L) → (B, D) sum over valid steps."""
    return jnp.sum(seq * mask[..., None], axis=1)


def masked_mean_pool(seq: jax.Array, mask: jax.Array) -> jax.Array:
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return jnp.sum(seq * mask[..., None], axis=1) / denom
