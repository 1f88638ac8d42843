"""Match/recall family: DSSM two-tower semantic model.

The reference shelves "[DSSM] Learning Deep Structured Semantic Models"
(paper/Next Read/) without implementing it. Here DSSM is the recall-side
counterpart to the CTR rankers: separate user and item towers meeting in a
cosine head, so item vectors can be precomputed and served from an ANN
index while the user tower runs per request (the serving split the paper is
for). ``ShardedScorer``-style export works on either tower.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.base import split_rngs, zeros
from ..ops.core import MLP
from ..ops.embedding import FusedEmbedding, masked_mean_pool
from .base import Model, stateless


def DSSM(fs: FeatureSet,
         user_fields: Optional[Tuple[str, ...]] = None,
         item_fields: Tuple[str, ...] = ("item", "cate"),
         behavior: Optional[Tuple[str, ...]] = None,
         hidden: Tuple[int, ...] = (256, 128, 64),
         temperature: float = 0.05) -> Model:
    """Two-tower DSSM (Huang et al., CIKM 2013).

    - user tower: [user sparse fields, mean-pooled behavior history, dense]
      → MLP → unit vector u;
    - item tower: [item sparse fields] → MLP → unit vector i;
    - logit = ⟨u, i⟩ / temperature (pointwise CTR head; the exposed
      ``user_vec``/``item_vec`` give the recall-serving embeddings, and
      ``in_batch_softmax_loss`` the retrieval objective with in-batch
      negatives).

    Defaults: ``item_fields`` are the candidate fields; ``user_fields`` all
    remaining sparse fields; ``behavior`` every seq feature.
    """
    if user_fields is None:
        user_fields = tuple(s.name for s in fs.sparse
                            if s.name not in item_fields)
    if behavior is None:
        behavior = tuple(s.name for s in fs.seq)
    fe = FusedEmbedding(fs, with_linear=False)
    d = fs.embed_dim
    out_dim = hidden[-1]
    u_in = len(user_fields) * d + len(behavior) * d + len(fs.dense)
    i_in = len(item_fields) * d
    u_mlp = MLP(u_in, hidden[:-1], activation="relu", norm="layer",
                out_dim=out_dim)
    i_mlp = MLP(i_in, hidden[:-1], activation="relu", norm="layer",
                out_dim=out_dim)
    u_cols = [fs.sparse_index(n) for n in user_fields]
    i_cols = [fs.sparse_index(n) for n in item_fields]

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "u", "i"])
        return {"embedding": fe.init(rngs["emb"]),
                "u_mlp": u_mlp.init(rngs["u"]),
                "i_mlp": i_mlp.init(rngs["i"])}

    def _norm(x):
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)

    def user_vec(params, batch):
        emb = fe.sparse(params["embedding"], batch["sparse"])
        parts = [emb[:, c, :] for c in u_cols]
        for name in behavior:
            e, m = fe.seq(params["embedding"], name, batch["seq"][name])
            parts.append(masked_mean_pool(e, m))
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h, _ = u_mlp(params["u_mlp"], jnp.concatenate(parts, axis=-1))
        return _norm(h)

    def item_vec(params, batch):
        emb = fe.sparse(params["embedding"], batch["sparse"])
        h, _ = i_mlp(params["i_mlp"],
                     jnp.concatenate([emb[:, c, :] for c in i_cols], axis=-1))
        return _norm(h)

    def fwd(params, batch, train):
        u = user_vec(params, batch)
        v = item_vec(params, batch)
        logit = jnp.sum(u * v, axis=-1) / temperature
        emb = fe.sparse(params["embedding"], batch["sparse"])
        return logit, {"emb_l2": fe.l2_from_sparse(emb)}

    model = stateless("DSSM", fs, init_fn, fwd)

    def in_batch_softmax_loss(params, batch):
        """Retrieval objective: every positive (u_b, i_b) against the other
        items in the batch as sampled negatives (sampled-softmax CE)."""
        u = user_vec(params, batch)
        v = item_vec(params, batch)
        logits = (u @ v.T) / temperature               # (B, B)
        labels = jnp.arange(u.shape[0])
        return jnp.mean(
            -jax.nn.log_softmax(logits, axis=-1)[labels, labels])

    object.__setattr__(model, "user_vec", user_vec)
    object.__setattr__(model, "item_vec", item_vec)
    object.__setattr__(model, "in_batch_softmax_loss", in_batch_softmax_loss)
    return model
