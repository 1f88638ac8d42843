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


def DeepMCP(fs: FeatureSet,
            ad_fields: Tuple[str, ...] = ("item", "cate"),
            user_fields: Optional[Tuple[str, ...]] = None,
            corr_seq: Optional[str] = None,
            hidden: Tuple[int, ...] = (256, 128, 64),
            match_hidden: Tuple[int, ...] = (128,),
            match_dim: int = 64,
            corr_hidden: Tuple[int, ...] = (64,),
            alpha: float = 0.1, beta: float = 0.01,
            context: int = 2, negatives: int = 2) -> Model:
    """DeepMCP — Matching + Correlation + Prediction (Ouyang et al., IJCAI
    2019: the "[RLAC] Representation Learning-Assisted Click-Through Rate
    Prediction" pdf on the reference's Next-Read shelf).

    Three subnets over ONE shared embedding matrix (the paper's Fig. 4):

    - **prediction**: plain DNN over all features → pCTR logit (eq. 1) —
      the only subnet active at serving time;
    - **matching**: user-part and ad-part MLPs (tanh last layer — the paper
      rejects ReLU here because zeroed coordinates kill v_uᵀv_a) meeting in
      a sigmoid dot score, point-wise BCE against the same click label
      (eq. 2), weighted ``alpha``;
    - **correlation**: skip-gram with ``negatives`` sampled negatives over
      the user's clicked-ad sequence (eq. 3), weighted ``beta`` — each seq
      element's embedding passes the corr MLP to h, positives are pairs
      within ``context`` steps, negatives are batch-rolled ads (the same
      in-batch sampling DIEN's auxiliary loss uses, models/sequence.py).

    Matching/correlation terms ride ``aux`` (explicit loss terms — the
    Model-API replacement for Keras ``add_loss``) and are computed only in
    train mode, so eval/serving runs exactly the paper's online procedure
    (prediction subnet alone).
    """
    if user_fields is None:
        user_fields = tuple(s.name for s in fs.sparse
                            if s.name not in ad_fields)
    if corr_seq is None and fs.seq:
        corr_seq = fs.seq[0].name
    fe = FusedEmbedding(fs, with_linear=False)
    d = fs.embed_dim
    nd = len(fs.dense)
    n_seq = len(fs.seq)
    f = len(fs.sparse)
    pred_mlp = MLP(f * d + n_seq * d + nd, hidden, activation="relu",
                   out_dim=1)
    u_mlp = MLP(len(user_fields) * d + nd, match_hidden, activation="relu",
                out_dim=match_dim)
    a_mlp = MLP(len(ad_fields) * d, match_hidden, activation="relu",
                out_dim=match_dim)
    h_mlp = MLP(d, corr_hidden, activation="relu", out_dim=match_dim)
    u_cols = [fs.sparse_index(n) for n in user_fields]
    a_cols = [fs.sparse_index(n) for n in ad_fields]

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "pred", "u", "a", "h"])
        return {"embedding": fe.init(rngs["emb"]),
                "pred": pred_mlp.init(rngs["pred"]),
                "u_mlp": u_mlp.init(rngs["u"]),
                "a_mlp": a_mlp.init(rngs["a"]),
                "h_mlp": h_mlp.init(rngs["h"]),
                "bias": zeros(())}

    def _tanh_head(mlp, p, x):
        out, _ = mlp(p, x)
        return jnp.tanh(out)

    def fwd(params, batch, train):
        emb = fe.sparse(params["embedding"], batch["sparse"])  # (B, F, D)
        parts = [emb.reshape(emb.shape[0], -1)]
        seq_cache = {}
        for s in fs.seq:
            e, m = fe.seq(params["embedding"], s.name, batch["seq"][s.name])
            seq_cache[s.name] = (e, m)
            parts.append(masked_mean_pool(e, m))
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        pred, _ = pred_mlp(params["pred"], jnp.concatenate(parts, axis=-1))
        logit = pred[:, 0] + params["bias"]
        aux = {"emb_l2": fe.l2_from_sparse(emb)}

        if train and "label" in batch:
            y = batch["label"]
            # matching subnet (eq. 2): point-wise BCE on σ(v_u·v_a)
            u_in = [emb[:, c, :] for c in u_cols]
            if nd:
                u_in.append(batch["dense"])
            v_u = _tanh_head(u_mlp, params["u_mlp"],
                             jnp.concatenate(u_in, axis=-1))
            v_a = _tanh_head(a_mlp, params["a_mlp"],
                             jnp.concatenate([emb[:, c, :] for c in a_cols],
                                             axis=-1))
            m_logit = jnp.sum(v_u * v_a, axis=-1)
            m_bce = jnp.maximum(m_logit, 0) - m_logit * y + \
                jnp.log1p(jnp.exp(-jnp.abs(m_logit)))
            aux["match"] = alpha * jnp.mean(m_bce)

            # correlation subnet (eq. 3): skip-gram over the clicked-ad seq
            if corr_seq is not None:
                e, m = seq_cache[corr_seq]
                h = _tanh_head(h_mlp, params["h_mlp"], e)      # (B, L, M)
                mask = m.astype(h.dtype)
                total = jnp.asarray(0.0)
                n_pairs = jnp.asarray(0.0)
                for j in range(1, context + 1):
                    hi, hj = h[:, :-j], h[:, j:]
                    valid = mask[:, :-j] * mask[:, j:]
                    pos = jnp.sum(hi * hj, axis=-1)
                    total += jnp.sum(jax.nn.log_sigmoid(pos) * valid)
                    for q in range(1, negatives + 1):
                        neg = jnp.roll(hj, q, axis=0)
                        nv = valid * jnp.roll(mask[:, j:], q, axis=0)
                        sneg = jnp.sum(hi * neg, axis=-1)
                        total += jnp.sum(jax.nn.log_sigmoid(-sneg) * nv)
                    n_pairs += jnp.sum(valid)
                aux["corr"] = beta * (-total / jnp.maximum(n_pairs, 1.0))
        return logit, aux

    return stateless("DeepMCP", fs, init_fn, fwd)
