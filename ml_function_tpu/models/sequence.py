"""Behavior-sequence model family: DIN / DIEN / BST / DSIN / SeqFM.

TPU-native counterparts of the reference constructors
(``kon/model/ctr_model/model/models.py``): DIN (:168), DIEN (:202),
DSIN (:240), SeqFM (:264), BST (:336). Long-sequence tier (DTS/MIMN/SIM)
lives in ``models/longseq.py``.

Recurrences run as ``lax.scan`` with input projections hoisted to one MXU
matmul (``ops/recurrent.py``); DIEN uses a *working* attention-gated AUGRU
(the reference's gate is commented out, rnn_demo.py:569-574, forcing AIGRU).
Auxiliary losses are explicit loss terms, not Keras ``add_loss``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.attention import (MultiHeadAttention, SessionPositionBias,
                             TargetAttention, TransformerBlock,
                             sincos_position_encoding)
from ..ops.base import (bf16_matmul, glorot_uniform, normal_init, split_rngs,
                        zeros)
from ..ops.core import MLP, Dense, flatten_concat
from ..ops.embedding import FusedEmbedding, masked_mean_pool, masked_sum_pool
from ..ops.recurrent import AUGRU, GRU, BiLSTM
from .base import Model, behavior_inputs, embed_inputs, stateless


def _other_sparse(fs: FeatureSet, emb: jax.Array, candidate: Tuple[str, ...]):
    """Flat embeddings of the non-candidate sparse fields."""
    cand_idx = {fs.sparse_index(n) for n in candidate}
    rest = [i for i in range(len(fs.sparse)) if i not in cand_idx]
    if not rest:
        return None
    return emb[:, jnp.asarray(rest), :].reshape(emb.shape[0], -1)


def _beh_dims(fs: FeatureSet, candidate, behavior):
    d = fs.embed_dim
    kd = len(candidate) * d
    L = fs.seq_spec(behavior[0]).max_len
    n_other = len(fs.sparse) - len(candidate)
    return d, kd, L, n_other


def DIN(fs: FeatureSet,
        candidate: Tuple[str, ...] = ("item", "cate"),
        behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
        hidden: Tuple[int, ...] = (200, 80),
        activation: str = "dice",
        attention_hidden: Tuple[int, ...] = (36, 1)) -> Model:
    """Deep Interest Network (reference ``DIN``, models.py:168-200):
    sum-pooled behaviors + target-attention-pooled behaviors + candidate +
    other fields → Dice/PReLU MLP (the reference uses PReLU-DNN with res 2 +
    BN; here Dice + LayerNorm — the paper's activation, TPU-stateless)."""
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    attn = TargetAttention(kd, attention_hidden, activation="sigmoid")
    in_dim = kd * 3 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation=activation, norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "attn", "mlp"])
        return {"embedding": fe.init(rngs["emb"]),
                "attn": attn.init(rngs["attn"]),
                "mlp": mlp.init(rngs["mlp"])}

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        pooled_sum = masked_sum_pool(beh, mask)
        pooled_att = attn(params["attn"], cand, beh, mask)
        parts = [cand, pooled_sum, pooled_att]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": l2}

    return stateless("DIN", fs, init_fn, fwd)


def _auxiliary_loss(aux_mlp: MLP, params, states: jax.Array, beh: jax.Array,
                    mask: jax.Array) -> jax.Array:
    """DIEN auxiliary loss (reference AuxiliaryLayer, behavior_layer.py:122-152):
    classify (h_t, e_{t+1}) as click and (h_t, e_neg) as non-click.

    Negatives are drawn by rolling the batch (the reference's SampleLayer
    draws random rows from the same batch, behavior_layer.py:154-171)."""
    h_t = states[:, :-1, :]
    pos = beh[:, 1:, :]
    neg = jnp.roll(beh, shift=1, axis=0)[:, 1:, :]
    m = (mask[:, 1:] & mask[:, :-1]).astype(jnp.float32)

    def score(e):
        s, _ = aux_mlp(params, jnp.concatenate([h_t, e], axis=-1))
        return s[..., 0]

    pos_ll = jax.nn.log_sigmoid(score(pos))
    neg_ll = jax.nn.log_sigmoid(-score(neg))
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return -jnp.sum((pos_ll + neg_ll) * m) / denom


def DIEN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         hidden: Tuple[int, ...] = (200, 80),
         activation: str = "prelu",
         aux_weight: float = 1.0,
         mode: str = "augru") -> Model:
    """Deep Interest Evolution Network (reference ``DIEN``, models.py:202-238).

    GRU interest extractor (+aux loss) → attention-gated AUGRU evolution
    (``mode='aigru'`` reproduces the reference's fallback: attention-weighted
    sequence into a plain GRU, behavior_layer.py:199-241)."""
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    gru1 = GRU(kd, kd)
    gru2 = GRU(kd, kd) if mode == "aigru" else AUGRU(kd, kd)
    attn = TargetAttention(kd, (36, 1), activation="sigmoid")
    aux_mlp = MLP(2 * kd, (100, 50), activation="sigmoid", out_dim=1)
    in_dim = kd * 2 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation=activation, norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "gru1", "gru2", "attn", "aux", "mlp"])
        return {"embedding": fe.init(rngs["emb"]),
                "gru1": gru1.init(rngs["gru1"]),
                "gru2": gru2.init(rngs["gru2"]),
                "attn": attn.init(rngs["attn"]),
                "aux": aux_mlp.init(rngs["aux"]),
                "mlp": mlp.init(rngs["mlp"])}

    def interest(params, cand, beh, mask):
        """Shared core (reference ``useCore`` path for SIM, models.py:232-233):
        returns (final interest state, aux loss)."""
        states, _ = gru1(params["gru1"], beh, mask)
        aux = _auxiliary_loss(aux_mlp, params["aux"], states, beh, mask)
        scores = attn.scores(params["attn"], cand, states, mask)
        if mode == "aigru":
            weighted = states * scores[..., None]
            _, final = gru2(params["gru2"], weighted, mask)
        else:
            _, final = gru2(params["gru2"], states, mask, att_scores=scores)
        return final, aux

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        final, aux = interest(params, cand, beh, mask)
        parts = [cand, final]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"aux_loss": aux_weight * aux, "emb_l2": l2}

    model = stateless("DIEN", fs, init_fn, fwd)
    # expose the shared interest core for SIM (reference useCore)
    object.__setattr__(model, "interest_core", interest)
    object.__setattr__(model, "embedding", fe)
    return model


def BST(fs: FeatureSet,
        candidate: Tuple[str, ...] = ("item", "cate"),
        behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
        n_blocks: int = 1,
        num_heads: int = 2,
        hidden: Tuple[int, ...] = (200, 80),
        attention: str = "softmax") -> Model:
    """Behavior Sequence Transformer (reference ``BST``, models.py:336-349).

    The candidate is appended as the last sequence position (paper semantics —
    the reference instead splits the sequence into pairs, models.py:342-343),
    sin/cos positions added, transformer blocks, masked mean-pool → MLP.
    ``attention='lsh'`` uses Reformer hash-bucketed attention for long
    histories (the reference roadmap's promised hash option)."""
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    block = TransformerBlock(kd, num_heads, ffn_hidden=(4 * kd,),
                             attention=attention)
    in_dim = kd + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="relu", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp"] +
                          [f"block{i}" for i in range(n_blocks)])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"])}
        for i in range(n_blocks):
            p[f"block{i}"] = block.init(rngs[f"block{i}"])
        return p

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        seq = jnp.concatenate([beh, cand[:, None, :]], axis=1)  # (B, L+1, kD)
        full_mask = jnp.concatenate(
            [mask, jnp.ones((mask.shape[0], 1), bool)], axis=1)
        seq = seq + sincos_position_encoding(seq.shape[1], kd)[None]
        for i in range(n_blocks):
            seq = block(params[f"block{i}"], seq, mask=full_mask)
        pooled = masked_mean_pool(seq, full_mask)
        parts = [pooled]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": l2}

    return stateless("BST", fs, init_fn, fwd)


def DSIN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         session_shape: Optional[Tuple[int, int]] = None,
         num_heads: int = 2,
         lstm_hidden: Optional[int] = None,
         hidden: Tuple[int, ...] = (200, 80)) -> Model:
    """Deep Session Interest Network (reference ``DSIN``, models.py:240-261).

    Sessions (S × Ls) → bias position encodings → per-session self-attention
    + mean-pool (interest extractor) → BiLSTM across sessions (interacting) →
    two target attentions (over raw interests and over LSTM states) → MLP."""
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    spec = fs.seq_spec(behavior[0])
    S, Ls = session_shape or spec.session_shape or (4, L // 4)
    assert S * Ls == L, f"session shape {S}x{Ls} != max_len {L}"
    H = lstm_hidden or kd // 2
    bias = SessionPositionBias(S, Ls, kd)
    mha = MultiHeadAttention(kd, num_heads)
    bilstm = BiLSTM(kd, H)
    attn_i = TargetAttention(kd, (36, 1), activation="sigmoid")
    attn_l = TargetAttention(2 * H, (36, 1), activation="sigmoid")
    in_dim = kd * 2 + 2 * H + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="prelu", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "bias", "mha", "bilstm", "attn_i",
                                "attn_l", "mlp", "align"])
        p = {"embedding": fe.init(rngs["emb"]), "bias": bias.init(rngs["bias"]),
             "mha": mha.init(rngs["mha"]), "bilstm": bilstm.init(rngs["bilstm"]),
             "attn_i": attn_i.init(rngs["attn_i"]),
             "attn_l": attn_l.init(rngs["attn_l"]), "mlp": mlp.init(rngs["mlp"])}
        if 2 * H != kd:
            p["align"] = Dense(kd, 2 * H).init(rngs["align"])
        return p

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        sess = beh.reshape(b, S, Ls, kd)
        sess = bias(params["bias"], sess)
        sess = sess.reshape(b * S, Ls, kd)
        sess_mask = mask.reshape(b * S, Ls)
        # per-session self-attention; fully-padded sessions handled by
        # falling back to zeros after pooling
        any_valid = jnp.any(sess_mask, axis=1)
        safe_mask = sess_mask | ~any_valid[:, None]
        att = mha(params["mha"], sess, mask=safe_mask)
        interests = masked_mean_pool(att, safe_mask)
        interests = interests * any_valid[:, None]
        interests = interests.reshape(b, S, kd)
        sess_valid = jnp.any(mask.reshape(b, S, Ls), axis=2)
        lstm_out = bilstm(params["bilstm"], interests, sess_valid)
        cand_l = cand if 2 * H == kd else Dense(kd, 2 * H)(params["align"], cand)
        pooled_i = attn_i(params["attn_i"], cand, interests, sess_valid)
        pooled_l = attn_l(params["attn_l"], cand_l, lstm_out, sess_valid)
        parts = [cand, pooled_i, pooled_l]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": l2}

    return stateless("DSIN", fs, init_fn, fwd)


def SeqFM(fs: FeatureSet,
          candidate: Tuple[str, ...] = ("item", "cate"),
          behavior: Tuple[str, ...] = ("hist_item",),
          num_heads: int = 2,
          ffn_hidden: Tuple[int, ...] = (32,)) -> Model:
    """Sequence-aware FM (reference ``SeqFM``, models.py:264-310): three
    attention views — static (fields × fields), dynamic (causal over the
    behavior seq), cross (static ↔ dynamic only, via mask) — each intra-view
    mean-pooled, passed through a SHARED FFN, concatenated → logit."""
    fe = FusedEmbedding(fs, with_linear=True)
    d = fs.embed_dim
    F = len(fs.sparse)
    L = fs.seq_spec(behavior[0]).max_len
    mha = MultiHeadAttention(d, num_heads, use_res=False, use_ln=True)
    ffn = MLP(d, ffn_hidden, activation="relu")
    head = Dense(3 * ffn_hidden[-1] + len(fs.dense), 1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "static", "dynamic", "cross", "ffn",
                                "head"])
        return {"embedding": fe.init(rngs["emb"]),
                "static": mha.init(rngs["static"]),
                "dynamic": mha.init(rngs["dynamic"]),
                "cross": mha.init(rngs["cross"]),
                "ffn": ffn.init(rngs["ffn"]),
                "head": head.init(rngs["head"]),
                "bias": zeros(())}

    def fwd(params, batch, train):
        emb = fe.sparse(params["embedding"], batch["sparse"])  # (B,F,D)
        seq_e, mask = fe.seq(params["embedding"], behavior[0],
                             batch["seq"][behavior[0]])
        l2 = fe.l2_from_sparse(emb) + fe.l2_from_seq(behavior[0], seq_e)
        b = emb.shape[0]
        # static view: field self-attention
        v_static = jnp.mean(mha(params["static"], emb), axis=1)
        # dynamic view: causal self-attention over behaviors
        causal = MultiHeadAttention(d, num_heads, use_res=False, use_ln=True,
                                    causal=True)
        v_dyn = masked_mean_pool(causal(params["dynamic"], seq_e, mask=mask),
                                 mask)
        # cross view: concat [fields, seq]; mask blocks intra-view attention
        both = jnp.concatenate([emb, seq_e], axis=1)  # (B, F+L, D)
        is_static = jnp.concatenate(
            [jnp.ones((b, F), bool), jnp.zeros((b, L), bool)], axis=1)
        valid = jnp.concatenate([jnp.ones((b, F), bool), mask], axis=1)
        cross_ok = (is_static[:, :, None] ^ is_static[:, None, :])
        bias_q = jnp.where(cross_ok & valid[:, None, :], 0.0, -1e9)
        v_cross = masked_mean_pool(
            mha(params["cross"], both, mask=None, extra_bias=bias_q), valid)
        views = []
        for v in (v_static, v_dyn, v_cross):
            o, _ = ffn(params["ffn"], v)  # shared FFN (reference :303)
            views.append(o)
        h = jnp.concatenate(
            views + ([batch["dense"]] if len(fs.dense) else []), axis=-1)
        logit = head(params["head"], h)[:, 0] + params["bias"]
        lin = jnp.sum(fe.sparse_linear(params["embedding"], batch["sparse"]),
                      axis=1)
        return logit + lin, {"emb_l2": l2}

    return stateless("SeqFM", fs, init_fn, fwd)


def DSTN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         aux_sets: Tuple[Tuple[str, ...], ...] = (("hist_item", "hist_cate"),),
         hidden: Tuple[int, ...] = (200, 80),
         activation: str = "prelu") -> Model:
    """Deep Spatio-Temporal Network — interaction-attention variant
    (Ouyang et al. 2019). The reference registers DSTN but leaves it a
    ``pass`` stub (models.py:386-389); implemented here for real.

    Each auxiliary ad set (clicked / unclicked / contextual — any number of
    seq-feature groups) is attention-pooled conditioned on the target ad,
    plus a sum-pool residual path (the paper's self + interaction units);
    all pooled reps concat with the target → MLP.
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, aux_sets[0])
    attns = [TargetAttention(kd, (36, 1), activation="sigmoid")
             for _ in aux_sets]
    in_dim = kd + len(aux_sets) * 2 * kd + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation=activation, norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "mlp"]
                          + [f"attn{i}" for i in range(len(aux_sets))])
        p = {"embedding": fe.init(rngs["emb"]), "mlp": mlp.init(rngs["mlp"])}
        for i, a in enumerate(attns):
            p[f"attn{i}"] = a.init(rngs[f"attn{i}"])
        return p

    def fwd(params, batch, train):
        parts = []
        l2_total = None
        emb_full = None
        cand = None
        for i, names in enumerate(aux_sets):
            cand, beh, mask, l2, emb_full = behavior_inputs(
                fe, params["embedding"], batch, candidate, names)
            # interaction unit: target-conditioned attention pooling
            parts.append(attns[i](params[f"attn{i}"], cand, beh, mask))
            # self unit: unconditioned sum-pool
            parts.append(masked_sum_pool(beh, mask))
            l2_total = l2 if l2_total is None else l2_total + l2 \
                - fe.l2_from_sparse(emb_full)  # count sparse l2 once
        parts.insert(0, cand)
        other = _other_sparse(fs, emb_full, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        h = jnp.concatenate(parts, axis=-1)
        logit, _ = mlp(params["mlp"], h)
        return logit[:, 0], {"emb_l2": l2_total}

    return stateless("DSTN", fs, init_fn, fwd)


def DMIN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         num_interests: int = 2,
         hidden: Tuple[int, ...] = (200, 80),
         activation: str = "prelu",
         aux_weight: float = 1.0) -> Model:
    """Deep Multi-Interest Network (Xiao et al., CIKM 2020).

    The reference started this model — ``example/ctr_example/dmin_seq.py``
    reads and sorts the Alibaba data then stops mid-file (the driver never
    builds a model) — implemented here for real:

    - *Behavior Refiner*: one MHA block over the history whose refined state
      z_t is trained (DIEN-style auxiliary loss, reference AuxiliaryLayer
      behavior_layer.py:122-152) to retrieve the NEXT behavior against
      batch-rolled negatives;
    - *Multi-Interest Extractor*: a second MHA whose ``num_interests`` heads
      are kept separate — each head's sequence (+ learned position bias) is
      pooled by its own target attention into one interest vector;
    - scoring: [candidate, interest_1..K, other fields, dense] → MLP.
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    K = num_interests
    refiner = MultiHeadAttention(kd, num_heads=2)
    extractor = MultiHeadAttention(kd, num_heads=K, head_dim=kd)
    aux_mlp = MLP(2 * kd, (100, 50), activation="sigmoid", out_dim=1)
    attns = [TargetAttention(kd, (36, 1), activation="sigmoid")
             for _ in range(K)]
    in_dim = kd * (1 + K) + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation=activation, norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "refiner", "extractor", "aux", "mlp",
                                "pos"] + [f"attn{k}" for k in range(K)])
        p = {"embedding": fe.init(rngs["emb"]),
             "refiner": refiner.init(rngs["refiner"]),
             "extractor": extractor.init(rngs["extractor"]),
             "aux": aux_mlp.init(rngs["aux"]),
             "pos": normal_init(rngs["pos"], (L, kd), 0.02),
             "mlp": mlp.init(rngs["mlp"])}
        for k in range(K):
            p[f"attn{k}"] = attns[k].init(rngs[f"attn{k}"])
        return p

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        any_valid = jnp.any(mask, axis=1)
        safe_mask = mask | ~any_valid[:, None]
        z = refiner(params["refiner"], beh, mask=safe_mask)       # (B, L, kD)
        aux = _auxiliary_loss(aux_mlp, params["aux"], z, beh, mask)

        # per-head interest channels: project with K heads of head_dim=kD and
        # read the raw per-head outputs (pre output-projection mix)
        h, hd = K, kd
        q = bf16_matmul(z, params["extractor"]["q"]).reshape(b, L, h, hd)
        kk = bf16_matmul(z, params["extractor"]["k"]).reshape(b, L, h, hd)
        v = bf16_matmul(z, params["extractor"]["v"]).reshape(b, L, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kk) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32))
        logits = logits + jnp.where(safe_mask, 0.0, -1e9)[:, None, None, :]
        a = jax.nn.softmax(logits, axis=-1)
        heads = jnp.einsum("bhqk,bkhd->bhqd", a, v)               # (B, K, L, kD)
        heads = heads + z[:, None, :, :] + params["pos"][None, None]

        interests = [attns[k](params[f"attn{k}"], cand, heads[:, k], mask)
                     for k in range(K)]
        parts = [cand] + interests
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"aux_loss": aux_weight * aux, "emb_l2": l2}

    return stateless("DMIN", fs, init_fn, fwd)


def MIND(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         num_interests: int = 4,
         routing_iters: int = 3,
         label_pow: float = 2.0,
         hidden: Tuple[int, ...] = (200, 80),
         activation: str = "prelu") -> Model:
    """Multi-Interest Network with Dynamic routing (Li et al., CIKM 2019 —
    "[MINDN] Multi-Interest Network with Dynamic Routing for Recommendation
    at Tmall" pdf on the reference's Next-Read shelf).

    Behavior→Interest (B2I) capsule routing: behaviors map through a SHARED
    bilinear matrix S; ``routing_iters`` fixed iterations distribute each
    behavior over ``num_interests`` capsules (softmax over capsules), capsule
    states squash-normalized, routing logits updated by agreement ⟨v_k, m_l⟩.
    Routing-logit updates are ``stop_gradient``-ed (routing is an inference
    procedure, not a learned path — standard practice, keeps the fixed-point
    iteration stable). Label-aware attention (softmax of ⟨v_k, cand⟩^p over
    capsules) reads the interests for scoring.

    TPU notes: the whole routing is ``routing_iters`` (2–3) unrolled rounds
    of two (B, K, L)×(B, L, D) einsums — static shapes, MXU-bound; masked
    behaviors are −1e9 in the routing softmax.
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    K = num_interests
    in_dim = kd * 2 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation=activation, norm="layer", out_dim=1)

    def squash(s):
        n2 = jnp.sum(jnp.square(s), axis=-1, keepdims=True)
        return (n2 / (1.0 + n2)) * s / jnp.sqrt(n2 + 1e-9)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "bilinear", "b0", "mlp"])
        return {"embedding": fe.init(rngs["emb"]),
                "bilinear": glorot_uniform(rngs["bilinear"], (kd, kd)),
                # fixed (non-learned-free) random routing init breaks capsule
                # symmetry (paper §4.2); stored as a param so it checkpoints,
                # but stop_gradient keeps it frozen
                "b0": normal_init(rngs["b0"], (K, L), 1.0),
                "mlp": mlp.init(rngs["mlp"])}

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        m = bf16_matmul(beh, params["bilinear"])          # (B, L, kD)
        m_detached = jax.lax.stop_gradient(m)
        logits_b = jnp.broadcast_to(
            jax.lax.stop_gradient(params["b0"]), (b, K, L))
        key_mask = jnp.where(mask, 0.0, -1e9)[:, None, :]
        v = None
        for it in range(routing_iters):
            # each behavior distributes its vote over capsules
            w = jax.nn.softmax(logits_b + key_mask, axis=1)   # (B, K, L)
            w = w * mask[:, None, :]
            m_it = m if it == routing_iters - 1 else m_detached
            s = jnp.einsum("bkl,bld->bkd", w, m_it)
            v = squash(s)                                      # (B, K, kD)
            if it < routing_iters - 1:
                agree = jnp.einsum("bkd,bld->bkl", v, m_detached)
                logits_b = logits_b + jax.lax.stop_gradient(agree)
        # label-aware attention read
        att = jnp.einsum("bkd,bd->bk", v, cand)
        att = jax.nn.softmax(label_pow * att, axis=-1)
        read = jnp.einsum("bk,bkd->bd", att, v)
        parts = [cand, read]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"emb_l2": l2}

    model = stateless("MIND", fs, init_fn, fwd)

    def interests(params, batch):
        """User-interest capsules (B, K, kD) — the recall-side output the
        paper serves from (vector index per interest)."""
        cand, beh, mask, _, _ = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        m = bf16_matmul(beh, params["bilinear"])
        logits_b = jnp.broadcast_to(params["b0"], (b, K, L))
        key_mask = jnp.where(mask, 0.0, -1e9)[:, None, :]
        v = None
        for it in range(routing_iters):
            w = jax.nn.softmax(logits_b + key_mask, axis=1) * mask[:, None, :]
            v = squash(jnp.einsum("bkl,bld->bkd", w, m))
            if it < routing_iters - 1:
                logits_b = logits_b + jnp.einsum("bkd,bld->bkl", v, m)
        return v

    object.__setattr__(model, "interests", interests)
    return model
