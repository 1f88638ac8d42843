"""Long-sequence tier: DTS (latent time stream), MIMN (NTM memory),
SIM (search-based interest), HPMN (lifelong periodic memory).

TPU-native counterparts of the reference constructors
(``kon/model/ctr_model/model/models.py``): DTS (:313), MIMN (:351),
SIM (:392). HPMN implements the reference's "Next Building" roadmap item #1
(``kon/model/ctr_model/README.md`` — "[LSM] Lifelong Sequential Modeling with
Personalized Memorization", i.e. the SIGIR'19 HPMN paper the reference never
built). All recurrences are ``lax.scan`` over time-major layouts.

Design corrections vs. the reference (documented divergences):
- MIMN's learned initial state is batch-size-shaped in the reference
  (behavior_layer.py:880-904, forcing a static batch, warned at
  models.py:355-357). Here the initial memory/state is batch-INDEPENDENT
  (learned (slots, dim) broadcast over batch) — any batch size works.
- SIM's soft search is an identity stub in the reference (LSHLayer/GSULayer,
  behavior_layer.py:940-957; admitted at models.py:399-400). Here soft search
  is implemented: inner-product scores against the candidate + ``lax.top_k``
  retrieval over the long sequence.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..features.schema import FeatureSet
from ..ops.attention import TargetAttention, MultiHeadAttention
from ..ops.base import Params, bf16_matmul, glorot_uniform, normal_init, split_rngs, zeros
from ..ops.core import MLP, Dense
from ..ops.embedding import FusedEmbedding, masked_mean_pool
from ..ops.recurrent import GRU
from .base import Model, behavior_inputs, stateless
from .sequence import DIEN, _beh_dims, _other_sparse


# ---------------------------------------------------------------------------
# DTS
# ---------------------------------------------------------------------------


def DTS(fs: FeatureSet,
        candidate: Tuple[str, ...] = ("item", "cate"),
        behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
        latent_dim: int = 0,
        hidden: Tuple[int, ...] = (200, 80),
        guide_weight: float = 1.0) -> Model:
    """Deep Time-Stream (reference ``DTS``, models.py:313-333).

    A latent state z evolves through an ODE-style Euler step driven by a
    learned dynamics MLP f(z, Δt, e_t) (reference LatentTimeStreamLayer's
    DnnLayer mode, behavior_layer.py:511-560). Each z_t is decoded into the
    behavior-embedding space (TimeDecodedLayer, :563) and pulled towards the
    *next* behavior with a contrastive guide loss (GuideLossLayer, :588) —
    negatives drawn by rolling the batch. Scoring: target attention over the
    decoded stream, combined with the candidate.

    Timestamps: uses ``batch['seq'][behavior[0]+'_time']`` (B, L) Δt if
    present, else unit steps.
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    z_dim = latent_dim or kd
    dyn = MLP(z_dim + kd + 1, (z_dim,), activation="tanh")
    dec = Dense(z_dim, kd)
    attn = TargetAttention(kd, (36, 1), activation="sigmoid")
    in_dim = kd * 2 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="prelu", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "dyn", "dec", "attn", "mlp", "z0"])
        return {"embedding": fe.init(rngs["emb"]), "dyn": dyn.init(rngs["dyn"]),
                "dec": dec.init(rngs["dec"]), "attn": attn.init(rngs["attn"]),
                "mlp": mlp.init(rngs["mlp"]),
                "z0": normal_init(rngs["z0"], (z_dim,), 0.05)}

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        tkey = behavior[0] + "_time"
        if "seq" in batch and tkey in batch["seq"]:
            dt = batch["seq"][tkey].astype(jnp.float32)
        else:
            dt = jnp.ones((b, L), jnp.float32)
        z0 = jnp.broadcast_to(params["z0"], (b, z_dim))

        def step(z, inp):
            e_t, dt_t, m_t = inp
            f_in = jnp.concatenate([z, e_t, dt_t[:, None]], axis=-1)
            dz, _ = dyn(params["dyn"], f_in)
            z_new = z + dt_t[:, None] * dz  # Euler step
            z_new = jnp.where(m_t[:, None], z_new, z)
            return z_new, z_new

        _, z_seq = jax.lax.scan(
            step, z0, (jnp.transpose(beh, (1, 0, 2)), jnp.transpose(dt),
                       jnp.transpose(mask)))
        z_seq = jnp.transpose(z_seq, (1, 0, 2))          # (B, L, z)
        decoded = dec(params["dec"], z_seq)              # (B, L, kd)

        # guide loss: decoded_t should retrieve behavior_{t+1}
        pred, target = decoded[:, :-1], beh[:, 1:]
        neg = jnp.roll(beh, 1, axis=0)[:, 1:]
        m = (mask[:, 1:] & mask[:, :-1]).astype(jnp.float32)
        pos_s = jnp.sum(pred * target, -1)
        neg_s = jnp.sum(pred * neg, -1)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        guide = -jnp.sum((jax.nn.log_sigmoid(pos_s)
                          + jax.nn.log_sigmoid(-neg_s)) * m) / denom

        pooled = attn(params["attn"], cand, decoded, mask)
        parts = [cand, pooled]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"guide_loss": guide_weight * guide, "emb_l2": l2}

    return stateless("DTS", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# MIMN
# ---------------------------------------------------------------------------


def MIMN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         memory_slots: int = 4,
         channels: int = 4,
         hidden: Tuple[int, ...] = (200, 80),
         reg_weight: float = 0.1) -> Model:
    """Multi-channel user Interest Memory Network (reference ``MIMN``,
    models.py:351-384; UIC/NTM machinery behavior_layer.py:646-938).

    Per behavior step (one fused scan):
    - controller GRU over [e_t, read_{t−1}];
    - content addressing: cosine(key, M_i)·β → softmax read/write weights
      (reference AddressCalLayer, :700);
    - NTM read, erase/add write (ReadLayer/WriteLayer, :646-699);
    - memory-utilization regularization: write-weight balancing
      (MemoryUtilizationRegLayer, :817 — here the variance of accumulated
      write mass across slots);
    - MIU: channel memories S_k updated by a shared GRU cell, gated by
      channel attention over the current item (MemoryInductionUnitLayer,
      :775).
    Scoring: target attention of the candidate over memory slots + channels +
    controller state → MLP.
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    H = kd                      # controller width
    M = memory_slots
    ctrl = GRU(2 * kd, H)       # used as a single-step cell below
    miu = GRU(kd, kd)
    attn_mem = TargetAttention(kd, (36, 1), activation="sigmoid")
    attn_ch = TargetAttention(kd, (36, 1), activation="sigmoid")
    in_dim = kd * 3 + H + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="prelu", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["emb", "ctrl", "miu", "key_r", "key_w",
                                "beta", "erase", "add", "mem0", "ch0",
                                "attn_mem", "attn_ch", "mlp"])
        return {
            "embedding": fe.init(rngs["emb"]),
            "ctrl": ctrl.init(rngs["ctrl"]),
            "miu": miu.init(rngs["miu"]),
            "key_r": Dense(H, kd).init(rngs["key_r"]),
            "key_w": Dense(H, kd).init(rngs["key_w"]),
            "beta": Dense(H, 2).init(rngs["beta"]),
            "erase": Dense(H, kd).init(rngs["erase"]),
            "add": Dense(H, kd).init(rngs["add"]),
            "mem0": normal_init(rngs["mem0"], (M, kd), 0.05),
            "ch0": normal_init(rngs["ch0"], (channels, kd), 0.05),
            "attn_mem": attn_mem.init(rngs["attn_mem"]),
            "attn_ch": attn_ch.init(rngs["attn_ch"]),
            "mlp": mlp.init(rngs["mlp"]),
        }

    def _address(key, mem, beta):
        """cosine-similarity content addressing → (B, M) weights."""
        kn = key / (jnp.linalg.norm(key, axis=-1, keepdims=True) + 1e-8)
        mn = mem / (jnp.linalg.norm(mem, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("bd,bmd->bm", kn, mn)
        return jax.nn.softmax(jax.nn.softplus(beta)[:, None] * sim, axis=-1)

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        mem0 = jnp.broadcast_to(params["mem0"], (b, M, kd))
        ch0 = jnp.broadcast_to(params["ch0"], (b, channels, kd))
        h0 = jnp.zeros((b, H), beh.dtype)
        r0 = jnp.zeros((b, kd), beh.dtype)
        wsum0 = jnp.zeros((b, M), beh.dtype)

        def step(carry, inp):
            mem, ch, h, r, wsum = carry
            e_t, m_t = inp
            x = jnp.concatenate([e_t, r], axis=-1)
            # single GRU step (reuse the fused cell on a length-1 slice)
            xw = bf16_matmul(x, params["ctrl"]["wx"]) + params["ctrl"]["b"]
            h_new = ctrl._step(params["ctrl"], h, xw, m_t)
            betas = Dense(H, 2)(params["beta"], h_new)
            w_r = _address(Dense(H, kd)(params["key_r"], h_new), mem, betas[:, 0])
            w_w = _address(Dense(H, kd)(params["key_w"], h_new), mem, betas[:, 1])
            r_new = jnp.einsum("bm,bmd->bd", w_r, mem)
            erase = jax.nn.sigmoid(Dense(H, kd)(params["erase"], h_new))
            add = jnp.tanh(Dense(H, kd)(params["add"], h_new))
            mem_new = (mem * (1.0 - w_w[..., None] * erase[:, None, :])
                       + w_w[..., None] * add[:, None, :])
            # MIU: gate channel update by attention over channels.
            # GRU cell inlined on the (B, CH, KD) tensor directly — the
            # broadcast_to+reshape formulation trips an XLA TPU fusion bug
            # (fusion_util TransformWindow check) in the scan backward.
            ch_w = jax.nn.softmax(jnp.einsum("bd,bcd->bc", e_t, ch), axis=-1)
            xw_ch = (bf16_matmul(e_t, params["miu"]["wx"])
                     + params["miu"]["b"])[:, None, :]        # (B, 1, 3KD)
            hh_ch = bf16_matmul(ch, params["miu"]["wh"])       # (B, CH, 3KD)
            xu, xr, xn = jnp.split(xw_ch, 3, axis=-1)
            hu, hr, hn = jnp.split(hh_ch, 3, axis=-1)
            u_g = jax.nn.sigmoid(xu + hu)
            r_g = jax.nn.sigmoid(xr + hr)
            n_g = jnp.tanh(xn + r_g * hn)
            ch_upd = (1.0 - u_g) * ch + u_g * n_g
            ch_new = ch + ch_w[..., None] * (ch_upd - ch)
            # mask padded steps: carry everything through
            keep = m_t[:, None]
            mem_new = jnp.where(keep[..., None], mem_new, mem)
            ch_new = jnp.where(keep[..., None], ch_new, ch)
            r_new = jnp.where(keep, r_new, r)
            wsum_new = jnp.where(keep, wsum + w_w, wsum)
            return (mem_new, ch_new, h_new, r_new, wsum_new), None

        (mem, ch, h, r, wsum), _ = jax.lax.scan(
            step, (mem0, ch0, h0, r0, wsum0),
            (jnp.transpose(beh, (1, 0, 2)), jnp.transpose(mask)))

        # write-balance regularization (reference RegLossLayer, :803):
        # minimize variance of write mass across slots
        wnorm = wsum / jnp.maximum(jnp.sum(wsum, -1, keepdims=True), 1e-6)
        reg = jnp.mean(jnp.sum(jnp.square(wnorm - 1.0 / M), axis=-1))

        slot_mask = jnp.ones((b, M), bool)
        ch_mask = jnp.ones((b, channels), bool)
        mem_read = attn_mem(params["attn_mem"], cand, mem, slot_mask)
        ch_read = attn_ch(params["attn_ch"], cand, ch, ch_mask)
        parts = [cand, mem_read, ch_read, h]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"util_reg": reg_weight * reg, "emb_l2": l2}

    return stateless("MIMN", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# SIM
# ---------------------------------------------------------------------------


def SIM(fs: FeatureSet,
        candidate: Tuple[str, ...] = ("item", "cate"),
        behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
        long_behavior: Optional[Tuple[str, ...]] = None,
        search: str = "soft",
        top_k: int = 8,
        num_heads: int = 2,
        hidden: Tuple[int, ...] = (200, 80),
        aux_weight: float = 1.0,
        esu_attention: str = "softmax") -> Model:
    """Search-based Interest Model (reference ``SIM``, models.py:392-426).

    Two-stage: a General Search Unit reduces the long sequence — 'hard'
    expects a pre-filtered sequence from ``features.encoders.hard_search``
    (reference does hard search in data prep, data_prepare.py:136-147);
    'soft' scores long-sequence items by inner product with the candidate and
    keeps top-k via ``lax.top_k`` (implementing the stub, :940-957). The
    Exact Search Unit runs MHA + target attention over the reduced sequence
    (ESULayer, :959-975). Short-term interest comes from the DIEN core
    (reference ``useCore``, models.py:232-233) with its aux loss.
    """
    long_behavior = long_behavior or behavior
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    # The long sequence may carry fewer fields than the short behavior
    # (e.g. one 16k item stream vs item+cate pairs). Soft search stays in
    # the RAW embedding space — scored against the candidate subfields that
    # share the long fields' vocabs, so the same-id inner-product prior that
    # makes soft search work survives — and only the top-k REDUCED rows are
    # width-aligned for the ESU (reference AlignLayer idea,
    # core_layer.py:240-257; also k rows to project instead of 16k).
    kd_long = sum(fs.seq_spec(n).dim for n in long_behavior)
    align_long = Dense(kd_long, kd) if kd_long != kd else None
    cand_vocab_col = {fs.sparse[fs.sparse_index(n)].vocab: fs.sparse_index(n)
                      for n in candidate}
    long_score_cols = [cand_vocab_col.get(fs.seq_spec(n).vocab)
                       for n in long_behavior]
    if search == "soft" and any(c is None for c in long_score_cols):
        # hard search never computes the raw-space scores, so mismatched
        # vocabs are fine there (pre-filtering happened in data prep)
        raise ValueError(
            f"every long_behavior field must share a vocab with a candidate "
            f"field for soft search (long vocabs "
            f"{[fs.seq_spec(n).vocab for n in long_behavior]}, candidate "
            f"vocabs {list(cand_vocab_col)})")
    dien = DIEN(fs, candidate, behavior, hidden=hidden)
    if esu_attention == "lsh":  # roadmap hash option over the long sequence
        from ..ops.attention import LSHSelfAttention
        mha = LSHSelfAttention(kd, num_heads)
    else:
        mha = MultiHeadAttention(kd, num_heads)
    attn = TargetAttention(kd, (36, 1), activation="sigmoid")
    in_dim = kd * 3 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="prelu", norm="layer", out_dim=1)

    def init_fn(rng):
        rngs = split_rngs(rng, ["dien", "mha", "attn", "mlp", "align_long"])
        dien_params, _ = dien.init(rngs["dien"])
        p = {"dien": dien_params, "mha": mha.init(rngs["mha"]),
             "attn": attn.init(rngs["attn"]), "mlp": mlp.init(rngs["mlp"])}
        if align_long is not None:
            p["align_long"] = align_long.init(rngs["align_long"])
        return p

    def _seq_shard_mesh():
        """Active mesh when the seq-sharded GSU applies: soft search, a
        model-sharded mesh with seq_shard requested, and no RowTape (the
        sparse-row path records ids through behavior_inputs instead)."""
        if search != "soft":
            return None
        from ..ops.embedding import active_row_tape
        if active_row_tape() is not None:
            return None
        from ..parallel import context as pctx
        if pctx.seq_shard_active() and pctx.model_axis_size() > 1:
            return pctx.active_mesh()
        return None

    def _regather_selected(emb_p, batch, top_i, emb):
        """Differentiable re-gather of ONLY the selected long-stream rows.

        The GSU scoring pass runs on STOP-GRADIENT rows (scores feed only
        the integer top-k selection, which has no tangent anyway), so its
        full-L gather has no backward; the (B, k) selected ids re-gather
        differentiably — the table cotangent scatter shrinks from B·L to
        B·k rows (measured: the full-stream scatter was 107 of 138 ms of
        the 16k-key SIM step). Returns (reduced, red_mask, l2_long)."""
        parts, red_mask = [], None
        l2 = fe.l2_from_sparse(emb)  # emb_l2 covers the rows USED downstream
        for n in long_behavior:
            sel_ids = jnp.take_along_axis(batch["seq"][n], top_i, axis=1)
            e, m = fe.seq(emb_p, n, sel_ids)
            parts.append(e)
            red_mask = m if red_mask is None else (red_mask | m)
            l2 = l2 + fe.l2_from_seq(n, e)
        return jnp.concatenate(parts, axis=-1), red_mask, l2

    def fwd(params, batch, train):
        from ..ops.embedding import active_row_tape
        emb_p = params["dien"]["embedding"]
        sp_mesh = _seq_shard_mesh()
        fast_soft = (search == "soft" and active_row_tape() is None)
        if sp_mesh is not None:
            # SP path (parallel/longseq.py): the long KEY axis is sharded
            # over `model` — scoring, masking and top-k run per L/M block,
            # merged exactly; no device materializes the (B, L, D) stream
            from ..parallel.longseq import seq_sharded_soft_search
            cand_cols = [fs.sparse_index(n) for n in candidate]
            emb = fe.sparse(emb_p, batch["sparse"])
            cand = jnp.concatenate([emb[:, c, :] for c in cand_cols],
                                   axis=-1)
            cand_long = jnp.concatenate([emb[:, c, :]
                                         for c in long_score_cols], axis=-1)
            from ..parallel import context as pctx
            k = min(top_k, fs.seq_spec(long_behavior[0]).max_len)
            top_i, _ = seq_sharded_soft_search(
                sp_mesh, fs, long_behavior, k, emb_p["table"],
                batch["seq"], cand_long,
                capacity=pctx.exchange_capacity(),
                compress=pctx.exchange_compress())
            reduced, red_mask, l2_long = _regather_selected(
                emb_p, batch, top_i, emb)
        elif fast_soft:
            # stop-grad scoring + selected-rows re-gather (see helper);
            # bit-identical VALUES to the full-gather path
            cand_cols = [fs.sparse_index(n) for n in candidate]
            emb = fe.sparse(emb_p, batch["sparse"])
            cand = jnp.concatenate([emb[:, c, :] for c in cand_cols],
                                   axis=-1)
            cand_long = jnp.concatenate([emb[:, c, :]
                                         for c in long_score_cols], axis=-1)
            sg_parts, long_mask = [], None
            for n in long_behavior:
                e, m = fe.seq(emb_p, n, batch["seq"][n])
                sg_parts.append(jax.lax.stop_gradient(e))
                long_mask = m if long_mask is None else (long_mask | m)
            long_beh_sg = jnp.concatenate(sg_parts, axis=-1)
            scores = jnp.einsum("bld,bd->bl", long_beh_sg,
                                jax.lax.stop_gradient(cand_long))
            scores = jnp.where(long_mask, scores, -jnp.inf)
            k = min(top_k, long_beh_sg.shape[1])
            _, top_i = jax.lax.top_k(scores, k)
            reduced, red_mask, l2_long = _regather_selected(
                emb_p, batch, top_i, emb)
        else:
            # RowTape path (sparse-row optimizer): lookup ids must depend
            # on the batch only, so the selection cannot drive a second
            # gather — keep the full-stream differentiable gather here
            cand, long_beh, long_mask, l2_long, emb = behavior_inputs(
                fe, emb_p, batch, candidate, long_behavior)
        if sp_mesh is not None or fast_soft:
            pass  # reduced/red_mask computed above
        elif search == "soft":
            # raw-space scoring against the vocab-matched candidate slice
            cand_long = jnp.concatenate([emb[:, c, :]
                                         for c in long_score_cols], axis=-1)
            scores = jnp.einsum("bld,bd->bl", long_beh, cand_long)
            scores = jnp.where(long_mask, scores, -jnp.inf)
            k = min(top_k, long_beh.shape[1])
            top_s, top_i = jax.lax.top_k(scores, k)
            reduced = jnp.take_along_axis(long_beh, top_i[..., None], axis=1)
            red_mask = jnp.take_along_axis(long_mask, top_i, axis=1)
        else:  # hard search already applied in preprocessing
            reduced, red_mask = long_beh, long_mask
        if align_long is not None:
            reduced = align_long(params["align_long"], reduced)

        any_valid = jnp.any(red_mask, axis=1)
        safe_mask = red_mask | ~any_valid[:, None]
        esu = mha(params["mha"], reduced, mask=safe_mask)
        long_term = attn(params["attn"], cand, esu, safe_mask)
        long_term = long_term * any_valid[:, None]

        s_cand, s_beh, s_mask, l2_short, _ = behavior_inputs(
            fe, emb_p, batch, candidate, behavior)
        short_term, aux = dien.interest_core(params["dien"], s_cand, s_beh,
                                             s_mask)
        parts = [cand, long_term, short_term]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        # both behavior_inputs calls count the sparse-field l2 — subtract one
        l2 = l2_long + l2_short - fe.l2_from_sparse(emb)
        return logit[:, 0], {"aux_loss": aux_weight * aux, "emb_l2": l2}

    return stateless("SIM", fs, init_fn, fwd)


# ---------------------------------------------------------------------------
# HPMN (the reference's LSM roadmap item)
# ---------------------------------------------------------------------------


def HPMN(fs: FeatureSet,
         candidate: Tuple[str, ...] = ("item", "cate"),
         behavior: Tuple[str, ...] = ("hist_item", "hist_cate"),
         layers: int = 3,
         hidden: Tuple[int, ...] = (200, 80),
         cov_weight: float = 0.1) -> Model:
    """Hierarchical Periodic Memory Network (lifelong sequential modeling).

    The reference lists "[LSM] Lifelong Sequential Modeling with Personalized
    Memorization" as its Next-Building item #1 (kon/model/ctr_model/README.md)
    but never implemented it. HPMN (Ren et al., SIGIR 2019) is that paper's
    model:

    - ``layers`` stacked GRU memory slots; layer ``l`` (0-based) updates only
      every ``2**l`` *valid* behavior steps — slower layers memorize
      longer-period, coarser interests. Layer 0 reads the behavior embedding;
      layer ``l`` reads layer ``l−1``'s state at its update ticks (hierarchy).
    - The final per-layer states form the user memory M (B, layers, H); the
      candidate reads it with target attention (the paper's attentive read).
    - A covariance regularizer decorrelates the memory slots
      (‖M̄M̄ᵀ − diag‖²) so layers do not collapse onto one interest.

    TPU design: ONE ``lax.scan`` over time carries (states, valid-step count);
    the per-layer "does it tick" decision is a mask select (no dynamic control
    flow), and layer 0's input projections are hoisted out of the scan as a
    single MXU matmul. Padded steps advance nothing (right-padding as in the
    reference's ``is_sequence_right_padded``, rnn_demo.py:1541).
    """
    fe = FusedEmbedding(fs, with_linear=False)
    d, kd, L, n_other = _beh_dims(fs, candidate, behavior)
    H = kd
    cell0 = GRU(kd, H)          # layer 0: reads behavior embeddings
    cell_up = GRU(H, H)         # layers 1..D-1: read the layer below
    attn = TargetAttention(kd, (36, 1), activation="sigmoid")
    in_dim = kd * 2 + n_other * d + len(fs.dense)
    mlp = MLP(in_dim, hidden, activation="prelu", norm="layer", out_dim=1)

    def init_fn(rng):
        names = ["emb", "attn", "mlp", "m0"] + [f"cell{l}" for l in range(layers)]
        rngs = split_rngs(rng, names)
        cells = [
            (cell0 if l == 0 else cell_up).init(rngs[f"cell{l}"])
            for l in range(layers)
        ]
        return {"embedding": fe.init(rngs["emb"]),
                "cells": cells,
                "m0": normal_init(rngs["m0"], (layers, H), 0.05),
                "attn": attn.init(rngs["attn"]),
                "mlp": mlp.init(rngs["mlp"])}

    def fwd(params, batch, train):
        cand, beh, mask, l2, emb = behavior_inputs(
            fe, params["embedding"], batch, candidate, behavior)
        b = beh.shape[0]
        # hoist layer-0 input projections: (B, L, 3H) in one matmul
        xw0 = (bf16_matmul(beh.reshape(b * L, kd), params["cells"][0]["wx"])
               + params["cells"][0]["b"]).reshape(b, L, 3 * H)
        m0 = jnp.broadcast_to(params["m0"], (b, layers, H))
        cnt0 = jnp.zeros((b,), jnp.int32)

        def step(carry, inp):
            states, cnt = carry              # (B, D, H), (B,)
            xw_t, m_t = inp                  # (B, 3H), (B,)
            cnt_new = cnt + m_t.astype(jnp.int32)
            new_states = []
            below = None
            for l in range(layers):
                h = states[:, l, :]
                # layer l ticks when the valid-step count hits a multiple of
                # 2**l (and the step itself is valid)
                tick = m_t & (jnp.remainder(cnt_new, 2 ** l) == 0)
                if l == 0:
                    h_new = cell0._step(params["cells"][0], h, xw_t, tick)
                else:
                    xw_l = (bf16_matmul(below, params["cells"][l]["wx"])
                            + params["cells"][l]["b"])
                    h_new = cell_up._step(params["cells"][l], h, xw_l, tick)
                below = h_new
                new_states.append(h_new)
            return (jnp.stack(new_states, axis=1), cnt_new), None

        (mem, _), _ = jax.lax.scan(
            step, (m0, cnt0),
            (jnp.transpose(xw0, (1, 0, 2)), jnp.transpose(mask)))

        # covariance regularization over slots (paper eq. 10): decorrelate
        mbar = mem - jnp.mean(mem, axis=1, keepdims=True)
        cov = jnp.einsum("bld,bkd->blk", mbar, mbar) / H
        off = cov * (1.0 - jnp.eye(layers))
        cov_reg = jnp.mean(jnp.sum(jnp.square(off), axis=(1, 2)))

        slot_mask = jnp.ones((b, layers), bool)
        read = attn(params["attn"], cand, mem, slot_mask)
        parts = [cand, read]
        other = _other_sparse(fs, emb, candidate)
        if other is not None:
            parts.append(other)
        if batch.get("dense") is not None and batch["dense"].shape[-1] > 0:
            parts.append(batch["dense"])
        logit, _ = mlp(params["mlp"], jnp.concatenate(parts, axis=-1))
        return logit[:, 0], {"cov_reg": cov_weight * cov_reg, "emb_l2": l2}

    return stateless("HPMN", fs, init_fn, fwd)
