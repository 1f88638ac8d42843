"""Attention blocks: field self-attention (AutoInt), target attention (DIN),
transformer blocks (BST/DSIN/SeqFM/SIM), positional encodings.

TPU-native re-design of the reference's attention stack
(``kon/model/ctr_model/layer/behavior_layer/behavior_layer.py``):

- ``MultHeadAttentionLayer`` (behavior_layer.py:313-380) materializes per-head
  rank-3 weights and (noted in SURVEY §7) projects V with the K weights — a
  bug. Here: standard fused QKV projections, softmax(QKᵀ/√d)V in one batched
  einsum per step, paper semantics.
- ``ProductAttentionLayer`` (behavior_layer.py:272-311) uses sigmoid where
  softmax is expected; here scores are softmax-normalized with additive
  −1e9 masking (the reference's −2³² trick, behavior_layer.py:78).
- ``AttentionUnitLayer``/``ActivationUnitLayer`` (behavior_layer.py:53-120):
  DIN target attention, scoring [cand, beh, cand−beh, cand·beh] with an MLP.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple
import os

import jax
import jax.numpy as jnp
import numpy as np

from .base import Params, bf16_matmul, glorot_uniform, split_rngs, zeros
from .core import MLP, Dense, LayerNorm

NEG_INF = -1e9


def attention_mask_bias(mask: jax.Array) -> jax.Array:
    """(…, L) bool → (…, 1, L) additive bias (0 keep / −1e9 drop)."""
    return jnp.where(mask[..., None, :], 0.0, NEG_INF)


# ---------------------------------------------------------------------------
# Multi-head self/cross attention
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MultiHeadAttention:
    """softmax(QKᵀ/√d)V with fused projections.

    Works both over behavior sequences (L = seq len) and over feature fields
    (AutoInt: L = n_fields, no mask). ``use_res``/``use_ln`` mirror the
    reference's optional residual + LayerNorm (behavior_layer.py:369-377).
    """

    dim: int
    num_heads: int = 2
    head_dim: Optional[int] = None
    use_res: bool = True
    use_ln: bool = True
    causal: bool = False
    # 'auto': use the Pallas flash kernel when the key length reaches
    # flash_min_len and no extra_bias is present; 'never'/'always' force.
    flash: str = "auto"
    flash_min_len: int = 512

    @property
    def hd(self) -> int:
        return self.head_dim or max(self.dim // self.num_heads, 1)

    @property
    def proj_dim(self) -> int:
        return self.num_heads * self.hd

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["q", "k", "v", "o", "ln", "res"])
        p = {
            "q": glorot_uniform(rngs["q"], (self.dim, self.proj_dim)),
            "k": glorot_uniform(rngs["k"], (self.dim, self.proj_dim)),
            "v": glorot_uniform(rngs["v"], (self.dim, self.proj_dim)),
            "o": glorot_uniform(rngs["o"], (self.proj_dim, self.dim)),
        }
        if self.use_ln:
            p["ln"] = LayerNorm(self.dim).init(rngs["ln"])
        return p

    def __call__(self, params: Params, x: jax.Array,
                 kv: Optional[jax.Array] = None,
                 mask: Optional[jax.Array] = None,
                 extra_bias: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, Lq, D); kv: (B, Lk, D) (defaults to x);
        mask: (B, Lk) valid-key mask; extra_bias: (B, Lq, Lk) additive."""
        kv = x if kv is None else kv
        b, lq, _ = x.shape
        lk = kv.shape[1]
        h, hd = self.num_heads, self.hd
        q = bf16_matmul(x, params["q"]).reshape(b, lq, h, hd)
        k = bf16_matmul(kv, params["k"]).reshape(b, lk, h, hd)
        v = bf16_matmul(kv, params["v"]).reshape(b, lk, h, hd)
        use_flash = (self.flash == "always"
                     or (self.flash == "auto" and lk >= self.flash_min_len
                         and extra_bias is None))
        if use_flash:
            from .kernels.flash_attention import flash_attention
            out = flash_attention(q.transpose(0, 2, 1, 3),
                                  k.transpose(0, 2, 1, 3),
                                  v.transpose(0, 2, 1, 3),
                                  mask=mask, causal=self.causal,
                                  scale=1.0 / np.sqrt(hd))
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * hd)
        elif (lq * lk <= 4096 and hd <= 64
              and os.environ.get("ML_FUNCTION_TPU_FIELD_ATTN") == "1"
              and extra_bias is None and not self.causal):
            # opt-in Pallas field-attention kernel — measured TIE with the
            # mul-reduce path below (PERF.md); kept as the floor proof
            from .kernels.field_attention import field_attention
            bias = (jnp.zeros((b, lk), jnp.float32) if mask is None
                    else jnp.where(mask, 0.0, NEG_INF))
            out = field_attention(q, k, v, bias, 1.0 / np.sqrt(hd))
            out = out.reshape(b, lq, h * hd)
        elif lq * lk <= 4096 and hd <= 64:
            # SMALL-L path (field attention / short behavior windows): the
            # batched (lq, hd)x(hd, lk) dots at huge batch lower to a
            # pathological dilated-convolution on TPU (measured 13.4 ms/
            # block fwd at AutoInt's B=32k, F=27 — ~10x off roofline); a
            # broadcast-multiply-reduce keeps XLA on fused VPU loops:
            # 2.4x fwd / 2.5x bwd measured, identical f32 math
            lg = jnp.sum(q[:, :, None] * k[:, None, :], axis=-1) \
                / np.sqrt(hd)                       # (B, lq, lk, H)
            if mask is not None:
                lg = lg + jnp.where(mask, 0.0, NEG_INF)[:, None, :, None]
            if extra_bias is not None:
                lg = lg + extra_bias[..., None]
            if self.causal:
                causal = jnp.tril(jnp.ones((lq, lk), bool))
                lg = jnp.where(causal[None, :, :, None], lg, NEG_INF)
            a = jax.nn.softmax(lg, axis=2)
            out = jnp.sum(a[..., None] * v[:, None], axis=2)  # (B,lq,H,hd)
            out = out.reshape(b, lq, h * hd)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            if mask is not None:
                logits = logits + jnp.where(mask, 0.0,
                                            NEG_INF)[:, None, None, :]
            if extra_bias is not None:
                logits = logits + extra_bias[:, None, :, :]
            if self.causal:
                causal = jnp.tril(jnp.ones((lq, lk), bool))
                logits = jnp.where(causal[None, None], logits, NEG_INF)
            a = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, lq, h * hd)
        out = bf16_matmul(out, params["o"])
        if self.use_res:
            out = out + x
        if self.use_ln:
            out = LayerNorm(self.dim)(params["ln"], out)
        return out


@dataclass(frozen=True)
class TransformerBlock:
    """MHA + position-wise FFN with residuals (reference SelfAttentionLayer +
    PositionWiseFeedForwardLayer, behavior_layer.py:382-425).

    ``attention='lsh'`` swaps the softmax product for Reformer LSH bucketed
    attention (``LSHSelfAttention``) — the hash option the reference's
    roadmap promises for the product parts (ctr_model/README.md p.s. 2).
    """

    dim: int
    num_heads: int = 2
    ffn_hidden: Tuple[int, ...] = (32,)
    causal: bool = False
    attention: str = "softmax"      # 'softmax' | 'lsh'
    lsh_chunk: int = 16

    def _attn(self):
        if self.attention == "lsh":
            return LSHSelfAttention(self.dim, self.num_heads,
                                    chunk_size=self.lsh_chunk,
                                    causal=self.causal)
        return MultiHeadAttention(self.dim, self.num_heads,
                                  causal=self.causal)

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["mha", "ffn", "ffn_out", "ln"])
        return {
            "mha": self._attn().init(rngs["mha"]),
            "ffn": MLP(self.dim, self.ffn_hidden, activation="relu").init(rngs["ffn"]),
            "ffn_out": Dense(self.ffn_hidden[-1], self.dim).init(rngs["ffn_out"]),
            "ln": LayerNorm(self.dim).init(rngs["ln"]),
        }

    def __call__(self, params: Params, x: jax.Array,
                 mask: Optional[jax.Array] = None,
                 extra_bias: Optional[jax.Array] = None) -> jax.Array:
        if self.attention == "lsh":
            h = self._attn()(params["mha"], x, mask=mask)
        else:
            h = self._attn()(params["mha"], x, mask=mask,
                             extra_bias=extra_bias)
        f, _ = MLP(self.dim, self.ffn_hidden, activation="relu")(params["ffn"], h)
        f = Dense(self.ffn_hidden[-1], self.dim)(params["ffn_out"], f)
        return LayerNorm(self.dim)(params["ln"], h + f)


# ---------------------------------------------------------------------------
# LSH (hash-bucketed) self-attention — Reformer
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LSHSelfAttention:
    """Reformer LSH self-attention (Kitaev et al. 2020) — the "hash option
    for the product parts" the reference's roadmap promises but never builds
    (kon/model/ctr_model/README.md p.s. 2; the REFORMER pdf sits in
    paper/behavior/).

    Shared-QK attention where keys are bucketed by random-rotation LSH,
    sorted by bucket, chunked, and each chunk attends to itself plus the
    previous chunk — O(L·C) instead of O(L²). TPU design: the whole thing is
    argsort + gathers + one batched (nc, C, 2C) einsum per round; all shapes
    static, no bucket-size dynamic control flow. Sorting is stable by
    (bucket, position), so within a chunk keys keep temporal order.

    Choices (documented):
    - no cross-bucket mask inside the attend window (trax-style: sorting
      already clusters buckets; with ``chunk_size ≥ L`` this makes the op
      EXACTLY shared-QK full attention — pinned in tests);
    - self-attention gets the paper's −1e5 penalty (a token prefers other
      targets but can fall back to itself when its bucket is a singleton);
    - ``n_hashes`` rounds are combined with per-query softmax-normalizer
      weights (paper eq. for multi-round LSH).
    """

    dim: int
    num_heads: int = 2
    head_dim: Optional[int] = None
    n_buckets: int = 8
    chunk_size: int = 16
    n_hashes: int = 1
    causal: bool = False
    use_res: bool = True
    use_ln: bool = True
    seed: int = 0
    SELF_PENALTY = -1e5

    @property
    def hd(self) -> int:
        return self.head_dim or max(self.dim // self.num_heads, 1)

    @property
    def proj_dim(self) -> int:
        return self.num_heads * self.hd

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["qk", "v", "o", "ln"])
        p = {
            "qk": glorot_uniform(rngs["qk"], (self.dim, self.proj_dim)),
            "v": glorot_uniform(rngs["v"], (self.dim, self.proj_dim)),
            "o": glorot_uniform(rngs["o"], (self.proj_dim, self.dim)),
        }
        if self.use_ln:
            p["ln"] = LayerNorm(self.dim).init(rngs["ln"])
        return p

    def _buckets(self, qk: jax.Array, rng: jax.Array) -> jax.Array:
        """Random-rotation LSH: qk (N, L, hd) → int buckets (N, L)."""
        rot = jax.random.normal(rng, (self.hd, self.n_buckets // 2),
                                qk.dtype)
        proj = qk @ rot                                  # (N, L, nb/2)
        proj = jnp.concatenate([proj, -proj], axis=-1)   # (N, L, nb)
        return jnp.argmax(proj, axis=-1).astype(jnp.int32)

    def _one_round(self, qk, v, valid, rng):
        """One hash round. qk/v: (N, L, hd); valid: (N, L) bool.
        Returns (out (N, L, hd), lse (N, L))."""
        n, l, hd = qk.shape
        c = min(self.chunk_size, l)
        lp = ((l + c - 1) // c) * c
        buckets = self._buckets(qk, rng)
        # invalid keys to a virtual last bucket so they sort to the end
        buckets = jnp.where(valid, buckets, self.n_buckets)
        # stable sort key: bucket-major, position-minor
        pos = jnp.arange(l, dtype=jnp.int32)[None, :]
        s_idx = jnp.argsort(buckets * l + pos, axis=-1)  # (N, L)
        take = lambda t: jnp.take_along_axis(t, s_idx[..., None], axis=1)
        sqk, sv = take(qk), take(v)
        spos = jnp.take_along_axis(jnp.broadcast_to(pos, (n, l)), s_idx,
                                   axis=-1)
        svalid = jnp.take_along_axis(valid, s_idx, axis=-1)
        if lp != l:  # pad to a chunk multiple with inert keys
            padn = lp - l
            sqk = jnp.pad(sqk, ((0, 0), (0, padn), (0, 0)))
            sv = jnp.pad(sv, ((0, 0), (0, padn), (0, 0)))
            spos = jnp.pad(spos, ((0, 0), (0, padn)), constant_values=l)
            svalid = jnp.pad(svalid, ((0, 0), (0, padn)))
        nc = lp // c
        cq = sqk.reshape(n, nc, c, hd)
        # keys: this chunk ++ previous chunk (lookback)
        ck = jnp.concatenate([cq, jnp.roll(cq, 1, axis=1)], axis=2)
        cv = sv.reshape(n, nc, c, hd)
        cv = jnp.concatenate([cv, jnp.roll(cv, 1, axis=1)], axis=2)
        kpos = spos.reshape(n, nc, c)
        kpos = jnp.concatenate([kpos, jnp.roll(kpos, 1, axis=1)], axis=2)
        kval = svalid.reshape(n, nc, c)
        kval = jnp.concatenate([kval, jnp.roll(kval, 1, axis=1)], axis=2)
        qpos = spos.reshape(n, nc, c)

        logits = jnp.einsum("ngqd,ngkd->ngqk", cq, ck) / np.sqrt(hd)
        logits = jnp.where(kval[:, :, None, :], logits, NEG_INF)
        if self.causal:
            logits = jnp.where(kpos[:, :, None, :] <= qpos[..., None],
                               logits, NEG_INF)
        logits = jnp.where(kpos[:, :, None, :] == qpos[..., None],
                           logits + self.SELF_PENALTY, logits)
        # max-shifted normalized softmax: with the −1e5 self penalty the raw
        # logits sit at ~1e5 magnitude where f32 resolution is ~0.008, so
        # exp(logits − logsumexp) alone loses ~1e-3 of probability mass —
        # normalize explicitly (weights sum to exactly 1)
        mx = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - mx)
        se = jnp.sum(e, axis=-1, keepdims=True)
        a = e / se
        lse = (mx + jnp.log(se))[..., 0]                 # (N, nc, C)
        out = jnp.einsum("ngqk,ngkd->ngqd", a, cv)
        out = out.reshape(n, lp, hd)[:, :l]
        lse = lse.reshape(n, lp)[:, :l]
        # unsort back to temporal order
        inv = jnp.argsort(s_idx, axis=-1)
        out = jnp.take_along_axis(out, inv[..., None], axis=1)
        lse = jnp.take_along_axis(lse, inv, axis=-1)
        return out, lse

    def __call__(self, params: Params, x: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, L, D); mask: (B, L) valid mask → (B, L, D)."""
        b, l, _ = x.shape
        h, hd = self.num_heads, self.hd
        valid = jnp.ones((b, l), bool) if mask is None else mask
        qk = bf16_matmul(x, params["qk"]).reshape(b, l, h, hd)
        v = bf16_matmul(x, params["v"]).reshape(b, l, h, hd)
        fold = lambda t: t.transpose(0, 2, 1, 3).reshape(b * h, l, hd)
        qk_f, v_f = fold(qk), fold(v)
        val_f = jnp.repeat(valid, h, axis=0)
        outs, lses = [], []
        base = jax.random.PRNGKey(self.seed)
        for r in range(self.n_hashes):
            o, s = self._one_round(qk_f, v_f, val_f,
                                   jax.random.fold_in(base, r))
            outs.append(o)
            lses.append(s)
        if self.n_hashes == 1:
            out = outs[0]
        else:  # weight rounds by their softmax mass (Reformer multi-round)
            lse_all = jnp.stack(lses)                     # (R, N, L)
            w = jax.nn.softmax(lse_all, axis=0)[..., None]
            out = jnp.sum(w * jnp.stack(outs), axis=0)
        out = out.reshape(b, h, l, hd).transpose(0, 2, 1, 3).reshape(
            b, l, h * hd)
        out = bf16_matmul(out, params["o"])
        out = out * valid[..., None]
        if self.use_res:
            out = out + x
        if self.use_ln:
            out = LayerNorm(self.dim)(params["ln"], out)
        return out


# ---------------------------------------------------------------------------
# DIN target attention
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class TargetAttention:
    """DIN activation unit (reference AttentionUnitLayer +
    ActivationUnitLayer, behavior_layer.py:53-120).

    score_t = MLP([cand, beh_t, cand − beh_t, cand ⊙ beh_t]); padded steps
    masked to −1e9; softmax over steps; returns the weighted sum (or the
    weighted sequence when ``return_seq`` — DIEN's AIGRU input).
    """

    dim: int
    hidden: Tuple[int, ...] = (36, 1)
    activation: str = "sigmoid"
    softmax_norm: bool = True

    def _mlp(self):
        return MLP(4 * self.dim, self.hidden[:-1] or (36,), activation=self.activation,
                   out_dim=1)

    def init(self, rng) -> Params:
        return {"mlp": self._mlp().init(rng)}

    def scores(self, params: Params, cand: jax.Array, seq: jax.Array,
               mask: jax.Array) -> jax.Array:
        """cand: (B, D); seq: (B, L, D); mask: (B, L) → (B, L) weights."""
        l = seq.shape[1]
        c = jnp.broadcast_to(cand[:, None, :], seq.shape)
        feats = jnp.concatenate([c, seq, c - seq, c * seq], axis=-1)
        s, _ = self._mlp()(params["mlp"], feats)
        s = s[..., 0]
        s = jnp.where(mask, s, NEG_INF)
        if self.softmax_norm:
            return jax.nn.softmax(s, axis=-1)
        return jnp.where(mask, jax.nn.sigmoid(s), 0.0)

    def __call__(self, params: Params, cand: jax.Array, seq: jax.Array,
                 mask: jax.Array, return_seq: bool = False) -> jax.Array:
        w = self.scores(params, cand, seq, mask)
        if return_seq:
            return seq * w[..., None]
        return jnp.einsum("bl,bld->bd", w, seq)


# ---------------------------------------------------------------------------
# Positional encodings
# ---------------------------------------------------------------------------


def sincos_position_encoding(length: int, dim: int) -> jax.Array:
    """(L, D) sin/cos encodings (reference PositionalEncodeLayer,
    behavior_layer.py:244-270)."""
    pos = np.arange(length)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    enc = np.zeros((length, dim), np.float32)
    enc[:, 0::2] = np.sin(angle[:, 0::2])
    enc[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(enc)


@dataclass(frozen=True)
class SessionPositionBias:
    """DSIN learned bias encodings over (session, position, dim)
    (reference BiasPositionEncodeLayer, behavior_layer.py:428-458)."""

    session_num: int
    session_len: int
    dim: int

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["sess", "pos", "unit"])
        return {
            "sess": zeros((self.session_num, 1, 1)),
            "pos": zeros((1, self.session_len, 1)),
            "unit": zeros((1, 1, self.dim)),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        """x: (B, S, L, D)."""
        return x + params["sess"][None] + params["pos"][None] + params["unit"][None]
