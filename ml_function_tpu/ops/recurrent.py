"""Recurrent cells on TPU: GRU / AUGRU / LSTM / BiLSTM as ``lax.scan``.

The reference vendors TF Keras ``recurrent_v2.py`` with a cuDNN/CPU dispatch
(``kon/model/ctr_model/layer/behavior_layer/rnn_demo.py:507,596,680``) and an
``AUGRU`` class whose attention-gating of the update gate is **commented out**
(rnn_demo.py:569-574) — which forces DIEN into its AIGRU fallback
(behavior_layer.py:199-209). The TPU-native design:

- all timestep input projections are hoisted out of the recurrence into ONE
  big (B·L, D)×(D, 3H) matmul (MXU), so the scan body is only the small
  h·U recurrence + elementwise gates;
- scan is time-major; padded steps carry the hidden state through unchanged
  (right-padding assumption matches the reference's
  ``is_sequence_right_padded`` check, rnn_demo.py:1541);
- AUGRU implements the *actual* DIEN semantics: ũ_t = a_t·u_t,
  h_t = (1−ũ)·h_{t−1} + ũ·h̃_t.

Gate convention (DIEN paper): u = update ("how much new"), r = reset;
h_t = (1−u)·h_{t−1} + u·h̃_t.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .base import Params, bf16_matmul, glorot_uniform, split_rngs, zeros


def _orthogonal(rng, shape):
    return jax.nn.initializers.orthogonal()(rng, shape, jnp.float32)


@dataclass(frozen=True)
class GRU:
    """GRU over (B, L, D) with mask; returns (B, L, H) sequence and (B, H) last.

    ``kernel``: 'scan' (default) is ``lax.scan`` with hoisted projections;
    'pallas' forces the fused sequence kernel (``ops/kernels/gru.py`` —
    whole time loop in VMEM). Measured on v5e at the DIEN bench shape
    (B=2048, L=64, H=16): kernel 5.16 ms/step vs scan 5.03 — XLA's scan
    is already latency-optimal at CTR hidden sizes, so the kernel stays
    opt-in (it exists per SURVEY §2.5's cuDNN-equivalence mandate and is
    numerics-pinned against the scan path)."""

    in_dim: int
    hidden: int
    kernel: str = "scan"

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["wx", "wh", "b"])
        return {
            "wx": glorot_uniform(rngs["wx"], (self.in_dim, 3 * self.hidden)),
            "wh": _orthogonal(rngs["wh"], (self.hidden, 3 * self.hidden)),
            "b": zeros((3 * self.hidden,)),
        }

    def _step(self, params, h, xw, m, a=None):
        hh = bf16_matmul(h, params["wh"])
        xu, xr, xn = jnp.split(xw, 3, axis=-1)
        hu, hr, hn = jnp.split(hh, 3, axis=-1)
        u = jax.nn.sigmoid(xu + hu)
        r = jax.nn.sigmoid(xr + hr)
        n = jnp.tanh(xn + r * hn)
        if a is not None:
            u = a[:, None] * u  # AUGRU: attention scales the update gate
        h_new = (1.0 - u) * h + u * n
        return jnp.where(m[:, None], h_new, h)

    def __call__(self, params: Params, x: jax.Array, mask: jax.Array,
                 att_scores: Optional[jax.Array] = None,
                 h0: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        b, l, _ = x.shape
        xw = (bf16_matmul(x.reshape(b * l, -1), params["wx"]) + params["b"]
              ).reshape(b, l, -1)
        xw_t = jnp.transpose(xw, (1, 0, 2))
        mask_t = jnp.transpose(mask, (1, 0))
        if h0 is None:
            h0 = jnp.zeros((b, self.hidden), x.dtype)

        if self.kernel == "pallas":
            from .kernels.gru import gru_sequence
            att_t = (jnp.transpose(att_scores, (1, 0)) if att_scores
                     is not None else jnp.ones((l, b), jnp.float32))
            seq_t = gru_sequence(xw_t, params["wh"], mask_t, att_t, h0)
            return jnp.transpose(seq_t, (1, 0, 2)), seq_t[-1]

        if att_scores is None:
            def body(h, inp):
                xw_s, m_s = inp
                h = self._step(params, h, xw_s, m_s)
                return h, h
            last, seq = jax.lax.scan(body, h0, (xw_t, mask_t))
        else:
            a_t = jnp.transpose(att_scores, (1, 0))
            def body(h, inp):
                xw_s, m_s, a_s = inp
                h = self._step(params, h, xw_s, m_s, a_s)
                return h, h
            last, seq = jax.lax.scan(body, h0, (xw_t, mask_t, a_t))
        return jnp.transpose(seq, (1, 0, 2)), last


@dataclass(frozen=True)
class AUGRU:
    """Attention-gated GRU (DIEN interest evolution) — the working version of
    the reference's disabled gate (rnn_demo.py:569-574)."""

    in_dim: int
    hidden: int

    def init(self, rng) -> Params:
        return GRU(self.in_dim, self.hidden).init(rng)

    def __call__(self, params: Params, x: jax.Array, mask: jax.Array,
                 att_scores: jax.Array, h0=None) -> Tuple[jax.Array, jax.Array]:
        return GRU(self.in_dim, self.hidden)(params, x, mask,
                                             att_scores=att_scores, h0=h0)


@dataclass(frozen=True)
class LSTM:
    """LSTM over (B, L, D) (reference's vendored LSTM half, rnn_demo.py:1229+;
    used via Bidirectional in DSIN, behavior_layer.py:500)."""

    in_dim: int
    hidden: int

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["wx", "wh", "b"])
        return {
            "wx": glorot_uniform(rngs["wx"], (self.in_dim, 4 * self.hidden)),
            "wh": _orthogonal(rngs["wh"], (self.hidden, 4 * self.hidden)),
            "b": zeros((4 * self.hidden,)),
        }

    def __call__(self, params: Params, x: jax.Array, mask: jax.Array,
                 reverse: bool = False) -> Tuple[jax.Array, jax.Array]:
        b, l, _ = x.shape
        xw = (bf16_matmul(x.reshape(b * l, -1), params["wx"]) + params["b"]
              ).reshape(b, l, -1)
        xw_t = jnp.transpose(xw, (1, 0, 2))
        mask_t = jnp.transpose(mask, (1, 0))

        def body(carry, inp):
            h, c = carry
            xw_s, m_s = inp
            gates = xw_s + bf16_matmul(h, params["wh"])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f + 1.0), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            m = m_s[:, None]
            return (jnp.where(m, h_new, h), jnp.where(m, c_new, c)), \
                jnp.where(m, h_new, h)

        init = (jnp.zeros((b, self.hidden), x.dtype),
                jnp.zeros((b, self.hidden), x.dtype))
        (h_last, _), seq = jax.lax.scan(body, init, (xw_t, mask_t),
                                        reverse=reverse)
        return jnp.transpose(seq, (1, 0, 2)), h_last


@dataclass(frozen=True)
class BiLSTM:
    """Bidirectional LSTM, concat merge (reference
    SessionInterestInteractingLayer, behavior_layer.py:497-508)."""

    in_dim: int
    hidden: int

    def init(self, rng) -> Params:
        rngs = split_rngs(rng, ["fwd", "bwd"])
        cell = LSTM(self.in_dim, self.hidden)
        return {"fwd": cell.init(rngs["fwd"]), "bwd": cell.init(rngs["bwd"])}

    def __call__(self, params: Params, x: jax.Array, mask: jax.Array
                 ) -> jax.Array:
        cell = LSTM(self.in_dim, self.hidden)
        f_seq, _ = cell(params["fwd"], x, mask)
        b_seq, _ = cell(params["bwd"], x, mask, reverse=True)
        return jnp.concatenate([f_seq, b_seq], axis=-1)
