"""Fused small-L attention (field attention), Pallas fwd + custom-vjp bwd.

The complement of ``flash_attention``: that kernel is built for LONG key
axes (lifelong streams); this one is for the opposite regime — attention
over a handful of positions (AutoInt's ~27 feature fields, DSIN's 8-item
sessions, short behavior windows) at a HUGE batch. XLA lowers the batched
(L, Dh)×(Dh, L) tiny GEMMs of that regime to a dilated-convolution HLO
that runs ~10× off roofline, and even the broadcast-multiply-reduce
rewrite (ops/attention.py small-L path) leaves ~2-4× on the table because
every array keeps L/Dh (≤ 32) on the 128-wide lane dimension.

Layout choice (the whole kernel): put the BATCH on the lanes. Inputs are
transposed host-side to ``(H, L, Dh, B)``; each grid program takes one
head's ``(1, L, Dh, BB)`` block and computes with every elementwise op
shaped ``(L, ·, BB)`` — full 128-lane utilization at any L. The L×L score
matrix lives in VMEM only. Contractions over Dh/L unroll as small Python
loops (L, Dh ≤ 32 by construction) of lane-parallel multiply-accumulates
— no MXU, pure VPU.

MEASURED VERDICT (v5e, AutoInt shape B=32k, F=27, H=2, Dh=16): fwd
5.59 ms / fwd+bwd 9.9 ms — a statistical TIE with the XLA
broadcast-multiply-reduce path this kernel was meant to beat (5.66/10.8).
Both are VPU-FLOP-bound at the same rate; the MXU cannot help (per-example
L×L attention at 128-lane batch granularity wastes the systolic array by
exactly the batch factor). The kernel therefore stays OPT-IN
(ML_FUNCTION_TPU_FIELD_ATTN=1): its value is the measurement — it proves
the default small-L path in ops/attention.py already runs at
hand-written-kernel speed, so there is no fusion left on the table.

Semantics: softmax(QKᵀ·scale + bias_k) V — exactly the dense path of
``MultiHeadAttention`` (additive key bias encodes the mask; no causal, no
extra_bias — callers with those fall back to XLA). f32 throughout.

Public entry ``field_attention(q, k, v, bias, scale)`` with q/k/v
``(B, L, H, Dh)``, bias ``(B, Lk)`` additive; returns ``(B, Lq, H, Dh)``.
Interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_B = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _scores(qh, kh, bias, scale):
    """qh (Lq, Dh, BB), kh (Lk, Dh, BB), bias (Lk, BB) → probs (Lq, Lk, BB).
    Dh-loop of lane-parallel MACs; softmax over the key axis."""
    dh = qh.shape[1]
    lg = qh[:, 0, :][:, None, :] * kh[:, 0, :][None, :, :]
    for d in range(1, dh):
        lg += qh[:, d, :][:, None, :] * kh[:, d, :][None, :, :]
    lg = lg * scale + bias[None, :, :]
    m = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _apply_v(a, vh):
    """a (Lq, Lk, BB), vh (Lk, Dh, BB) → (Lq, Dh, BB)."""
    dh = vh.shape[1]
    outs = []
    for d in range(dh):
        outs.append(jnp.sum(a * vh[:, d, :][None, :, :], axis=1))
    return jnp.stack(outs, axis=1)


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    a = _scores(q_ref[0], k_ref[0], bias_ref[:, :], scale)
    o_ref[0] = _apply_v(a, v_ref[0])


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    lk, dh = k_ref.shape[1], k_ref.shape[2]
    for hh in range(1):
        qh, kh, vh = q_ref[0], k_ref[0], v_ref[0]
        doh = do_ref[0]                          # (Lq, Dh, BB)
        a = _scores(qh, kh, bias_ref[:, :], scale)   # (Lq, Lk, BB)
        # dV[k,d] = Σ_q a[q,k] dO[q,d]
        dv = []
        for d in range(dh):
            dv.append(jnp.sum(a * doh[:, d, :][:, None, :], axis=0))
        dv_ref[0] = jnp.stack(dv, axis=1)        # (Lk, Dh, BB)
        # dA[q,k] = Σ_d dO[q,d] V[k,d]
        da = doh[:, 0, :][:, None, :] * vh[:, 0, :][None, :, :]
        for d in range(1, dh):
            da += doh[:, d, :][:, None, :] * vh[:, d, :][None, :, :]
        # dS = a ⊙ (dA − Σ_k a·dA)
        ds = a * (da - jnp.sum(a * da, axis=1, keepdims=True))  # (Lq,Lk,BB)
        # dQ[q,d] = scale Σ_k dS[q,k] K[k,d]; dK[k,d] = scale Σ_q dS Q[q,d]
        dq, dk = [], []
        for d in range(dh):
            dq.append(scale * jnp.sum(ds * kh[:, d, :][None, :, :], axis=1))
            dk.append(scale * jnp.sum(ds * qh[:, d, :][:, None, :], axis=0))
        dq_ref[0] = jnp.stack(dq, axis=1)
        dk_ref[0] = jnp.stack(dk, axis=1)


def _pad_b(x, bb):
    b = x.shape[-1]
    pad = -b % bb
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _call(kernel, n_out, q_t, k_t, v_t, bias_t, *extra, scale):
    """Shared pallas_call wiring: grid over padded B, blocks (H,L,Dh,BB)."""
    h, lq, dh, b = q_t.shape
    lk = k_t.shape[1]
    bb = min(BLOCK_B, _round_up(b, 128))
    args = [_pad_b(x, bb) for x in (q_t, k_t, v_t, bias_t) + extra]
    bp = args[0].shape[-1]
    # grid: (head, batch-block) — one head per program keeps the unrolled
    # (L, L, BB) temporaries inside the 16 MB VMEM stack budget
    spec4 = lambda l: pl.BlockSpec((1, l, dh, bb),
                                   lambda hh, i: (hh, 0, 0, i),
                                   memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((lk, bb), lambda hh, i: (0, i),
                             memory_space=pltpu.VMEM)
    in_specs = [spec4(lq), spec4(lk), spec4(lk), bias_spec] \
        + [spec4(lq) for _ in extra]
    shapes = {1: [jax.ShapeDtypeStruct((h, lq, dh, bp), jnp.float32)],
              3: [jax.ShapeDtypeStruct((h, lq, dh, bp), jnp.float32),
                  jax.ShapeDtypeStruct((h, lk, dh, bp), jnp.float32),
                  jax.ShapeDtypeStruct((h, lk, dh, bp), jnp.float32)]}[n_out]
    out_specs = [spec4(lq), spec4(lk), spec4(lk)][:n_out]
    outs = pl.pallas_call(
        functools.partial(kernel, scale=scale),
        grid=(h, bp // bb),
        in_specs=in_specs,
        out_shape=shapes if n_out > 1 else shapes[0],
        out_specs=out_specs if n_out > 1 else out_specs[0],
        interpret=_interpret(),
    )(*args)
    outs = outs if n_out > 1 else [outs]
    return [o[..., :b] for o in outs]


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def field_attention(q, k, v, bias, scale):
    """q (B, Lq, H, Dh), k/v (B, Lk, H, Dh), bias (B, Lk) additive →
    (B, Lq, H, Dh). softmax(QKᵀ·scale + bias) V, f32."""
    return _fwd(q, k, v, bias, scale)[0]


def _to_t(x):   # (B, L, H, Dh) -> (H, L, Dh, B)
    return jnp.transpose(x.astype(jnp.float32), (2, 1, 3, 0))


def _from_t(x):  # (H, L, Dh, B) -> (B, L, H, Dh)
    return jnp.transpose(x, (3, 1, 0, 2))


def _fwd(q, k, v, bias, scale):
    o_t, = _call(_fwd_kernel, 1, _to_t(q), _to_t(k), _to_t(v),
                 jnp.transpose(bias.astype(jnp.float32), (1, 0)),
                 scale=scale)
    return [_from_t(o_t)]


def _vjp_fwd(q, k, v, bias, scale):
    return field_attention(q, k, v, bias, scale), (q, k, v, bias)


def _vjp_bwd(scale, res, g):
    q, k, v, bias = res
    dq_t, dk_t, dv_t = _call(
        _bwd_kernel, 3, _to_t(q), _to_t(k), _to_t(v),
        jnp.transpose(bias.astype(jnp.float32), (1, 0)), _to_t(g),
        scale=scale)
    return (_from_t(dq_t).astype(q.dtype), _from_t(dk_t).astype(k.dtype),
            _from_t(dv_t).astype(v.dtype), jnp.zeros_like(bias))


field_attention.defvjp(_vjp_fwd, _vjp_bwd)
