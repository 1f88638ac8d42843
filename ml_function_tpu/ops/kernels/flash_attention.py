"""Flash attention for behavior sequences (Pallas, fwd + custom-vjp bwd).

Sized for CTR workloads: small head dims (kd = 16 here) and lifelong
sequences (SIM-class, 10⁴⁺ — the reference caps behavior length at 90
because TF attention is O(L²) memory; here the (L_q, L_k) score matrix never
leaves VMEM and is processed in K blocks with online softmax).

Layout choices for the v5e:
- K and V are stored TRANSPOSED, (Dh, Lk): with Dh = 16, the natural (Lk, Dh)
  layout would pad the 16-wide lane dim to 128 (8× VMEM waste, OOM at 16k
  keys); transposed, Dh sits on sublanes and Lk on lanes — no waste, and both
  kernel matmuls contract along the right axes without relayout;
- one grid program per (batch·head, q-block); K-block loop with running
  (m, l, acc) online-softmax state;
- backward recomputes P per (q-block, k-block) and accumulates dK/dV in a
  VMEM scratch revisited across q-blocks via an outer k-block grid axis.

Public entry ``flash_attention``; interpret mode on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
# pad granules — the MINIMUM block sizes; the entry picks larger blocks
# (256/1024) when the padded lengths divide, which measures 1.2-1.3x
# faster across 1k-16k key lengths (r5 block sweep)
BLOCK_Q = 128
BLOCK_K = 512


def _round_up(x, m):
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# forward: grid (BH, n_q_blocks); K-block online softmax inside
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, kt_ref, vt_ref, bias_ref, o_ref, lse_ref, *,
                scale, causal, bq, bk):
    dh = q_ref.shape[1]
    lk = kt_ref.shape[1]
    n_kb = lk // bk
    iq = pl.program_id(1)

    q = q_ref[:, :]  # (BQ, Dh)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, dh), jnp.float32)

    def body(j, carry):
        m, l, acc = carry
        kt = kt_ref[:, pl.ds(j * bk, bk)]      # (Dh, BK)
        s = jax.lax.dot_general(
            q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        s = s + bias_ref[0, pl.ds(j * bk, bk)][None, :]
        if causal:
            rows = (iq * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0))
            cols = (j * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1))
            s = jnp.where(cols <= rows, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                            # (BQ, BK)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vt = vt_ref[:, pl.ds(j * bk, bk)]       # (Dh, BK)
        pv = jax.lax.dot_general(
            p, vt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, Dh)
        return m_new, l_new, acc * alpha + pv

    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[:, :] = acc / l_safe
    lse_ref[:, :] = m + jnp.log(l_safe)


# ---------------------------------------------------------------------------
# backward dq: grid (BH, n_q_blocks) — recompute, accumulate over k blocks
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, kt_ref, vt_ref, bias_ref, lse_ref, do_ref,
                   delta_ref, dq_ref, *, scale, causal, bq, bk):
    dh = q_ref.shape[1]
    lk = kt_ref.shape[1]
    n_kb = lk // bk
    iq = pl.program_id(1)

    q = q_ref[:, :]
    do = do_ref[:, :]
    lse = lse_ref[:, :]
    delta = delta_ref[:, :]

    def body(j, dq):
        kt = kt_ref[:, pl.ds(j * bk, bk)]
        s = jax.lax.dot_general(
            q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + bias_ref[0, pl.ds(j * bk, bk)][None, :]
        if causal:
            rows = (iq * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0))
            cols = (j * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 1))
            s = jnp.where(cols <= rows, s, NEG_INF)
        p = jnp.exp(s - lse)                              # (BQ, BK)
        vt = vt_ref[:, pl.ds(j * bk, bk)]
        dp = jax.lax.dot_general(
            do, vt, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, BK)
        ds = p * (dp - delta)
        # dq += dS @ K = dS (BQ, BK) @ ktᵀ (BK, Dh)
        return dq + jax.lax.dot_general(
            ds, kt, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, n_kb, body, jnp.zeros((bq, dh), jnp.float32))
    dq_ref[:, :] = dq


# ---------------------------------------------------------------------------
# backward dk/dv: grid (BH, n_k_blocks) — loop q blocks inside
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(qt_ref, kt_ref, vt_ref, bias_ref, lse_ref, dot_ref,
                    delta_ref, dk_ref, dv_ref, *, scale, causal, bq, bk):
    """q/do arrive TRANSPOSED (Dh, Lq) like k/v: with Dh on sublanes the
    full-sequence refs cost Dh·Lq·4 bytes of VMEM; the natural (Lq, Dh)
    layout pads Dh=8 to 128 lanes, which at Lq=16384 is 8 MB PER ref and
    kills the Mosaic compile (measured: remote-compile 500 at 16k·16k)."""
    dh = kt_ref.shape[0]
    lq = qt_ref.shape[1]
    n_qb = lq // bq
    jk = pl.program_id(1)

    kt = kt_ref[:, :]   # (Dh, BK) — this program's key block
    vt = vt_ref[:, :]
    bias = bias_ref[0, :][None, :]

    def body(i, carry):
        dk, dv = carry
        qt = qt_ref[:, pl.ds(i * bq, bq)]       # (Dh, BQ)
        dot_ = dot_ref[:, pl.ds(i * bq, bq)]    # (Dh, BQ)
        lse = lse_ref[0, pl.ds(i * bq, bq)][:, None]
        delta = delta_ref[0, pl.ds(i * bq, bq)][:, None]
        s = jax.lax.dot_general(
            qt, kt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        s = s + bias
        if causal:
            rows = (i * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, kt.shape[1]), 0))
            cols = (jk * bk + jax.lax.broadcasted_iota(
                jnp.int32, (bq, kt.shape[1]), 1))
            s = jnp.where(cols <= rows, s, NEG_INF)
        p = jnp.exp(s - lse)
        # dV += Pᵀ dO: (BK, BQ) · (BQ, Dh) via transposed refs → (BK, Dh)
        dv = dv + jax.lax.dot_general(
            p, dot_, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            dot_, vt, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, BK)
        ds = p * (dp - delta)
        # dK += dSᵀ q → (BK, Dh)
        dk = dk + jax.lax.dot_general(
            ds, qt, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return dk, dv

    bk = kt.shape[1]
    dk, dv = jax.lax.fori_loop(
        0, n_qb, body, (jnp.zeros((bk, dh), jnp.float32),
                        jnp.zeros((bk, dh), jnp.float32)))
    dk_ref[:, :] = dk
    dv_ref[:, :] = dv


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _fwd_call(q, kt, vt, bias, scale, causal, bq, bk):
    bh, lq, dh = q.shape
    lk = kt.shape[2]
    grid = (bh, lq // bq)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          bq=bq, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, dh, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, dh, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, lk), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, bq, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, lq, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32)],
        interpret=_interpret(),
    )(q, kt, vt, bias)
    return out, lse


def _bwd_calls(q, kt, vt, bias, lse, do, delta, scale, causal, bq, bk):
    bh, lq, dh = q.shape
    lk = kt.shape[2]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          bq=bq, bk=bk),
        grid=(bh, lq // bq),
        in_specs=[
            pl.BlockSpec((None, bq, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, dh, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, dh, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, 1, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, dh), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, bq, dh), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lq, dh), jnp.float32),
        interpret=_interpret(),
    )(q, kt, vt, bias, lse, do, delta)

    # q/do/lse/delta transposed so Dh sits on sublanes (see _bwd_dkv_kernel)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          bq=bq, bk=bk),
        grid=(bh, lk // bk),
        in_specs=[
            pl.BlockSpec((None, dh, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, dh, bk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((None, dh, bk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((None, 1, bk), lambda b, j: (b, 0, j)),
            pl.BlockSpec((None, 1, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, dh, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, 1, lq), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, bk, dh), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, bk, dh), lambda b, j: (b, j, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32),
                   jax.ShapeDtypeStruct((bh, lk, dh), jnp.float32)],
        interpret=_interpret(),
    )(q.transpose(0, 2, 1), kt, vt, bias, lse.transpose(0, 2, 1),
      do.transpose(0, 2, 1), delta.transpose(0, 2, 1))
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, kt, vt, bias, scale, causal, bq, bk):
    out, _ = _fwd_call(q, kt, vt, bias, scale, causal, bq, bk)
    return out


def _flash_fwd(q, kt, vt, bias, scale, causal, bq, bk):
    out, lse = _fwd_call(q, kt, vt, bias, scale, causal, bq, bk)
    return out, (q, kt, vt, bias, out, lse)


def _flash_bwd(scale, causal, bq, bk, res, do):
    q, kt, vt, bias, out, lse = res
    delta = jnp.sum(do * out, axis=-1, keepdims=True)
    dq, dk, dv = _bwd_calls(q, kt, vt, bias, lse, do, delta, scale, causal,
                            bq, bk)
    return dq, dk.transpose(0, 2, 1), dv.transpose(0, 2, 1), None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask: Optional[jax.Array] = None,
                    causal: bool = False,
                    scale: Optional[float] = None) -> jax.Array:
    """softmax(QKᵀ·scale + maskbias)V with O(L) memory.

    q: (B, H, Lq, Dh); k, v: (B, H, Lk, Dh); mask: (B, Lk) valid-key bool.
    Returns (B, H, Lq, Dh) f32. Lq padded to 128, Lk to 512 internally.
    """
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else 1.0 / np.sqrt(dh)

    lq_p = _round_up(lq, BLOCK_Q)
    lk_p = _round_up(lk, BLOCK_K)
    # bigger blocks when the padded lengths divide: 1.2-1.3x measured
    bq = 256 if lq_p % 256 == 0 else BLOCK_Q
    bk = 1024 if lk_p % 1024 == 0 else BLOCK_K
    dh_p = _round_up(dh, 8)  # Dh lives on sublanes in the (Dh, Lk) layout
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_p - lq), (0, dh_p - dh)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_p - lk), (0, dh_p - dh)))

    if mask is None:
        mask = jnp.ones((b, lk), bool)
    bias = jnp.where(jnp.pad(mask, ((0, 0), (0, lk_p - lk))), 0.0, NEG_INF)
    bias = jnp.broadcast_to(bias[:, None, None, :], (b, h, 1, lk_p))

    qf = qp.reshape(b * h, lq_p, dh_p).astype(jnp.float32)
    ktf = kp.reshape(b * h, lk_p, dh_p).transpose(0, 2, 1).astype(jnp.float32)
    vtf = vp.reshape(b * h, lk_p, dh_p).transpose(0, 2, 1).astype(jnp.float32)
    bf = bias.reshape(b * h, 1, lk_p).astype(jnp.float32)

    out = _flash(qf, ktf, vtf, bf, scale, causal, bq, bk)
    return out.reshape(b, h, lq_p, dh_p)[:, :, :lq, :dh]
