"""Fused (AU)GRU sequence kernel: the whole recurrence in ONE Pallas call.

The reference reaches GRU speed through cuDNN's fused kernels
(``kon/model/ctr_model/layer/behavior_layer/rnn_demo.py:596`` dispatches to
``gen_cudnn_rnn_ops``); SURVEY §2.5 calls for the TPU equivalent. The
``lax.scan`` cells in ``ops/recurrent.py`` are correct but pay per-iteration
loop overhead (~6 µs/step measured on v5e at CTR sizes — the recurrent
matmul itself is tiny at H ≤ 64); this kernel runs the full time loop in
VMEM: weights, hidden state, and the hoisted input projections stay
resident, one grid step per batch tile.

Layout: channels on SUBLANES, batch on LANES — tensors enter as
(L, 3H, TB) / (H, TB). CTR hidden sizes (H = 8..64) would pad to 128 lanes
in the natural (TB, H) layout and blow VMEM 3-8× (measured: 64.5 MB scoped
for a (64, 2048, 48) fwd block); transposed, blocks are padding-free and a
(L=64, B=2048, H=16) DIEN layer fits comfortably.

Forward emits the full hidden sequence (padded steps carry h through, same
right-padding semantics as the scan path). Backward is a second kernel that
replays the recurrence in reverse from the saved sequence (gates are
recomputed — cheaper than storing them) and accumulates dxw, dwh, datt, dh0.
The backward MATH is pinned against autodiff-of-scan in f32
(tests/test_gru_kernel.py).

AUGRU (DIEN's attention-gated update, the gate the reference left disabled,
rnn_demo.py:569-574) is the same kernel with ``att`` wired: ũ = a·u.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _sig(x):
    return jax.nn.sigmoid(x)


def _mm(a, b, dn, cast_bf16):
    """Matmul with f32 accumulate. On TPU hardware DEFAULT precision is one
    bf16×bf16 MXU pass — arithmetic-equivalent to the scan path's
    bf16_matmul (ops/base.py; Mosaic rejects explicit bf16 operands here);
    interpret mode (CPU tests) applies the cast explicitly so both paths
    round identically."""
    if cast_bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dn,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(xw_ref, wh_ref, m_ref, a_ref, h0_ref, seq_ref, *, cast_bf16):
    l, h3, tb = xw_ref.shape
    h = h3 // 3
    wh = wh_ref[:, :]                        # (H, 3H)

    def body(t, carry):                      # carry: (H, TB)
        xw_t = xw_ref[t]                     # (3H, TB)
        # hhᵀ (3H, TB) = whᵀ (3H, H) @ h (H, TB)
        hh = _mm(wh, carry, (((0,), (0,)), ((), ())), cast_bf16)
        u = _sig(xw_t[:h] + hh[:h])
        r = _sig(xw_t[h:2 * h] + hh[h:2 * h])
        n = jnp.tanh(xw_t[2 * h:] + r * hh[2 * h:])
        u = a_ref[t][None, :] * u            # AUGRU gate (a≡1 for plain GRU)
        h_new = (1.0 - u) * carry + u * n
        m = m_ref[t][None, :]
        h_out = m * h_new + (1.0 - m) * carry
        seq_ref[t] = h_out
        return h_out

    jax.lax.fori_loop(0, l, body, h0_ref[:, :])


def _bwd_kernel(xw_ref, wh_ref, m_ref, a_ref, h0_ref, seq_ref, dseq_ref,
                dxw_ref, dwh_ref, da_ref, dh0_ref, *, cast_bf16):
    l, h3, tb = xw_ref.shape
    h = h3 // 3
    wh = wh_ref[:, :]
    dwh_ref[0, :, :] = jnp.zeros((h, h3), jnp.float32)

    def body(i, dh):                         # dh: (H, TB) carry cotangent
        t = l - 1 - i
        hp = seq_ref[jnp.maximum(t - 1, 0)]
        h_prev = jnp.where(t == 0, h0_ref[:, :], hp)
        xw_t = xw_ref[t]
        a_t = a_ref[t][None, :]
        m = m_ref[t][None, :]
        hh = _mm(wh, h_prev, (((0,), (0,)), ((), ())), cast_bf16)
        u0 = _sig(xw_t[:h] + hh[:h])         # pre-attention gate
        r = _sig(xw_t[h:2 * h] + hh[h:2 * h])
        n = jnp.tanh(xw_t[2 * h:] + r * hh[2 * h:])
        u = a_t * u0

        dh_t = dh + dseq_ref[t]
        dh_new = dh_t * m
        dh_prev = dh_t * (1.0 - m)
        du = dh_new * (n - h_prev)
        dn = dh_new * u
        dh_prev += dh_new * (1.0 - u)
        da_ref[t] = jnp.sum(du * u0, axis=0)
        du0 = du * a_t
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hh[2 * h:]
        dhn = dn_pre * r
        du_pre = du0 * u0 * (1.0 - u0)
        dr_pre = dr * r * (1.0 - r)
        dgates = jnp.concatenate([du_pre, dr_pre, dn_pre], axis=0)  # (3H,TB)
        dxw_ref[t] = dgates
        # dh_prev (H,TB) += wh (H,3H) @ dhh (3H,TB); dhh's n-block is dhn
        dhh = jnp.concatenate([du_pre, dr_pre, dhn], axis=0)
        dh_prev += _mm(wh, dhh, (((1,), (0,)), ((), ())), cast_bf16)
        # dwh (H,3H) += h_prev (H,TB) @ dhhᵀ (TB,3H)
        dwh_ref[0, :, :] += _mm(h_prev, dhh, (((1,), (1,)), ((), ())),
                                cast_bf16)
        return dh_prev

    dh0_ref[:, :] = jax.lax.fori_loop(0, l, body,
                                      jnp.zeros((h, tb), jnp.float32))


def _tile(b: int, cap: int = 128) -> int:
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if tb <= cap and b % tb == 0:
            return tb
    return b


@jax.custom_vjp
def gru_sequence(xw: jax.Array, wh: jax.Array, mask: jax.Array,
                 att: jax.Array, h0: jax.Array) -> jax.Array:
    """(L, B, 3H) hoisted projections + (H, 3H) recurrent weights +
    (L, B) mask + (L, B) attention gates + (B, H) init → (L, B, H) hiddens.
    Pass ``att = ones`` for a plain GRU."""
    seq, _ = _gru_fwd_impl(xw, wh, mask, att, h0)
    return seq


def _pallas_fwd(xw_t, wh, mask, att, h0_t, interpret):
    l, h3, b = xw_t.shape
    h = h3 // 3
    # VMEM budget: fwd blocks are ~(l*h3*tb + l*h*tb)*4B double-buffered
    cap = max(min(16 * 2**20 // (l * (h3 + h) * 4 * 2 + 1) // 64 * 64, 512), 8)
    tb = _tile(b, cap)
    nb = b // tb
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cast_bf16=interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((l, h3, tb), lambda i: (0, 0, i)),
            pl.BlockSpec((h, h3), lambda i: (0, 0)),
            pl.BlockSpec((l, tb), lambda i: (0, i)),
            pl.BlockSpec((l, tb), lambda i: (0, i)),
            pl.BlockSpec((h, tb), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((l, h, tb), lambda i: (0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((l, h, b), jnp.float32),
        interpret=interpret,
    )(xw_t, wh, mask, att, h0_t)


def _gru_fwd_impl(xw, wh, mask, att, h0):
    interpret = jax.default_backend() == "cpu"
    mask = mask.astype(jnp.float32)
    att = att.astype(jnp.float32)
    xw_t = jnp.transpose(xw.astype(jnp.float32), (0, 2, 1))   # (L, 3H, B)
    h0_t = jnp.transpose(h0.astype(jnp.float32), (1, 0))      # (H, B)
    seq_t = _pallas_fwd(xw_t, wh.astype(jnp.float32), mask, att, h0_t,
                        interpret)
    seq = jnp.transpose(seq_t, (0, 2, 1))                     # (L, B, H)
    return seq, (xw_t, wh, mask, att, h0_t, seq_t)


def _gru_bwd_impl(res, dseq):
    xw_t, wh, mask, att, h0_t, seq_t = res
    l, h3, b = xw_t.shape
    h = h3 // 3
    tb = _tile(b)
    nb = b // tb
    interpret = jax.default_backend() == "cpu"
    dseq_t = jnp.transpose(dseq.astype(jnp.float32), (0, 2, 1))
    dxw_t, dwh, da, dh0_t = pl.pallas_call(
        functools.partial(_bwd_kernel, cast_bf16=interpret),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((l, h3, tb), lambda i: (0, 0, i)),
            pl.BlockSpec((h, h3), lambda i: (0, 0)),
            pl.BlockSpec((l, tb), lambda i: (0, i)),
            pl.BlockSpec((l, tb), lambda i: (0, i)),
            pl.BlockSpec((h, tb), lambda i: (0, i)),
            pl.BlockSpec((l, h, tb), lambda i: (0, 0, i)),
            pl.BlockSpec((l, h, tb), lambda i: (0, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((l, h3, tb), lambda i: (0, 0, i)),
            pl.BlockSpec((1, h, h3), lambda i: (i, 0, 0)),
            pl.BlockSpec((l, tb), lambda i: (0, i)),
            pl.BlockSpec((h, tb), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((l, h3, b), jnp.float32),
            jax.ShapeDtypeStruct((nb, h, h3), jnp.float32),
            jax.ShapeDtypeStruct((l, b), jnp.float32),
            jax.ShapeDtypeStruct((h, b), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, wh.astype(jnp.float32), mask, att, h0_t, seq_t, dseq_t)
    return (jnp.transpose(dxw_t, (0, 2, 1)), jnp.sum(dwh, axis=0),
            jnp.zeros_like(mask), da, jnp.transpose(dh0_t, (1, 0)))


def _gru_fwd_vjp(xw, wh, mask, att, h0):
    return _gru_fwd_impl(xw, wh, mask, att, h0)


gru_sequence.defvjp(_gru_fwd_vjp, _gru_bwd_impl)
