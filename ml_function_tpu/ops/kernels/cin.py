"""Fused CIN layer (Pallas, fwd + custom-vjp bwd).

The einsum CIN materializes the interaction tensor Z = xk ⊗ x0 of shape
(B, H·F, D) in HBM — ~7 GB per layer at the xDeepFM bench shape
(B=65536, H=128, F=26, D=8). This kernel never lets Z (or its cotangent)
leave VMEM. Measured on v5e (PERF.md): standalone CIN fwd+full-bwd
94.5 -> 62.6 ms, but END-TO-END the xDeepFM step is a wash at feasible
batches (147.5 vs 147.6 ms at B=64k — the einsum path's Z traffic
overlaps step phases XLA schedules around). The kernel's real win is
MEMORY: with no Z allocation, B=131072 trains at 435k ex/s where the
einsum path fails to compile — the same memory-cliff value proposition
as the sparse-row optimizer.

    y[b,o,d] = Σ_{h,f} W[h·F+f, o] · xk[b,h,d] · x0[b,f,d]

computed per (batch-tile, d) grid step as
    U = xk_d @ W1          (TB, F·O)   one MXU matmul, W1 = W as (H, F·O)
    y_d = Σ_f U[:, f, :] · x0_d[:, f, None]        (VPU reduce over F)

Layouts (the flash-attention lesson, flash_attention.py): all activations
travel TRANSPOSED as (D, B, ·) so the 8-wide D never sits on the 128-lane
axis — and a layer's (D, B, O) output IS the next layer's xk input, so the
whole multi-layer CIN does ONE transpose of the field embeddings at entry
and none after (the D-sum pooling consumes the transposed layout
directly).

Backward recomputes U per tile (flash-style) and accumulates dW across the
sequential grid into a revisited output block.

Used automatically by ``ops.interactions.CIN`` when shapes qualify
(O % 128 == 0, B % BLOCK_B == 0); exact-match tests vs the einsum path in
tests/test_cin_kernel.py (interpret mode on CPU)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_B = 256


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fwd_kernel(xk_ref, x0_ref, w_ref, y_ref):
    xk = xk_ref[...]                     # (TB, H) — None dims are squeezed
    x0 = x0_ref[...]                     # (TB, F)
    w = w_ref[...]                       # (H, F*O)
    f = x0.shape[1]
    u = jax.lax.dot_general(
        xk.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TB, F*O)
    u3 = u.reshape(u.shape[0], f, -1)                # (TB, F, O)
    y_ref[...] = jnp.sum(u3 * x0[:, :, None], axis=1)  # (TB, O)


def _bwd_kernel(xk_ref, x0_ref, w_ref, dy_ref, dxk_ref, dx0_ref, dw_ref):
    i = pl.program_id(0)
    d = pl.program_id(1)
    xk = xk_ref[...]                     # (TB, H)
    x0 = x0_ref[...]                     # (TB, F)
    dy = dy_ref[...]                     # (TB, O)
    w = w_ref[...]                       # (H, F*O)
    f = x0.shape[1]

    u = jax.lax.dot_general(             # recompute (flash-style)
        xk.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TB, F*O)
    u3 = u.reshape(u.shape[0], f, -1)                # (TB, F, O)
    dx0_ref[...] = jnp.sum(u3 * dy[:, None, :], axis=2)      # (TB, F)

    du3 = x0[:, :, None] * dy[:, None, :]            # (TB, F, O)
    du = du3.reshape(du3.shape[0], -1)               # (TB, F*O)
    dxk_ref[...] = jax.lax.dot_general(
        du.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TB, H)
    dwt = jax.lax.dot_general(                       # (H, F*O)
        xk.astype(jnp.bfloat16), du.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(i == 0, d == 0))
    def _init():
        dw_ref[...] = dwt

    @pl.when(jnp.logical_not(jnp.logical_and(i == 0, d == 0)))
    def _acc():
        dw_ref[...] = dw_ref[...] + dwt


def _fwd_call(xk_t, x0_t, w1):
    d, b, h = xk_t.shape
    f = x0_t.shape[2]
    fo = w1.shape[1]
    o = fo // f
    grid = (b // BLOCK_B, d)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, BLOCK_B, h), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((None, BLOCK_B, f), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((h, fo), lambda i, dd: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, BLOCK_B, o), lambda i, dd: (dd, i, 0)),
        out_shape=jax.ShapeDtypeStruct((d, b, o), jnp.float32),
        interpret=_interpret(),
    )(xk_t, x0_t, w1)


def _bwd_call(xk_t, x0_t, w1, dy_t):
    d, b, h = xk_t.shape
    f = x0_t.shape[2]
    fo = w1.shape[1]
    o = fo // f
    grid = (b // BLOCK_B, d)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, BLOCK_B, h), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((None, BLOCK_B, f), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((h, fo), lambda i, dd: (0, 0)),
            pl.BlockSpec((None, BLOCK_B, o), lambda i, dd: (dd, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, BLOCK_B, h), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((None, BLOCK_B, f), lambda i, dd: (dd, i, 0)),
            pl.BlockSpec((h, fo), lambda i, dd: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, b, h), jnp.float32),
            jax.ShapeDtypeStruct((d, b, f), jnp.float32),
            jax.ShapeDtypeStruct((h, fo), jnp.float32),
        ],
        interpret=_interpret(),
    )(xk_t, x0_t, w1, dy_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cin_layer_t(xk_t: jax.Array, x0_t: jax.Array, w1: jax.Array
                ) -> jax.Array:
    """One fused CIN layer on TRANSPOSED activations.

    xk_t (D, B, H), x0_t (D, B, F), w1 (H, F·O) → (D, B, O); w1 is the
    einsum path's (H·F, O) weight as ``W.reshape(H, F, O).reshape(H, F·O)``
    (same parameters, different view)."""
    return _fwd_call(xk_t, x0_t, w1)


def _vjp_fwd(xk_t, x0_t, w1):
    return _fwd_call(xk_t, x0_t, w1), (xk_t, x0_t, w1)


def _vjp_bwd(res, dy_t):
    xk_t, x0_t, w1 = res
    dxk, dx0, dw = _bwd_call(xk_t, x0_t, w1, dy_t)
    return dxk, dx0, dw


cin_layer_t.defvjp(_vjp_fwd, _vjp_bwd)


def supports(b: int, f: int, o: int, d: int) -> bool:
    """Shapes the kernel handles: batch tiles divide, O is a lane multiple
    (the in-kernel (TB, F·O) → (TB, F, O) split must keep lanes = O)."""
    return b % BLOCK_B == 0 and o % 128 == 0 and f >= 1 and d >= 1
