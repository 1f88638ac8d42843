"""Fused Pallas (AU)GRU sequence kernel vs the lax.scan reference
(interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.recurrent import AUGRU, GRU


def _data(b=16, l=12, d=6, h=8, seed=0, ragged=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (b, l, d)).astype(np.float32))
    if ragged:
        lens = rng.integers(1, l + 1, b)
        mask = jnp.asarray(np.arange(l)[None, :] < lens[:, None])
    else:
        mask = jnp.ones((b, l), bool)
    att = jnp.asarray(rng.uniform(0, 1, (b, l)).astype(np.float32))
    return x, mask, att


@pytest.mark.parametrize("use_att", [False, True])
def test_gru_kernel_matches_scan(use_att):
    x, mask, att = _data()
    scan_cell = GRU(6, 8, kernel="scan")
    pall_cell = GRU(6, 8, kernel="pallas")
    params = scan_cell.init(jax.random.PRNGKey(0))
    kw = {"att_scores": att} if use_att else {}

    seq_s, last_s = scan_cell(params, x, mask, **kw)
    seq_p, last_p = pall_cell(params, x, mask, **kw)
    np.testing.assert_allclose(np.asarray(seq_p), np.asarray(seq_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(last_p), np.asarray(last_s),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_att", [False, True])
def test_gru_kernel_grads_exact_f32(use_att, monkeypatch):
    """With the bf16 cast disabled, the hand-written backward must match
    autodiff-through-scan to f32 precision — this pins the MATH; the bf16
    production path differs only by rounding composition (below)."""
    import ml_function_tpu.ops.kernels.gru as G
    import ml_function_tpu.ops.recurrent as R

    orig = G._mm
    monkeypatch.setattr(G, "_mm",
                        lambda x, w, dn, cast: orig(x, w, dn, False))
    monkeypatch.setattr(R, "bf16_matmul",
                        lambda x, w: jnp.einsum("...i,ij->...j", x, w))

    x, mask, att = _data(b=8, l=7, d=5, h=8, seed=1)
    scan_cell = GRU(5, 8, kernel="scan")
    pall_cell = GRU(5, 8, kernel="pallas")
    params = scan_cell.init(jax.random.PRNGKey(1))

    def loss(cell, params, x, att_in):
        kw = {"att_scores": att_in} if use_att else {}
        seq, last = cell(params, x, mask, **kw)
        return jnp.sum(jnp.sin(seq)) + jnp.sum(last * last)

    gs = jax.grad(lambda p, xx, aa: loss(scan_cell, p, xx, aa),
                  argnums=(0, 1, 2))(params, x, att)
    gp = jax.grad(lambda p, xx, aa: loss(pall_cell, p, xx, aa),
                  argnums=(0, 1, 2))(params, x, att)
    for a, b_ in zip(jax.tree_util.tree_leaves(gs),
                     jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("use_att", [False, True])
def test_gru_kernel_grads_match_scan_bf16(use_att):
    """Production (bf16 recurrent matmul) paths: AD-of-cast vs hand-written
    backward agree to bf16 rounding (~1% on isolated elements)."""
    x, mask, att = _data(b=8, l=7, d=5, h=8, seed=1)
    scan_cell = GRU(5, 8, kernel="scan")
    pall_cell = GRU(5, 8, kernel="pallas")
    params = scan_cell.init(jax.random.PRNGKey(1))

    def loss(cell, params, x, att_in):
        kw = {"att_scores": att_in} if use_att else {}
        seq, last = cell(params, x, mask, **kw)
        return jnp.sum(jnp.sin(seq)) + jnp.sum(last * last)

    gs = jax.grad(lambda p, xx, aa: loss(scan_cell, p, xx, aa),
                  argnums=(0, 1, 2))(params, x, att)
    gp = jax.grad(lambda p, xx, aa: loss(pall_cell, p, xx, aa),
                  argnums=(0, 1, 2))(params, x, att)
    for a, b_ in zip(jax.tree_util.tree_leaves(gs),
                     jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=4e-2, atol=1e-2)


def test_augru_kernel_matches_scan():
    x, mask, att = _data(b=8, l=9, d=4, h=8, seed=2)
    params = AUGRU(4, 8).init(jax.random.PRNGKey(2))
    seq_s, last_s = GRU(4, 8, kernel="scan")(params, x, mask, att_scores=att)
    seq_p, last_p = GRU(4, 8, kernel="pallas")(params, x, mask,
                                               att_scores=att)
    np.testing.assert_allclose(np.asarray(seq_p), np.asarray(seq_s),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(last_p), np.asarray(last_s),
                               rtol=2e-5, atol=2e-5)
