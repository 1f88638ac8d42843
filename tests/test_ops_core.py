"""Numeric unit tests for core/interaction ops against reference formulas
(brute-force NumPy implementations of the math in
``kon/model/ctr_model/layer/interactive_layer/interactive_layer.py``)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.core import MLP, Activation, Dense, LayerNorm
from ml_function_tpu.ops.interactions import (CIN, AFMAttention, CrossNet,
                                              fm_interaction,
                                              fm_interaction_vector,
                                              pairwise_inner_products,
                                              pairwise_products)


def test_dense_shapes(rng):
    d = Dense(8, 4)
    p = d.init(rng)
    x = jnp.ones((3, 8))
    assert d(p, x).shape == (3, 4)


def test_mlp_residual_runs(rng):
    mlp = MLP(16, (32, 32, 8), activation="prelu", res_every=2, norm="layer",
              out_dim=1)
    p = mlp.init(rng)
    y, _ = mlp(p, jnp.ones((5, 16)))
    assert y.shape == (5, 1)


def test_fm_interaction_matches_pairwise_sum(rng):
    """FM sum-of-squares identity == Σ_{i<j} <e_i, e_j> (reference InnerLayer
    + Add, interactive_layer.py:34-66)."""
    e = jax.random.normal(rng, (4, 6, 8))
    got = fm_interaction(e)
    e_np = np.asarray(e)
    want = np.zeros(4)
    for i, j in itertools.combinations(range(6), 2):
        want += (e_np[:, i] * e_np[:, j]).sum(-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bi_interaction_vector(rng):
    e = jax.random.normal(rng, (3, 5, 4))
    got = np.asarray(fm_interaction_vector(e))
    e_np = np.asarray(e)
    want = np.zeros((3, 4))
    for i, j in itertools.combinations(range(5), 2):
        want += e_np[:, i] * e_np[:, j]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_products_count(rng):
    e = jax.random.normal(rng, (2, 7, 3))
    pp = pairwise_products(e)
    assert pp.shape == (2, 21, 3)
    ip = pairwise_inner_products(e)
    np.testing.assert_allclose(np.asarray(ip), np.asarray(pp).sum(-1),
                               rtol=1e-4, atol=1e-4)


def test_crossnet_recursion(rng):
    """x_{k+1} = x0*(x_k·w) + b + x_k (reference CrossLayer,
    interactive_layer.py:250-282)."""
    cn = CrossNet(6, depth=2)
    p = cn.init(rng)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (3, 6))
    got = np.asarray(cn(p, x0))
    x = np.asarray(x0)
    x0n = np.asarray(x0)
    for i in range(2):
        w = np.asarray(p[f"layer{i}"]["w"])
        b = np.asarray(p[f"layer{i}"]["b"])
        x = x0n * (x @ w) + b + x
    np.testing.assert_allclose(got, x, rtol=2e-2, atol=2e-2)  # bf16 matmul


def test_cin_matches_naive(rng):
    """CIN einsum == naive outer-product + compression (reference CIN,
    interactive_layer.py:285-327)."""
    cin = CIN(n_fields=4, dim=3, hidden=(5,), out_logit=False)
    p = cin.init(rng)
    e = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 3))
    got = np.asarray(cin.features(p, e))
    e_np = np.asarray(e, np.float32)
    w = np.asarray(p["w0"]).reshape(4, 4, 5)  # (H0=F, F, H1)
    z = np.einsum("bhd,bfd->bhfd", e_np, e_np)
    nxt = np.einsum("bhfd,hfo->bod", z, w)
    want = nxt.sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_afm_attention_shapes(rng):
    attn = AFMAttention(8, 4)
    p = attn.init(rng)
    pp = jax.random.normal(rng, (3, 10, 8))
    out = attn(p, pp)
    assert out.shape == (3,)


def test_layernorm(rng):
    ln = LayerNorm(16)
    p = ln.init(rng)
    x = jax.random.normal(rng, (4, 16)) * 3 + 1
    y = np.asarray(ln(p, x))
    np.testing.assert_allclose(y.mean(-1), 0, atol=1e-4)
    np.testing.assert_allclose(y.std(-1), 1, atol=1e-2)


@pytest.mark.parametrize("kind", ["relu", "prelu", "dice", "sigmoid", "tanh"])
def test_activations(rng, kind):
    act = Activation(kind, 8)
    p = act.init(rng)
    x = jax.random.normal(rng, (3, 8))
    assert act(p, x).shape == (3, 8)
