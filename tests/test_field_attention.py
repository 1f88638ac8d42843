"""Field-attention kernel (ops/kernels/field_attention.py): numerics vs the
dense reference in interpret mode (the kernel is opt-in — PERF.md records
it TIES the default small-L XLA path, which is the finding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.kernels.field_attention import field_attention


def _ref(q, k, v, bias, scale):
    lg = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    lg = lg + bias[:, None, None, :]
    a = jax.nn.softmax(lg, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


@pytest.mark.parametrize("shape", [(37, 5, 7, 2, 4), (130, 27, 27, 2, 16),
                                   (64, 1, 9, 3, 8)])
def test_field_attention_matches_dense(shape):
    b, lq, lk, h, hd = shape
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, lq, h, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, lk, h, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, lk, h, hd)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, lk)) > 0.3).at[:, 0].set(True)
    bias = jnp.where(mask, 0.0, -1e9)
    scale = 1.0 / np.sqrt(hd)
    got = field_attention(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref(q, k, v, bias, scale)),
                               rtol=1e-5, atol=1e-6)

    def loss(f):
        return lambda q, k, v: jnp.sum(jnp.sin(f(q, k, v)))

    g1 = jax.grad(loss(lambda q, k, v: field_attention(q, k, v, bias,
                                                       scale)),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda q, k, v: _ref(q, k, v, bias, scale)),
                  argnums=(0, 1, 2))(q, k, v)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=1e-4, atol=1e-5)
