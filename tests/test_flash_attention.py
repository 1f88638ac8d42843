"""Flash attention kernel vs jnp reference: forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.kernels.flash_attention import flash_attention

NEG_INF = -1e9


def reference_attention(q, k, v, mask=None, causal=False, scale=None):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    scale = scale if scale is not None else 1.0 / np.sqrt(dh)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if mask is not None:
        s = s + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
    if causal:
        cm = jnp.tril(jnp.ones((lq, lk), bool))
        s = jnp.where(cm[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("lq,lk,dh,causal", [
    (64, 96, 16, False), (128, 128, 16, True), (100, 200, 8, False),
])
def test_flash_forward_matches(lq, lk, dh, causal):
    rng = np.random.default_rng(0)
    b, h = 2, 2
    q = jnp.asarray(rng.normal(size=(b, h, lq, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, lk)) > 0.2)
    mask = mask.at[:, 0].set(True)
    got = flash_attention(q, k, v, mask, causal=causal)
    want = reference_attention(q, k, v, mask, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_flash_gradients_match():
    rng = np.random.default_rng(1)
    b, h, lq, lk, dh = 1, 2, 64, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, lq, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, lk)) > 0.3)
    mask = mask.at[:, 0].set(True)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, mask)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(reference_attention(q, k, v, mask)))

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_flash_causal_gradients():
    rng = np.random.default_rng(2)
    b, h, l, dh = 1, 1, 128, 8
    q = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, l, dh)), jnp.float32)

    def lf(q):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    def lr(q):
        return jnp.sum(reference_attention(q, k, v, causal=True) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(lf)(q)),
                               np.asarray(jax.grad(lr)(q)),
                               rtol=2e-3, atol=2e-3)
