"""Sequence-parallel attention (dist + ring) vs dense reference on the
8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.seq_parallel import make_seq_parallel_attention

NEG_INF = -1e9


def dense_reference(q, k, v, mask):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    s = s + jnp.where(mask, 0.0, NEG_INF)[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.fixture(scope="module")
def qkvm():
    rng = np.random.default_rng(0)
    b, h, lq, lk, dh = 2, 2, 4, 64, 8
    q = jnp.asarray(rng.normal(size=(b, h, lq, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, lk, dh)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(b, lk)) > 0.3).at[:, 0].set(True)
    return q, k, v, mask


@pytest.mark.parametrize("mode", ["dist", "ring"])
def test_seq_parallel_matches_dense(qkvm, mode):
    q, k, v, mask = qkvm
    mesh = make_mesh(data=1, model=8)
    attn = make_seq_parallel_attention(mesh, "model", mode=mode)
    got = attn(q, k, v, mask)
    want = dense_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["dist", "ring"])
def test_seq_parallel_grads(qkvm, mode):
    q, k, v, mask = qkvm
    mesh = make_mesh(data=1, model=8)
    attn = make_seq_parallel_attention(mesh, "model", mode=mode)

    g1 = jax.grad(lambda q: jnp.sum(jnp.sin(attn(q, k, v, mask))))(q)
    g2 = jax.grad(lambda q: jnp.sum(jnp.sin(dense_reference(q, k, v, mask))))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)


def test_seq_parallel_fully_masked_shard(qkvm):
    """A shard whose keys are ALL padding must not produce NaNs."""
    q, k, v, _ = qkvm
    mask = jnp.zeros((q.shape[0], k.shape[2]), bool).at[:, :8].set(True)
    mesh = make_mesh(data=1, model=8)
    for mode in ("dist", "ring"):
        attn = make_seq_parallel_attention(mesh, "model", mode=mode)
        out = attn(q, k, v, mask)
        assert np.isfinite(np.asarray(out)).all()
        want = dense_reference(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
