"""The scatter-free embedding backward (sort + segmented combine + Pallas
merge-scatter) must match XLA's scatter-add exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.kernels.embedding_grad import (
    _combine_sorted_duplicates, dense_grad_from_updates, fused_gather)


def test_combine_sorted_duplicates():
    ids = jnp.asarray([1, 1, 1, 4, 4, 7], jnp.int32)
    ct = jnp.asarray([[1.], [2.], [3.], [10.], [20.], [5.]])
    u_ids, u_ct = _combine_sorted_duplicates(ids, ct, sentinel=99)
    u_ids, u_ct = np.asarray(u_ids), np.asarray(u_ct)
    # tails hold run totals
    assert u_ids[2] == 1 and u_ct[2, 0] == 6.0
    assert u_ids[4] == 4 and u_ct[4, 0] == 30.0
    assert u_ids[5] == 7 and u_ct[5, 0] == 5.0
    # non-tails masked
    assert (u_ids[[0, 1, 3]] == 99).all()
    assert (u_ct[[0, 1, 3]] == 0).all()


@pytest.mark.parametrize("v,n,d", [(1000, 4096, 8), (530, 256, 4),
                                   (100, 2000, 16), (5000, 64, 8)])
def test_dense_grad_matches_scatter(v, n, d):
    rng = np.random.default_rng(v + n)
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)
    ct = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    want = np.asarray(jnp.zeros((v, d)).at[ids].add(ct))
    got = np.asarray(dense_grad_from_updates(ids, ct, v))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dense_grad_hot_row():
    """One extremely hot id (the power-law case the combine must handle)."""
    v, n, d = 64, 3000, 8
    ids = jnp.asarray(np.full(n, 7), jnp.int32)
    ct = jnp.ones((n, d), jnp.float32)
    got = np.asarray(dense_grad_from_updates(ids, ct, v))
    assert got[7, 0] == pytest.approx(n, rel=1e-6)
    assert np.abs(got).sum() == pytest.approx(n * d, rel=1e-6)


def test_fused_gather_fwd_and_grad():
    v, n, d = 200, 512, 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, v, n), jnp.int32)

    out = fused_gather(table, ids)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(table)[np.asarray(ids)])

    def loss_fused(t):
        return jnp.sum(jnp.sin(fused_gather(t, ids)))

    def loss_plain(t):
        return jnp.sum(jnp.sin(jnp.take(t, ids, axis=0)))

    g1 = np.asarray(jax.grad(loss_fused)(table))
    g2 = np.asarray(jax.grad(loss_plain)(table))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)


def test_split_table_init_and_pre_weight():
    """Split-column storage: (V, D) cross + (V, 1) linear; pre_weight lands
    on the cross columns of the right vocab block."""
    import numpy as np

    from ml_function_tpu.features.schema import FeatureSet, SparseSpec
    from ml_function_tpu.ops.embedding import FusedEmbedding

    fs = FeatureSet(dense=(), sparse=(
        SparseSpec("a", vocab_size=5, dim=4),
        SparseSpec("b", vocab_size=7, dim=4)))
    fe = FusedEmbedding(fs)
    w = np.arange(7 * 4, dtype=np.float32).reshape(7, 4)
    params = fe.init(jax.random.PRNGKey(0), pre_weight={"b": w})
    assert params["table"].shape == (12, 4)
    assert params["linear"].shape == (12, 1)
    np.testing.assert_allclose(np.asarray(params["table"][5:12]), w)

    ids = jnp.asarray([[0, 2]])  # b's id 2 -> global row 7
    emb, lin = fe.sparse_all(params, ids)
    np.testing.assert_allclose(np.asarray(emb[0, 1]), w[2])
    assert lin.shape == (1, 2)
    # linear-only lookup matches the joint one
    lin2 = fe.sparse_linear(params, ids)
    np.testing.assert_allclose(np.asarray(lin2), np.asarray(lin))
