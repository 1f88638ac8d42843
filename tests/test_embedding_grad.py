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


class TestGroupedGather:
    """grouped_gather == jnp.take fwd and autodiff bwd, incl. shared-vocab
    columns and unused (gap) row ranges (seq vocabs sharing the table)."""

    def _check(self, groups, f, v, b=7, w=9, seed=0):
        import jax
        import jax.numpy as jnp
        from ml_function_tpu.ops.kernels.embedding_grad import grouped_gather
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        table = jax.random.normal(k1, (v, w), jnp.float32)
        # draw each column's ids inside its group's range
        cols_lo_hi = {}
        for lo, hi, cols in groups:
            for c in cols:
                cols_lo_hi[c] = (lo, hi)
        ids = jnp.stack(
            [jax.random.randint(jax.random.fold_in(k2, c), (b,),
                                cols_lo_hi[c][0], cols_lo_hi[c][1])
             for c in range(f)], axis=1)
        ct = jax.random.normal(k3, (b, f, w), jnp.float32)

        out = grouped_gather(table, ids, groups, 8)
        ref = jnp.take(table, ids.reshape(-1), axis=0).reshape(b, f, w)
        assert jnp.allclose(out, ref)

        g = jax.grad(lambda t: jnp.sum(grouped_gather(t, ids, groups, 8) * ct))(table)
        g_ref = jax.grad(
            lambda t: jnp.sum(jnp.take(t, ids.reshape(-1), axis=0).reshape(b, f, w) * ct))(table)
        assert jnp.allclose(g, g_ref, atol=1e-5)

    def test_per_column_groups(self):
        self._check(((0, 10, (0,)), (10, 25, (1,)), (25, 31, (2,))), f=3, v=31)

    def test_shared_vocab_and_gaps(self):
        # cols 0 and 2 share one vocab; rows 20-40 belong to no sparse column
        self._check(((0, 12, (0, 2)), (12, 20, (1,))), f=3, v=40)

    def test_feature_set_groups(self):
        from ml_function_tpu.features.schema import criteo_feature_set
        fs = criteo_feature_set([11, 13, 17], n_dense=2, embed_dim=4)
        groups = fs.sparse_groups()
        assert groups == ((0, 11, (0,)), (11, 24, (1,)), (24, 41, (2,)))
        self._check(groups, f=3, v=fs.total_vocab, w=4)

    def test_fused_embedding_routes_grouped(self):
        import jax
        import jax.numpy as jnp
        from ml_function_tpu.features.schema import criteo_feature_set
        from ml_function_tpu.ops.embedding import FusedEmbedding
        fs = criteo_feature_set([11, 13], n_dense=1, embed_dim=4)
        fe = FusedEmbedding(fs)
        params = fe.init(jax.random.PRNGKey(0))
        ids = jnp.asarray([[1, 5], [10, 0], [3, 12]], jnp.int32)
        cross, lin = fe.sparse_all(params, ids)
        gids = ids + jnp.asarray([0, 11])[None, :]
        ref = jnp.take(params["table"], gids.reshape(-1), axis=0).reshape(3, 2, 4)
        assert jnp.allclose(cross, ref)
        assert jnp.allclose(
            lin, jnp.take(params["linear"], gids.reshape(-1), axis=0).reshape(3, 2))
