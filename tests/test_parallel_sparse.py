"""Sharded sparse-row optimizer (parallel/sparse.py): row-sharded tables +
O(ids) updates, equal to the single-device sparse step (which is itself
equal to dense optax — tests/test_sparse_optimizer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ml_function_tpu.features.synthetic import (make_behavior_data,
                                                make_criteo_like)
from ml_function_tpu.models import get_model
from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.sparse import (create_sparse_sharded_state,
                                             make_sparse_sharded_train_step)
from ml_function_tpu.parallel.train import shard_batch
from ml_function_tpu.train.loop import iter_batches
from ml_function_tpu.train.sparse import (RowAdagrad, RowAdam,
                                          create_sparse_train_state,
                                          make_sparse_train_step)


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh(data=4, model=2)


def _tree_allclose(a, b, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-5)


@pytest.mark.parametrize("row_opt,grad_exchange",
                         [(RowAdagrad(0.05), "a2a"),
                          (RowAdagrad(0.05), "allgather"),
                          (RowAdam(1e-2), "a2a")],
                         ids=["adagrad-a2a", "adagrad-allgather", "adam-a2a"])
def test_sharded_sparse_matches_single_device(mesh42, row_opt, grad_exchange):
    fs, data = make_criteo_like(n_rows=96, n_dense=2, n_sparse=4,
                                vocab_size=11, embed_dim=4, seed=0)
    model = get_model("deepfm", fs, hidden=(8,))
    dense_opt = optax.adam(5e-3)

    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     dense_opt, row_opt)
    step_s = make_sparse_train_step(model, dense_opt, row_opt, donate=False)

    ts_p = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                       dense_opt, row_opt, mesh42)
    # table + moments row-sharded over 'model'
    assert (ts_p.params["embedding"]["table"].sharding.spec
            == jax.sharding.PartitionSpec("model", None))
    for leaf in jax.tree_util.tree_leaves(ts_p.opt_state["rows"]):
        assert "model" in str(leaf.sharding.spec)
    step_p = make_sparse_sharded_train_step(model, dense_opt, row_opt,
                                            mesh42, donate=False,
                                            grad_exchange=grad_exchange)

    v = fs.total_vocab
    for b in list(iter_batches(data, 32))[:3]:
        ts_s, out_s = step_s(ts_s, b)
        ts_p, out_p = step_p(ts_p, shard_batch(b, mesh42))
        np.testing.assert_allclose(float(out_s["loss"]), float(out_p["loss"]),
                                   rtol=1e-5)
    for grp in ("table", "linear"):
        np.testing.assert_allclose(
            np.asarray(ts_p.params["embedding"][grp])[:v],
            np.asarray(ts_s.params["embedding"][grp]), rtol=1e-4, atol=1e-5)
    _tree_allclose({k: v for k, v in ts_s.params.items()
                    if k != "embedding"},
                   {k: v for k, v in ts_p.params.items()
                    if k != "embedding"})


def test_grad_a2a_equals_allgather_with_capacity_and_dupes(mesh42):
    """Owner-routed backward == allgather backward on a duplicate-heavy id
    stream (dedup-sum shares exchange slots), and a capacity at the exact
    per-bucket unique count stays lossless (VERDICT r3 next #1)."""
    fs, data = make_criteo_like(n_rows=64, n_dense=1, n_sparse=4,
                                vocab_size=5, embed_dim=4, seed=3)
    model = get_model("fm", fs)
    row_opt = RowAdagrad(0.05)
    dense_opt = optax.adam(5e-3)

    # tiny vocab (5/field) + B=32 → heavy duplication. Default per-peer
    # slice is S = (8 local rows × 4 fields)/2 peers = 16 slots; a bucket
    # can never hold more uniques than its shard's 10 rows, so capacity 10
    # (< S) must stay lossless — the dedup win the a2a capacity exists for.
    results = {}
    for gx, cap in (("allgather", None), ("a2a", None), ("a2a", 10)):
        ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                         dense_opt, row_opt, mesh42)
        step = make_sparse_sharded_train_step(
            model, dense_opt, row_opt, mesh42, donate=False,
            grad_exchange=gx, grad_capacity=cap)
        for b in list(iter_batches(data, 32))[:2]:
            ts, out = step(ts, shard_batch(b, mesh42))
        results[(gx, cap)] = jax.device_get(ts.params["embedding"])
    for key in [("a2a", None), ("a2a", 10)]:
        for grp in ("table", "linear"):
            np.testing.assert_allclose(
                np.asarray(results[key][grp]),
                np.asarray(results[("allgather", None)][grp]),
                rtol=1e-5, atol=1e-6, err_msg=str(key))


def test_sharded_sparse_seq_model_runs_and_learns(mesh42):
    fs, data = make_behavior_data(n_rows=512, n_items=30, n_cates=8,
                                  seq_len=8, vocab_size=13, embed_dim=4,
                                  seed=1)
    model = get_model("din", fs, hidden=(16, 8))
    row_opt = RowAdagrad(0.05)
    dense_opt = optax.adam(5e-3)
    ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0), dense_opt,
                                     row_opt, mesh42)
    step = make_sparse_sharded_train_step(model, dense_opt, row_opt, mesh42)
    losses = []
    for epoch in range(3):
        for b in iter_batches(data, 64, shuffle=True, seed=epoch):
            ts, out = step(ts, shard_batch(b, mesh42))
            losses.append(float(out["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


@pytest.mark.parametrize("name", ["ffm", "oenn"])
def test_sharded_sparse_supports_aux_table_models(mesh42, name):
    """Aux-table models on the SHARDED sparse path: since r5 the aux
    tables (FFM's (V, F·K) blocks, OENN's per-order tables) are padded +
    ROW-SHARDED like the fused table — per-device HBM ≈ 1/M — with the
    same collective gather and owner-routed a2a backward; multi-step
    equality vs the single-device sparse step (VERDICT r4 weak #2)."""
    fs, data = make_criteo_like(n_rows=96, n_dense=2, n_sparse=3,
                                vocab_size=9, embed_dim=4, seed=5)
    hp = {} if name == "ffm" else {"hidden": (8,)}
    model = get_model(name, fs, **hp)
    row_opt = RowAdagrad(0.05)
    dense_opt = optax.adam(5e-3)
    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     dense_opt, row_opt)
    step_s = make_sparse_train_step(model, dense_opt, row_opt, donate=False)
    ts_p = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                       dense_opt, row_opt, mesh42)
    step_p = make_sparse_sharded_train_step(model, dense_opt, row_opt,
                                            mesh42, donate=False)
    v = fs.total_vocab
    aux = [k for k, t in ts_s.params.items()
           if k != "embedding" and hasattr(t, "ndim") and t.ndim == 2
           and t.shape[0] == v]
    assert aux
    m = mesh42.shape["model"]
    vp = -(-v // m) * m
    for k in aux:
        # aux table + its row-optimizer moments are row-sharded over model
        assert ts_p.params[k].shape[0] == vp
        assert (ts_p.params[k].sharding.spec
                == jax.sharding.PartitionSpec("model", None)), k
        assert ts_p.params[k].addressable_shards[0].data.shape[0] == vp // m
        for leaf in jax.tree_util.tree_leaves(ts_p.opt_state["rows"][k]):
            assert "model" in str(leaf.sharding.spec), k
    for b in list(iter_batches(data, 32))[:2]:
        ts_s, out_s = step_s(ts_s, b)
        ts_p, out_p = step_p(ts_p, shard_batch(b, mesh42))
        np.testing.assert_allclose(float(out_s["loss"]),
                                   float(out_p["loss"]), rtol=1e-5)
    for k in aux:
        np.testing.assert_allclose(np.asarray(ts_p.params[k])[:v],
                                   np.asarray(ts_s.params[k]), rtol=1e-4,
                                   atol=1e-5)
    for grp in ts_s.params["embedding"]:
        np.testing.assert_allclose(
            np.asarray(ts_p.params["embedding"][grp])[:v],
            np.asarray(ts_s.params["embedding"][grp]), rtol=1e-4, atol=1e-5)


def test_sharded_sparse_with_bf16_compress(mesh42):
    """compress='bf16' reaches the collective gather on the sparse path
    (code-review r3: CLI silently dropped it)."""
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=4,
                                vocab_size=11, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    row_opt = RowAdagrad(0.05)
    ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                     optax.adam(5e-3), row_opt, mesh42)
    step = make_sparse_sharded_train_step(model, optax.adam(5e-3), row_opt,
                                          mesh42, donate=False,
                                          compress="bf16")
    ts_x = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                       optax.adam(5e-3), row_opt, mesh42)
    step_x = make_sparse_sharded_train_step(model, optax.adam(5e-3), row_opt,
                                            mesh42, donate=False)
    b = shard_batch(next(iter_batches(data, 32)), mesh42)
    _, out = step(ts, b)
    _, out_x = step_x(ts_x, b)
    # bf16 payload cast: close to the exact exchange, not equal
    np.testing.assert_allclose(float(out["loss"]), float(out_x["loss"]),
                               rtol=5e-2)
