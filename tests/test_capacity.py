"""a2a capacity: planner-derived auto capacity + overflow observability
(VERDICT r3 weak #6 / next #7). A power-law id stream must get a capacity
BELOW the worst case N/M that is still lossless, and runtime drops must be
countable in step outputs instead of silently reading zero rows."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from ml_function_tpu.features.schema import criteo_feature_set
from ml_function_tpu.models import get_model
from ml_function_tpu.parallel.embedding import (ShardedLookup,
                                                pad_table_for_shards,
                                                rows_per_shard)
from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.planner import plan_capacity
from ml_function_tpu.parallel.train import (create_sharded_state,
                                            make_sharded_train_step,
                                            shard_batch)


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh(data=4, model=2)


def _zipf_ids(rng, vocab, size, a=1.5):
    """Power-law ids in [1, vocab) (0 = pad), truncated zipf."""
    ids = rng.zipf(a, size=size)
    return np.clip(ids, 1, vocab - 1).astype(np.int32)


def _freq_from_ids(ids_col, vocab):
    return np.bincount(ids_col.reshape(-1), minlength=vocab).astype(float)


def test_auto_capacity_power_law_lossless_below_worst_case(mesh42):
    n_fields, vocab, b = 4, 400, 512
    fs = criteo_feature_set([vocab] * n_fields, n_dense=0, embed_dim=4)
    rng = np.random.default_rng(0)
    ids = np.stack([_zipf_ids(rng, vocab, b) for _ in range(n_fields)],
                   axis=1)
    freq = {f"c{i}": _freq_from_ids(ids[:, i], vocab)
            for i in range(n_fields)}
    # map freq keys onto the actual vocab names
    names = [s.vocab for s in fs.sparse]
    freq = {nm: freq[f"c{i}"] for i, nm in enumerate(names)}

    per_device_ids = (b // 4) * n_fields          # flat ids per device
    s_worst = -(-per_device_ids // 2)             # N/M worst case
    cap = plan_capacity(fs, 2, per_device_ids, freq=freq)
    assert cap < s_worst, (cap, s_worst)          # the dedup win exists

    m = 2
    table = jax.random.normal(jax.random.PRNGKey(0),
                              (fs.total_vocab, 4))
    padded = pad_table_for_shards(table, m)
    sl = ShardedLookup(mesh42, fs, mode="a2a", capacity=cap)
    got = np.asarray(sl.sparse(padded, jnp.asarray(ids)))
    offs = np.asarray(fs.sparse_offsets())
    want = np.asarray(table)[ids + offs[None, :]]
    np.testing.assert_allclose(got, want, rtol=1e-6)  # lossless

    gids = jnp.asarray(ids + offs[None, :])
    assert int(sl.overflow_count(gids)) == 0


def test_overflow_counter_counts_drops(mesh42):
    """A deliberately tiny capacity drops uniques — the counter must see
    them, and exactly the dropped ids must read as zero rows."""
    n_fields, vocab, b = 2, 64, 64
    fs = criteo_feature_set([vocab] * n_fields, n_dense=0, embed_dim=4)
    rng = np.random.default_rng(1)
    # near-unique ids -> every bucket overflows at cap=2
    ids = rng.permutation(np.arange(1, vocab))[: b // 2]
    ids = np.stack([np.resize(ids, b), np.resize(ids[::-1], b)], axis=1)
    ids = ids.astype(np.int32)
    offs = np.asarray(fs.sparse_offsets())

    sl_tiny = ShardedLookup(mesh42, fs, mode="a2a", capacity=2)
    n_drop = int(sl_tiny.overflow_count(jnp.asarray(ids + offs[None, :])))
    assert n_drop > 0

    table = jax.random.normal(jax.random.PRNGKey(0), (fs.total_vocab, 4))
    padded = pad_table_for_shards(table, 2)
    got = np.asarray(sl_tiny.sparse(padded, jnp.asarray(ids)))
    want = np.asarray(table)[ids + offs[None, :]]
    zero_rows = int((np.abs(got).sum(-1) == 0).sum())
    assert zero_rows > 0  # the drops ARE the zero rows
    # full capacity: no drops, exact
    sl_full = ShardedLookup(mesh42, fs, mode="a2a")
    assert int(sl_full.overflow_count(jnp.asarray(ids + offs[None, :]))) == 0
    np.testing.assert_allclose(
        np.asarray(sl_full.sparse(padded, jnp.asarray(ids))), want,
        rtol=1e-6)


def test_train_step_surfaces_overflow(mesh42):
    fs = criteo_feature_set([50] * 3, n_dense=2, embed_dim=4)
    model = get_model("fm", fs)
    opt = optax.adam(1e-3)
    ts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh42)
    step = make_sharded_train_step(model, opt, mesh42, donate=False,
                                   exchange="a2a", capacity=3)
    b = 64
    rng = np.random.default_rng(2)
    batch = {"dense": rng.uniform(size=(b, 2)).astype(np.float32),
             "sparse": rng.integers(1, 50, (b, 3)).astype(np.int32),
             "label": rng.integers(0, 2, b).astype(np.float32),
             "weight": np.ones(b, np.float32)}
    _, out = step(ts, shard_batch(batch, mesh42))
    assert "a2a_overflow" in out
    assert int(out["a2a_overflow"]) >= 0
    # no capacity -> no counter in outputs
    step2 = make_sharded_train_step(model, opt, mesh42, donate=False,
                                    exchange="a2a")
    _, out2 = step2(ts, shard_batch(batch, mesh42))
    assert "a2a_overflow" not in out2


def test_cli_auto_capacity_runs():
    from ml_function_tpu.train.cli import main
    res = main([
        "--config.model.name=fm", "--config.data.n_rows=256",
        "--config.data.vocab_size=40", "--config.train.batch_size=64",
        "--config.train.log_every=0", "--config.mesh.model=2",
        "--config.mesh.exchange=a2a", "--config.mesh.capacity=auto",
    ])
    assert np.isfinite(res["train"]["logloss"])


def test_cli_grad_capacity_auto_runs():
    """Sparse path with owner-routed backward + auto grad capacity."""
    from ml_function_tpu.train.cli import main
    res = main([
        "--config.model.name=fm", "--config.data.n_rows=256",
        "--config.data.vocab_size=40", "--config.train.batch_size=64",
        "--config.train.log_every=0", "--config.mesh.model=2",
        "--config.train.row_optimizer=adagrad",
        "--config.mesh.grad_exchange=a2a",
        "--config.mesh.grad_capacity=auto",
    ])
    assert np.isfinite(res["train"]["logloss"])


def test_sparse_grad_capacity_overflow_counter(mesh42):
    """The backward's capacity drops surface as grad_a2a_overflow: 0 at the
    lossless-capacity setting, >0 at a deliberately tiny one (dropping
    gradient rows silently would be the worst failure mode)."""
    import optax as _ox

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.parallel.sparse import (
        create_sparse_sharded_state, make_sparse_sharded_train_step)
    from ml_function_tpu.train.sparse import RowAdagrad

    from ml_function_tpu.train.loop import iter_batches

    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=4,
                                vocab_size=40, embed_dim=4, seed=7)
    model = get_model("fm", fs)
    b = shard_batch(next(iter_batches(data, 64)), mesh42)
    for cap, expect_drops in ((64, False), (2, True)):
        ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0),
                                         _ox.adam(1e-3), RowAdagrad(0.05),
                                         mesh42)
        step = make_sparse_sharded_train_step(
            model, _ox.adam(1e-3), RowAdagrad(0.05), mesh42, donate=False,
            grad_exchange="a2a", grad_capacity=cap)
        _, out = step(ts, b)
        n = int(out["grad_a2a_overflow"])
        assert (n > 0) == expect_drops, (cap, n)
