"""Sharded embedding store + multi-chip train step on the 8-device virtual
CPU mesh (multi-host semantics per SURVEY §4's 'multihost sim' mandate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.synthetic import make_criteo_like
from ml_function_tpu.models import get_model
from ml_function_tpu.ops.embedding import FusedEmbedding
from ml_function_tpu.parallel.context import sharded_embeddings
from ml_function_tpu.parallel.embedding import (ShardedLookup,
                                               pad_table_for_shards)
from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.train import (create_sharded_state,
                                            make_sharded_train_step,
                                            param_spec_tree, shard_batch)
from ml_function_tpu.train.loop import iter_batches

import optax


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh(data=4, model=2)


def test_sharded_lookup_matches_dense(mesh42):
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=5,
                                vocab_size=13, embed_dim=4)
    fe = FusedEmbedding(fs)
    params = fe.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(data["sparse"][:16])

    want = fe.sparse(params, ids)  # dense path (cross columns)

    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs)
    got = sl.sparse(table, ids)[..., :fs.embed_dim]  # merged table: slice cross
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_sharded_lookup_grads_match(mesh42):
    fs, data = make_criteo_like(n_rows=32, n_dense=0, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(data["sparse"][:16])

    def dense_loss(table):
        return jnp.sum(jnp.sin(fe.sparse({"table": table}, ids)))

    g_dense = jax.grad(dense_loss)(params["table"])

    sl = ShardedLookup(mesh42, fs)
    table_p = pad_table_for_shards(params["table"], 2)

    def shard_loss(table):
        return jnp.sum(jnp.sin(sl.sparse(table, ids)))

    g_shard = jax.grad(shard_loss)(table_p)[:params["table"].shape[0]]
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-5)


def test_param_spec_tree_marks_tables():
    fs, _ = make_criteo_like(n_rows=8, n_sparse=3, vocab_size=7, embed_dim=4)
    model = get_model("deepfm", fs, hidden=(8,))
    params, _ = model.init(jax.random.PRNGKey(0))
    specs = param_spec_tree(params)
    assert specs["embedding"]["table"] == jax.sharding.PartitionSpec("model", None)
    assert specs["mlp"]["layer0"]["dense"]["w"] == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs_and_learns(mesh42):
    fs, data = make_criteo_like(n_rows=1024, n_dense=2, n_sparse=5,
                                vocab_size=13, embed_dim=4, seed=5)
    model = get_model("deepfm", fs, hidden=(16, 8))
    opt = optax.adam(5e-3)
    sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh42)
    step = make_sharded_train_step(model, opt, mesh42)

    # table params are actually sharded over the model axis
    sh = sts.params["embedding"]["table"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("model", None)

    losses = []
    for epoch in range(3):
        for batch in iter_batches(data, 64, shuffle=True, seed=epoch):
            sts, out = step(sts, shard_batch(batch, mesh42))
            losses.append(float(out["loss"]))
    # it trains (loss decreases front → back)
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_lr_linear_table_row_shards(mesh42):
    """ADVICE r2 repro: LR's (V, 1) table must be padded + row-sharded like
    every other embedding table (total_vocab=33 does not divide the 2-way
    model axis without padding) and match the single-device step."""
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=3,
                                vocab_size=11, embed_dim=4, seed=9)
    assert fs.total_vocab == 33  # odd on purpose
    model = get_model("lr", fs)
    opt = optax.sgd(0.1)
    batch = next(iter_batches(data, 32))

    from ml_function_tpu.train.loop import create_train_state, make_train_step
    ts = create_train_state(model, jax.random.PRNGKey(3), opt)
    ts1, out1 = make_train_step(model, opt, donate=False)(ts, batch)

    sts = create_sharded_state(model, jax.random.PRNGKey(3), opt, mesh42)
    sh = sts.params["embedding"]["linear"].sharding
    assert sh.spec == jax.sharding.PartitionSpec("model", None)
    assert sts.params["embedding"]["linear"].shape[0] % 2 == 0  # padded
    sstep = make_sharded_train_step(model, opt, mesh42, donate=False)
    sts1, out2 = sstep(sts, shard_batch(batch, mesh42))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    v = np.asarray(sts1.params["embedding"]["linear"])[:33]
    np.testing.assert_allclose(
        v, np.asarray(ts1.params["embedding"]["linear"]), rtol=1e-4,
        atol=1e-6)


def test_sharded_matches_single_device_step():
    """One sharded step == one single-device step (same params, same batch)."""
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=4,
                                vocab_size=9, embed_dim=4, seed=7)
    model = get_model("fm", fs)
    opt = optax.sgd(0.1)
    batch = next(iter_batches(data, 32))

    from ml_function_tpu.train.loop import create_train_state, make_train_step
    ts = create_train_state(model, jax.random.PRNGKey(3), opt)
    step = make_train_step(model, opt, donate=False)
    ts1, out1 = step(ts, batch)

    mesh = make_mesh(data=2, model=4)
    sts = create_sharded_state(model, jax.random.PRNGKey(3), opt, mesh)
    sstep = make_sharded_train_step(model, opt, mesh, donate=False)
    sts1, out2 = sstep(sts, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    v = sts1.params["embedding"]["table"][:ts1.params["embedding"]["table"].shape[0]]
    np.testing.assert_allclose(np.asarray(v),
                               np.asarray(ts1.params["embedding"]["table"]),
                               rtol=1e-4, atol=1e-5)


def test_sharded_training_run_matches_single_device():
    """30 train steps + eval: sharded (2x4 mesh) and single-device runs from
    one seed produce the same AUC/logloss — the 'AUC parity within run
    variance' requirement, shown as exact-equality on the virtual mesh."""
    from ml_function_tpu.train.loop import create_train_state, make_train_step
    from ml_function_tpu.train.metrics import init_metrics, metrics_summary, update_metrics

    fs, data = make_criteo_like(n_rows=2048, n_dense=3, n_sparse=5,
                                vocab_size=17, embed_dim=4, seed=11)
    model = get_model("xdeepfm", fs, hidden=(16, 8), cin_hidden=(8,))
    opt = optax.adam(3e-3)

    # single device
    ts = create_train_state(model, jax.random.PRNGKey(4), opt)
    step = make_train_step(model, opt, donate=False)
    for epoch in range(2):
        for batch in iter_batches(data, 128, shuffle=True, seed=epoch):
            ts, _ = step(ts, batch)
    m1 = init_metrics()
    for batch in iter_batches(data, 128):
        logits, _, _ = model.apply(ts.params, {}, batch, train=False)
        m1 = update_metrics(m1, logits, batch["label"], batch["weight"])

    # sharded
    mesh = make_mesh(data=2, model=4)
    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_eval_step,
                                                make_sharded_train_step,
                                                shard_batch)
    sts = create_sharded_state(model, jax.random.PRNGKey(4), opt, mesh)
    sstep = make_sharded_train_step(model, opt, mesh, donate=False)
    for epoch in range(2):
        for batch in iter_batches(data, 128, shuffle=True, seed=epoch):
            sts, _ = sstep(sts, shard_batch(batch, mesh))
    ev = make_sharded_eval_step(model, mesh)
    m2 = init_metrics()
    for batch in iter_batches(data, 128):
        m2 = ev(sts.params, sts.model_state, m2, shard_batch(batch, mesh))

    s1, s2 = metrics_summary(m1), metrics_summary(m2)
    assert s1["auc"] > 0.55  # it learned something
    np.testing.assert_allclose(s1["auc"], s2["auc"], atol=2e-3)
    np.testing.assert_allclose(s1["logloss"], s2["logloss"], atol=2e-3)


# ---------------------------------------------------------------------------
# id all-to-all exchange (BASELINE north star; parallel/embedding.py mode='a2a')
# ---------------------------------------------------------------------------


def test_a2a_lookup_matches_dense(mesh42):
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=5,
                                vocab_size=13, embed_dim=4)
    fe = FusedEmbedding(fs)
    params = fe.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(data["sparse"][:16])

    want = fe.sparse(params, ids)
    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs, mode="a2a")
    got = sl.sparse(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_a2a_lookup_matches_dense_model8():
    mesh = make_mesh(data=1, model=8)
    fs, data = make_criteo_like(n_rows=24, n_dense=0, n_sparse=3,
                                vocab_size=10, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(2))
    ids = jnp.asarray(data["sparse"][:24])

    want = fe.sparse(params, ids)
    table = pad_table_for_shards(params["table"], 8)
    sl = ShardedLookup(mesh, fs, mode="a2a")
    got = sl.sparse(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_a2a_grads_match(mesh42):
    fs, data = make_criteo_like(n_rows=32, n_dense=0, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(data["sparse"][:16])

    def dense_loss(table):
        return jnp.sum(jnp.sin(fe.sparse({"table": table}, ids)))

    g_dense = jax.grad(dense_loss)(params["table"])

    sl = ShardedLookup(mesh42, fs, mode="a2a")
    table_p = pad_table_for_shards(params["table"], 2)

    def shard_loss(table):
        return jnp.sum(jnp.sin(sl.sparse(table, ids)))

    g_shard = jax.grad(shard_loss)(table_p)[:params["table"].shape[0]]
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-5)


def test_a2a_capacity_overflow_drops_to_zero(mesh42):
    """With capacity 1 and many ids per owner, overflowed ids read zeros
    (the documented MoE-style drop semantics)."""
    fs, _ = make_criteo_like(n_rows=8, n_dense=0, n_sparse=4,
                             vocab_size=11, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(1))
    ids = jnp.ones((8, 4), jnp.int32)  # all identical -> one owner bucket

    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs, mode="a2a", capacity=1)
    got = np.asarray(sl.sparse(table, ids))
    dense = np.asarray(fe.sparse(params, ids))
    # each of the 8 model-axis slices keeps its first id per owner; the rest
    # must be EXACTLY zero (dropped), never garbage
    is_kept = np.isclose(got, dense, atol=1e-6).all(axis=-1)
    is_zero = np.isclose(got, 0.0).all(axis=-1)
    assert np.all(is_kept | is_zero)
    assert is_zero.any()  # overflow actually happened


def test_a2a_train_step_matches_psum(mesh42):
    """One sharded train step, both exchange modes: same loss."""
    fs, data = make_criteo_like(n_rows=32, n_dense=2, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    model = get_model("deepfm", fs, hidden=(8,))
    opt = optax.adam(1e-3)
    batch = next(iter_batches(data, 32))

    outs = {}
    for mode in ("psum", "a2a"):
        sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh42)
        step = make_sharded_train_step(model, opt, mesh42, exchange=mode)
        sts, out = step(sts, shard_batch(batch, mesh42))
        outs[mode] = float(out["loss"])
    assert np.isclose(outs["psum"], outs["a2a"], rtol=1e-5), outs


def test_expert_parallel_mmoe_matches_single_device():
    """EP: MMoE expert stacks shard their leading (expert) axis over
    'model'; one sharded step == the single-device step, and the spec tree
    actually marks the expert leaves."""
    from jax.sharding import PartitionSpec as P
    from ml_function_tpu.features.synthetic import make_cvr_data
    from ml_function_tpu.train.loop import create_train_state, make_train_step

    fs, data = make_cvr_data(n_rows=64, n_dense=2, n_sparse=4, vocab_size=9,
                             embed_dim=4, seed=13)
    model = get_model("mmoe", fs, n_experts=4, expert_hidden=(8,),
                      tower_hidden=(8,))
    opt = optax.sgd(0.1)
    batch = next(iter_batches(data, 32))

    ts = create_train_state(model, jax.random.PRNGKey(3), opt)
    step = make_train_step(model, opt, donate=False)
    ts1, out1 = step(ts, batch)

    mesh = make_mesh(data=2, model=4)
    sts = create_sharded_state(model, jax.random.PRNGKey(3), opt, mesh)
    specs = param_spec_tree(sts.params)
    assert specs["experts"]["w"][0] == P("model", None, None), specs["experts"]
    assert specs["experts"]["b"][0] == P("model", None)
    sstep = make_sharded_train_step(model, opt, mesh, donate=False)
    sts1, out2 = sstep(sts, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sts1.params["experts"]["w"][0]),
                               np.asarray(ts1.params["experts"]["w"][0]),
                               rtol=1e-4, atol=1e-5)


def test_sharded_sequence_model_matches_single_device():
    """The behavior family shards too: one DIN step on a 2x4 mesh == the
    single-device step (seq lookups ride the same collective exchange)."""
    from ml_function_tpu.features.synthetic import make_behavior_data
    from ml_function_tpu.train.loop import create_train_state, make_train_step

    fs, data = make_behavior_data(n_rows=64, n_items=30, n_cates=8,
                                  seq_len=8, vocab_size=13, embed_dim=4,
                                  seed=11)
    model = get_model("din", fs, hidden=(16, 8))
    opt = optax.sgd(0.1)
    batch = next(iter_batches(data, 32))

    ts = create_train_state(model, jax.random.PRNGKey(3), opt)
    step = make_train_step(model, opt, donate=False)
    ts1, out1 = step(ts, batch)

    mesh = make_mesh(data=2, model=4)
    sts = create_sharded_state(model, jax.random.PRNGKey(3), opt, mesh)
    sstep = make_sharded_train_step(model, opt, mesh, donate=False)
    sts1, out2 = sstep(sts, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(out1["loss"]), float(out2["loss"]),
                               rtol=1e-5)
    v = sts1.params["embedding"]["table"][
        :ts1.params["embedding"]["table"].shape[0]]
    np.testing.assert_allclose(np.asarray(v),
                               np.asarray(ts1.params["embedding"]["table"]),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# bf16 row-payload compression (compress='bf16'; parallel/embedding.py)
# ---------------------------------------------------------------------------


def test_psum_bf16_compress_is_cast_exact(mesh42):
    """psum + bf16 compression: every row has ONE non-zero contributor, so
    the result equals bf16(row) exactly — no accumulation error."""
    fs, data = make_criteo_like(n_rows=32, n_dense=0, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(0))
    ids = jnp.asarray(data["sparse"][:16])

    dense = fe.sparse(params, ids)
    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs, mode="psum", compress="bf16")
    got = sl.sparse(table, ids)
    assert got.dtype == params["table"].dtype
    want = np.asarray(dense.astype(jnp.bfloat16).astype(dense.dtype))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_a2a_bf16_compress_close_and_grads_flow(mesh42):
    fs, data = make_criteo_like(n_rows=32, n_dense=0, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(data["sparse"][:16])

    dense = np.asarray(fe.sparse(params, ids))
    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs, mode="a2a", compress="bf16")
    got = np.asarray(sl.sparse(table, ids))
    # bf16 has ~3 decimal digits; values are ~0.05 scale
    np.testing.assert_allclose(got, dense, atol=4e-3)

    g = jax.grad(lambda t: jnp.sum(jnp.sin(sl.sparse(t, ids))))(table)
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_compressed_train_step_close_to_exact(mesh42):
    """Full sharded DeepFM step with compress='bf16': loss within bf16
    tolerance of the uncompressed step, both exchange modes."""
    fs, data = make_criteo_like(n_rows=32, n_dense=2, n_sparse=4,
                                vocab_size=11, embed_dim=4)
    model = get_model("deepfm", fs, hidden=(8,))
    opt = optax.adam(1e-3)
    batch = next(iter_batches(data, 32))

    for mode in ("psum", "a2a"):
        losses = {}
        for compress in (None, "bf16"):
            sts = create_sharded_state(model, jax.random.PRNGKey(0), opt,
                                       mesh42)
            step = make_sharded_train_step(model, opt, mesh42, exchange=mode,
                                           compress=compress)
            sts, out = step(sts, shard_batch(batch, mesh42))
            losses[compress] = float(out["loss"])
        assert np.isclose(losses[None], losses["bf16"], atol=5e-3), (mode,
                                                                     losses)


def test_a2a_dedup_small_capacity_lossless(mesh42):
    """SURVEY §7's deduped-id a2a: duplicates share one exchange slot, so a
    capacity far below ids-per-peer is lossless when per-bucket UNIQUES fit
    (power-law id streams). 64 ids drawn from only 3 distinct values ride a
    capacity-4 exchange exactly."""
    fs, _ = make_criteo_like(n_rows=8, n_dense=0, n_sparse=4, vocab_size=13,
                             embed_dim=4)
    fe = FusedEmbedding(fs, with_linear=False)
    params = fe.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.choice([1, 5, 9], size=(16, 4)).astype(np.int32))

    want = fe.sparse(params, ids)
    table = pad_table_for_shards(params["table"], 2)
    sl = ShardedLookup(mesh42, fs, mode="a2a", capacity=4)
    offs = jnp.asarray(fs.sparse_offsets())
    got = sl.lookup(table, ids + offs[None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    # grads also flow through the shared slots and sum like dense
    def loss_s(t):
        return jnp.sum(jnp.sin(sl.lookup(t, ids + offs[None, :])))

    def loss_d(t):
        return jnp.sum(jnp.sin(fe.sparse({"table": t}, ids)))

    gs = jax.grad(loss_s)(table)[:params["table"].shape[0]]
    gd = jax.grad(loss_d)(params["table"])
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=1e-5,
                               atol=1e-5)
