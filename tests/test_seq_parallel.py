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


# ---------------------------------------------------------------------------
# Seq-sharded GSU (parallel/longseq.py) composed into the REAL SIM model
# ---------------------------------------------------------------------------


def _sim_longseq_case(L=32, n_rows=32, n_items=40, seed=0):
    """Planted long-stream batch + SIM over it (the test_models_longseq
    planted-signal shape, shrunk for the 8-dev CPU mesh)."""
    from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                 SparseSpec)
    rng = np.random.default_rng(seed)
    iv = n_items + 1
    cand = rng.integers(1, iv, n_rows).astype(np.int32)
    hist_long = rng.integers(0, iv, (n_rows, L)).astype(np.int32)  # 0s: pads
    hist_short = rng.integers(1, iv, (n_rows, 8)).astype(np.int32)
    fs = FeatureSet(
        sparse=(SparseSpec("item", iv, vocab_name="item", dim=8),),
        seq=(SeqSpec("hist_item", iv, 8, vocab_name="item", dim=8),
             SeqSpec("hist_long", iv, L, vocab_name="item", dim=8)),
    )
    batch = {"dense": np.zeros((n_rows, 0), np.float32),
             "sparse": cand[:, None],
             "seq": {"hist_item": hist_short, "hist_long": hist_long},
             "label": (rng.random(n_rows) < 0.5).astype(np.float32)}
    from ml_function_tpu.models import get_model
    model = get_model("sim", fs, hidden=(16, 8), search="soft", top_k=6,
                      candidate=("item",), behavior=("hist_item",),
                      long_behavior=("hist_long",))
    return fs, model, batch


def test_seq_sharded_gsu_matches_inline_soft_search():
    """The sharded GSU primitive (block-local score→top-k→lex merge) must
    EQUAL the inline full-axis soft search, including lax.top_k's
    tie-break-by-lower-index semantics. Since r5 it returns the selected
    POSITIONS (the caller re-gathers rows differentiably)."""
    from ml_function_tpu.parallel.longseq import seq_sharded_soft_search
    fs, model, batch = _sim_longseq_case()
    mesh = make_mesh(data=2, model=4)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(fs.total_vocab, 8)), jnp.float32)
    cand_rows = jnp.take(table, jnp.asarray(batch["sparse"][:, 0]
                                            + fs.vocab_offsets["item"]),
                         axis=0)

    # inline reference (the unsharded SIM soft-search math)
    off = fs.seq_offset("hist_long")
    ids = jnp.asarray(batch["seq"]["hist_long"])
    mask = ids != 0
    rows = jnp.take(table, (ids + off).reshape(-1), axis=0).reshape(
        ids.shape + (8,)) * mask[..., None]
    scores = jnp.where(mask, jnp.einsum("bld,bd->bl", rows, cand_rows),
                       -jnp.inf)
    _, top_i = jax.lax.top_k(scores, 6)
    want_mask = jnp.take_along_axis(mask, top_i, axis=1)

    top_idx, red_mask = seq_sharded_soft_search(
        mesh, fs, ("hist_long",), 6, table,
        {"hist_long": jnp.asarray(batch["seq"]["hist_long"])}, cand_rows)
    np.testing.assert_array_equal(np.asarray(top_idx), np.asarray(top_i))
    np.testing.assert_array_equal(np.asarray(red_mask),
                                  np.asarray(want_mask))


def test_seq_sharded_sim_train_step_matches_unsharded():
    """One sharded SIM train step with the long KEY axis sharded over
    `model` (seq_shard=True) must equal the replicated-key step: same
    loss, logits, and updated embedding table (VERDICT r4 next #1 — SP as
    a capability on the real model, not a library demo)."""
    import optax

    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_train_step,
                                                shard_batch)
    fs, model, batch = _sim_longseq_case()
    mesh = make_mesh(data=2, model=4)
    opt = optax.adam(1e-2)
    got = {}
    for seq_shard in (False, True):
        sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
        step = make_sharded_train_step(model, opt, mesh, donate=False,
                                       seq_shard=seq_shard)
        sts2, out = step(sts, shard_batch(batch, mesh))
        got[seq_shard] = (np.asarray(out["loss"]), np.asarray(out["logits"]),
                          np.asarray(sts2.params["dien"]["embedding"]
                                     ["table"]))
    np.testing.assert_allclose(got[True][0], got[False][0], rtol=1e-6)
    np.testing.assert_allclose(got[True][1], got[False][1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[True][2], got[False][2],
                               rtol=1e-5, atol=1e-7)
