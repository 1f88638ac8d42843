"""Reformer LSH self-attention (ops/attention.py LSHSelfAttention) — the
reference roadmap's promised hash option (ctr_model/README.md p.s. 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.ops.attention import LSHSelfAttention
from ml_function_tpu.ops.base import bf16_matmul


def _shared_qk_full(mod, params, x, mask, causal=False):
    """Manual shared-QK full attention with the Reformer self penalty —
    what LSH attention must reduce to when one chunk covers everything."""
    b, l, _ = x.shape
    h, hd = mod.num_heads, mod.hd
    qk = bf16_matmul(x, params["qk"]).reshape(b, l, h, hd)
    v = bf16_matmul(x, params["v"]).reshape(b, l, h, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qk, qk) / np.sqrt(hd)
    logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    if causal:
        cm = jnp.tril(jnp.ones((l, l), bool))
        logits = jnp.where(cm[None, None], logits, -1e9)
    eye = jnp.eye(l, dtype=bool)
    logits = jnp.where(eye[None, None], logits + mod.SELF_PENALTY, logits)
    a = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, l, h * hd)
    out = bf16_matmul(out, params["o"])
    out = out * mask[..., None] + x
    ln = params["ln"]
    mu = jnp.mean(out, -1, keepdims=True)
    var = jnp.var(out, -1, keepdims=True)
    return (out - mu) / jnp.sqrt(var + 1e-6) * ln["scale"] + ln["bias"]


@pytest.mark.parametrize("causal", [False, True])
def test_single_chunk_equals_full_attention(causal):
    """chunk_size ≥ L ⇒ exactly shared-QK full attention (no approximation).
    The duplicated lookback window (chunk attends to itself twice) must not
    change the softmax average."""
    mod = LSHSelfAttention(dim=8, num_heads=2, chunk_size=32, n_buckets=4,
                           causal=causal)
    params = mod.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 12, 8))
    mask = jnp.asarray(np.array([[True] * 12,
                                 [True] * 7 + [False] * 5,
                                 [True] * 3 + [False] * 9]))
    got = mod(params, x, mask)
    want = _shared_qk_full(mod, params, x, mask, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_masked_keys_do_not_leak():
    """Values at padded positions must not influence valid positions."""
    mod = LSHSelfAttention(dim=8, num_heads=2, chunk_size=4, n_buckets=4)
    params = mod.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    mask = jnp.asarray(np.array([[True] * 10 + [False] * 6,
                                 [True] * 5 + [False] * 11]))
    base = np.asarray(mod(params, x, mask))
    x2 = x.at[:, 10:, :].set(99.0)  # scribble on padding of row 0
    x2 = x2.at[:, 5:, :].set(jnp.where(mask[:, 5:, None], x[:, 5:], 99.0))
    got = np.asarray(mod(params, x2, mask))
    m = np.asarray(mask)
    np.testing.assert_allclose(got[m], base[m], rtol=1e-4, atol=1e-4)


def test_multi_hash_rounds_and_grad():
    """n_hashes > 1 combines rounds by softmax mass; grads flow and are
    finite through the sort/gather pipeline."""
    mod = LSHSelfAttention(dim=8, num_heads=2, chunk_size=4, n_buckets=4,
                           n_hashes=3)
    params = mod.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 8))
    mask = jnp.ones((2, 24), bool)

    def loss(p):
        return jnp.sum(jnp.square(mod(p, x, mask)))

    g = jax.jit(jax.grad(loss))(params)
    total = sum(float(jnp.sum(jnp.abs(t)))
                for t in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_lsh_chunked_approximates_full():
    """On bucket-clustered data (two well-separated direction clusters) the
    chunked LSH output should track full attention closely."""
    mod_lsh = LSHSelfAttention(dim=8, num_heads=1, head_dim=8, chunk_size=8,
                               n_buckets=4, n_hashes=2, use_ln=False,
                               use_res=False)
    mod_full = LSHSelfAttention(dim=8, num_heads=1, head_dim=8, chunk_size=64,
                                n_buckets=4, use_ln=False, use_res=False)
    params = mod_lsh.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    # two antipodal clusters of near-duplicate tokens
    c1, c2 = rng.normal(size=8), rng.normal(size=8)
    toks = np.stack([c1 + 0.05 * rng.normal(size=8) if i % 2 == 0
                     else -c1 + 0.05 * rng.normal(size=8)
                     for i in range(32)]).astype(np.float32)
    x = jnp.asarray(toks)[None]
    mask = jnp.ones((1, 32), bool)
    got = np.asarray(mod_lsh(params, x, mask))
    want = np.asarray(mod_full(params, x, mask))
    # cosine similarity per position must be high (approximation quality)
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1) + 1e-9)
    assert float(np.mean(cos)) > 0.9


def test_bst_and_sim_lsh_option():
    """Model-level wiring: BST(attention='lsh') and SIM(esu_attention='lsh')
    build, run, and train."""
    from ml_function_tpu.features.synthetic import make_behavior_data
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import iter_batches

    fs, data = make_behavior_data(n_rows=64, n_items=40, n_cates=8,
                                  seq_len=8, embed_dim=4)
    for name, kw in (("bst", {"attention": "lsh", "hidden": (16, 8)}),
                     ("sim", {"esu_attention": "lsh", "hidden": (16, 8),
                              "top_k": 4})):
        model = get_model(name, fs, **kw)
        params, state = model.init(jax.random.PRNGKey(0))
        batch = next(iter_batches(data, 16))
        logits, _, aux = model.apply(params, state, batch, train=True)
        assert logits.shape == (16,)
        assert np.isfinite(np.asarray(logits)).all()

        def loss(p):
            lg, _, ax = model.apply(p, state, batch, train=True)
            return jnp.mean(jnp.square(lg)) + sum(ax.values())

        g = jax.jit(jax.grad(loss))(params)
        total = sum(float(jnp.sum(jnp.abs(t)))
                    for t in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0, name
