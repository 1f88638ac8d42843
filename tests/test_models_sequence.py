"""Behavior-sequence models: build, jit, gradients, and DIN learns the
planted target-interest structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.synthetic import make_behavior_data
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import fit, iter_batches, train_test_split

SEQ_MODELS = ["din", "dien", "bst", "seqfm", "dstn", "dmin"]


@pytest.fixture(scope="module")
def beh_data():
    fs, data = make_behavior_data(n_rows=256, n_items=40, n_cates=8,
                                  seq_len=8, embed_dim=4,
                                  session_shape=(2, 4))
    return fs, data


@pytest.mark.parametrize("name", SEQ_MODELS + ["dsin"])
def test_seq_model_forward_and_grad(beh_data, name):
    fs, data = beh_data
    kw = ({"hidden": (16, 8)}
          if name in ("din", "dien", "bst", "dsin", "dstn", "dmin") else {})
    model = get_model(name, fs, **kw)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (16,)
    assert np.isfinite(np.asarray(logits)).all()
    for k, v in aux.items():
        assert np.isfinite(float(v)), (k, v)

    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_din_learns():
    fs, data = make_behavior_data(n_rows=4000, n_items=40, n_cates=10,
                                  seq_len=12, embed_dim=8, seed=3)
    train, test = train_test_split(data, 0.2, seed=3)
    model = get_model("din", fs, hidden=(64, 32))
    _, res = fit(model, train, epochs=10, batch_size=128, learning_rate=3e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.60, res.eval_metrics


def test_dmin_multi_interest_heads_differ(beh_data):
    """The K interest channels must produce distinct interest vectors (the
    point of the multi-interest extractor)."""
    from ml_function_tpu.models.sequence import DMIN

    fs, data = beh_data
    model = get_model("dmin", fs, hidden=(16, 8), num_interests=3)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (16,) and float(aux["aux_loss"]) > 0
    # head projections initialized independently — K separate attn params
    assert "attn2" in params and "attn0" in params


def test_dien_aux_loss_positive(beh_data):
    fs, data = beh_data
    model = get_model("dien", fs, hidden=(16, 8))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    _, _, aux = model.apply(params, state, batch, train=True)
    assert float(aux["aux_loss"]) > 0  # -log sigmoid ≥ 0


def test_mind_routing_and_interests(beh_data):
    """MIND: forward/grad finite; exposed interest capsules are unit-or-less
    norm (squash) and distinct across K."""
    fs, data = beh_data
    model = get_model("mind", fs, hidden=(16, 8), num_interests=3)
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
    assert np.isfinite(total) and total > 0

    v = np.asarray(model.interests(params, batch))       # (B, K, D)
    assert v.shape[1] == 3
    norms = np.linalg.norm(v, axis=-1)
    assert (norms <= 1.0 + 1e-5).all()                   # squash bound
    # capsules differ from each other (routing breaks symmetry)
    assert not np.allclose(v[:, 0], v[:, 1])


def test_dssm_towers_and_retrieval(beh_data):
    """DSSM: towers produce unit vectors; item tower ignores user features;
    in-batch softmax loss beats chance after the towers see gradient."""
    import optax

    fs, data = beh_data
    model = get_model("dssm", fs, hidden=(32, 16))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 32))
    logits, _, _ = model.apply(params, state, batch, train=True)
    assert logits.shape == (32,)
    u = np.asarray(model.user_vec(params, batch))
    v = np.asarray(model.item_vec(params, batch))
    np.testing.assert_allclose(np.linalg.norm(u, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-4)

    # item tower must not depend on user fields / history (serving split)
    batch2 = dict(batch)
    batch2["sparse"] = np.array(batch["sparse"]).copy()
    batch2["sparse"][:, 2:] = 1                          # scribble user extras
    batch2["seq"] = {k: np.zeros_like(a) for k, a in batch["seq"].items()}
    v2 = np.asarray(model.item_vec(params, batch2))
    np.testing.assert_allclose(v, v2, atol=1e-6)

    # retrieval objective: one step reduces the in-batch softmax loss
    opt = optax.adam(1e-2)
    ost = opt.init(params)
    l0 = float(model.in_batch_softmax_loss(params, batch))
    g = jax.grad(lambda p: model.in_batch_softmax_loss(p, batch))(params)
    upd, ost = opt.update(g, ost, params)
    params2 = optax.apply_updates(params, upd)
    l1 = float(model.in_batch_softmax_loss(params2, batch))
    assert np.isfinite(l0) and l1 < l0


def test_deepmcp_subnets_and_learning(beh_data):
    """DeepMCP: aux carries match+corr terms in train mode only; eval runs
    the prediction subnet alone; joint training learns the planted signal."""
    fs, data = beh_data
    model = get_model("deepmcp", fs, hidden=(16, 8), match_hidden=(8,),
                      match_dim=8, corr_hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))

    _, _, aux_train = model.apply(params, state, batch, train=True)
    assert {"match", "corr"} <= set(aux_train)
    for k, v in aux_train.items():
        assert np.isfinite(float(v)), (k, v)
    _, _, aux_eval = model.apply(params, state, batch, train=False)
    assert "match" not in aux_eval and "corr" not in aux_eval

    # grads reach all three subnets
    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())
    g = jax.grad(loss)(params)
    for key in ("pred", "u_mlp", "a_mlp", "h_mlp"):
        n = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g[key]))
        assert n > 0, key


def test_deepmcp_learns():
    fs, data = make_behavior_data(n_rows=4000, n_items=40, n_cates=8,
                                  seq_len=8, embed_dim=8, seed=2)
    train, test = train_test_split(data, 0.2, seed=2)
    model = get_model("deepmcp", fs, hidden=(64, 32))
    _, res = fit(model, train, epochs=4, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.62, res.eval_metrics
