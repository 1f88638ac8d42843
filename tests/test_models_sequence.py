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
