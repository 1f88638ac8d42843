"""Integration tests: every interaction model builds, jits, trains, and
DeepFM learns the planted FM structure (AUC well above chance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.synthetic import make_criteo_like
from ml_function_tpu.models import MODEL_REGISTRY, get_model
from ml_function_tpu.train.loop import fit, iter_batches, train_test_split

INTERACTION_MODELS = ["fm", "pnn", "deepcross", "wide_deep", "deepfm", "dcn",
                      "nfm", "xdeepfm", "afm", "autoint"]


@pytest.fixture(scope="module")
def small_data():
    fs, data = make_criteo_like(n_rows=512, n_dense=4, n_sparse=6,
                                vocab_size=20, embed_dim=4)
    return fs, data


@pytest.mark.parametrize("name", INTERACTION_MODELS)
def test_model_forward_and_grad(small_data, name):
    fs, data = small_data
    model = get_model(name, fs)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 32))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (32,)
    assert np.isfinite(np.asarray(logits)).all()

    # gradients flow
    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())

    g = jax.grad(loss)(params)
    norms = [float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g)]
    assert sum(norms) > 0


def test_deepfm_learns():
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=8,
                                vocab_size=30, embed_dim=8, seed=1)
    train, test = train_test_split(data, 0.2, seed=1)
    model = get_model("deepfm", fs, hidden=(64, 32))
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.68, res.eval_metrics


def test_fm_learns():
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=8,
                                vocab_size=30, embed_dim=8, seed=2)
    train, test = train_test_split(data, 0.2, seed=2)
    model = get_model("fm", fs)
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.66, res.eval_metrics
