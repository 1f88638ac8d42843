"""CVR multi-task family (ESMM, MMoE) — fills the reference's empty
``kon/model/cvr_model/`` placeholder (SURVEY §2.9)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.synthetic import make_cvr_data
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import fit, iter_batches, train_test_split


@pytest.fixture(scope="module")
def cvr_data():
    return make_cvr_data(n_rows=8000, n_dense=4, n_sparse=8, vocab_size=30,
                         embed_dim=8, seed=5)


@pytest.mark.parametrize("name,hp", [
    ("esmm", {}),
    ("mmoe", {"n_experts": 3}),
    ("ple", {"n_task_experts": 2, "n_shared_experts": 1, "n_layers": 2,
             "expert_dim": 16}),
])
def test_forward_and_grad(cvr_data, name, hp):
    fs, data = cvr_data
    model = get_model(name, fs, **hp)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 32))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (32,)
    assert np.isfinite(np.asarray(logits)).all()
    assert any(k.endswith("_bce") for k in aux), aux.keys()

    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())

    g = jax.grad(loss)(params)
    assert sum(float(jnp.sum(jnp.abs(x)))
               for x in jax.tree_util.tree_leaves(g)) > 0


def test_esmm_pctcvr_bounded_by_pctr(cvr_data):
    """Structural ESMM property: pCTCVR = pCTR·pCVR ≤ pCTR."""
    fs, data = cvr_data
    from ml_function_tpu.models.multitask import ESMM
    from ml_function_tpu.ops.core import MLP, flatten_concat
    from ml_function_tpu.ops.embedding import FusedEmbedding
    model = ESMM(fs, hidden=(16,))
    params, state = model.init(jax.random.PRNGKey(1))
    batch = next(iter_batches(data, 64))
    logits, _, _ = model.apply(params, state, batch)
    pctcvr = jax.nn.sigmoid(logits)

    fe = FusedEmbedding(fs, with_linear=False)
    emb = fe.sparse(params["embedding"], batch["sparse"])
    h = flatten_concat([emb, batch["dense"]])
    l_ctr = MLP(h.shape[-1], (16,), activation="relu",
                out_dim=1)(params["ctr"], h)[0][:, 0]
    pctr = jax.nn.sigmoid(l_ctr)
    assert np.all(np.asarray(pctcvr) <= np.asarray(pctr) + 1e-6)


def test_esmm_learns_conversion(cvr_data):
    fs, data = cvr_data
    train, test = train_test_split(data, 0.2, seed=5)
    model = get_model("esmm", fs, hidden=(64, 32))
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    # conversion = click-signal AND cvr-signal; well above chance
    assert res.eval_metrics["auc"] > 0.70, res.eval_metrics


def test_mmoe_learns_both_tasks(cvr_data):
    fs, data = cvr_data
    train, test = train_test_split(data, 0.2, seed=5)
    model = get_model("mmoe", fs, n_experts=4, expert_hidden=(64,),
                      tower_hidden=(32,))
    ts, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                  eval_data=test)
    assert res.eval_metrics["auc"] > 0.70, res.eval_metrics
    # the click head (task 1) must ALSO have learned: rebuild its logits
    batch = next(iter_batches(test, 1024))
    from ml_function_tpu.models.multitask import MMoE  # noqa: F401
    # aux bce for click after training should be well below chance entropy
    _, _, aux = model.apply(ts.params, {}, batch, train=False)
    assert float(aux["click_bce"]) < 0.63, aux


def test_ple_learns_and_isolates_gradients(cvr_data):
    fs, data = cvr_data
    train, test = train_test_split(data, 0.2, seed=5)
    model = get_model("ple", fs, n_task_experts=2, n_shared_experts=2,
                      n_layers=2, expert_dim=64, tower_hidden=(32,))
    ts, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                  eval_data=test)
    assert res.eval_metrics["auc"] > 0.70, res.eval_metrics
    _, _, aux = model.apply(ts.params, {}, next(iter_batches(test, 1024)),
                            train=False)
    assert float(aux["click_bce"]) < 0.63, aux


def test_ple_private_experts_untouched_by_other_task():
    """CGC routing invariant: task 0's loss must produce ZERO gradient on
    task 1's private experts (first layer) — the property PLE adds over
    MMoE (whose shared experts all receive every task's gradient)."""
    fs, data = make_cvr_data(n_rows=256, n_dense=2, n_sparse=4, vocab_size=10,
                             embed_dim=4, seed=7)
    model = get_model("ple", fs, n_task_experts=1, n_shared_experts=1,
                      n_layers=1, expert_dim=8, tower_hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 64))

    def primary_loss(p):
        lg, _, _ = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg))

    g = jax.grad(primary_loss)(params)
    gl = g["layers"][0]
    # expert 0 = task 0 private, expert 1 = task 1 private, expert 2 = shared
    assert float(jnp.abs(gl["w"][0]).sum()) > 0
    assert float(jnp.abs(gl["w"][2]).sum()) > 0
    assert float(jnp.abs(gl["w"][1]).sum()) == 0.0  # task-1 private: no grad
    # task 1's gate never influences the primary logit either
    assert float(jnp.abs(gl["gate_w"][1]).sum()) == 0.0


def test_esmm_serves_without_labels(cvr_data, tmp_path):
    """Scoring path: no click/label arrays in the batch (serving contract)."""
    from ml_function_tpu.serving import Scorer, export_model, load_scorer
    fs, data = cvr_data
    model = get_model("esmm", fs, hidden=(16,))
    params, state = model.init(jax.random.PRNGKey(2))
    feats = {"dense": data["dense"][:100], "sparse": data["sparse"][:100]}
    proba = Scorer(model, params, state, batch_size=64).predict_proba(feats)
    assert proba.shape == (100,) and np.isfinite(proba).all()
    export_model(str(tmp_path / "m"), "esmm", fs, params, state,
                 hyperparams={"hidden": [16]})
    got = load_scorer(str(tmp_path / "m"), batch_size=64).predict_proba(feats)
    np.testing.assert_allclose(got, proba, rtol=1e-6)
