"""Scoring + export roundtrip."""

import jax
import numpy as np

from ml_function_tpu.features.synthetic import make_behavior_data, make_criteo_like
from ml_function_tpu.models import get_model
from ml_function_tpu.serving import Scorer, export_model, load_scorer
from ml_function_tpu.wrapper import BehaviorFea, CateFea, NumsFea


def test_scorer_matches_direct_apply():
    fs, data = make_criteo_like(n_rows=100, n_dense=2, n_sparse=3,
                                vocab_size=11, embed_dim=4)
    model = get_model("deepfm", fs, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    sc = Scorer(model, params, state, batch_size=32)
    proba = sc.predict_proba(data)
    assert proba.shape == (100,)

    logits, _, _ = model.apply(params, state, {
        "dense": data["dense"], "sparse": data["sparse"]}, train=False)
    np.testing.assert_allclose(proba, np.asarray(jax.nn.sigmoid(logits)),
                               rtol=1e-5, atol=1e-6)


def test_sharded_scorer_matches_single_device():
    """ShardedScorer over a 4x2 mesh == Scorer on one device (tables
    row-sharded, batch data-sharded, same probabilities)."""
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.serving import ShardedScorer

    fs, data = make_criteo_like(n_rows=100, n_dense=2, n_sparse=4,
                                vocab_size=9, embed_dim=4, seed=3)
    model = get_model("deepfm", fs, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(1))
    want = Scorer(model, params, state, batch_size=32).predict_proba(data)

    mesh = make_mesh(data=4, model=2)
    for exchange in ("psum", "a2a"):
        ss = ShardedScorer(model, params, mesh, state, batch_size=32,
                           exchange=exchange)
        got = ss.predict_proba(data)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    import pytest
    with pytest.raises(ValueError):
        ShardedScorer(model, params, mesh, state, batch_size=33)


def test_export_load_roundtrip(tmp_path):
    fs, data = make_criteo_like(n_rows=64, n_dense=2, n_sparse=3,
                                vocab_size=11, embed_dim=4)
    model = get_model("dcn", fs, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    want = Scorer(model, params, state, 32).predict_proba(data)

    export_model(str(tmp_path / "m"), "dcn", fs, params, state,
                 hyperparams={"hidden": [8]})
    sc = load_scorer(str(tmp_path / "m"), batch_size=32)
    got = sc.predict_proba(data)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_export_load_sequence_model(tmp_path):
    fs, data = make_behavior_data(n_rows=48, n_items=20, n_cates=5,
                                  seq_len=6, embed_dim=4)
    model = get_model("din", fs, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    want = Scorer(model, params, state, 16).predict_proba(data)
    export_model(str(tmp_path / "m"), "din", fs, params, state,
                 hyperparams={"hidden": [8]})
    got = load_scorer(str(tmp_path / "m"), 16).predict_proba(data)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_wrapper_aliases():
    assert NumsFea("price").name == "price"
    c = CateFea("item", word_size=100, cross_unit=8)
    assert c.vocab_size == 100 and c.dim == 8
    b = BehaviorFea("hist", word_size=100, input_length=20,
                    vocab_name="item")
    assert b.max_len == 20 and b.vocab == "item"
