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


def test_int8_quantized_scorer_matches_float():
    """int8 serving tables (quantize_for_serving): scores track the float
    scorer closely, tables store 4x smaller, and aux-table models (FFM)
    quantize too."""
    import jax
    import jax.numpy as jnp

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.serving import Scorer, quantize_for_serving
    from ml_function_tpu.train.loop import fit

    for name, hp in (("deepfm", {"hidden": (16, 8)}), ("ffm", {})):
        fs, data = make_criteo_like(n_rows=512, n_dense=2, n_sparse=4,
                                    vocab_size=50, embed_dim=8, seed=3)
        model = get_model(name, fs, **hp)
        ts, _ = fit(model, data, epochs=2, batch_size=128, seed=0)

        s_f32 = Scorer(model, ts.params, ts.model_state, batch_size=128)
        qp = quantize_for_serving(model, ts.params)
        s_int8 = Scorer(model, qp, ts.model_state, batch_size=128)

        if name == "deepfm":
            # both column groups pack into ONE int8 (V, D+3) row
            tab = qp["embedding"]["qpl"]
            assert tab.dtype == jnp.int8
            v, d = ts.params["embedding"]["table"].shape
            assert tab.shape == (v, d + 3)
            f32_bytes = (ts.params["embedding"]["table"].nbytes
                         + ts.params["embedding"]["linear"].nbytes)
            assert tab.nbytes * 3 < f32_bytes  # >3x smaller
        else:  # ffm: aux (V, F*K) table quantizes; (V,1)-only groups stay
            assert qp["ffm"]["qp"].dtype == jnp.int8
            assert not isinstance(qp["embedding"]["linear"], dict)

        p_f = s_f32.predict_proba(data)
        p_q = s_int8.predict_proba(data)
        assert float(np.max(np.abs(p_f - p_q))) < 0.02, name
        # rank order preserved: AUC of quantized scores vs float labels
        from sklearn.metrics import roc_auc_score
        auc_f = roc_auc_score(data["label"], p_f)
        auc_q = roc_auc_score(data["label"], p_q)
        assert abs(auc_f - auc_q) < 2e-3, name


def test_int8_export_load_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.serving import Scorer, export_model, load_scorer
    from ml_function_tpu.train.loop import fit

    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=3,
                                vocab_size=30, embed_dim=4, seed=4)
    model = get_model("fm", fs)
    ts, _ = fit(model, data, epochs=1, batch_size=64, seed=0)
    export_model(str(tmp_path / "m"), "fm", fs, ts.params, ts.model_state)
    sc = load_scorer(str(tmp_path / "m"), quantize="int8")
    assert sc.params["embedding"]["qpl"].dtype == jnp.int8
    p = sc.predict_proba(data)
    ref = Scorer(model, ts.params, ts.model_state).predict_proba(data)
    assert float(np.max(np.abs(p - ref))) < 0.02


def test_int8_with_sharded_scorer():
    """int8-quantized tables under the sharded scorer: qpl rows are not
    fused-table paths in the spec tree, so they REPLICATE (11 bytes/row —
    a 100M-row table is ~1.1 GB, replication is the sensible serving
    layout); scores must match the single-device int8 scorer."""
    import jax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.serving import (Scorer, ShardedScorer,
                                         quantize_for_serving)
    from ml_function_tpu.train.loop import fit

    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=3,
                                vocab_size=30, embed_dim=4, seed=5)
    model = get_model("deepfm", fs, hidden=(8,))
    ts, _ = fit(model, data, epochs=1, batch_size=64, seed=0)
    qp = quantize_for_serving(model, ts.params)
    mesh = make_mesh(data=4, model=2)
    sh = ShardedScorer(model, qp, mesh, ts.model_state, batch_size=64)
    single = Scorer(model, qp, ts.model_state, batch_size=64)
    np.testing.assert_allclose(sh.predict_proba(data),
                               single.predict_proba(data), atol=1e-6)
