"""Integration tests: every interaction model builds, jits, trains, and
DeepFM learns the planted FM structure (AUC well above chance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.synthetic import make_criteo_like
from ml_function_tpu.models import MODEL_REGISTRY, get_model
from ml_function_tpu.train.loop import fit, iter_batches, train_test_split

INTERACTION_MODELS = ["lr", "fm", "fnn", "ffm", "fwfm", "pnn", "deepcross",
                      "wide_deep", "deepfm", "dcn", "nfm", "xdeepfm", "afm",
                      "autoint", "fibinet", "dlrm",
                      # Next-Read shelf (models/interaction_ext.py)
                      "ccpm", "fgcnn", "flen", "onn", "oenn", "fat_deepffm",
                      "fignn", "mlr"]


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


def test_ffm_matches_naive_pair_loop(small_data):
    """FFM's vectorized transpose-multiply reduction == the textbook
    Σ_{i<j} v_{i,f_j}·v_{j,f_i} pair loop."""
    fs, data = small_data
    f, k = len(fs.sparse), 3
    model = get_model("ffm", fs, ffm_dim=k)
    params, state = model.init(jax.random.PRNGKey(3))
    batch = next(iter_batches(data, 16))
    logits, _, _ = model.apply(params, state, batch)

    from ml_function_tpu.ops.interactions import LinearUnit
    tab = np.asarray(params["ffm"]).reshape(-1, f, k)
    lin = np.asarray(params["embedding"]["linear"])[:, 0]
    offs = np.asarray(fs.sparse_offsets())
    gids = np.asarray(batch["sparse"]) + offs[None, :]
    # dense part through the model's own LinearUnit (bf16 matmul) — the
    # golden check targets the FFM pair reduction
    dl = np.asarray(LinearUnit(len(fs.dense))(params["dense_linear"],
                                              jnp.asarray(batch["dense"])))
    want = []
    for b in range(16):
        s = float(params["bias"]) + lin[gids[b]].sum() + dl[b]
        for i in range(f):
            for j in range(i + 1, f):
                s += float(tab[gids[b, i], j] @ tab[gids[b, j], i])
        want.append(s)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=2e-4)


def test_fwfm_matches_naive_pair_loop(small_data):
    fs, data = small_data
    model = get_model("fwfm", fs)
    params, state = model.init(jax.random.PRNGKey(4))
    batch = next(iter_batches(data, 16))
    logits, _, _ = model.apply(params, state, batch)

    from ml_function_tpu.ops.embedding import FusedEmbedding
    from ml_function_tpu.ops.interactions import LinearUnit
    fe = FusedEmbedding(fs)
    e, lin = fe.sparse_all(params["embedding"], batch["sparse"])
    e, lin = np.asarray(e), np.asarray(lin)
    r = np.asarray(params["field_r"])
    dl = np.asarray(LinearUnit(len(fs.dense))(params["dense_linear"],
                                              jnp.asarray(batch["dense"])))
    f = e.shape[1]
    want = []
    for b in range(16):
        s = float(params["bias"]) + lin[b].sum() + dl[b]
        for i in range(f):
            for j in range(i + 1, f):
                s += r[i, j] * float(e[b, i] @ e[b, j])
        want.append(s)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-4, atol=2e-4)


def test_ffm_learns():
    """FFM recovers planted second-order structure."""
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=8,
                                vocab_size=30, embed_dim=8, seed=3)
    train, test = train_test_split(data, 0.2, seed=3)
    model = get_model("ffm", fs, ffm_dim=4)
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.66, res.eval_metrics


def test_fibinet_bilinear_matches_naive(small_data):
    """FiBiNET's einsum+triu-gather bilinear == naive (v_i W_i) ∘ v_j loop,
    SENET reweighting included."""
    fs, data = small_data
    model = get_model("fibinet", fs, bilinear_type="each", hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(5))
    batch = next(iter_batches(data, 8))
    logits, _, _ = model.apply(params, state, batch)

    from ml_function_tpu.ops.core import MLP
    from ml_function_tpu.ops.embedding import FusedEmbedding
    from ml_function_tpu.ops.interactions import LinearUnit
    fe = FusedEmbedding(fs)
    e, lin = fe.sparse_all(params["embedding"], batch["sparse"])
    e = np.asarray(e)
    w = np.asarray(params["bilinear_w"])
    se = {k: np.asarray(v) for k, v in params["se"].items()}
    f = e.shape[1]
    z = e.mean(-1)
    a = np.maximum(np.maximum(z @ se["w1"], 0) @ se["w2"], 0)
    v = e * a[..., None]
    rows = []
    for src in (e, v):
        pairs = [(src[:, i] @ w[i]) * src[:, j]
                 for i in range(f) for j in range(i + 1, f)]
        rows.append(np.concatenate(pairs, axis=-1))
    h = np.concatenate(rows + [np.asarray(batch["dense"])], axis=-1)
    deep = np.asarray(MLP(h.shape[-1], (8,), activation="relu",
                          out_dim=1)(params["mlp"], jnp.asarray(h))[0][:, 0])
    dl = np.asarray(LinearUnit(len(fs.dense))(params["dense_linear"],
                                              jnp.asarray(batch["dense"])))
    want = (np.asarray(lin).sum(1) + dl + deep + float(params["bias"]))
    np.testing.assert_allclose(np.asarray(logits), want, rtol=2e-3, atol=2e-3)


def test_dlrm_learns():
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=8,
                                vocab_size=30, embed_dim=8, seed=4)
    train, test = train_test_split(data, 0.2, seed=4)
    model = get_model("dlrm", fs, bottom=(32,), top=(64, 32))
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.66, res.eval_metrics


def test_onn_pair_features_match_naive(small_data):
    """ONN's operation-aware pair dots == the textbook v_{i→fj}·v_{j→fi}
    loop (same storage trick as FFM, different consumption)."""
    fs, data = small_data
    f, k = len(fs.sparse), 3
    model = get_model("onn", fs, ffm_dim=k, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(6))
    batch = next(iter_batches(data, 8))
    tab = np.asarray(params["ffm"]).reshape(-1, f, k)
    offs = np.asarray(fs.sparse_offsets())
    gids = np.asarray(batch["sparse"]) + offs[None, :]
    # recompute the (B, P) pair features the model consumes
    import jax.numpy as jnp
    e = jnp.asarray(tab)[jnp.asarray(gids)]          # (B, F, F, K)
    t = jnp.sum(e * jnp.swapaxes(e, 1, 2), -1)
    iu, ju = np.triu_indices(f, k=1)
    got = np.asarray(t[:, iu, ju])
    want = np.zeros_like(got)
    for b in range(8):
        c = 0
        for i in range(f):
            for j in range(i + 1, f):
                want[b, c] = tab[gids[b, i], j] @ tab[gids[b, j], i]
                c += 1
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_mlr_probability_semantics(small_data):
    """MLR's logit must invert exactly to Σ_m softmax·sigmoid mixture."""
    fs, data = small_data
    model = get_model("mlr", fs, regions=3)
    params, state = model.init(jax.random.PRNGKey(7))
    batch = next(iter_batches(data, 16))
    logits, _, _ = model.apply(params, state, batch)
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    assert ((p > 0) & (p < 1)).all()

    from ml_function_tpu.ops.core import Dense, flatten_concat
    from ml_function_tpu.ops.embedding import FusedEmbedding
    fe = FusedEmbedding(fs)
    e, _ = fe.sparse_all(params["embedding"], batch["sparse"])
    x = flatten_concat([e, jnp.asarray(batch["dense"])])
    xd = x.shape[-1]
    region = jax.nn.softmax(Dense(xd, 3)(params["u"], x), -1)
    scorer = jax.nn.sigmoid(Dense(xd, 3)(params["w"], x))
    want = np.asarray(jnp.sum(region * scorer, -1))
    np.testing.assert_allclose(p, want, rtol=1e-4, atol=1e-5)


def test_flen_learns():
    """FLEN recovers planted second-order structure through its grouped
    bi-interaction."""
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=9,
                                vocab_size=30, embed_dim=8, seed=5)
    train, test = train_test_split(data, 0.2, seed=5)
    model = get_model("flen", fs, hidden=(64, 32))
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.64, res.eval_metrics


def test_fm_learns():
    fs, data = make_criteo_like(n_rows=6000, n_dense=4, n_sparse=8,
                                vocab_size=30, embed_dim=8, seed=2)
    train, test = train_test_split(data, 0.2, seed=2)
    model = get_model("fm", fs)
    _, res = fit(model, train, epochs=6, batch_size=256, learning_rate=5e-3,
                 eval_data=test)
    assert res.eval_metrics["auc"] > 0.66, res.eval_metrics


def test_fnn_warm_start_from_fm(small_data):
    """fnn_from_fm copies the trained FM tables into FNN (the paper's
    pretraining step)."""
    from ml_function_tpu.models import fnn_from_fm
    fs, data = small_data
    fm = get_model("fm", fs)
    fnn = get_model("fnn", fs)
    fm_params, _ = fm.init(jax.random.PRNGKey(1))
    fnn_params, state = fnn.init(jax.random.PRNGKey(2))
    warm = fnn_from_fm(fnn_params, fm_params)
    assert np.allclose(np.asarray(warm["embedding"]["table"]),
                       np.asarray(fm_params["embedding"]["table"]))
    batch = next(iter_batches(data, 32))
    logits, _, _ = fnn.apply(warm, state, batch, train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_oenn_order2_matches_pair_loop(small_data):
    """OENN's closed-form order-2 pooling == the explicit Σ_{i<j} e_i∘e_j."""
    fs, data = small_data
    model = get_model("oenn", fs, max_order=2)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 8))
    import itertools
    from ml_function_tpu.ops.embedding import gather_rows
    gids = np.asarray(batch["sparse"]) + np.asarray(
        fs.sparse_offsets())[None, :]
    e = np.asarray(gather_rows(params["order2"], jnp.asarray(gids)))
    f = e.shape[1]
    want = sum(e[:, i] * e[:, j] for i, j in itertools.combinations(range(f), 2))
    s1 = e.sum(axis=1)
    s2 = (e ** 2).sum(axis=1)
    got = 0.5 * (s1 ** 2 - s2)
    assert np.allclose(got, want, atol=1e-5)
