"""Feature-engineering + GBDT harness (reference ``kon/model/feature_eng/``)."""

import numpy as np
import pandas as pd
import pytest

from ml_function_tpu.tools.feature_tool import (count_features, cross_features,
                                                ctr_table,
                                                item_embeddings_from_sequences,
                                                null_count_feature,
                                                reduce_mem_usage,
                                                stat_features,
                                                user_item_edgelist)
from ml_function_tpu.tools.gbdt import GBDTModel, adversarial_validation


@pytest.fixture
def df():
    rng = np.random.default_rng(0)
    n = 400
    return pd.DataFrame({
        "user": rng.integers(0, 20, n),
        "item": rng.integers(0, 15, n),
        "cate": rng.choice(list("abc"), n),
        "price": rng.uniform(1, 100, n),
        "ts": rng.integers(0, 1000, n),
    })


def test_cross_and_count_features(df):
    cf = cross_features(df, ["cate", "item"], order=2)
    assert cf.shape == (len(df), 1)
    cnt = count_features(df, ["cate"])
    assert (cnt["cate_count"] > 0).all()


def test_stat_features(df):
    sf = stat_features(df, "user", ["price"], stats=("mean", "max"))
    assert set(sf.columns) == {"user_price_mean", "user_price_max"}
    one_user = df[df.user == df.user.iloc[0]]
    assert sf.loc[one_user.index[0], "user_price_mean"] == pytest.approx(
        one_user.price.mean())


def test_null_count_and_mem(df):
    d = df.copy()
    d.loc[0, "price"] = np.nan
    assert null_count_feature(d).iloc[0] == 1
    d2 = reduce_mem_usage(d.copy())
    assert d2["item"].dtype == np.int8


def test_ctr_table(df):
    d = df.copy()
    d["label"] = (d.price > 50).astype(float)
    t = ctr_table(d, "cate")
    assert {"count", "ctr"} <= set(t.columns)


def test_edgelist_and_item_embeddings(df):
    edges = user_item_edgelist(df, "user", "item", "ts")
    assert len(edges) > 0
    embs = item_embeddings_from_sequences(df, "user", "item", "ts", dim=8,
                                          num_walks=5, walk_length=5)
    assert len(embs) > 0
    assert next(iter(embs.values())).shape == (8,)


def test_gbdt_fits_and_discriminates():
    rng = np.random.default_rng(1)
    n = 600
    x = rng.normal(size=(n, 5))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(int)
    m = GBDTModel(n_folds=4)
    m.fit(x, y, feature_names=[f"f{i}" for i in range(5)])
    assert m.auc(y) > 0.85
    assert 0 < m.f1_at_threshold(y) <= 1
    proba = m.predict_proba(x)
    assert proba.shape == (n,)
    useless = m.useless_features(x, y)
    assert "f4" in useless or len(useless) <= 3  # noise features score ~0


def test_adversarial_validation_same_distribution():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(300, 4))
    b = rng.normal(size=(300, 4))
    auc, ok = adversarial_validation(a, b)
    assert ok, auc


def test_adversarial_validation_detects_shift():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(300, 4))
    b = rng.normal(size=(300, 4)) + 3.0
    auc, ok = adversarial_validation(a, b)
    assert not ok, auc


# ---------------------------------------------------------------------------
# EDA plots (reference ctr_eda, feature_transform.py:110-235)
# ---------------------------------------------------------------------------


def test_eda_report(tmp_path):
    from ml_function_tpu.tools.eda import eda_report

    rng = np.random.default_rng(4)
    n = 2000
    frame = pd.DataFrame({
        "hour": rng.integers(0, 24, n),
        "user": rng.integers(0, 50, n),
        "cat": rng.integers(0, 5, n).astype(str),
    })
    # planted: rate rises with hour
    frame["label"] = (rng.uniform(size=n) < frame["hour"] / 48).astype(float)

    out = eda_report(frame, time_col="hour", entity_col="user",
                     category_cols=["cat"], out_dir=str(tmp_path))
    tp = out["time_panel"]
    assert set(tp.columns) == {"hour", "count", "rate"}
    late = tp[tp["hour"] > 18]["rate"].mean()
    early = tp[tp["hour"] < 6]["rate"].mean()
    assert late > early  # the planted trend survives aggregation
    assert out["activity"].iloc[0] >= out["activity"].iloc[-1]
    assert out["heatmap"].shape[0] == 5
    for name in ("time_panel", "activity", "rate_by_cat", "heatmap"):
        assert (tmp_path / f"{name}.png").stat().st_size > 1000


def test_gbdt_lr_beats_plain_lr():
    """GBDT+LR leaf features must capture the planted nonlinearity that a
    plain logistic regression misses (Facebook ADKDD'14 stack)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score

    from ml_function_tpu.tools.gbdt import GBDTLRModel

    rng = np.random.default_rng(1)
    n = 3000
    x = rng.normal(size=(n, 6)).astype(np.float32)
    # XOR-ish nonlinear target: sign interactions invisible to a linear model
    logit = 2.0 * (x[:, 0] * x[:, 1]) + 1.5 * (x[:, 2] > 0) * (x[:, 3] > 0)
    y = (1 / (1 + np.exp(-logit)) > rng.uniform(size=n)).astype(int)
    tr, te = slice(0, 2400), slice(2400, None)

    m = GBDTLRModel(n_estimators=60, max_depth=3).fit(x[tr], y[tr])
    auc_stack = m.auc(x[te], y[te])
    lr = LogisticRegression(max_iter=1000).fit(x[tr], y[tr])
    auc_lr = roc_auc_score(y[te], lr.predict_proba(x[te])[:, 1])
    assert auc_stack > auc_lr + 0.1, (auc_stack, auc_lr)
    # leaf transform is usable standalone
    assert m.transform(x[te]).shape[0] == 600
