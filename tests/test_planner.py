"""Shard planner (parallel/planner.py): load model correctness + the greedy
layout actually balances a pathological schema."""

import jax
import numpy as np

from ml_function_tpu.features.schema import FeatureSet, SparseSpec
from ml_function_tpu.models import get_model
from ml_function_tpu.parallel.planner import (expected_shard_loads,
                                              plan_field_order)


def _skewed_fs():
    # two big cold vocabs followed by many tiny hot ones: uniform contiguous
    # blocks put ALL tiny vocabs (one lookup each per example) on the last
    # shard while shard 0 serves almost nothing
    big = [SparseSpec(f"big{i}", vocab_size=1000, dim=4) for i in range(2)]
    tiny = [SparseSpec(f"tiny{i}", vocab_size=10, dim=4) for i in range(10)]
    return FeatureSet(sparse=tuple(big + tiny))


def test_expected_loads_uniform_sums_to_lookups():
    fs = _skewed_fs()
    loads = expected_shard_loads(fs, 4)
    # total expected ids/example == number of sparse fields
    assert np.isclose(loads.sum(), len(fs.sparse))


def test_expected_loads_respects_freq():
    fs = FeatureSet(sparse=(SparseSpec("a", vocab_size=100, dim=4),))
    f = np.zeros(100)
    f[:50] = 1.0  # all mass in the first half -> first shard owns everything
    loads = expected_shard_loads(fs, 2, freq={"a": f})
    assert np.isclose(loads[0], 1.0) and np.isclose(loads[1], 0.0)


def test_plan_balances_skewed_schema():
    fs = _skewed_fs()
    plan = plan_field_order(fs, 2)
    assert plan.imbalance_after <= plan.imbalance_before
    assert plan.imbalance_after < 1.2  # near-balanced
    # same vocabs, same total rows, names preserved
    assert plan.feature_set.total_vocab == fs.total_vocab
    assert sorted(s.name for s in plan.feature_set.sparse) == \
        sorted(s.name for s in fs.sparse)


def test_planned_feature_set_trains():
    fs = _skewed_fs()
    plan = plan_field_order(fs, 2)
    model = get_model("deepfm", plan.feature_set, hidden=(8,))
    params, state = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"dense": np.zeros((16, 0), np.float32),
             "sparse": rng.integers(
                 1, 10, (16, len(plan.feature_set.sparse))).astype(np.int32),
             "label": rng.integers(0, 2, (16,)).astype(np.float32)}
    logits, _, _ = model.apply(params, state, batch, train=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_shared_vocab_groups_stay_intact():
    fs = FeatureSet(sparse=(
        SparseSpec("item", vocab_size=500, vocab_name="item_id", dim=4),
        SparseSpec("other", vocab_size=50, dim=4),
        SparseSpec("item2", vocab_size=500, vocab_name="item_id", dim=4),
    ))
    plan = plan_field_order(fs, 2)
    # one shared vocab -> appears once in the order; fs still validates
    assert plan.vocab_order.count("item_id") == 1
    assert plan.feature_set.total_vocab == fs.total_vocab


def test_encoder_id_counts_feed_planner():
    import pandas as pd
    from ml_function_tpu.features.encoders import SparseEncoder
    df = pd.DataFrame({"c": ["a"] * 7 + ["b"] * 2 + ["z"] * 1})
    enc = SparseEncoder().fit(df, ["c"])
    counts = enc.id_counts(df, "c")
    assert counts.shape[0] == enc.vocab_size("c")
    assert counts.sum() == len(df)
    fs = FeatureSet(sparse=(
        SparseSpec("c", vocab_size=enc.vocab_size("c"), dim=4),))
    loads = expected_shard_loads(fs, 2, freq={"c": counts})
    assert np.isclose(loads.sum(), 1.0)
