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
    # spec tuples untouched (batch column order is layout-independent)
    assert [s.name for s in plan.feature_set.sparse] == \
        [s.name for s in fs.sparse]
    # zones may pad, never shrink
    assert plan.feature_set.total_vocab >= fs.total_vocab


def test_plan_places_seq_only_vocab_in_its_zone():
    """ADVICE r2 repro: a seq-only vocab (hottest: max_len lookups/example)
    must land in its planned zone, not be forced after all sparse vocabs."""
    from ml_function_tpu.features.schema import SeqSpec

    fs = FeatureSet(
        sparse=(SparseSpec("big0", vocab_size=50, dim=4),
                SparseSpec("big1", vocab_size=50, dim=4)),
        seq=(SeqSpec("hist", vocab_size=4, max_len=50, dim=4),),
    )
    plan = plan_field_order(fs, 2)
    # 'hist' carries 50 of the 52 lookups -> must sit alone in one zone
    assert plan.vocab_order[0] == "hist"
    offs = plan.feature_set.vocab_offsets
    cap = -(-plan.feature_set.total_vocab // 2)
    hist_shard = offs["hist"] // cap
    big_shards = {offs["big0"] // cap, offs["big1"] // cap}
    assert hist_shard not in big_shards
    assert plan.imbalance_after < plan.imbalance_before


def test_zone_padding_aligns_blocks():
    """An underfilled zone pads to the block boundary so the realized shard
    blocks equal the planned zones (ADVICE r2 low: boundary drift)."""
    fs = FeatureSet(sparse=(
        SparseSpec("item", vocab_size=500, vocab_name="item_id", dim=4),
        SparseSpec("other", vocab_size=50, dim=4),
        SparseSpec("item2", vocab_size=500, vocab_name="item_id", dim=4),
    ))
    plan = plan_field_order(fs, 2)
    block = -(-plan.feature_set.total_vocab // 2)  # realized block size
    sizes = dict(plan.feature_set.vocabs)
    # every vocab starts at its zone's block boundary or packs directly
    # after the previous vocab of the same zone — no boundary drift
    for name, off in plan.feature_set.vocab_layout:
        assert off % block == 0 or any(
            o + sizes[n] == off
            for n, o in plan.feature_set.vocab_layout if n != name), \
            f"{name} at {off} is neither zone-aligned nor packed"
    # the two vocabs land in different blocks (500-row vocab gets its own)
    offs = plan.feature_set.vocab_offsets
    assert offs["item_id"] // block != offs["other"] // block


def test_zero_freq_falls_back_to_uniform():
    fs = FeatureSet(sparse=(SparseSpec("a", vocab_size=100, dim=4),))
    loads = expected_shard_loads(fs, 2, freq={"a": np.zeros(100)})
    assert np.all(np.isfinite(loads))
    assert np.isclose(loads.sum(), 1.0)


def test_unplanned_data_feeds_planned_model():
    """The footgun VERDICT r2 flagged is structurally gone: data encoded from
    the UNPLANNED FeatureSet is byte-identical for the planned model (layout
    only moves table rows; ids are per-field local)."""
    fs = _skewed_fs()
    plan = plan_field_order(fs, 2)
    rng = np.random.default_rng(0)
    batch = {"dense": np.zeros((16, 0), np.float32),
             "sparse": rng.integers(1, 10, (16, len(fs.sparse))).astype(np.int32),
             "label": rng.integers(0, 2, (16,)).astype(np.float32)}

    m_plain = get_model("fm", fs)
    m_plan = get_model("fm", plan.feature_set)
    p0, s0 = m_plain.init(jax.random.PRNGKey(0))
    p1, s1 = m_plan.init(jax.random.PRNGKey(0))
    # copy plain table rows into the planned layout -> identical logits
    off_plain = fs.vocab_offsets
    off_plan = plan.feature_set.vocab_offsets
    tab = np.asarray(p1["embedding"]["table"]).copy()
    lin = np.asarray(p1["embedding"]["linear"]).copy()
    for name, size in fs.vocabs:
        a, b = off_plain[name], off_plan[name]
        tab[b:b + size] = np.asarray(p0["embedding"]["table"])[a:a + size]
        lin[b:b + size] = np.asarray(p0["embedding"]["linear"])[a:a + size]
    p1 = dict(p1, embedding={"table": tab, "linear": lin},
              bias=p0["bias"])
    lg0, _, _ = m_plain.apply(p0, s0, batch, train=False)
    lg1, _, _ = m_plan.apply(p1, s1, batch, train=False)
    np.testing.assert_allclose(np.asarray(lg0), np.asarray(lg1), rtol=1e-6)


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
    assert plan.feature_set.total_vocab >= fs.total_vocab


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
