"""Long-sequence tier (DTS / MIMN / SIM): build, grad, semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.features.encoders import hard_search
from ml_function_tpu.features.synthetic import make_behavior_data
from ml_function_tpu.models import get_model
from ml_function_tpu.train.loop import iter_batches


@pytest.fixture(scope="module")
def beh_data():
    fs, data = make_behavior_data(n_rows=128, n_items=40, n_cates=8,
                                  seq_len=8, embed_dim=4)
    return fs, data


@pytest.mark.parametrize("name,kw", [
    ("dts", {"hidden": (16, 8)}),
    ("mimn", {"hidden": (16, 8), "memory_slots": 4, "channels": 4}),
    ("sim", {"hidden": (16, 8), "top_k": 4}),
    ("hpmn", {"hidden": (16, 8), "layers": 3}),
])
def test_longseq_forward_and_grad(beh_data, name, kw):
    fs, data = beh_data
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

    g = jax.jit(jax.grad(loss))(params)
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_mimn_batch_size_independent(beh_data):
    """The reference requires a static batch (models.py:355-357); ours must
    accept ANY batch size with the same params."""
    fs, data = beh_data
    model = get_model("mimn", fs, hidden=(16, 8), memory_slots=4)
    params, state = model.init(jax.random.PRNGKey(0))
    for bs in (8, 16, 32):
        batch = next(iter_batches(data, bs))
        logits, _, _ = model.apply(params, state, batch, train=False)
        assert logits.shape == (bs,)


def test_sim_soft_search_selects_relevant(beh_data):
    """Soft search must focus on top-k most candidate-similar items — verify
    the model output changes when the most-similar history items change."""
    fs, data = beh_data
    model = get_model("sim", fs, hidden=(16, 8), top_k=2)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 8))
    base, _, _ = model.apply(params, state, batch, train=False)
    # zeroing the history must change predictions (search has signal)
    batch2 = dict(batch)
    batch2["seq"] = {k: np.zeros_like(v) for k, v in batch["seq"].items()}
    zeroed, _, _ = model.apply(params, state, batch2, train=False)
    assert not np.allclose(np.asarray(base), np.asarray(zeroed))


def test_sim_hard_search_mode():
    fs, data = make_behavior_data(n_rows=64, n_items=30, n_cates=6,
                                  seq_len=8, embed_dim=4)
    # emulate the GSU preprocessing: filter history to candidate's category
    cand_cate = data["sparse"][:, 1:2]
    data["seq"]["hist_item"] = hard_search(
        data["seq"]["hist_item"], data["seq"]["hist_cate"], cand_cate)
    model = get_model("sim", fs, hidden=(16, 8), search="hard")
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_hpmn_periodic_hierarchy(beh_data):
    """Layer l updates every 2**l valid steps: with a history shorter than
    2**(layers-1), the slowest layer must never tick — its memory slot stays
    at the learned init regardless of the behaviors."""
    from ml_function_tpu.models.longseq import HPMN

    fs, data = beh_data
    model = HPMN(fs, layers=3, hidden=(16, 8))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 8))
    seq = {k: np.array(v) for k, v in batch["seq"].items()}
    # keep exactly 3 valid steps (< 2**2=4): layer 2 never ticks
    for k in seq:
        seq[k][:, 3:] = 0
    short = dict(batch, seq=seq)

    # perturb ONLY the slowest layer's cell weights
    pert = jax.tree_util.tree_map(lambda x: x, params)
    pert["cells"] = list(pert["cells"])
    pert["cells"][2] = jax.tree_util.tree_map(lambda x: x + 0.3,
                                              params["cells"][2])

    def run(p, b):
        lg, _, _ = model.apply(p, state, b, train=False)
        return np.asarray(lg)

    # 3 valid steps: layer 2 never ticks → its cell params are inert
    np.testing.assert_allclose(run(params, short), run(pert, short), atol=1e-6)
    # full 8-step history: layer 2 ticks (steps 4 and 8) → params matter
    assert not np.allclose(run(params, batch), run(pert, batch))


def test_dts_uses_time_deltas(beh_data):
    """Providing Δt must change the latent stream (time actually wired in)."""
    fs, data = beh_data
    model = get_model("dts", fs, hidden=(16, 8))
    params, state = model.init(jax.random.PRNGKey(0))
    batch = next(iter_batches(data, 16))
    base, _, _ = model.apply(params, state, batch, train=False)
    batch2 = dict(batch)
    batch2["seq"] = dict(batch["seq"])
    batch2["seq"]["hist_item_time"] = 5.0 * np.ones(
        batch["seq"]["hist_item"].shape, np.float32)
    timed, _, _ = model.apply(params, state, batch2, train=False)
    assert not np.allclose(np.asarray(base), np.asarray(timed))


def test_sim_long_behavior_width_alignment():
    """A long stream with FEWER fields than the short behavior (one 16k item
    stream vs item+cate pairs) gets a learned width alignment before the
    ESU — the lifelong-SIM serving shape (bench.py --board 16k-key row)."""
    from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                 SparseSpec)

    fs = FeatureSet(
        sparse=(SparseSpec("item", 40, vocab_name="item", dim=4),
                SparseSpec("cate", 9, vocab_name="cate", dim=4)),
        seq=(SeqSpec("hist_item", 40, 8, vocab_name="item", dim=4),
             SeqSpec("hist_cate", 9, 8, vocab_name="cate", dim=4),
             SeqSpec("hist_long", 40, 32, vocab_name="item", dim=4)))
    model = get_model("sim", fs, hidden=(16, 8), search="hard",
                      long_behavior=("hist_long",))
    params, state = model.init(jax.random.PRNGKey(0))
    assert "align_long" in params  # 4-wide long stream -> 8-wide ESU
    rng = np.random.default_rng(0)
    batch = {
        "dense": np.zeros((16, 0), np.float32),
        "sparse": np.stack([rng.integers(1, 40, 16),
                            rng.integers(1, 9, 16)], axis=1).astype(np.int32),
        "seq": {"hist_item": rng.integers(0, 40, (16, 8)).astype(np.int32),
                "hist_cate": rng.integers(0, 9, (16, 8)).astype(np.int32),
                "hist_long": rng.integers(0, 40, (16, 32)).astype(np.int32)},
        "label": rng.integers(0, 2, 16).astype(np.float32),
    }
    logits, _, aux = model.apply(params, state, batch, train=True)
    assert logits.shape == (16,) and np.isfinite(np.asarray(logits)).all()

    def loss(p):
        lg, _, ax = model.apply(p, state, batch, train=True)
        return jnp.mean(jnp.square(lg)) + sum(ax.values())

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(
        g["align_long"]))
    assert np.isfinite(gn) and gn > 0


def _planted_longseq_data(n_rows=2400, n_items=60, L=96, n_plant=6, seed=0):
    """Planted lifelong-stream signal: half the rows carry the CANDIDATE
    item n_plant times inside an otherwise-noise long history; the label
    follows that repeat-click signal. The short behavior is pure noise, so
    only a model that searches the LONG stream can separate the classes."""
    from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                 SparseSpec)
    rng = np.random.default_rng(seed)
    iv = n_items + 1
    cand = rng.integers(1, iv, n_rows).astype(np.int32)
    hist_long = rng.integers(1, iv, (n_rows, L)).astype(np.int32)
    planted = rng.random(n_rows) < 0.5
    for i in np.where(planted)[0]:
        pos = rng.choice(L, n_plant, replace=False)
        hist_long[i, pos] = cand[i]
    label = np.where(planted, rng.random(n_rows) < 0.85,
                     rng.random(n_rows) < 0.15).astype(np.float32)
    hist_short = rng.integers(1, iv, (n_rows, 8)).astype(np.int32)
    fs = FeatureSet(
        sparse=(SparseSpec("item", iv, vocab_name="item", dim=8),),
        seq=(SeqSpec("hist_item", iv, 8, vocab_name="item", dim=8),
             SeqSpec("hist_long", iv, L, vocab_name="item", dim=8)),
    )
    data = {"dense": np.zeros((n_rows, 0), np.float32),
            "sparse": cand[:, None],
            "seq": {"hist_item": hist_short, "hist_long": hist_long},
            "label": label}
    return fs, data


def test_sim_reduced_esu_matches_full():
    """The production GSU->ESU composition (bench board row): soft-search
    top-k over the long stream must reach AT LEAST the quality of running
    the ESU over the full stream — the reduction is what makes B>=512
    lifelong training affordable (VERDICT r3 next #4). Measured on the
    planted repeat-click signal, the reduced ESU actually WINS (top-8:
    ~0.69 AUC vs full-96: ~0.50 at equal budget): the GSU focuses the ESU
    on candidate-similar keys while the full ESU drowns in noise keys."""
    from ml_function_tpu.train.loop import fit, train_test_split
    fs, data = _planted_longseq_data(n_plant=6)
    tr, te = train_test_split(data, test_frac=0.2, seed=0)
    aucs = {}
    for tag, k in (("reduced", 8), ("full", 96)):
        model = get_model("sim", fs, hidden=(16, 8), search="soft", top_k=k,
                          candidate=("item",), behavior=("hist_item",),
                          long_behavior=("hist_long",))
        _, res = fit(model, tr, epochs=8, batch_size=128, learning_rate=1e-2,
                     eval_data=te, seed=0, eval_every=60)
        aucs[tag] = res.eval_metrics["auc"]
    assert aucs["reduced"] > 0.64, aucs
    assert aucs["reduced"] >= aucs["full"] - 0.05, aucs
