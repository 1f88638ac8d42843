"""Eval-driven training control (train/control.py + fit/CLI wiring):
early stopping, best-weights restore, plateau LR reduction, LR schedules —
the reference drivers' EarlyStopping(10) (example/ctr_example/seq.py:53) and
ReduceLROnPlateau/ModelCheckpoint(save_best_only)
(kon/model/embedding/walk_core_model.py:203-227) behaviors."""

import math

import numpy as np
import pytest

import jax

from ml_function_tpu.features.synthetic import make_criteo_like
from ml_function_tpu.models import get_model
from ml_function_tpu.train.control import (EarlyStopping, MetricMonitor,
                                           ReduceLROnPlateau)
from ml_function_tpu.train.loop import fit, train_test_split
from ml_function_tpu.train.optimizers import (get_learning_rate,
                                              make_lr_schedule,
                                              make_optimizer,
                                              set_learning_rate)


# ---------------------------------------------------------------------------
# host-side controller logic
# ---------------------------------------------------------------------------


def test_metric_monitor_modes():
    m = MetricMonitor("auc")           # -> max
    assert m.mode == "max"
    assert m.improved(0.6, 1) and not m.improved(0.6, 2)
    assert m.improved(0.7, 3) and m.best_step == 3
    m2 = MetricMonitor("logloss")      # -> min
    assert m2.mode == "min"
    assert m2.improved(0.5, 1) and m2.improved(0.4, 2)
    assert not m2.improved(0.45, 3)
    m3 = MetricMonitor("auc", min_delta=0.01)
    assert m3.improved(0.6, 1)
    assert not m3.improved(0.605, 2)   # below min_delta


def test_early_stopping_patience():
    es = EarlyStopping(patience=2, monitor="auc")
    assert not es.update(0.6, 1)
    assert not es.update(0.59, 2)      # bad 1
    assert es.update(0.58, 3)          # bad 2 -> stop
    assert es.best == 0.6 and es.best_step == 1
    es2 = EarlyStopping(patience=2, monitor="auc")
    es2.update(0.6, 1)
    es2.update(0.59, 2)
    assert not es2.update(0.65, 3)     # improvement resets the counter
    assert not es2.update(0.64, 4)


def test_reduce_on_plateau_fires_and_floors():
    r = ReduceLROnPlateau(base_lr=0.1, factor=0.5, patience=2, min_lr=0.03,
                          monitor="auc")
    assert r.update(0.6) is None
    assert r.update(0.59) is None          # bad 1
    assert r.update(0.58) == pytest.approx(0.05)   # bad 2 -> reduce
    assert r.update(0.57) is None          # counter reset
    assert r.update(0.56) == pytest.approx(0.03)   # floored at min_lr
    assert r.update(0.55) is None and r.update(0.54) is None  # at floor


def test_lr_schedules_decay():
    s = make_lr_schedule("cosine", 1e-2, decay_steps=100)
    assert s(0) == pytest.approx(1e-2)
    assert s(100) == pytest.approx(0.0, abs=1e-9)
    w = make_lr_schedule("warmup_cosine", 1e-2, warmup_steps=10,
                         decay_steps=100)
    assert w(0) == pytest.approx(0.0, abs=1e-9)
    assert w(10) == pytest.approx(1e-2)
    e = make_lr_schedule("exponential", 1e-2, transition_steps=10,
                         decay_rate=0.5)
    assert e(10) == pytest.approx(5e-3)
    with pytest.raises(ValueError, match="unknown lr schedule"):
        make_lr_schedule("nope", 1e-2)


def test_inject_lr_roundtrip():
    opt = make_optimizer("adam", 1e-3, inject_lr=True)
    st = opt.init({"w": np.zeros(3, np.float32)})
    assert get_learning_rate(st) == pytest.approx(1e-3)
    st2 = set_learning_rate(st, 5e-4)
    assert get_learning_rate(st2) == pytest.approx(5e-4)
    plain = make_optimizer("adam", 1e-3)
    with pytest.raises(ValueError, match="inject_lr"):
        set_learning_rate(plain.init({"w": np.zeros(3, np.float32)}), 1e-4)
    with pytest.raises(ValueError, match="ONE of"):
        make_optimizer("adam", 1e-3, schedule="cosine", inject_lr=True)


# ---------------------------------------------------------------------------
# fit() integration
# ---------------------------------------------------------------------------


def _small_problem(seed=0):
    fs, data = make_criteo_like(n_rows=768, n_dense=2, n_sparse=4,
                                vocab_size=30, embed_dim=4, seed=seed)
    tr, te = train_test_split(data, test_frac=0.25, seed=seed)
    return fs, tr, te


def test_fit_early_stops_on_divergence_and_restores_best():
    """The CONVERGENCE.md failure mode (train long enough at a hot LR and
    the loss blows up): early stopping must fire before the epoch budget
    and the returned state must be the BEST eval, not the last."""
    fs, tr, te = _small_problem()
    model = get_model("deepfm", fs, hidden=(16, 8))
    ts, res = fit(model, tr, epochs=30, batch_size=128, learning_rate=0.9,
                  eval_data=te, seed=0, eval_every=3, patience=3)
    n_evals = len(res.history.records)
    assert res.stopped_early, res.history.records
    assert res.steps < 30 * 6  # stopped before the epoch budget
    aucs = res.history.series("auc")
    # the returned (restored) state evaluates AT the best recorded eval
    assert res.eval_metrics["auc"] == pytest.approx(max(aucs), abs=1e-6)
    assert res.best_step > 0
    assert n_evals >= 4


def test_fit_periodic_eval_history_without_stopping():
    fs, tr, te = _small_problem(seed=1)
    model = get_model("fm", fs)
    ts, res = fit(model, tr, epochs=2, batch_size=128, learning_rate=5e-3,
                  eval_data=te, seed=0, eval_every=4)
    assert not res.stopped_early
    assert len(res.history.records) == res.steps // 4
    assert all("auc" in r and "step" in r for r in res.history.records)


def test_fit_plateau_reduces_lr():
    """No-signal labels -> eval logloss bottoms out then worsens (memorizing
    noise) -> the injected LR must come down when the plateau fires."""
    fs, tr, te = _small_problem(seed=2)
    rng = np.random.default_rng(0)
    tr = dict(tr, label=rng.integers(0, 2, len(tr["label"])).astype(np.float32))
    te = dict(te, label=rng.integers(0, 2, len(te["label"])).astype(np.float32))
    model = get_model("fm", fs)
    ts, res = fit(model, tr, epochs=6, batch_size=128, learning_rate=1e-2,
                  eval_data=te, seed=0, eval_every=3, monitor="logloss",
                  plateau=dict(factor=0.5, patience=1, min_lr=1e-4))
    lrs = res.history.series("lr")
    assert lrs and lrs[-1] < lrs[0]
    assert get_learning_rate(ts.opt_state) == pytest.approx(lrs[-1])


def test_fit_control_argument_validation():
    fs, tr, te = _small_problem(seed=3)
    model = get_model("fm", fs)
    with pytest.raises(ValueError, match="eval_data"):
        fit(model, tr, epochs=1, patience=2)
    with pytest.raises(ValueError, match="steps_per_call"):
        fit(model, tr, epochs=1, patience=2, eval_data=te, steps_per_call=4)


# ---------------------------------------------------------------------------
# CLI integration
# ---------------------------------------------------------------------------


def test_cli_early_stop_and_best_checkpoint(tmp_path):
    from ml_function_tpu.train.cli import main
    res = main([
        "--config.model.name=deepfm", "--config.model.hidden=(16,8)",
        "--config.data.n_rows=512", "--config.data.vocab_size=30",
        "--config.train.batch_size=64", "--config.train.log_every=0",
        "--config.train.epochs=20", "--config.train.learning_rate=0.9",
        "--config.train.eval_every=4", "--config.train.patience=2",
        f"--config.train.checkpoint_dir={tmp_path}",
    ])
    assert "stopped_early" in res and "best_step" in res
    assert res["stopped_early"]
    import os
    assert os.path.isdir(tmp_path / "best")
    assert any(d.startswith("ckpt_") for d in os.listdir(tmp_path / "best"))


def test_cli_lr_schedule_runs():
    from ml_function_tpu.train.cli import main
    res = main([
        "--config.model.name=fm", "--config.data.n_rows=256",
        "--config.data.vocab_size=20", "--config.train.batch_size=64",
        "--config.train.log_every=0", "--config.train.lr_schedule=cosine",
        "--config.train.lr_decay_steps=50",
    ])
    assert np.isfinite(res["train"]["logloss"])
