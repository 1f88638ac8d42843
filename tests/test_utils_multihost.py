"""utils (logging/debug/watchdog) + single-process multihost helpers."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ml_function_tpu.parallel.multihost import (Heartbeat, global_metrics,
                                                host_batch_slice,
                                                init_multihost)
from ml_function_tpu.train.metrics import init_metrics, update_metrics
from ml_function_tpu.utils.debug import StepWatchdog, find_nonfinite
from ml_function_tpu.utils.logging import MetricLogger


def test_metric_logger(tmp_path):
    ml = MetricLogger(path=str(tmp_path / "log.jsonl"))
    ml.log(1, loss=0.5, auc=0.7)
    ml.log(2, loss=0.4)
    ml.close()
    lines = (tmp_path / "log.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2 and '"loss": 0.5' in lines[0]


def test_find_nonfinite():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    bad = find_nonfinite(tree)
    assert bad == ["b/c"]


def test_watchdog_fires_and_cancels():
    fired = []
    with StepWatchdog(timeout_s=0.2, on_timeout=lambda: fired.append(1)) as wd:
        time.sleep(0.35)
        assert fired  # fired while we stalled
        wd.ping()
    time.sleep(0.3)
    assert len(fired) == 1  # no firing after exit


def test_init_multihost_single_process():
    idx, cnt = init_multihost()
    assert idx == 0 and cnt == 1


def test_host_batch_slice_single():
    start, per = host_batch_slice(128)
    assert (start, per) == (0, 128)


def test_global_metrics_single_host_identity():
    m = update_metrics(init_metrics(), jnp.asarray([1.0, -1.0]),
                       jnp.asarray([1.0, 0.0]))
    g = global_metrics(m)
    assert float(g["count"]) == 2.0


def test_heartbeat(tmp_path):
    hb = Heartbeat(str(tmp_path), interval_s=0.0, timeout_s=0.2)
    hb.beat(step=1)
    assert hb.stale_hosts() == []
    time.sleep(0.3)
    assert hb.stale_hosts() == [0]
    with pytest.raises(RuntimeError):
        hb.check_or_raise()
