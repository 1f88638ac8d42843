"""CLI train/eval entry — the counterpart of the reference's example driver
scripts (``example/ctr_example/{un_seq,seq,session}.py``) as one configurable
command.

    python -m ml_function_tpu.train.cli \
        --config.model.name=deepfm --config.train.batch_size=4096 \
        --config.mesh.model=2 --config.train.checkpoint_dir=/tmp/ck
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import jax
import numpy as np

from ..features.synthetic import make_behavior_data, make_criteo_like
from ..models import get_model
from ..parallel.mesh import make_mesh
from ..parallel.multihost import host_batch_slice, init_multihost
from ..parallel.train import (create_sharded_state, make_sharded_eval_step,
                              make_sharded_train_step, shard_batch)
from .checkpoint import restore_latest, save_checkpoint
from .config import Config, apply_overrides
from .loop import iter_batches, prefetch, train_test_split
from .metrics import init_metrics, metrics_summary, update_metrics
from .optimizers import make_optimizer


def build_data(cfg: Config):
    d = cfg.data
    if d.source == "synthetic":
        if d.seq_len > 0:
            return make_behavior_data(
                n_rows=d.n_rows, seq_len=d.seq_len,
                embed_dim=cfg.model.embed_dim, seed=cfg.train.seed)
        return make_criteo_like(
            n_rows=d.n_rows, n_dense=d.n_dense, n_sparse=d.n_sparse,
            vocab_size=d.vocab_size, embed_dim=cfg.model.embed_dim,
            seed=cfg.train.seed)
    if d.source == "csv":
        from ..features.pipeline import criteo_csv_pipeline
        return criteo_csv_pipeline(d.path, n_dense=d.n_dense,
                                   n_sparse=d.n_sparse,
                                   embed_dim=cfg.model.embed_dim,
                                   hash_features=d.hash_features)
    if d.source == "stream":
        # Out-of-core: the FeatureSet is fixed by the hash space; batches
        # stream through the native C++ loader (features/native_loader.py)
        # with background chunk parsing — the file never loads whole.
        from ..features.schema import criteo_feature_set
        fs = criteo_feature_set([d.hash_buckets] * d.n_sparse,
                                n_dense=d.n_dense,
                                embed_dim=cfg.model.embed_dim)
        return fs, None
    if d.source == "behavior_stream":
        # Out-of-core lifelong-sequence training: behavior CSVs stream
        # through chunked parsing on a background thread
        # (features/behavior_stream.py) — the schema is fixed by the
        # integer-id bucket spaces, like the Criteo hash stream.
        from ..features.behavior_stream import behavior_stream_feature_set
        fs = behavior_stream_feature_set(
            item_buckets=d.hash_buckets, cate_buckets=d.cate_buckets,
            seq_len=d.seq_len or 90, embed_dim=cfg.model.embed_dim,
            long_seq_len=d.long_seq_len)
        return fs, None
    raise ValueError(f"unknown data source {d.source!r}")


def _stream_iter(cfg: Config):
    shard = ((jax.process_index(), jax.process_count())
             if jax.process_count() > 1 else None)  # disjoint per-host chunks
    if cfg.data.source == "behavior_stream":
        from ..features.behavior_stream import BehaviorFileIterator
        return iter(BehaviorFileIterator(
            cfg.data.path, cfg.train.batch_size,
            seq_len=cfg.data.seq_len or 90,
            long_seq_len=cfg.data.long_seq_len,
            item_buckets=cfg.data.hash_buckets,
            cate_buckets=cfg.data.cate_buckets,
            chunk_bytes=cfg.data.chunk_mb << 20, shard=shard))
    from ..features.native_loader import CriteoFileIterator
    return iter(CriteoFileIterator(
        cfg.data.path, cfg.train.batch_size, n_dense=cfg.data.n_dense,
        n_sparse=cfg.data.n_sparse, hash_buckets=cfg.data.hash_buckets,
        chunk_bytes=cfg.data.chunk_mb << 20, shard=shard))


def _host_rows(batch: dict) -> dict:
    """Multi-process: slice this host's disjoint row range out of the
    (identically-built) global batch; ``shard_batch`` then assembles the
    global array from the per-process slices. Single-process: identity."""
    if jax.process_count() == 1:
        return batch
    start, per = host_batch_slice(len(batch["label"]))

    def sl(x):
        return x[start:start + per]

    return {k: ({n: sl(a) for n, a in v.items()} if isinstance(v, dict)
                else sl(v)) for k, v in batch.items()}


def run(cfg: Config) -> dict:
    # env-driven jax.distributed init (JAX_COORDINATOR/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID); no-op single-host
    init_multihost()
    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)

    fs, data = build_data(cfg)
    if data is None:  # stream source
        train_data, test_data = None, None
        if cfg.data.eval_path:
            if cfg.data.source == "behavior_stream":
                from ..features.behavior_stream import load_behavior_stream
                _, test_data = load_behavior_stream(
                    cfg.data.eval_path, embed_dim=cfg.model.embed_dim,
                    seq_len=cfg.data.seq_len or 90,
                    long_seq_len=cfg.data.long_seq_len,
                    item_buckets=cfg.data.hash_buckets,
                    cate_buckets=cfg.data.cate_buckets)
            else:
                from ..features.native_loader import load_criteo
                test_data = load_criteo(cfg.data.eval_path,
                                        n_dense=cfg.data.n_dense,
                                        n_sparse=cfg.data.n_sparse,
                                        hash_buckets=cfg.data.hash_buckets)
    else:
        train_data, test_data = train_test_split(data, cfg.data.test_frac,
                                                 seed=cfg.train.seed)
    hp = dict(cfg.model.extra)
    if cfg.model.name not in ("fm", "afm", "seqfm", "sim", "mimn", "dts",
                              "autoint", "lr"):
        hp.setdefault("hidden", tuple(cfg.model.hidden))
    model = get_model(cfg.model.name, fs, **hp)

    mesh = make_mesh(data=cfg.mesh.data or None, model=cfg.mesh.model)
    opt = make_optimizer(cfg.train.optimizer, cfg.train.learning_rate,
                         schedule=cfg.train.lr_schedule,
                         decay_steps=cfg.train.lr_decay_steps,
                         warmup_steps=cfg.train.lr_warmup_steps)
    row_opt = None
    if cfg.train.row_optimizer:
        from ..train.sparse import make_row_optimizer
        row_opt = make_row_optimizer(cfg.train.row_optimizer,
                                     cfg.train.row_learning_rate)
        from ..parallel.sparse import create_sparse_sharded_state
        ts = create_sparse_sharded_state(
            model, jax.random.PRNGKey(cfg.train.seed), opt, row_opt, mesh)
    else:
        ts = create_sharded_state(model, jax.random.PRNGKey(cfg.train.seed),
                                  opt, mesh)

    start_step = 0
    if cfg.train.checkpoint_dir:
        # newest READABLE checkpoint: torn/corrupt ones (host died mid-
        # write) fall back to older ones instead of wedging the restart
        ts2, extra, ck = restore_latest(cfg.train.checkpoint_dir, ts)
        if ck:
            ts = ts2
            saved_fp = extra.get("fs_fingerprint")
            if saved_fp and saved_fp != fs.fingerprint:
                raise ValueError(
                    f"checkpoint {ck} was written for a different table "
                    f"layout (fingerprint {saved_fp} != current "
                    f"{fs.fingerprint}); restoring would silently permute "
                    "vocab rows — rebuild the FeatureSet (same planner "
                    "layout) or start a fresh checkpoint_dir")
            start_step = int(jax.device_get(ts.step))
            print(f"resumed from {ck} at step {start_step}", file=sys.stderr)

    compress = cfg.mesh.compress or None

    def resolve_capacity(setting: str, tag: str):
        if not setting:
            return None
        if setting == "auto":
            from ..parallel.planner import plan_capacity
            per_dev = cfg.train.batch_size // mesh.shape["data"]
            # ONE capacity serves every a2a lookup of the step, so it must
            # cover the LARGEST one — sequence lookups ship B_loc·max_len
            # ids per device (DIN/SIM/behavior_stream), far more than the
            # B_loc·F sparse lookup. Sizing from sparse fields alone made
            # seq buckets overflow and read zero rows (ADVICE r4). The sum
            # over all lookups upper-bounds each single one.
            ids_per_ex = (max(len(fs.sparse), 1)
                          + sum(s.max_len for s in fs.seq))
            cap = plan_capacity(fs, mesh.shape["model"],
                                per_dev * ids_per_ex)
            print(f"{tag} auto capacity: {cap} "
                  f"(per-device ids {per_dev * ids_per_ex})",
                  file=sys.stderr)
            return cap
        return int(setting)

    capacity = (resolve_capacity(cfg.mesh.capacity, "a2a")
                if cfg.mesh.exchange == "a2a" else None)
    if row_opt is not None:
        from ..parallel.sparse import make_sparse_sharded_train_step
        train_step = make_sparse_sharded_train_step(
            model, opt, row_opt, mesh, exchange=cfg.mesh.exchange,
            compress=compress, grad_exchange=cfg.mesh.grad_exchange,
            grad_capacity=(resolve_capacity(cfg.mesh.grad_capacity,
                                            "grad-a2a")
                           if cfg.mesh.grad_exchange == "a2a" else None))
    else:
        train_step = make_sharded_train_step(
            model, opt, mesh, exchange=cfg.mesh.exchange, compress=compress,
            capacity=capacity, seq_shard=cfg.mesh.seq_shard,
            pp_microbatches=cfg.mesh.pp_microbatches)
    eval_step = make_sharded_eval_step(model, mesh,
                                       exchange=cfg.mesh.exchange,
                                       compress=compress,
                                       seq_shard=cfg.mesh.seq_shard)

    if cfg.train.profile_dir:
        jax.profiler.start_trace(cfg.train.profile_dir)

    def eval_now():
        em = init_metrics()
        for b in iter_batches(test_data, cfg.train.batch_size):
            em = eval_step(ts.params, ts.model_state, em,
                           shard_batch(_host_rows(b), mesh))
        return metrics_summary(em)

    # eval-driven control (train/control.py): periodic eval + early stop +
    # best-checkpoint keep — every process runs the identical host logic on
    # the identical replicated metric, so decisions stay in lockstep
    stopper = best_tracker = None
    can_eval = cfg.train.eval_every > 0 and test_data is not None
    if can_eval:
        from .control import EarlyStopping, MetricMonitor
        best_tracker = MetricMonitor(cfg.train.monitor,
                                     min_delta=cfg.train.min_delta)
        if cfg.train.patience:
            stopper = EarlyStopping(cfg.train.patience, cfg.train.monitor,
                                    min_delta=cfg.train.min_delta)

    metrics = init_metrics()
    upd = jax.jit(update_metrics)
    step_i, t0, n_seen = 0, None, 0
    stopped = False
    for epoch in range(cfg.train.epochs):
        epoch_iter = (_stream_iter(cfg) if train_data is None else
                      iter_batches(train_data, cfg.train.batch_size,
                                   shuffle=True,
                                   seed=cfg.train.seed + epoch))
        for batch in prefetch(epoch_iter):
            if step_i < start_step:
                step_i += 1
                continue  # fast-forward the data iterator on resume
            # stream batches are already host-local (disjoint file chunks);
            # in-memory sources slice this host's rows out of the global batch
            sb = shard_batch(batch if train_data is None
                             else _host_rows(batch), mesh)
            ts, out = train_step(ts, sb)
            metrics = upd(metrics, out["logits"], out["label"], sb.get("weight"))
            step_i += 1
            if step_i == start_step + 1:
                jax.block_until_ready(out["loss"])
                t0 = time.perf_counter()
            else:
                n_seen += cfg.train.batch_size
            if cfg.train.log_every and step_i % cfg.train.log_every == 0:
                ov = (f" a2a_overflow {int(out['a2a_overflow'])}"
                      if "a2a_overflow" in out else "")
                print(f"step {step_i} loss {float(out['loss']):.4f}{ov}",
                      file=sys.stderr)
            if (cfg.train.checkpoint_dir and cfg.train.checkpoint_every
                    and step_i % cfg.train.checkpoint_every == 0):
                save_checkpoint(cfg.train.checkpoint_dir, ts,
                                extra={"config": cfg.to_json(),
                                       "fs_fingerprint": fs.fingerprint})
            if can_eval and step_i % cfg.train.eval_every == 0:
                summ = eval_now()
                print(f"eval @ step {step_i}: {summ}", file=sys.stderr)
                if best_tracker.improved(summ[cfg.train.monitor], step_i):
                    if cfg.train.save_best and cfg.train.checkpoint_dir:
                        import os as _os
                        save_checkpoint(
                            _os.path.join(cfg.train.checkpoint_dir, "best"),
                            ts, keep=1,
                            extra={"config": cfg.to_json(),
                                   "fs_fingerprint": fs.fingerprint,
                                   cfg.train.monitor:
                                       summ[cfg.train.monitor]})
                if stopper is not None and stopper.update(
                        summ[cfg.train.monitor], step_i):
                    print(f"early stop @ step {step_i} (best "
                          f"{cfg.train.monitor}={stopper.best:.5f} @ step "
                          f"{stopper.best_step})", file=sys.stderr)
                    stopped = True
                    break
        if stopped:
            break
    jax.block_until_ready(ts.params)
    dt = (time.perf_counter() - t0) if t0 else 0.0

    if cfg.train.profile_dir:
        jax.profiler.stop_trace()

    if cfg.train.checkpoint_dir:
        save_checkpoint(cfg.train.checkpoint_dir, ts,
                        extra={"config": cfg.to_json(),
                               "fs_fingerprint": fs.fingerprint})

    em = init_metrics()
    if test_data is not None:
        for batch in iter_batches(test_data, cfg.train.batch_size):
            em = eval_step(ts.params, ts.model_state, em,
                           shard_batch(_host_rows(batch), mesh))
    result = {
        "train": metrics_summary(metrics),
        "eval": metrics_summary(em),
        "steps": step_i,
        "examples_per_sec": (n_seen / dt) if dt > 0 else 0.0,
    }
    if (test_data is not None and "group" in test_data
            and jax.process_count() == 1):
        # group/user key present: report GAUC + calibration alongside AUC
        # (single-process — per-example prob gather; the streaming AUC
        # above stays the multi-host path)
        from ..parallel.context import sharded_embeddings
        from .loop import evaluate
        with sharded_embeddings(mesh, mode=cfg.mesh.exchange,
                                compress=compress):
            full = evaluate(model, ts.params, ts.model_state, test_data,
                            batch_size=cfg.train.batch_size)
        result["eval"].update(
            {k: full[k] for k in ("gauc", "gauc_groups", "ratio", "ece")
             if k in full})
    if can_eval:
        result["stopped_early"] = stopped
        result["best_step"] = best_tracker.best_step
        result["best_" + cfg.train.monitor] = best_tracker.best
    if jax.process_index() == 0:
        print(result)
    return result


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = apply_overrides(Config(), argv)
    print(cfg.to_json(), file=sys.stderr)
    return run(cfg)


if __name__ == "__main__":
    main()
