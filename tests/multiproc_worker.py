"""Worker for the multi-process drills (tests/test_multiprocess.py).

Each process: jax.distributed init -> sharded state init (jit, no full-table
host materialization) -> 2 train steps on per-host batch slices -> per-process
sharded checkpoint -> restore -> 2 more steps -> write result JSON.

Run: python multiproc_worker.py <pid> <nprocs> <port> <workdir> [dense|sparse]
``sparse`` drives the sharded sparse-row optimizer path (parallel/sparse.py)
with distributed row-optimizer moments instead of dense optax.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "dense"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs

    import numpy as np
    import optax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.multihost import (Heartbeat, global_metrics,
                                                    host_batch_slice)
    from ml_function_tpu.parallel.train import shard_batch
    from ml_function_tpu.train.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint,
                                                  save_checkpoint)
    from ml_function_tpu.train.loop import iter_batches
    from ml_function_tpu.train.metrics import (init_metrics, metrics_summary,
                                               update_metrics)

    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    mesh = make_mesh(data=2 * nprocs, model=2)

    if mode == "seqshard":
        # SIM with the long KEY axis sharded over 'model' ACROSS REAL
        # PROCESSES (r5): the block-local a2a fetch + lex merge runs its
        # collectives over the process boundary; parity vs the
        # replicated-key step on the same seed/batch proves exactness.
        import optax

        from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                     SparseSpec)
        from ml_function_tpu.parallel.train import (create_sharded_state,
                                                    make_sharded_train_step)
        rng = np.random.default_rng(7)
        iv, n_rows, lk = 41, 16 * nprocs, 16
        fs2 = FeatureSet(
            sparse=(SparseSpec("item", iv, vocab_name="item", dim=8),),
            seq=(SeqSpec("hist_item", iv, 4, vocab_name="item", dim=8),
                 SeqSpec("hist_long", iv, lk, vocab_name="item", dim=8)))
        batch = {
            "dense": np.zeros((n_rows, 0), np.float32),
            "sparse": rng.integers(1, iv, (n_rows, 1)).astype(np.int32),
            "seq": {"hist_item": rng.integers(1, iv, (n_rows, 4))
                    .astype(np.int32),
                    "hist_long": rng.integers(0, iv, (n_rows, lk))
                    .astype(np.int32)},
            "label": (rng.random(n_rows) < 0.5).astype(np.float32),
        }
        start, per = host_batch_slice(n_rows)
        local = {k: ({n: a[start:start + per] for n, a in v.items()}
                     if isinstance(v, dict) else v[start:start + per])
                 for k, v in batch.items()}
        model2 = get_model("sim", fs2, hidden=(16, 8), search="soft",
                           top_k=6, candidate=("item",),
                           behavior=("hist_item",),
                           long_behavior=("hist_long",))
        losses = {}
        for ss in (False, True):
            st = create_sharded_state(model2, jax.random.PRNGKey(3),
                                      optax.adam(1e-3), mesh)
            stp = make_sharded_train_step(model2, optax.adam(1e-3), mesh,
                                          donate=False, seq_shard=ss)
            _, out = stp(st, shard_batch(local, mesh))
            losses[str(ss)] = float(out["loss"])
        assert abs(losses["True"] - losses["False"]) < 1e-5, losses
        with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
            json.dump({"losses": losses}, f)
        print(f"worker {pid} (seqshard): OK {losses}", flush=True)
        return

    if mode == "sparse":
        from ml_function_tpu.parallel.sparse import (
            create_sparse_sharded_state, make_sparse_sharded_train_step)
        from ml_function_tpu.train.sparse import RowAdagrad

        row_opt = RowAdagrad(0.05)
        dense_opt = optax.adam(1e-2)

        def make_state():
            return create_sparse_sharded_state(
                model, jax.random.PRNGKey(0), dense_opt, row_opt, mesh)

        ts = make_state()
        # row-optimizer moments are genuinely distributed across processes
        acc = ts.opt_state["rows"]["table"]["acc"]
        assert not acc.is_fully_addressable
        step = make_sparse_sharded_train_step(model, dense_opt, row_opt,
                                              mesh, donate=False)
    else:
        from ml_function_tpu.parallel.train import (create_sharded_state,
                                                    make_sharded_train_step)

        opt = optax.adam(1e-2)

        def make_state():
            return create_sharded_state(model, jax.random.PRNGKey(0), opt,
                                        mesh)

        ts = make_state()
        step = make_sharded_train_step(model, opt, mesh, donate=False)

    # the fused table is genuinely distributed: this process's addressable
    # blocks cover only 1/model_axis of the padded rows
    tab = ts.params["embedding"]["table"]
    local_rows = {s.index[0] for s in tab.addressable_shards}
    assert len(local_rows) == 2 and all(
        (sl.stop - sl.start) == tab.shape[0] // 2 for sl in local_rows)

    batches = list(iter_batches(data, 64))

    def host_slice(b):
        start, per = host_batch_slice(len(b["label"]))
        return {k: v[start:start + per] for k, v in b.items()}

    hb = Heartbeat(os.path.join(workdir, "hb"), interval_s=0.0,
                   timeout_s=120.0)
    losses = []
    metrics = init_metrics()
    for b in batches[:2]:
        sb = shard_batch(host_slice(b), mesh)
        ts, out = step(ts, sb)
        metrics = jax.jit(update_metrics)(metrics, out["logits"],
                                          out["label"], sb.get("weight"))
        losses.append(float(out["loss"]))
        hb.beat(step=int(ts.step))
        hb.check_or_raise()

    ckpt = os.path.join(workdir, "ckpt")
    path = save_checkpoint(ckpt, ts)
    # per-process shard files exist; neither holds the full table
    shard_files = sorted(os.listdir(path))
    assert f"shards_{pid:05d}.npz" in shard_files, shard_files
    mine = np.load(os.path.join(path, f"shards_{pid:05d}.npz"))
    tkeys = [k for k in mine.files if k.startswith("params/embedding/table::")]
    assert all(mine[k].shape[0] < tab.shape[0] for k in tkeys), \
        "a single process wrote the full table"

    # fresh state -> restore -> resume
    ts2 = make_state()
    ts2, _ = restore_checkpoint(latest_checkpoint(ckpt), ts2)
    assert int(jax.device_get(ts2.step)) == 2
    for b in batches[2:4]:
        sb = shard_batch(host_slice(b), mesh)
        ts2, out = step(ts2, sb)
        losses.append(float(out["loss"]))

    gm = metrics_summary(global_metrics(metrics))
    checksum = float(sum(
        jax.jit(lambda x: jax.numpy.sum(jax.numpy.abs(x)))(l)
        for l in jax.tree_util.tree_leaves(ts2.params)))
    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "checksum": checksum,
                   "train_count": gm["count"],
                   "step": int(jax.device_get(ts2.step))}, f)
    print(f"worker {pid} ({mode}): OK losses={losses} "
          f"checksum={checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
