"""Worker for the multi-process SPARSE drill: jax.distributed + row-sharded
tables + sparse-row updates + per-process sharded checkpoint of the sparse
optimizer state. Run: python multiproc_sparse_worker.py <pid> <nprocs> <port>
<workdir>."""

import json
import os
import sys


def main():
    pid, nprocs, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)

    import numpy as np
    import optax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.multihost import host_batch_slice
    from ml_function_tpu.parallel.sparse import (
        create_sparse_sharded_state, make_sparse_sharded_train_step)
    from ml_function_tpu.parallel.train import shard_batch
    from ml_function_tpu.train.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint,
                                                  save_checkpoint)
    from ml_function_tpu.train.loop import iter_batches
    from ml_function_tpu.train.sparse import RowAdagrad

    fs, data = make_criteo_like(n_rows=256, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    row_opt = RowAdagrad(0.05)
    dense_opt = optax.adam(1e-2)
    mesh = make_mesh(data=2 * nprocs, model=2)
    ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0), dense_opt,
                                     row_opt, mesh)
    # row-optimizer moments are genuinely distributed across processes
    acc = ts.opt_state["rows"]["table"]["acc"]
    assert not acc.is_fully_addressable
    step = make_sparse_sharded_train_step(model, dense_opt, row_opt, mesh,
                                          donate=False)
    batches = list(iter_batches(data, 64))

    def host_slice(b):
        start, per = host_batch_slice(len(b["label"]))
        return {k: v[start:start + per] for k, v in b.items()}

    losses = []
    for b in batches[:2]:
        ts, out = step(ts, shard_batch(host_slice(b), mesh))
        losses.append(float(out["loss"]))

    ckpt = os.path.join(workdir, "ckpt")
    save_checkpoint(ckpt, ts)
    ts2 = create_sparse_sharded_state(model, jax.random.PRNGKey(0), dense_opt,
                                      row_opt, mesh)
    ts2, _ = restore_checkpoint(latest_checkpoint(ckpt), ts2)
    assert int(jax.device_get(ts2.step)) == 2
    for b in batches[2:4]:
        ts2, out = step(ts2, shard_batch(host_slice(b), mesh))
        losses.append(float(out["loss"]))

    checksum = float(sum(
        jax.jit(lambda x: jax.numpy.sum(jax.numpy.abs(x)))(l)
        for l in jax.tree_util.tree_leaves(ts2.params)))
    with open(os.path.join(workdir, f"result_{pid}.json"), "w") as f:
        json.dump({"losses": losses, "checksum": checksum}, f)
    print(f"sparse worker {pid}: OK losses={losses}", flush=True)


if __name__ == "__main__":
    main()
