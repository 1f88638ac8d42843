"""Kill-a-worker elastic recovery drill worker (VERDICT r3 next #6).

Phase 1: N processes train together (heartbeats each step), write a sharded
checkpoint, then the VICTIM process dies abruptly (os._exit, no further
beats, no cleanup). Survivors are between collectives (detection loop only)
and must flag the dead peer via ``Heartbeat.check_or_raise`` within the
timeout, record the detection, and exit cleanly.

Phase 2: all N processes relaunch (fresh coordinator, fresh heartbeat dir —
the restart controller rotates it), restore the sharded checkpoint at the
pre-death step, and finish training.

Run: python elastic_worker.py <pid> <nprocs> <port> <workdir> <phase> <victim>
"""

import json
import os
import sys
import time


def main():
    pid, nprocs, port, workdir, phase, victim = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        int(sys.argv[5]), int(sys.argv[6]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    # generous runtime-side timeouts: under full-suite CPU oversubscription
    # a starved compile must not trip jax's own coordination heartbeat
    # before OUR detector runs (the drill's whole point)
    jax.distributed.initialize(heartbeat_timeout_seconds=600,
                               initialization_timeout=600,
                               coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)

    import optax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.multihost import Heartbeat, host_batch_slice
    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_train_step,
                                                shard_batch)
    from ml_function_tpu.train.checkpoint import (latest_checkpoint,
                                                  restore_checkpoint,
                                                  save_checkpoint)
    from ml_function_tpu.train.loop import iter_batches

    fs, data = make_criteo_like(n_rows=384, n_dense=2, n_sparse=4,
                                vocab_size=13, embed_dim=4, seed=0)
    model = get_model("fm", fs)
    mesh = make_mesh(data=2 * nprocs, model=2)
    opt = optax.adam(1e-2)
    ts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
    step = make_sharded_train_step(model, opt, mesh, donate=False)
    batches = list(iter_batches(data, 6 * nprocs))

    def host_slice(b):
        start, per = host_batch_slice(len(b["label"]))
        return {k: v[start:start + per] for k, v in b.items()}

    ckpt = os.path.join(workdir, "ckpt")
    hb = Heartbeat(os.path.join(workdir, f"hb_phase{phase}"),
                   interval_s=0.0, timeout_s=2.0)

    if phase == 1:
        losses = []
        for b in batches[:4]:
            ts, out = step(ts, shard_batch(host_slice(b), mesh))
            losses.append(float(out["loss"]))
            hb.beat(step=int(jax.device_get(ts.step)))
            hb.check_or_raise()
        save_checkpoint(ckpt, ts)
        if pid == victim:
            # die abruptly mid-job: no cleanup, no further beats
            print(f"worker {pid}: dying now", flush=True)
            os._exit(17)
        # survivors: detection loop (no collectives -> nothing can hang)
        deadline = time.time() + 30.0
        while time.time() < deadline:
            try:
                hb.beat(step=4)
                hb.check_or_raise()
            except RuntimeError as e:
                assert f"[{victim}]" in str(e), str(e)
                with open(os.path.join(workdir, f"detected_{pid}.json"),
                          "w") as f:
                    json.dump({"detector": pid, "stale": victim,
                               "losses": losses}, f)
                print(f"worker {pid}: detected dead peer {victim}, "
                      "exiting for restart", flush=True)
                # _exit, not return: a clean interpreter exit would run
                # jax.distributed's shutdown barrier, which cannot complete
                # with a dead peer (the coordination service fatals the
                # process). A real restart controller tears workers down
                # exactly like this and relaunches the job.
                os._exit(0)
            time.sleep(0.2)
        print(f"worker {pid}: detection TIMED OUT", flush=True)
        sys.exit(2)
    else:
        ts, _ = restore_checkpoint(latest_checkpoint(ckpt), ts)
        assert int(jax.device_get(ts.step)) == 4, int(jax.device_get(ts.step))
        losses = []
        for b in batches[4:6]:
            ts, out = step(ts, shard_batch(host_slice(b), mesh))
            losses.append(float(out["loss"]))
            hb.beat(step=int(jax.device_get(ts.step)))
            hb.check_or_raise()
        checksum = float(sum(
            jax.jit(lambda x: jax.numpy.sum(jax.numpy.abs(x)))(l)
            for l in jax.tree_util.tree_leaves(ts.params)))
        with open(os.path.join(workdir, f"resumed_{pid}.json"), "w") as f:
            json.dump({"losses": losses, "checksum": checksum,
                       "step": int(jax.device_get(ts.step))}, f)
        print(f"worker {pid}: resumed OK {losses}", flush=True)


if __name__ == "__main__":
    main()
