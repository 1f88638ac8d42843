"""Multi-chip sharded training over a (data, model) mesh.

No counterpart in the reference (single-device only). Run on real chips, or
simulate 8 devices on CPU:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip.py --data-axis 4 --model-axis 2
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-axis", type=int, default=0, help="0 = auto")
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--exchange", default="psum", choices=["psum", "a2a"],
                    help="embedding lookup exchange (parallel/embedding.py)")
    ap.add_argument("--compress", default="", choices=["", "bf16"],
                    help="bf16 ICI row-payload compression")
    ap.add_argument("--plan", action="store_true",
                    help="balance the table layout with the shard planner")
    ap.add_argument("--row-optimizer", default="",
                    choices=["", "adagrad", "adam"],
                    help="sparse-row updates for the tables")
    ap.add_argument("--platform", default="",
                    help="force a jax platform before backend init (e.g. "
                         "'cpu' with XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=8 to simulate a mesh)")
    args = ap.parse_args()

    import jax
    if args.platform:  # must run before the backend initializes
        jax.config.update("jax_platforms", args.platform)
    n_dev = jax.device_count()
    bad = (n_dev != args.data_axis * args.model_axis if args.data_axis
           else n_dev % args.model_axis != 0)
    if bad:
        raise SystemExit(
            f"mesh {args.data_axis or 'auto'}x{args.model_axis} does not "
            f"tile {n_dev} device(s) — on a single-chip host simulate with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 and "
            "--platform cpu")

    import optax
    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_train_step,
                                                shard_batch)
    from ml_function_tpu.train.loop import iter_batches

    mesh = make_mesh(data=args.data_axis or None, model=args.model_axis)
    print("mesh:", dict(mesh.shape), "devices:", jax.device_count())

    fs, data = make_criteo_like(n_rows=args.rows, vocab_size=5000)
    if args.plan:
        from ml_function_tpu.parallel.planner import plan_field_order
        plan = plan_field_order(fs, mesh.shape["model"])
        fs = plan.feature_set  # layout-only change; the data stays valid
        print(f"planner: imbalance {plan.imbalance_before:.2f} -> "
              f"{plan.imbalance_after:.2f}")
    model = get_model("deepfm", fs)
    opt = optax.adam(2e-3)
    compress = args.compress or None
    if args.row_optimizer:
        from ml_function_tpu.parallel.sparse import (
            create_sparse_sharded_state, make_sparse_sharded_train_step)
        from ml_function_tpu.train.sparse import make_row_optimizer
        row_opt = make_row_optimizer(args.row_optimizer)
        sts = create_sparse_sharded_state(model, jax.random.PRNGKey(0), opt,
                                          row_opt, mesh)
        step = make_sparse_sharded_train_step(model, opt, row_opt, mesh,
                                              exchange=args.exchange,
                                              compress=compress)
    else:
        sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
        step = make_sharded_train_step(model, opt, mesh,
                                       exchange=args.exchange,
                                       compress=compress)
    print("table sharding:",
          sts.params["embedding"]["table"].sharding.spec)

    n = 0
    for batch in iter_batches(data, args.batch_size, shuffle=True):
        sts, out = step(sts, shard_batch(batch, mesh))
        n += 1
        if n % 20 == 0:
            print(f"step {n} loss {float(out['loss']):.4f}")
        if n >= args.steps:
            break
    print("done:", n, "sharded steps")


if __name__ == "__main__":
    main()
