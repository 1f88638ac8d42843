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
    args = ap.parse_args()

    import jax
    if jax.default_backend() != "tpu" and jax.device_count() < 2:
        jax.config.update("jax_platforms", "cpu")

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
    model = get_model("deepfm", fs)
    opt = optax.adam(2e-3)
    sts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
    print("table sharding:",
          sts.params["embedding"]["table"].sharding.spec)
    step = make_sharded_train_step(model, opt, mesh)

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
