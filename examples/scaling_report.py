"""Scaling-efficiency evidence for the BASELINE.json ">=90% examples/s
scaling, 1 chip -> 16" clause (VERDICT r3 missing #2 / next #3).

Multi-chip hardware is unavailable here, so the evidence is built from
what IS inspectable: the per-device SPMD program XLA compiles for each mesh
shape. For every (model, mesh, exchange) config this script

1. compiles the REAL sharded train step on an N-virtual-device CPU mesh at
   the bench per-chip batch (weak scaling: per-chip work fixed);
2. parses the compiled HLO for collectives (utils/hlo_stats.py) — op
   kinds, payload bytes, replica-group sizes;
3. folds in the MEASURED v5e single-chip step time (PERF.md board) and the
   public v5e ICI bandwidth (45 GB/s/link/direction) to project step time
   and weak-scaling efficiency at 4 / 8 / 16 chips.

Collective payload shapes depend on batch/fields/dim — not on vocab size —
so the probe uses a small vocab (fast CPU compile) at the TRUE batch.

Each mesh size runs in a subprocess (the virtual device count is fixed at
process start). Run:

    python examples/scaling_report.py            # full table (few minutes)
    python examples/scaling_report.py --probe …  # one config, JSON line

The resulting table lives in docs/SCALING.md §8; collective counts for the
8-device configs are regression-tested in tests/test_hlo_stats.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# measured v5e single-chip step times at the bench-optimal per-chip batch
# (PERF.md board, 2026-08-21): examples/s -> s/step
STEP_TIME_S = {
    ("deepfm", 32768): 32768 / 1_249_960,     # 26.2 ms
    ("xdeepfm", 65536): 65536 / 443_851,      # 147.7 ms
}
PER_CHIP_BATCH = {"deepfm": 32768, "xdeepfm": 65536}


def probe(args) -> dict:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import optax

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model
    from ml_function_tpu.parallel.mesh import make_mesh
    from ml_function_tpu.parallel.train import (create_sharded_state,
                                                make_sharded_train_step,
                                                shard_batch)
    from ml_function_tpu.utils.hlo_stats import collective_stats

    n_dense, n_sparse, dim = 13, 26, 8
    mesh = make_mesh(data=args.data, model=args.model_axis)
    opt = optax.adam(1e-3)
    b = args.batch_per_chip * args.data
    if args.model == "sim":
        # lifelong-stream shape (bench board: B=512/chip, L=16k): probes the
        # seq-sharded GSU (parallel/longseq.py) vs the replicated-key step
        from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                     SparseSpec)
        iv = args.vocab
        L = args.long_len
        fs = FeatureSet(
            sparse=(SparseSpec("item", iv, vocab_name="item", dim=dim),),
            seq=(SeqSpec("hist_item", iv, 8, vocab_name="item", dim=dim),
                 SeqSpec("hist_long", iv, L, vocab_name="item", dim=dim)),
        )
        model = get_model("sim", fs, hidden=(64, 32), search="soft",
                          top_k=args.top_k, candidate=("item",),
                          behavior=("hist_item",),
                          long_behavior=("hist_long",))
        batch = {
            "dense": np.zeros((b, 0), np.float32),
            "sparse": np.ones((b, 1), np.int32),
            "seq": {"hist_item": np.ones((b, 8), np.int32),
                    "hist_long": np.ones((b, L), np.int32)},
            "label": np.zeros((b,), np.float32),
            "weight": np.ones((b,), np.float32),
        }
        ts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
        step = make_sharded_train_step(model, opt, mesh, donate=False,
                                       exchange=args.exchange,
                                       compress=args.compress or None,
                                       seq_shard=bool(args.seq_shard))
        stats = collective_stats(step, ts, shard_batch(batch, mesh))
        return {
            "model": "sim", "n_devices": args.data * args.model_axis,
            "data": args.data, "model_axis": args.model_axis,
            "seq_shard": bool(args.seq_shard), "long_len": L,
            "top_k": args.top_k, "batch_per_chip": args.batch_per_chip,
            "counts": stats.counts, "bytes": stats.bytes,
            "total_count": stats.total_count,
            "wire_bytes": stats.wire_bytes(default_k=args.data
                                           * args.model_axis),
        }
    fs = criteo_feature_set([args.vocab] * n_sparse, n_dense=n_dense,
                            embed_dim=dim)
    model = get_model(args.model, fs, **({"hidden": (256, 128, 64)}
                                         if args.model == "deepfm" else {}))
    batch = {
        "dense": np.zeros((b, n_dense), np.float32),
        "sparse": np.ones((b, n_sparse), np.int32),
        "label": np.zeros((b,), np.float32),
        "weight": np.ones((b,), np.float32),
    }
    if args.row_optimizer:
        from ml_function_tpu.parallel.sparse import (
            create_sparse_sharded_state, make_sparse_sharded_train_step)
        from ml_function_tpu.train.sparse import make_row_optimizer
        row_opt = make_row_optimizer(args.row_optimizer)
        ts = create_sparse_sharded_state(model, jax.random.PRNGKey(0), opt,
                                         row_opt, mesh)
        step = make_sparse_sharded_train_step(
            model, opt, row_opt, mesh, donate=False,
            exchange=args.exchange, compress=args.compress or None,
            grad_exchange=args.grad_exchange,
            grad_capacity=args.grad_capacity or None)
    else:
        ts = create_sharded_state(model, jax.random.PRNGKey(0), opt, mesh)
        step = make_sharded_train_step(model, opt, mesh, donate=False,
                                       exchange=args.exchange,
                                       compress=args.compress or None)
    stats = collective_stats(step, ts, shard_batch(batch, mesh))
    return {
        "model": args.model, "n_devices": args.data * args.model_axis,
        "data": args.data, "model_axis": args.model_axis,
        "exchange": args.exchange, "compress": args.compress,
        "grad_exchange": args.grad_exchange if args.row_optimizer else "",
        "grad_capacity": args.grad_capacity,
        "row_optimizer": args.row_optimizer,
        "batch_per_chip": args.batch_per_chip,
        "counts": stats.counts, "bytes": stats.bytes,
        "total_count": stats.total_count,
        "wire_bytes": stats.wire_bytes(default_k=args.data
                                       * args.model_axis),
    }


def run_probe(n_devices: int, **kw) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={n_devices}")
    cmd = [sys.executable, os.path.abspath(__file__), "--probe"]
    for k, v in kw.items():
        cmd += [f"--{k.replace('_', '-')}", str(v)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1200, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
    if out.returncode != 0:
        raise RuntimeError(f"probe failed: {out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", action="store_true")
    ap.add_argument("--model", default="deepfm")
    ap.add_argument("--data", type=int, default=4)
    ap.add_argument("--model-axis", type=int, default=2)
    ap.add_argument("--batch-per-chip", type=int, default=32768)
    ap.add_argument("--vocab", type=int, default=2000)
    ap.add_argument("--exchange", default="psum")
    ap.add_argument("--compress", default="")
    ap.add_argument("--row-optimizer", default="")
    ap.add_argument("--grad-exchange", default="a2a")
    ap.add_argument("--grad-capacity", type=int, default=0)
    ap.add_argument("--seq-shard", type=int, default=0)
    ap.add_argument("--long-len", type=int, default=16384)
    ap.add_argument("--top-k", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="8-chip configs only")
    args = ap.parse_args()

    if args.probe:
        print(json.dumps(probe(args)))
        return

    from ml_function_tpu.utils.hlo_stats import IciModel, projected_efficiency

    ici = IciModel()
    meshes = [(4, 2, 2), (8, 4, 2), (16, 8, 2)]
    if args.quick:
        meshes = [(8, 4, 2)]
    rows = []
    for model in ("deepfm", "xdeepfm"):
        bpc = PER_CHIP_BATCH[model]
        t_chip = STEP_TIME_S[(model, bpc)]
        for n, d, m in meshes:
            for exch, comp in (("psum", ""), ("a2a", ""), ("psum", "bf16")):
                r = run_probe(n, model=model, data=d, model_axis=m,
                              batch_per_chip=bpc, exchange=exch,
                              compress=comp)
                for overlap, tag in ((0.0, "exposed"), (0.5, "50% overlap")):
                    p = projected_efficiency(t_chip, r["wire_bytes"],
                                             r["total_count"], ici,
                                             overlap=overlap)
                    r[f"eff_{tag}"] = p["efficiency"]
                r["t_comm_ms"] = 1e3 * (r["wire_bytes"] / ici.bytes_per_s
                                        + r["total_count"]
                                        * ici.hop_latency_s)
                rows.append(r)
                print(json.dumps(r), flush=True)

    # sparse-row backward comparison at the 852k-id shape (B=32768 × 26):
    # allgather vs owner-routed a2a at lossless worst-case AND at a tuned
    # capacity (30k ≈ what plan_capacity derives for a power-law stream
    # with ~23k uniques per bucket)
    for gx, cap in (("a2a", 0), ("a2a", 30000), ("allgather", 0)):
        r = run_probe(8, model="deepfm", data=4, model_axis=2,
                      batch_per_chip=32768, exchange="psum",
                      row_optimizer="adagrad", grad_exchange=gx,
                      grad_capacity=cap)
        r["t_comm_ms"] = 1e3 * (r["wire_bytes"] / ici.bytes_per_s
                                + r["total_count"] * ici.hop_latency_s)
        rows.append(r)
        print(json.dumps(r), flush=True)

    print("\n| model | chips (d×m) | exchange | collectives | wire MB/step "
          "| t_comm ms | eff (exposed) | eff (50% overlap) |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        if r.get("row_optimizer"):
            continue
        print(f"| {r['model']} | {r['n_devices']} ({r['data']}×"
              f"{r['model_axis']}) | {r['exchange']}"
              f"{'+bf16' if r['compress'] else ''} | {r['total_count']} | "
              f"{r['wire_bytes'] / 1e6:.1f} | {r['t_comm_ms']:.2f} | "
              f"{r['eff_exposed']:.1%} | {r['eff_50% overlap']:.1%} |")
    print("\nsparse-row backward (852k ids/step):")
    for r in rows:
        if not r.get("row_optimizer"):
            continue
        cap = r.get("grad_capacity") or "worst-case"
        print(f"| deepfm sparse {r['grad_exchange']} (cap {cap}) | "
              f"{r['n_devices']} | {r['total_count']} collectives | "
              f"{r['wire_bytes'] / 1e6:.1f} MB/step |")


if __name__ == "__main__":
    main()
