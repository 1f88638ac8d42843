"""Headline benchmark: DeepFM training throughput (examples/sec/chip).

Config mirrors BASELINE.json's first target: Criteo-format 13 dense + 26
sparse fields, embed dim 8, shared-embedding DeepFM, Adam — the reference's
flagship configuration (``example/ctr_example/un_seq.py`` trains this shape
with TF2 Keras; it publishes no numbers, SURVEY §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": N}

``vs_baseline`` is measured against the reference's own stack (TF2 Keras
binary-crossentropy Adam train_on_batch) executing the same model/config on
this host (the only reference-equivalent run available — no GPU here, and the
reference has no published numbers). The TF number is cached in
``.bench_tf_baseline.json`` after the first run.
"""

import contextlib
import argparse
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Measured batch→throughput on v5e (DeepFM Criteo shape, this file):
#   8192 → 496k · 16384 → 956k · 32768 → 1239k · 65536 → 1232k ex/s/chip.
# The scatter-dominated step grows sublinearly with batch until ~32k
# (per-id scatter cost falls as the id count rises — see PERF.md), so the
# headline config runs the throughput-optimal 32768.
BATCH = 32768
N_SPARSE = 26
N_DENSE = 13
VOCAB = 100_000
DIM = 8
HIDDEN = (256, 128, 64)


def bench_model(name: str, steps: int, hp=None, batch: int = 0) -> float:
    """Secondary per-model throughput (same methodology as bench_jax)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import TrainState, create_train_state, loss_fn

    b = batch or BATCH
    fs = criteo_feature_set([VOCAB] * N_SPARSE, n_dense=N_DENSE, embed_dim=DIM)
    model = get_model(name, fs, **(hp or {}))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, jax.random.PRNGKey(0), opt)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    batch_d = {
        "dense": jax.random.uniform(k1, (b, N_DENSE), jnp.float32),
        "sparse": jax.random.randint(k2, (b, N_SPARSE), 1, VOCAB,
                                     jnp.int32),
        "label": jax.random.bernoulli(k3, 0.3, (b,)).astype(jnp.float32),
    }
    # multitask models (esmm/mmoe/ple) read a second task target
    batch_d["click"] = jnp.maximum(
        batch_d["label"],
        jax.random.bernoulli(k1, 0.3, (b,)).astype(jnp.float32))

    def one_step(carry):
        p, o = carry
        grads = jax.grad(
            lambda p: loss_fn(model, p, {}, batch_d, jax.random.PRNGKey(0))[0])(p)
        u, o = opt.update(grads, o, p)
        return optax.apply_updates(p, u), o

    def run_n(n):
        @jax.jit
        def f(carry):
            return jax.lax.fori_loop(0, n, lambda i, c: one_step(c), carry)
        c = f((ts.params, ts.opt_state))
        v = float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0]).astype(jnp.float32))
        import time as _t
        t0 = _t.perf_counter()
        c = f((ts.params, ts.opt_state))
        float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0]).astype(jnp.float32))
        return _t.perf_counter() - t0

    short = max(steps // 10, 2)
    per = (run_n(short + steps) - run_n(short)) / steps
    eps = b / per
    log(f"{name} (B={b}): {per*1e3:.3f} ms/step -> {eps:,.0f} examples/s/chip")
    return eps


def bench_model_best_batch(name: str, steps: int, hp=None,
                           batches=(16384, 32768, 65536)):
    """Per-model optimal batch: measure each candidate, return the best
    (batch, examples/s)."""
    best = (0, 0.0)
    for b in batches:
        eps = bench_model(name, steps, hp, batch=b)
        if eps > best[1]:
            best = (b, eps)
    log(f"{name}: best batch {best[0]} -> {best[1]:,.0f} examples/s/chip")
    return best


def bench_lookup_rate(steps: int = 50) -> float:
    """Fused-table lookup throughput (ids embedded per second)."""
    import jax
    import jax.numpy as jnp

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.ops.embedding import FusedEmbedding

    fs = criteo_feature_set([VOCAB] * N_SPARSE, n_dense=N_DENSE, embed_dim=DIM)
    fe = FusedEmbedding(fs)
    params = fe.init(jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (BATCH, N_SPARSE), 1,
                             VOCAB, jnp.int32)

    def run_n(n):
        @jax.jit
        def f(tab, lin_t):
            def body(i, t):
                emb, lin = fe.sparse_all({"table": t, "linear": lin_t}, ids)
                # real (non-foldable) dependence on the gather output — a
                # 0.0 * sum multiplier gets constant-folded and the whole
                # gather DCE'd (measured: a bogus 8e9 ids/s)
                return t * (1.0 + 1e-30 * (jnp.sum(emb[0, 0])
                                           + jnp.sum(lin[0])))
            return jax.lax.fori_loop(0, n, body, tab)
        import time as _t
        v = float(jnp.sum(f(params["table"], params["linear"])[0]))
        t0 = _t.perf_counter()
        float(jnp.sum(f(params["table"], params["linear"])[0]))
        return _t.perf_counter() - t0

    per = (run_n(5 + steps) - run_n(5)) / steps
    rate = BATCH * N_SPARSE / per
    log(f"lookup: {per*1e3:.3f} ms/batch -> {rate/1e6:,.1f}M lookups/s/chip")
    return rate


def _behavior_batch(batch: int, seq_len: int, n_items=5000, n_cates=100,
                    session_shape=None, long_seq: int = 0):
    """Random device-resident behavior batch (synthetic ids — throughput
    benches don't need learnable structure, and make_behavior_data's planted
    interest loop is too slow at 16k-length sequences)."""
    import jax
    import jax.numpy as jnp

    from ml_function_tpu.features.schema import (FeatureSet, SeqSpec,
                                                 SparseSpec)

    iv, cv = n_items + 1, n_cates + 1
    seqs = [SeqSpec("hist_item", iv, seq_len, vocab_name="item", dim=DIM,
                    session_shape=session_shape),
            SeqSpec("hist_cate", cv, seq_len, vocab_name="cate", dim=DIM,
                    session_shape=session_shape)]
    if long_seq:
        seqs.append(SeqSpec("hist_long", iv, long_seq, vocab_name="item",
                            dim=DIM))
    fs = FeatureSet(
        sparse=(SparseSpec("item", iv, vocab_name="item", dim=DIM),
                SparseSpec("cate", cv, vocab_name="cate", dim=DIM)),
        seq=tuple(seqs))
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    seq_d = {"hist_item": jax.random.randint(ks[0], (batch, seq_len), 1, iv,
                                             jnp.int32),
             "hist_cate": jax.random.randint(ks[1], (batch, seq_len), 1, cv,
                                             jnp.int32)}
    if long_seq:
        seq_d["hist_long"] = jax.random.randint(ks[2], (batch, long_seq), 1,
                                                iv, jnp.int32)
    batch_d = {
        "dense": jnp.zeros((batch, 0), jnp.float32),
        "sparse": jnp.stack(
            [jax.random.randint(ks[3], (batch,), 1, iv, jnp.int32),
             jax.random.randint(ks[4], (batch,), 1, cv, jnp.int32)], axis=1),
        "seq": seq_d,
        "label": jax.random.bernoulli(ks[5], 0.4, (batch,)).astype(
            jnp.float32),
    }
    return fs, batch_d


def bench_seq_model(name: str = "din", steps: int = 20, batch: int = 2048,
                    seq_len: int = 64, hp=None, session_shape=None,
                    long_seq: int = 0) -> float:
    """Behavior-sequence model throughput (reference seq.py shapes, scaled:
    batch 2048, history length 64 vs the reference's batch 32 / len 90).
    ``long_seq`` adds a 'hist_long' sequence (SIM lifelong tier)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import create_train_state, loss_fn

    fs, batch_d = _behavior_batch(batch, seq_len,
                                  session_shape=session_shape,
                                  long_seq=long_seq)
    model = get_model(name, fs, **(hp or {}))
    opt = optax.adam(1e-3)
    ts = create_train_state(model, jax.random.PRNGKey(0), opt)

    def one_step(carry):
        p, o = carry
        grads = jax.grad(
            lambda p: loss_fn(model, p, {}, batch_d, jax.random.PRNGKey(0))[0])(p)
        u, o = opt.update(grads, o, p)
        return optax.apply_updates(p, u), o

    def run_n(n):
        @jax.jit
        def f(carry):
            return jax.lax.fori_loop(0, n, lambda i, c: one_step(c), carry)
        c = f((ts.params, ts.opt_state))
        float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0]).astype(jnp.float32))
        import time as _t
        t0 = _t.perf_counter()
        c = f((ts.params, ts.opt_state))
        float(jnp.sum(jax.tree_util.tree_leaves(c[0])[0]).astype(jnp.float32))
        return _t.perf_counter() - t0

    short = max(steps // 10, 2)
    per = (run_n(short + steps) - run_n(short)) / steps
    eps = batch / per
    log(f"{name} (B={batch}, L={seq_len}): {per*1e3:.3f} ms/step -> "
        f"{eps:,.0f} examples/s/chip")
    return eps


def bench_lookup_tight(n_runs: int = 5, steps: int = 50):
    """Lookup rate measured N times: median + spread (kills the 96–282M
    variance band of the r2 board — tunnel jitter is per-RUN, so the median
    of chained-loop runs is stable)."""
    import numpy as np

    rates = [bench_lookup_rate(steps) for _ in range(n_runs)]
    med = float(np.median(rates))
    spread = (max(rates) - min(rates)) / med
    log(f"lookup (median of {n_runs}): {med/1e6:,.1f}M lookups/s/chip "
        f"(spread {100*spread:.0f}%: "
        f"{min(rates)/1e6:,.0f}–{max(rates)/1e6:,.0f}M)")
    return med, spread


def bench_sparse_path(vocab_per_field: int, steps: int = 10,
                      batch: int = 32768, row_opt_name: str = "adagrad"):
    """Dense full-table optax update vs the sparse-row path (train/sparse.py)
    at a given table scale — the crossover row for PERF.md. Both time the
    SAME DeepFM step (fwd+bwd+update) via chained dispatch."""
    import jax
    import jax.numpy as jnp
    import optax

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import create_train_state, make_train_step
    from ml_function_tpu.train.sparse import (create_sparse_train_state,
                                              make_row_optimizer,
                                              make_sparse_train_step)

    fs = criteo_feature_set([vocab_per_field] * N_SPARSE, n_dense=N_DENSE,
                            embed_dim=DIM)
    total = fs.total_vocab
    model = get_model("deepfm", fs, hidden=HIDDEN)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    batch_d = {
        "dense": jax.random.uniform(k1, (batch, N_DENSE), jnp.float32),
        "sparse": jax.random.randint(k2, (batch, N_SPARSE), 1,
                                     vocab_per_field, jnp.int32),
        "label": jax.random.bernoulli(k3, 0.3, (batch,)).astype(jnp.float32),
    }
    jax.block_until_ready(batch_d)

    def timed(step_fn, ts, n):
        """Chained lax.fori_loop timing (cancels the ~18 ms tunnel dispatch;
        the inner jitted step inlines into the loop body)."""
        import time as _t

        def run_n(k):
            @jax.jit
            def f(t):
                def body(i, tt):
                    t2, _ = step_fn(tt, batch_d)
                    return t2
                return jax.lax.fori_loop(0, k, body, t)
            r = f(ts)
            float(jnp.sum(r.params["bias"]))  # force full execution
            t0 = _t.perf_counter()
            r = f(ts)
            float(jnp.sum(r.params["bias"]))
            return _t.perf_counter() - t0

        short = max(n // 5, 2)
        return (run_n(short + n) - run_n(short)) / n

    out = {}
    # dense path: same optimizer family full-table
    dense_opt = (optax.adagrad(1e-2) if row_opt_name == "adagrad"
                 else optax.adam(1e-3))
    ts = create_train_state(model, jax.random.PRNGKey(0), dense_opt)
    per_d = timed(make_train_step(model, dense_opt, donate=False), ts, steps)
    out["dense"] = per_d
    log(f"sparse-bench V={total/1e6:.1f}M dense-{row_opt_name}: "
        f"{per_d*1e3:.2f} ms/step ({batch/per_d:,.0f} ex/s)")

    row_opt = make_row_optimizer(row_opt_name,
                                 1e-2 if row_opt_name == "adagrad" else 1e-3)
    ts_s = create_sparse_train_state(model, jax.random.PRNGKey(0),
                                     optax.adam(1e-3), row_opt)
    per_s = timed(make_sparse_train_step(model, optax.adam(1e-3), row_opt,
                                         donate=False), ts_s, steps)
    out["sparse"] = per_s
    log(f"sparse-bench V={total/1e6:.1f}M sparse-row-{row_opt_name}: "
        f"{per_s*1e3:.2f} ms/step ({batch/per_s:,.0f} ex/s, "
        f"{per_d/per_s:.2f}x dense)")
    return out


def bench_scoring(steps: int = 50, quantize: str = "") -> float:
    """Inference throughput: DeepFM forward + sigmoid (the serving path).
    ``quantize='int8'`` scores from int8 row tables
    (serving.quantize_for_serving — 4x less table HBM)."""
    import jax
    import jax.numpy as jnp

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model

    fs = criteo_feature_set([VOCAB] * N_SPARSE, n_dense=N_DENSE, embed_dim=DIM)
    model = get_model("deepfm", fs, hidden=HIDDEN)
    params, _ = model.init(jax.random.PRNGKey(0))
    if quantize:
        from ml_function_tpu.serving import quantize_for_serving
        params = quantize_for_serving(model, params)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "dense": jax.random.uniform(k1, (BATCH, N_DENSE), jnp.float32),
        "sparse": jax.random.randint(k2, (BATCH, N_SPARSE), 1, VOCAB,
                                     jnp.int32),
    }

    def run_n(n):
        @jax.jit
        def f(params, batch):
            def body(i, acc):
                b = dict(batch)
                b["sparse"] = (batch["sparse"] + i) % VOCAB  # defeat CSE
                logits, _, _ = model.apply(params, {}, b, train=False)
                return acc + jnp.sum(jax.nn.sigmoid(logits))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
        import time as _t
        float(f(params, batch))
        t0 = _t.perf_counter()
        float(f(params, batch))
        return _t.perf_counter() - t0

    per = (run_n(5 + steps) - run_n(5)) / steps
    rate = BATCH / per
    log(f"scoring{'+' + quantize if quantize else ''}: {per*1e3:.3f} ms/batch -> {rate/1e6:,.2f}M examples/s/chip")
    return rate


def bench_serving_latency(batches=(1, 16, 256), reps: int = 25,
                          inner: int = 0, sharded: bool = False):
    """Online-scoring LATENCY board (VERDICT r4 weak #6): per-batch p50/p99
    at small serving batches, f32 vs int8 packed tables.

    Method: chained-``fori_loop`` differencing — each sample is
    (t[fori(2·inner)] − t[fori(inner)]) / inner, which cancels the ~18 ms
    axon tunnel dispatch AND the fixed jit-call overhead, leaving pure
    device step latency; p50/p99 are over ``reps`` such samples.
    ``inner=0`` auto-scales per config so inner·latency ≥ ~25 ms — well
    above tunnel jitter (µs-scale configs at a fixed small inner read as
    0.000 ms otherwise). (True
    end-to-end percentiles depend on the RPC stack in front of the chip,
    which this dev tunnel does not represent.)

    ``sharded=True``: ShardedScorer's collective-exchange forward over an
    8-virtual-device CPU mesh (data=4, model=2) — run in a CPU subprocess;
    numbers are CPU-relative (sharding overhead), not chip latency.
    Returns {(batch, tag): {"p50_ms", "p99_ms"}}."""
    import time as _t

    import jax
    import jax.numpy as jnp

    import numpy as np

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model
    from ml_function_tpu.serving import quantize_for_serving

    fs = criteo_feature_set([VOCAB] * N_SPARSE, n_dense=N_DENSE,
                            embed_dim=DIM)
    model = get_model("deepfm", fs, hidden=HIDDEN)
    params, _ = model.init(jax.random.PRNGKey(0))
    variants = [("f32", params),
                ("int8", quantize_for_serving(model, params))]

    if sharded:
        from ml_function_tpu.parallel.context import sharded_embeddings
        from ml_function_tpu.parallel.mesh import make_mesh
        from ml_function_tpu.parallel.train import (_pad_tables,
                                                    param_spec_tree)
        from jax.sharding import NamedSharding, PartitionSpec as P
        mesh = make_mesh(data=4, model=2)
        pp = _pad_tables(params, 2)
        specs = param_spec_tree(pp)
        pp = jax.device_put(pp, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda s: isinstance(s, P)))
        variants = [("sharded-f32", pp)]

    out = {}
    for b in batches:
        if sharded and b % 4:
            continue  # batch must divide the data axis
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        batch = {
            "dense": jax.random.uniform(k1, (b, N_DENSE), jnp.float32),
            "sparse": jax.random.randint(k2, (b, N_SPARSE), 1, VOCAB,
                                         jnp.int32),
        }
        for tag, p in variants:
            def make_f(n):
                @jax.jit
                def f(p, batch):
                    def body(i, acc):
                        bb = dict(batch)
                        bb["sparse"] = (batch["sparse"] + i) % VOCAB  # no CSE
                        logits, _, _ = model.apply(p, {}, bb, train=False)
                        return acc + jnp.sum(jax.nn.sigmoid(logits))
                    return jax.lax.fori_loop(0, n, body,
                                             jnp.zeros((), jnp.float32))
                return f

            ctx = (sharded_embeddings(mesh) if sharded
                   else contextlib.nullcontext())
            with ctx:
                n_in = inner
                if not n_in:  # calibrate: inner * latency >= ~25 ms
                    import time as _t2
                    probe = jax.jit(make_f(64))
                    float(probe(p, batch))
                    t0 = _t2.perf_counter()
                    float(probe(p, batch))
                    per = max((_t2.perf_counter() - t0 - 0.018) / 64, 1e-7)
                    n_in = int(min(max(0.025 / per, 64), 1 << 14))
                f_long, f_short = make_f(2 * n_in), make_f(n_in)
                float(f_long(p, batch))     # compile
                float(f_short(p, batch))
                samples = []
                for _ in range(reps):
                    t0 = _t.perf_counter()
                    float(f_short(p, batch))
                    t_s = _t.perf_counter() - t0
                    t0 = _t.perf_counter()
                    float(f_long(p, batch))
                    t_l = _t.perf_counter() - t0
                    samples.append(max(t_l - t_s, 1e-9) / n_in)
            s = np.sort(np.asarray(samples))
            p50 = float(s[len(s) // 2]) * 1e3
            p99 = float(s[min(int(len(s) * 0.99), len(s) - 1)]) * 1e3
            out[(b, tag)] = {"p50_ms": p50, "p99_ms": p99}
            log(f"serving latency B={b:>4} {tag:>11}: "
                f"p50 {p50:.3f} ms  p99 {p99:.3f} ms  "
                f"({b / (p50 / 1e3):,.0f} ex/s at p50)")
    return out


def bench_jax(steps: int, warmup: int = 5) -> float:
    """Times N train steps inside ONE jit (lax.fori_loop) and differences two
    loop lengths — the remote-dispatch latency of the axon tunnel (~18 ms per
    call) would otherwise swamp the sub-millisecond step."""
    import jax
    import jax.numpy as jnp
    import optax

    from ml_function_tpu.features.schema import criteo_feature_set
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import TrainState, create_train_state, loss_fn

    log(f"jax backend: {jax.default_backend()} devices: {jax.devices()}")
    fs = criteo_feature_set([VOCAB] * N_SPARSE, n_dense=N_DENSE, embed_dim=DIM)
    model = get_model("deepfm", fs, hidden=HIDDEN)
    opt = optax.adam(1e-3)
    ts = create_train_state(model, jax.random.PRNGKey(0), opt)

    # device-resident synthetic batches, stacked: (n_buf, ...)
    rng = jax.random.PRNGKey(1)
    n_buf = 4
    k1, k2, k3 = jax.random.split(rng, 3)
    batches = {
        "dense": jax.random.uniform(k1, (n_buf, BATCH, N_DENSE), jnp.float32),
        "sparse": jax.random.randint(k2, (n_buf, BATCH, N_SPARSE), 1, VOCAB,
                                     jnp.int32),
        "label": jax.random.bernoulli(k3, 0.3, (n_buf, BATCH)).astype(
            jnp.float32),
    }
    jax.block_until_ready(batches)

    def one_step(ts, batch):
        rng_, step_rng = jax.random.split(ts.rng)
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, ts.model_state, batch, step_rng),
            has_aux=True)
        (total, (_, new_state, _, _)), grads = grad_fn(ts.params)
        updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params=params, opt_state=opt_state,
                          model_state=new_state, step=ts.step + 1,
                          rng=rng_), total

    def run_n(n):
        @jax.jit
        def f(ts, batches):
            def body(i, carry):
                ts, _ = carry
                b = jax.tree_util.tree_map(lambda x: x[i % n_buf], batches)
                return one_step(ts, b)
            ts, last = jax.lax.fori_loop(0, n, body,
                                         (ts, jnp.zeros((), jnp.float32)))
            return last
        v = float(f(ts, batches))      # compile + run, fetch forces sync
        t0 = time.perf_counter()
        v = float(f(ts, batches))
        return time.perf_counter() - t0, v

    short = max(steps // 10, 2)
    d_short, _ = run_n(short)
    d_long, loss = run_n(short + steps)
    per_step = (d_long - d_short) / steps
    eps = BATCH / per_step
    log(f"jax: {per_step*1e3:.3f} ms/step (loss {loss:.4f}) -> "
        f"{eps:,.0f} examples/s/chip")
    return eps


def bench_tf_reference(steps: int = 8, warmup: int = 2) -> float:
    """Reference-equivalent DeepFM in TF2 Keras (the reference's stack:
    per-field Embedding + shared-embedding FM & deep towers, BCE + Adam,
    models.py:80-90) on this host."""
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import numpy as np
    import tensorflow as tf

    import keras
    from keras import layers, ops

    inp_dense = keras.Input((N_DENSE,))
    inp_sparse = keras.Input((N_SPARSE,), dtype="int32")
    e = layers.Embedding(VOCAB * N_SPARSE, DIM)(inp_sparse)   # (B, F, D)
    lin_e = layers.Embedding(VOCAB * N_SPARSE, 1)(inp_sparse)

    class FMHead(layers.Layer):
        def call(self, e, lin_e, dense):
            s = ops.sum(e, axis=1)
            fm = 0.5 * ops.sum(ops.square(s) - ops.sum(ops.square(e), 1), -1)
            lin = ops.sum(lin_e[..., 0], axis=1)
            deep = ops.concatenate(
                [ops.reshape(e, (-1, N_SPARSE * DIM)), dense], -1)
            return fm, lin, deep

    fm, lin, deep = FMHead()(e, lin_e, inp_dense)
    for h in HIDDEN:
        deep = layers.Dense(h, activation="relu")(deep)
    deep = layers.Dense(1)(deep)

    class Score(layers.Layer):
        def call(self, fm, lin, deep):
            return ops.sigmoid(fm + lin + deep[:, 0])

    out = Score()(fm, lin, deep)
    m = keras.Model([inp_dense, inp_sparse], out)
    m.compile(optimizer="adam", loss="binary_crossentropy")

    rng = np.random.default_rng(0)
    xd = rng.uniform(0, 1, (BATCH, N_DENSE)).astype("float32")
    xs = rng.integers(1, VOCAB, (BATCH, N_SPARSE), dtype=np.int32)
    y = rng.integers(0, 2, BATCH).astype("float32")

    for _ in range(warmup):
        m.train_on_batch([xd, xs], y)
    t0 = time.perf_counter()
    for _ in range(steps):
        m.train_on_batch([xd, xs], y)
    dt = time.perf_counter() - t0
    eps = steps * BATCH / dt
    log(f"tf reference: {steps} steps in {dt:.3f}s -> {eps:,.0f} examples/s")
    return eps


def get_tf_baseline(cache=".bench_tf_baseline.json") -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), cache)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["examples_per_sec"]
    try:
        eps = bench_tf_reference()
    except Exception as e:  # TF missing/broken: report vs 0 sentinel
        log(f"tf baseline failed: {e}")
        return 0.0
    with open(path, "w") as f:
        json.dump({"examples_per_sec": eps, "config": {
            "batch": BATCH, "n_sparse": N_SPARSE, "vocab": VOCAB,
            "dim": DIM, "hidden": list(HIDDEN), "host": "cpu"}}, f)
    return eps


def bench_loader(rows: int = 500_000) -> float:
    """Native C++ Criteo loader throughput (rows/s) on a synthetic TSV."""
    import numpy as np

    from ml_function_tpu.features.native_loader import (native_available,
                                                        parse_buffer)
    if not native_available():
        log("loader: g++ unavailable, skipped")
        return 0.0
    rng = np.random.default_rng(0)
    lab = rng.integers(0, 2, rows).astype("U1")
    dense = rng.integers(0, 1000, (rows, N_DENSE)).astype("U4")
    sp = np.char.mod("%08x", rng.integers(0, 1 << 32, (rows, N_SPARSE)))
    cols = np.concatenate([lab[:, None], dense, sp], axis=1)
    buf = ("\n".join("\t".join(r) for r in cols) + "\n").encode()
    parse_buffer(buf)  # warm (thread pool, page cache)
    t0 = time.perf_counter()
    parse_buffer(buf)
    dt = time.perf_counter() - t0
    log(f"loader: {rows/dt/1e6:.2f}M rows/s ({len(buf)/dt/1e6:.0f} MB/s)")
    return rows / dt


def bench_avazu_loader(rows: int = 500_000) -> float:
    """Native Avazu CSV parser throughput (rows/s) on a synthetic file
    (22 categorical fields: hex ids + small ints + hour split)."""
    import numpy as np

    from ml_function_tpu.features.native_loader import (native_available,
                                                        parse_avazu_buffer)
    if not native_available():
        log("avazu loader: g++ unavailable, skipped")
        return 0.0
    rng = np.random.default_rng(0)
    header = (["id", "click", "hour", "C1", "banner_pos"]
              + [f"site_{i}" for i in range(9)]
              + [f"C{i}" for i in range(14, 22)])
    cols = [np.char.mod("%019d", rng.integers(0, 1 << 60, rows)),
            rng.integers(0, 2, rows).astype("U1"),
            np.char.mod("141021%02d", rng.integers(0, 24, rows)),
            np.char.mod("%d", rng.integers(1000, 1012, rows)),
            rng.integers(0, 3, rows).astype("U1")]
    for _ in range(9):
        cols.append(np.char.mod("%08x", rng.integers(0, 1 << 32, rows)))
    for _ in range(8):
        cols.append(np.char.mod("%d", rng.integers(15000, 16000, rows)))
    buf = ("\n".join(",".join(r) for r in zip(*cols)) + "\n").encode()
    parse_avazu_buffer(buf, header)  # warm
    t0 = time.perf_counter()
    parse_avazu_buffer(buf, header)
    dt = time.perf_counter() - t0
    log(f"avazu loader: {rows/dt/1e6:.2f}M rows/s "
        f"({len(buf)/dt/1e6:.0f} MB/s)")
    return rows / dt


def bench_walks(n_nodes: int = 20_000, n_edges: int = 200_000) -> float:
    """Native C++ walk engine throughput (steps/s) on a random graph."""
    import numpy as np

    from ml_function_tpu.embedding_pretrain import native_walks
    from ml_function_tpu.embedding_pretrain.graph import from_edges
    if not native_walks.native_available():
        log("walks: g++ unavailable, skipped")
        return 0.0
    rng = np.random.default_rng(0)
    edges = [(str(s), str(d), 1.0) for s, d in
             zip(rng.integers(0, n_nodes, n_edges),
                 rng.integers(0, n_nodes, n_edges))]
    g = from_edges(edges, undirected=True)
    native_walks.deepwalk_walks_native(g, 1, 5)  # warm build
    t0 = time.perf_counter()
    w = native_walks.deepwalk_walks_native(g, num_walks=10, walk_length=20)
    dt = time.perf_counter() - t0
    log(f"walks (deepwalk native): {w.size/dt/1e6:.1f}M steps/s")
    t0 = time.perf_counter()
    w = native_walks.node2vec_walks_native(g, num_walks=2, walk_length=20,
                                           p=2.0, q=0.5)
    dt = time.perf_counter() - t0
    log(f"walks (node2vec native): {w.size/dt/1e6:.1f}M steps/s")
    return w.size / dt


def run_board(steps: int, only=None):
    """The full bench board (VERDICT r2 #3): every row at current code, one
    command, one commit stamp. Writes markdown to .bench_board.md (stderr
    shows progress); PERF.md's board section is pasted from it."""
    import subprocess

    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True,
                                cwd=os.path.dirname(os.path.abspath(__file__))
                                ).stdout.strip()
    except Exception:
        commit = "?"
    stamp = time.strftime("%Y-%m-%d")
    rows = []

    def add(metric, value, note=""):
        rows.append((metric, value, note))
        log(f"[board] {metric}: {value} {note}")

    def tier(key, fn):
        if only and not any(o in key for o in only):
            return
        try:
            fn()
        except Exception as e:
            add(f"{key} FAILED", f"{type(e).__name__}", str(e)[:120])

    def interaction_tier():
        for name, hp in [("deepfm", {"hidden": HIDDEN}), ("xdeepfm", None),
                         ("dlrm", None), ("fibinet", None),
                         ("autoint", None)]:
            b, eps = bench_model_best_batch(name, steps // 2, hp)
            add(f"{name} train", f"{eps:,.0f} ex/s/chip", f"B={b}")
        b, eps = bench_model_best_batch("mmoe", steps // 2)
        add("mmoe train", f"{eps:,.0f} ex/s/chip", f"B={b}")

    def seq_tier():
        for name, kw in [
            ("din", dict(batch=4096, seq_len=64)),
            ("dien", dict(batch=4096, seq_len=64)),
            ("dsin", dict(batch=2048, seq_len=64, session_shape=(8, 8),
                          hp={"session_shape": (8, 8)})),
            ("hpmn", dict(batch=2048, seq_len=64)),
            ("mimn", dict(batch=1024, seq_len=64)),
        ]:
            eps = bench_seq_model(name, max(steps // 3, 4), **kw)
            add(f"{name} train", f"{eps:,.0f} ex/s/chip",
                f"B={kw['batch']}, L={kw['seq_len']}")

    def sim_tier():
        # PRODUCTION shape (VERDICT r3 next #4): SIM's whole design is
        # GSU-reduce-then-ESU — soft search scores the 16k stream against
        # the candidate ON-DEVICE (one einsum, MXU) and lax.top_k keeps
        # 256 keys for the ESU, so the batch can be production-sized.
        # Quality parity of reduced vs full ESU on planted data:
        # tests/test_models_longseq.py::test_sim_reduced_esu_matches_full.
        eps = bench_seq_model("sim", 4, batch=512, seq_len=64,
                              long_seq=16384,
                              hp={"search": "soft", "top_k": 256,
                                  "long_behavior": ("hist_long",)})
        add("sim train (16k keys, GSU top-256 -> ESU)",
            f"{eps:,.0f} ex/s/chip", "B=512, L_long=16384, soft search")
        # stress row: flash ESU over the RAW 16k stream (kernel ceiling,
        # not a model-throughput number — kept for the attention kernel)
        eps2 = bench_seq_model("sim", 4, batch=8, seq_len=64,
                               long_seq=16384,
                               hp={"search": "hard",
                                   "long_behavior": ("hist_long",)})
        add("sim flash-ESU stress (raw 16k keys)", f"{eps2:,.0f} ex/s/chip",
            "B=8, L_long=16384, no GSU reduction")

    def store_tier():
        med, spread = bench_lookup_tight()
        add("embedding lookups", f"{med/1e6:,.0f}M ids/s/chip",
            f"median of 5, spread {100*spread:.0f}%")
        global BATCH
        b_prev, BATCH = BATCH, 8192  # measured scoring optimum (PERF.md:
        # 8192: 2.96M · 16384: 1.69M · 32768: 1.73M ex/s — inference is
        # gather-latency-bound, not scatter-amortization-bound like training)
        try:
            add("deepfm scoring", f"{bench_scoring()/1e6:,.2f}M ex/s/chip",
                f"B={BATCH}")
            add("deepfm scoring int8 tables",
                f"{bench_scoring(quantize='int8')/1e6:,.2f}M ex/s/chip",
                f"B={BATCH}, 4x less table HBM")
        finally:
            BATCH = b_prev

    def sparse_tier():
        for v in (100_000, 1_000_000):
            r = bench_sparse_path(v, steps=6)
            total = v * N_SPARSE / 1e6
            add(f"sparse-row vs dense update (V={total:.0f}M)",
                f"{r['dense']*1e3:.1f} -> {r['sparse']*1e3:.1f} ms/step",
                f"{r['dense']/r['sparse']:.2f}x")

    def native_tier():
        add("native criteo loader", f"{bench_loader()/1e6:.2f}M rows/s",
            "host")
        add("native avazu loader", f"{bench_avazu_loader()/1e6:.2f}M rows/s",
            "host (22 categorical + hour split)")
        add("native node2vec walks", f"{bench_walks()/1e6:.1f}M steps/s",
            "host (deepwalk rate on stderr)")

    def latency_tier():
        # online-scoring latency board (VERDICT r4 weak #6)
        lat = bench_serving_latency()
        for (b, tag), v in lat.items():
            add(f"serving latency B={b} {tag}",
                f"p50 {v['p50_ms']:.3f} / p99 {v['p99_ms']:.3f} ms",
                f"{b / (v['p50_ms'] / 1e3):,.0f} ex/s at p50")
        # ShardedScorer leg runs on an 8-virtual-device CPU mesh (sharding
        # overhead, not chip latency) in a subprocess
        import subprocess
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--latency-sharded"], env=env,
                           capture_output=True, text=True, timeout=1200)
        if r.returncode == 0 and r.stdout.strip():
            for row in json.loads(r.stdout.strip().splitlines()[-1]):
                add(row["metric"], row["value"], row["note"])
        else:
            add("serving latency sharded FAILED", "subprocess",
                r.stderr[-120:])

    tier("interaction", interaction_tier)
    tier("seq", seq_tier)
    tier("sim", sim_tier)
    tier("store", store_tier)
    tier("latency", latency_tier)
    tier("sparse", sparse_tier)
    tier("native", native_tier)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_board.md")
    mode = "a" if only else "w"  # --only appends partial reruns
    with open(path, mode) as f:
        f.write(f"## Bench board — {stamp}, commit {commit}, v5e single "
                f"chip (`python bench.py --board`)\n\n")
        f.write("| metric | value | config |\n|---|---|---|\n")
        for m, v, n in rows:
            f.write(f"| {m} | {v} | {n} |\n")
    log(f"[board] written to {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=0, help="override BATCH")
    ap.add_argument("--skip-tf", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="also bench xdeepfm/din + lookup rate (stderr)")
    ap.add_argument("--board", action="store_true",
                    help="full refreshed bench board -> .bench_board.md")
    ap.add_argument("--only", type=str, default="",
                    help="board: comma list of tiers (interaction,seq,sim,"
                         "store,latency,sparse,native)")
    ap.add_argument("--latency-sharded", action="store_true",
                    help="internal: ShardedScorer latency leg (run under "
                         "JAX_PLATFORMS=cpu + 8 virtual devices)")
    args = ap.parse_args()

    if args.latency_sharded:
        # the image's sitecustomize re-registers the TPU backend through
        # jax.config — force CPU so the 8 virtual devices exist
        import jax
        jax.config.update("jax_platforms", "cpu")
        lat = bench_serving_latency(batches=(16, 256), reps=15, inner=12,
                                    sharded=True)
        print(json.dumps([
            {"metric": f"serving latency B={b} {tag} (CPU mesh 4x2)",
             "value": f"p50 {v['p50_ms']:.2f} / p99 {v['p99_ms']:.2f} ms",
             "note": "collective-exchange overhead leg, not chip latency"}
            for (b, tag), v in lat.items()]))
        return

    if args.batch:
        global BATCH
        BATCH = args.batch
    if args.board:
        run_board(args.steps,
                  only=[t for t in args.only.split(",") if t] or None)
        return
    eps = bench_jax(args.steps)
    if args.all:
        bench_model("xdeepfm", args.steps // 2)
        bench_model("dlrm", args.steps // 2)
        bench_model("fibinet", args.steps // 2)
        bench_lookup_rate()
        bench_scoring()
        bench_seq_model("din")
        bench_seq_model("dien")
        bench_loader()
        bench_walks()
    tf_eps = 0.0 if args.skip_tf else get_tf_baseline()
    vs = eps / tf_eps if tf_eps > 0 else 0.0
    print(json.dumps({
        "metric": "deepfm_criteo_train_throughput",
        "value": round(eps, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
