"""Cold-start warm-up: learn-to-learn ID embeddings (MetaEmbedding).

Implements the workflow of the reference shelf's "[Warm Up Cold-start
Advertisements] Improving CTR Predictions via Learning to Learn ID
Embeddings" (SIGIR'19) end-to-end:

1. train a base model (any registry model) on "old ads";
2. meta-train the embedding generator on old ads with the two-phase
   cold/warm objective (frozen base model);
3. simulate NEW ads: reset their ID rows, compare eval logloss of
   zero-init vs generated (meta) init — the paper's cold-phase metric.

    python examples/coldstart_warmup.py --model deepfm --epochs 3
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepfm")
    ap.add_argument("--rows", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--meta-steps", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--cold-lr", type=float, default=0.1)
    ap.add_argument("--alpha", type=float, default=0.1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ml_function_tpu.features.synthetic import make_criteo_like
    from ml_function_tpu.models import (MetaEmbedding, get_model,
                                        make_meta_train_step)
    from ml_function_tpu.models.coldstart import make_meta_batch_pairs
    from ml_function_tpu.train.loop import (iter_batches, fit,
                                            train_test_split)

    fs, data = make_criteo_like(n_rows=args.rows, n_dense=4, n_sparse=8,
                                vocab_size=500, embed_dim=8, seed=0)
    target = fs.sparse[0].name  # treat field 0 as the ad-ID field
    train, test = train_test_split(data, 0.2, seed=0)

    # 1) base model on old ads
    model = get_model(args.model, fs)
    ts, res = fit(model, train, epochs=args.epochs,
                  batch_size=args.batch_size, learning_rate=2e-3,
                  eval_data=test)
    print(f"base {args.model}: eval {res.eval_metrics}")

    # 2) meta-train the generator (base model frozen)
    meta = MetaEmbedding(fs, target=target)
    gp = meta.init(jax.random.PRNGKey(1))
    opt = optax.adam(1e-2)
    os_ = opt.init(gp)
    step = make_meta_train_step(meta, model, opt, cold_lr=args.cold_lr,
                                alpha=args.alpha)
    # meta_loss's contract: batch_a/batch_b pair rows of the SAME ads —
    # make_meta_batch_pairs groups by the target ad id per position
    n, first, last, epoch = 0, None, None, 0
    while n < args.meta_steps:
        for ba, bb in make_meta_batch_pairs(train, fs, target,
                                            args.batch_size,
                                            seed=epoch):
            gp, os_, loss = step(gp, os_, ts.params, ts.model_state, ba, bb)
            first = first if first is not None else float(loss)
            last = float(loss)
            n += 1
            if n >= args.meta_steps:
                break
        epoch += 1
    print(f"meta loss {first:.4f} -> {last:.4f} over {n} steps")

    # 3) cold-phase eval: zero the target field's rows (new ads) and score
    # the test set with zero-init vs generated init. BOTH column groups are
    # reset — emb_override replaces only the cross embedding, so leaving the
    # trained (V, 1) first-order weights would leak memorized per-id CTR
    # into both arms.
    off = fs.sparse_offsets()[fs.sparse_index(target)]
    spec = fs.sparse[fs.sparse_index(target)]
    sl = slice(off, off + spec.vocab_size)
    zeroed_t = ts.params["embedding"]["table"].at[sl].set(0.0)
    zeroed_l = ts.params["embedding"]["linear"].at[sl].set(0.0)
    cold_params = dict(ts.params)
    cold_params["embedding"] = dict(ts.params["embedding"],
                                    table=zeroed_t, linear=zeroed_l)

    def eval_logloss(params, override):
        losses, weights = [], []
        for b in iter_batches(test, args.batch_size):
            bb = dict(b)
            if override:
                bb["emb_override"] = {
                    target: meta.generate(gp, params["embedding"], b)}
            logits, _, _ = model.apply(params, ts.model_state, bb,
                                       train=False)
            p = jax.nn.sigmoid(logits)
            y = b["label"]
            ll = -(y * jnp.log(p + 1e-7) + (1 - y) * jnp.log(1 - p + 1e-7))
            w = b.get("weight")
            if w is None:
                w = jnp.ones_like(ll)
            losses.append(float(jnp.sum(ll * w)))
            weights.append(float(jnp.sum(w)))
        return sum(losses) / sum(weights)

    cold_zero = eval_logloss(cold_params, override=False)
    cold_meta = eval_logloss(cold_params, override=True)
    print(f"cold-ad logloss: zero-init {cold_zero:.4f}  "
          f"meta-init {cold_meta:.4f}  "
          f"({'meta wins' if cold_meta < cold_zero else 'zero wins'})")


if __name__ == "__main__":
    main()
