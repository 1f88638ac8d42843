"""Interaction-model training on Criteo-format data.

Counterpart of the reference driver ``example/ctr_example/un_seq.py``
(FM on Criteo CSVs). Runs on synthetic planted-structure data by default;
pass ``--csv path`` for a real Criteo-format file (label, I1..I13, C1..C26).

    python examples/criteo_interaction.py --model deepfm --epochs 2
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deepfm")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=2e-3)
    args = ap.parse_args()

    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import fit, train_test_split

    if args.csv:
        from ml_function_tpu.features.pipeline import criteo_csv_pipeline
        fs, data = criteo_csv_pipeline(args.csv)
    else:
        from ml_function_tpu.features.synthetic import make_criteo_like
        fs, data = make_criteo_like(n_rows=args.rows, vocab_size=1000)

    train, test = train_test_split(data, 0.1)
    model = get_model(args.model, fs)
    _, res = fit(model, train, epochs=args.epochs,
                 batch_size=args.batch_size, learning_rate=args.lr,
                 eval_data=test, log_every=100, verbose=True)
    print(f"{args.model}: eval {res.eval_metrics} "
          f"({res.examples_per_sec:,.0f} ex/s)")


if __name__ == "__main__":
    main()
