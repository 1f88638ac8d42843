"""Behavior-sequence model training (DIN/DIEN/BST/SeqFM/DSTN/DMIN/HPMN).

Counterpart of the reference driver ``example/ctr_example/seq.py`` (DIEN on
'a|b|c' history CSVs). Synthetic planted-interest data by default; pass
``--csv`` for a behavior CSV (item, cate, hist_item, hist_cate, label).

    python examples/behavior_seq.py --model dien --epochs 3
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dien")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--rows", type=int, default=8000)
    ap.add_argument("--seq-len", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-3)
    args = ap.parse_args()

    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import fit, train_test_split

    if args.csv:
        from ml_function_tpu.features.pipeline import behavior_csv_pipeline
        fs, data = behavior_csv_pipeline(args.csv, seq_len=args.seq_len)
    else:
        from ml_function_tpu.features.synthetic import make_behavior_data
        fs, data = make_behavior_data(n_rows=args.rows, n_items=500,
                                      seq_len=args.seq_len)

    train, test = train_test_split(data, 0.1)
    model = get_model(args.model, fs, hidden=(128, 64))
    _, res = fit(model, train, epochs=args.epochs,
                 batch_size=args.batch_size, learning_rate=args.lr,
                 eval_data=test, log_every=50, verbose=True)
    print(f"{args.model}: eval {res.eval_metrics} "
          f"({res.examples_per_sec:,.0f} ex/s)")


if __name__ == "__main__":
    main()
