"""DSIN session-interest training.

Counterpart of the reference driver ``example/ctr_example/session.py``
(time-bucketed sessions → DSIN). Synthetic sessions by default (4 sessions ×
8 items); real data via ``behavior_csv_pipeline(..., session_shape=(S, L))``.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=6000)
    ap.add_argument("--sessions", type=int, default=4)
    ap.add_argument("--session-len", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from ml_function_tpu.features.synthetic import make_behavior_data
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import fit, train_test_split

    shape = (args.sessions, args.session_len)
    fs, data = make_behavior_data(
        n_rows=args.rows, n_items=300,
        seq_len=shape[0] * shape[1], session_shape=shape)
    train, test = train_test_split(data, 0.1)
    model = get_model("dsin", fs, hidden=(128, 64))
    _, res = fit(model, train, epochs=args.epochs, batch_size=256,
                 learning_rate=3e-3, eval_data=test, log_every=50,
                 verbose=True)
    print(f"dsin: eval {res.eval_metrics}")


if __name__ == "__main__":
    main()
