"""SIM lifelong-sequence training (soft top-k search + DIEN short-term core).

Counterpart of the reference driver ``example/ctr_example/sim_seq.py``.
Long sequences route ESU attention through the Pallas flash kernel
automatically (Lk ≥ 512).
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--top-k", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()

    from ml_function_tpu.features.synthetic import make_behavior_data
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import fit, train_test_split

    fs, data = make_behavior_data(n_rows=args.rows, n_items=1000,
                                  seq_len=args.seq_len)
    train, test = train_test_split(data, 0.1)
    model = get_model("sim", fs, hidden=(128, 64), top_k=args.top_k)
    _, res = fit(model, train, epochs=args.epochs, batch_size=128,
                 learning_rate=3e-3, eval_data=test, log_every=20,
                 verbose=True)
    print(f"sim: eval {res.eval_metrics}")


if __name__ == "__main__":
    main()
