"""CVR multi-task training (ESMM / MMoE) on impression-space data.

The reference reserves ``kon/model/cvr_model/`` for this but never implements
it (init-only stubs; SURVEY §2.9). Data carries TWO targets per impression:
``click`` and ``label`` (conversion, observed only on clicks); ESMM trains
pCTR·pCVR over the entire impression space, MMoE trains both heads through
a shared mixture-of-experts bottom.

    python examples/cvr_multitask.py --model esmm --epochs 3
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="esmm", choices=["esmm", "mmoe"])
    ap.add_argument("--rows", type=int, default=50_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=2e-3)
    args = ap.parse_args()

    from ml_function_tpu.features.synthetic import make_cvr_data
    from ml_function_tpu.models import get_model
    from ml_function_tpu.train.loop import fit, train_test_split

    fs, data = make_cvr_data(n_rows=args.rows, n_dense=4, n_sparse=8,
                             vocab_size=200)
    train, test = train_test_split(data, 0.1)
    model = get_model(args.model, fs)
    _, res = fit(model, train, epochs=args.epochs,
                 batch_size=args.batch_size, learning_rate=args.lr,
                 eval_data=test, log_every=100, verbose=True)
    print(f"{args.model}: conversion eval {res.eval_metrics} "
          f"({res.examples_per_sec:,.0f} ex/s)")


if __name__ == "__main__":
    main()
