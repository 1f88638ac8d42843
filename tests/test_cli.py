"""CLI driver (train/cli.py): synthetic and native-stream data sources."""

import numpy as np
import pytest

from ml_function_tpu.train.cli import main


def test_cli_synthetic_train_eval():
    res = main([
        "--config.model.name=deepfm", "--config.model.hidden=(16,8)",
        "--config.data.n_rows=512", "--config.data.vocab_size=50",
        "--config.train.batch_size=64", "--config.train.log_every=0",
    ])
    assert res["steps"] > 0
    assert np.isfinite(res["train"]["logloss"])
    assert res["eval"]["count"] > 0


def test_cli_stream_source(tmp_path):
    nl = pytest.importorskip("ml_function_tpu.features.native_loader")
    if not nl.native_available():
        pytest.skip("g++ toolchain unavailable")
    rng = np.random.default_rng(0)

    def mk(path, rows):
        lines = []
        for _ in range(rows):
            fields = ([str(rng.integers(0, 2))]
                      + [str(rng.integers(0, 40)) for _ in range(3)]
                      + [f"v{rng.integers(0, 30)}" for _ in range(4)])
            lines.append("\t".join(fields))
        path.write_text("\n".join(lines) + "\n")

    train_p, eval_p = tmp_path / "train.tsv", tmp_path / "eval.tsv"
    mk(train_p, 600)
    mk(eval_p, 128)
    res = main([
        "--config.model.name=deepfm", "--config.model.hidden=(16,8)",
        "--config.data.source=stream", f"--config.data.path={train_p}",
        f"--config.data.eval_path={eval_p}",
        "--config.data.n_dense=3", "--config.data.n_sparse=4",
        "--config.data.hash_buckets=256",
        "--config.train.batch_size=64", "--config.train.log_every=0",
    ])
    assert res["steps"] == 600 // 64
    assert np.isfinite(res["train"]["logloss"])
    assert res["eval"]["count"] == 128


def test_cli_sparse_row_optimizer():
    """--config.train.row_optimizer routes training through the sharded
    sparse-row path (parallel/sparse.py) end-to-end."""
    res = main([
        "--config.model.name=deepfm", "--config.model.hidden=(16,8)",
        "--config.data.n_rows=512", "--config.data.vocab_size=50",
        "--config.train.batch_size=64", "--config.train.log_every=0",
        "--config.train.row_optimizer=adagrad",
        "--config.train.row_learning_rate=0.05",
        "--config.mesh.model=2", "--config.train.epochs=2",
    ])
    assert res["steps"] > 0
    assert np.isfinite(res["train"]["logloss"])
    assert res["eval"]["count"] > 0


def test_cli_checkpoint_rejects_layout_mismatch(tmp_path):
    """A checkpoint written for one table layout must fail LOUDLY when
    resumed into a differently-planned FeatureSet (fingerprint stamp)."""
    import pytest

    import json
    import os

    args = ["--config.model.name=fm", "--config.data.n_rows=256",
            "--config.data.vocab_size=50", "--config.train.batch_size=64",
            "--config.train.log_every=0",
            f"--config.train.checkpoint_dir={tmp_path}"]
    main(args)
    # a same-total-rows LAYOUT permutation changes the fingerprint but not
    # any array shape — the case the shape check cannot catch
    from ml_function_tpu.features.schema import FeatureSet, SparseSpec
    a = FeatureSet(sparse=(SparseSpec("x", 10, dim=4),
                           SparseSpec("y", 20, dim=4)))
    b = a.replace(vocab_layout=(("y", 0), ("x", 20)))  # same rows, permuted
    assert a.total_vocab == b.total_vocab
    assert a.fingerprint != b.fingerprint

    # simulate exactly that: same shapes, stamped fingerprint differs
    ck = sorted(os.listdir(tmp_path))[-1]
    man_path = tmp_path / ck / "manifest.json"
    man = json.loads(man_path.read_text())
    man["extra"]["fs_fingerprint"] = "deadbeefdeadbeef"
    man_path.write_text(json.dumps(man))
    with pytest.raises(ValueError, match="different table layout"):
        main(args)


def test_cli_seq_shard_and_pipeline_flags():
    """--config.mesh.seq_shard routes SIM's GSU through the seq-parallel
    tier; --config.mesh.pp_microbatches pipelines AutoInt's block stack —
    both from the production entrypoint (r5)."""
    r1 = main(["--config.model.name=sim", "--config.data.seq_len=16",
               "--config.data.n_rows=256", "--config.mesh.model=2",
               "--config.mesh.seq_shard=true",
               "--config.train.batch_size=64", "--config.train.epochs=1",
               "--config.train.log_every=0"])
    assert np.isfinite(r1["eval"]["logloss"])
    assert "gauc" in r1["eval"]  # group column -> GAUC in the CLI result
    r2 = main(["--config.model.name=autoint", "--config.data.n_rows=256",
               "--config.data.n_sparse=5", "--config.data.vocab_size=50",
               "--config.mesh.model=2", "--config.mesh.pp_microbatches=2",
               "--config.model.extra.n_layers=4",
               "--config.train.batch_size=64", "--config.train.epochs=1",
               "--config.train.log_every=0"])
    assert np.isfinite(r2["eval"]["logloss"])
