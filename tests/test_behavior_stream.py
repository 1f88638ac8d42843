"""Out-of-core behavior-sequence stream (features/behavior_stream.py):
parser correctness, chunk-boundary carry, per-host sharding, CLI training."""

import numpy as np
import pytest

from ml_function_tpu.features.behavior_stream import (BehaviorFileIterator,
                                                      encode_int_ids,
                                                      load_behavior_stream)


def _write_csv(path, n_rows, seq_len=6, long_len=0, n_items=500, n_cates=30,
               seed=0):
    rng = np.random.default_rng(seed)
    cols = "label,item,cate,hist_item,hist_cate"
    if long_len:
        cols += ",hist_long"
    lines = [cols]
    rows = []
    for _ in range(n_rows):
        L = int(rng.integers(1, seq_len + 1))
        hi = rng.integers(1, n_items, L)
        hc = rng.integers(1, n_cates, L)
        r = {"label": int(rng.integers(0, 2)),
             "item": int(rng.integers(1, n_items)),
             "cate": int(rng.integers(1, n_cates)),
             "hist_item": hi, "hist_cate": hc}
        line = (f"{r['label']},{r['item']},{r['cate']},"
                f"{'|'.join(map(str, hi))},{'|'.join(map(str, hc))}")
        if long_len:
            hl = rng.integers(1, n_items, int(rng.integers(1, long_len + 1)))
            r["hist_long"] = hl
            line += "," + "|".join(map(str, hl))
        rows.append(r)
        lines.append(line)
    path.write_text("\n".join(lines) + "\n")
    return rows


def test_parser_matches_manual_encoding(tmp_path):
    p = tmp_path / "beh.csv"
    rows = _write_csv(p, 40, seq_len=6)
    fs, data = load_behavior_stream(p, seq_len=6, item_buckets=64,
                                    cate_buckets=16)
    assert len(data["label"]) == 40
    assert [s.name for s in fs.seq] == ["hist_item", "hist_cate"]
    for i, r in enumerate(rows):
        assert data["label"][i] == r["label"]
        assert data["sparse"][i, 0] == (r["item"] % 63) + 1
        assert data["sparse"][i, 1] == (r["cate"] % 15) + 1
        want = np.zeros(6, np.int32)
        hi = r["hist_item"][-6:]
        want[:len(hi)] = (hi % 63) + 1      # right-pad, keep most recent
        np.testing.assert_array_equal(data["seq"]["hist_item"][i], want)


def test_chunk_boundaries_and_carry(tmp_path):
    """Tiny chunks force mid-batch chunk boundaries; the carried batches
    must equal the single-chunk read row for row."""
    p = tmp_path / "beh.csv"
    _write_csv(p, 120, seq_len=5)
    kw = dict(seq_len=5, item_buckets=128, cate_buckets=16)
    big = list(iter(BehaviorFileIterator(p, 32, chunk_bytes=1 << 24, **kw)))
    small = list(iter(BehaviorFileIterator(p, 32, chunk_bytes=1 << 16,
                                           **kw)))
    assert len(big) == len(small) == 120 // 32
    for a, b in zip(big, small):
        np.testing.assert_array_equal(a["sparse"], b["sparse"])
        np.testing.assert_array_equal(a["label"], b["label"])
        for k in a["seq"]:
            np.testing.assert_array_equal(a["seq"][k], b["seq"][k])


def test_shards_are_disjoint_and_cover(tmp_path):
    p = tmp_path / "beh.csv"
    _write_csv(p, 2000, seq_len=20)  # ~300 KB -> several 64 KiB chunks
    kw = dict(seq_len=20, item_buckets=64, cate_buckets=16,
              chunk_bytes=1 << 16)
    rows_by_shard = []
    for i in range(2):
        got = list(iter(BehaviorFileIterator(p, 16, shard=(i, 2), **kw)))
        rows_by_shard.append(
            np.concatenate([b["sparse"] for b in got]) if got else
            np.zeros((0, 2), np.int32))
    n0, n1 = len(rows_by_shard[0]), len(rows_by_shard[1])
    assert n0 > 0 and n1 > 0
    # full batches only (tail dropped per shard) — but chunks are disjoint:
    # together they cannot exceed the file and must differ
    assert n0 + n1 <= 2000
    assert not np.array_equal(rows_by_shard[0][:16], rows_by_shard[1][:16])


def test_long_sequence_field(tmp_path):
    p = tmp_path / "beh.csv"
    _write_csv(p, 24, seq_len=4, long_len=12)
    fs, data = load_behavior_stream(p, seq_len=4, long_seq_len=12,
                                    item_buckets=64, cate_buckets=16)
    assert data["seq"]["hist_long"].shape == (24, 12)
    assert [s.name for s in fs.seq] == ["hist_item", "hist_cate",
                                        "hist_long"]


def test_cli_behavior_stream_trains_din(tmp_path):
    from ml_function_tpu.train.cli import main
    train_p, eval_p = tmp_path / "train.csv", tmp_path / "eval.csv"
    _write_csv(train_p, 400, seq_len=8, seed=1)
    _write_csv(eval_p, 64, seq_len=8, seed=2)
    res = main([
        "--config.model.name=din", "--config.model.hidden=(16,8)",
        "--config.data.source=behavior_stream",
        f"--config.data.path={train_p}",
        f"--config.data.eval_path={eval_p}",
        "--config.data.seq_len=8", "--config.data.hash_buckets=128",
        "--config.data.cate_buckets=32",
        "--config.train.batch_size=64", "--config.train.log_every=0",
    ])
    assert res["steps"] == 400 // 64
    assert np.isfinite(res["train"]["logloss"])
    assert res["eval"]["count"] == 64


def test_native_parser_matches_python(tmp_path):
    """The C++ behavior parser must reproduce the Python encoding bit for
    bit (labels, bucket encode, keep-most-recent right-padded histories,
    long field, chunk carry)."""
    from ml_function_tpu.features.behavior_stream import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    p = tmp_path / "beh.csv"
    _write_csv(p, 500, seq_len=9, long_len=17)
    kw = dict(seq_len=7, long_seq_len=12, item_buckets=64, cate_buckets=16,
              chunk_bytes=1 << 16)
    a = list(iter(BehaviorFileIterator(p, 64, engine="python", **kw)))
    b = list(iter(BehaviorFileIterator(p, 64, engine="native", **kw)))
    assert len(a) == len(b) == 500 // 64
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa["label"], xb["label"])
        np.testing.assert_array_equal(xa["sparse"], xb["sparse"])
        for k in xa["seq"]:
            np.testing.assert_array_equal(xa["seq"][k], xb["seq"][k], err_msg=k)


def test_native_parser_skips_blank_lines(tmp_path):
    """Blank lines (interspersed AND a trailing \\n\\n) must not become
    zero-filled rows in the native engine — the Python engine filters them
    (`if ln`), so both engines must agree on row count and content
    (ADVICE r4)."""
    from ml_function_tpu.features.behavior_stream import native_available
    if not native_available():
        pytest.skip("g++ toolchain unavailable")
    p = tmp_path / "beh.csv"
    _write_csv(p, 130, seq_len=5, long_len=9)
    text = p.read_text().splitlines()
    # inject a blank line every 7 rows + double-blank tail
    out = []
    for i, ln in enumerate(text):
        out.append(ln)
        if i % 7 == 3:
            out.append("")
    p.write_text("\n".join(out) + "\n\n")
    kw = dict(seq_len=5, long_seq_len=9, item_buckets=64, cate_buckets=16,
              chunk_bytes=1 << 12)  # small chunks: blanks cross chunk seams
    a = list(iter(BehaviorFileIterator(p, 32, engine="python", **kw)))
    b = list(iter(BehaviorFileIterator(p, 32, engine="native", **kw)))
    assert len(a) == len(b) == 130 // 32
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa["label"], xb["label"])
        np.testing.assert_array_equal(xa["sparse"], xb["sparse"])
        for k in xa["seq"]:
            np.testing.assert_array_equal(xa["seq"][k], xb["seq"][k],
                                          err_msg=k)
