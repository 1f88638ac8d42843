"""Checkpoint / resume.

The reference only checkpoints in its embedding trainer
(``ModelCheckpoint(save_best_only, weights_only)``,
``kon/model/embedding/walk_core_model.py:203-227``) and saves nothing in the
CTR path. Here checkpointing is first-class (SURVEY §5.4): full TrainState
(params + optimizer moments + model state + step + rng) and data-iterator
position, atomic write, keep-last-k GC, resume-by-step.

TWO formats, one API (self-contained .npz + JSON manifest, no orbax version
coupling):

- ``dense`` (single-process): one ``arrays.npz`` of '/'-joined keypath →
  full array (sharded arrays are fetched to host; re-placement happens
  through the caller's shardings).
- ``sharded`` (multi-process, or ``format='sharded'``): each process writes
  ``shards_<pid>.npz`` holding ONLY the table blocks whose owner device it
  hosts (replicas deduped by lowest device id), so no process ever
  materializes a full row-sharded table — the multi-host pod-slice path.
  Restore re-assembles global arrays per device via
  ``jax.make_array_from_single_device_arrays`` against the template's
  shardings (exact block match), or host-stitches when the restore topology
  differs (single-process only for big tables, by design).

``save_checkpoint`` picks ``sharded`` automatically when
``jax.process_count() > 1``; every process must call save/restore
(collective barriers inside).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..utils.logging import logger
from .loop import TrainState

_SEP = "/"


def _flatten(tree) -> Dict[str, Any]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path)
        flat[key or "_root"] = leaf
    return flat


def _unflatten_like(template, flat: Dict[str, Any]):
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, old_leaf in paths:
        key = _SEP.join(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path) or "_root"
        if key not in flat:
            raise KeyError(f"checkpoint missing key {key!r}")
        new = flat[key]
        if hasattr(old_leaf, "shape") and tuple(old_leaf.shape) != tuple(new.shape):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {new.shape} vs "
                f"template {old_leaf.shape}")
        leaves.append(new)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _span_key(idx: Tuple, shape: Tuple[int, ...]) -> str:
    """Shard index (tuple of slices) → 'lo-hi,lo-hi' span string."""
    parts = []
    for sl, dim in zip(idx, shape):
        lo = 0 if sl.start is None else int(sl.start)
        hi = dim if sl.stop is None else int(sl.stop)
        parts.append(f"{lo}-{hi}")
    return ",".join(parts) if parts else "scalar"


def _span_slices(span: str) -> Tuple[slice, ...]:
    if span == "scalar":
        return ()
    return tuple(slice(*map(int, p.split("-"))) for p in span.split(","))


def _tree_of(ts: TrainState) -> Dict[str, Any]:
    return {"params": ts.params, "opt_state": ts.opt_state,
            "model_state": ts.model_state, "step": ts.step, "rng": ts.rng}


def _sync(tag: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(ckpt_dir: str, ts: TrainState, *,
                    extra: Optional[Dict[str, Any]] = None,
                    keep: int = 3, format: Optional[str] = None) -> str:
    """Atomically write step-stamped checkpoint; GC old ones (keep last k).

    ``format``: None → 'sharded' when multi-process else 'dense'. In a
    multi-process run EVERY process must call this (barriers inside); each
    writes only its owned table blocks."""
    fmt = format or ("sharded" if jax.process_count() > 1 else "dense")
    step = int(jax.device_get(ts.step))
    os.makedirs(ckpt_dir, exist_ok=True)
    final = os.path.join(ckpt_dir, f"ckpt_{step:010d}")
    if fmt == "dense":
        flat = {k: np.asarray(jax.device_get(v))
                for k, v in _flatten(_tree_of(ts)).items()}
        tmp = tempfile.mkdtemp(dir=ckpt_dir, prefix=".tmp_")
        try:
            np.savez(os.path.join(tmp, "arrays.npz"), **flat)
            with open(os.path.join(tmp, "manifest.json"), "w") as f:
                json.dump({"step": step, "format": "dense",
                           "keys": sorted(flat), "extra": extra or {}}, f)
            if os.path.exists(final):
                shutil.rmtree(final)
            os.rename(tmp, final)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    else:
        _save_sharded(ckpt_dir, final, ts, step, extra)

    if jax.process_index() == 0:
        for old in all_checkpoints(ckpt_dir)[:-keep]:
            shutil.rmtree(old, ignore_errors=True)
    return final


def _save_sharded(ckpt_dir: str, final: str, ts: TrainState, step: int,
                  extra: Optional[Dict[str, Any]]) -> None:
    pid = jax.process_index()
    tmp = os.path.join(ckpt_dir, f".tmp_ckpt_{step:010d}")
    if pid == 0 and os.path.exists(tmp):
        shutil.rmtree(tmp)
    _sync("ckpt_tmp_clean")
    os.makedirs(tmp, exist_ok=True)

    flat = _flatten(_tree_of(ts))
    mine: Dict[str, np.ndarray] = {}
    shapes, dtypes = {}, {}
    for key, leaf in flat.items():
        arr = leaf if isinstance(leaf, jax.Array) else jax.numpy.asarray(leaf)
        shapes[key] = list(arr.shape)
        dtypes[key] = np.dtype(arr.dtype).name
        # one writer per distinct block: the lowest device id holding it
        owner: Dict[str, int] = {}
        for dev, idx in arr.sharding.devices_indices_map(arr.shape).items():
            span = _span_key(idx, arr.shape)
            owner[span] = min(owner.get(span, dev.id), dev.id)
        for sh in arr.addressable_shards:
            span = _span_key(sh.index, arr.shape)
            if owner[span] == sh.device.id:
                mine[f"{key}::{span}"] = np.asarray(sh.data)
    np.savez(os.path.join(tmp, f"shards_{pid:05d}.npz"), **mine)
    _sync("ckpt_shards_written")
    if pid == 0:
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump({"step": step, "format": "sharded",
                       "keys": sorted(flat), "shapes": shapes,
                       "dtypes": dtypes,
                       "process_count": jax.process_count(),
                       "extra": extra or {}}, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
    _sync("ckpt_finalized")


def all_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = [os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
           if re.fullmatch(r"ckpt_\d{10}", d)]
    return sorted(out)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    cks = all_checkpoints(ckpt_dir)
    return cks[-1] if cks else None


def restore_latest(ckpt_dir: str, ts_template: TrainState
                   ) -> Tuple[Optional[TrainState], Dict[str, Any], str]:
    """Restore the newest readable checkpoint, FALLING BACK to older ones
    when the newest is torn/corrupt (a host killed mid-write after the
    atomic rename, a truncated filesystem, a bad disk — the restart half
    of elastic recovery must not wedge on it). Returns
    ``(ts | None, extra, path | '')``; corrupt candidates are renamed to
    ``<name>.corrupt`` so the next restart doesn't retry them.

    Multi-process runs reach CONSENSUS before loading (ADVICE r4): process
    0 alone probes candidates newest-first (manifest + shard-file
    readability), quarantines corrupt ones, and broadcasts the selected
    step to all processes, which then restore the SAME path — hosts can
    never resume from different steps, and no peer races a mid-restore
    ``.corrupt`` rename."""
    if jax.process_count() > 1:
        return _restore_latest_consensus(ckpt_dir, ts_template)
    last_err: Optional[Exception] = None
    for path in reversed(all_checkpoints(ckpt_dir)):
        try:
            ts, extra = restore_checkpoint(path, ts_template)
            if last_err is not None:
                logger.warning("restored older checkpoint %s (newer ones "
                               "corrupt: %s)", path, last_err)
            return ts, extra, path
        except (OSError, ValueError, KeyError, json.JSONDecodeError,
                EOFError) as e:  # torn write / bad zip / missing member
            last_err = e
            logger.warning("checkpoint %s unreadable (%s) — trying older",
                           path, e)
            try:
                os.replace(path, path + ".corrupt")
            except OSError:
                pass
    if last_err is not None:
        logger.error("no readable checkpoint in %s (last error: %s)",
                     ckpt_dir, last_err)
    return None, {}, ""


def _probe_checkpoint(path: str) -> None:
    """Cheap readability probe (no array bytes decompressed): manifest
    parses; sharded format additionally requires every ``shards_*.npz``
    openable and jointly covering the manifest's keys. Raises on failure."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest.get("format", "dense") == "sharded":
        seen = set()
        files = sorted(glob.glob(os.path.join(path, "shards_*.npz")))
        if not files:
            raise OSError(f"no shard files in {path}")
        for fp in files:
            with np.load(fp, allow_pickle=False) as npz:  # zip dir read only
                for name in npz.files:
                    seen.add(name.rsplit("::", 1)[0])
        missing = set(manifest["keys"]) - seen
        if missing:
            raise KeyError(f"checkpoint {path} missing keys "
                           f"{sorted(missing)[:3]}...")
    else:
        # dense: the npz central directory must parse
        with np.load(os.path.join(path, "arrays.npz"),
                     allow_pickle=False) as npz:
            if not set(manifest["keys"]) <= set(npz.files):
                raise KeyError(f"checkpoint {path} npz is missing keys")


def _restore_latest_consensus(ckpt_dir: str, ts_template: TrainState
                              ) -> Tuple[Optional[TrainState],
                                         Dict[str, Any], str]:
    from jax.experimental import multihost_utils

    sel_step = -1
    if jax.process_index() == 0:
        for path in reversed(all_checkpoints(ckpt_dir)):
            try:
                _probe_checkpoint(path)
                sel_step = int(os.path.basename(path).split("_")[1])
                break
            except (OSError, ValueError, KeyError, json.JSONDecodeError,
                    EOFError) as e:
                logger.warning("checkpoint %s unreadable (%s) — trying "
                               "older", path, e)
                try:  # only process 0 quarantines — peers never race this
                    os.replace(path, path + ".corrupt")
                except OSError:
                    pass
    sel_step = int(multihost_utils.broadcast_one_to_all(
        np.asarray(sel_step, np.int64)))
    if sel_step < 0:
        return None, {}, ""
    path = os.path.join(ckpt_dir, f"ckpt_{sel_step:010d}")
    # an agreed-on path that still fails to read is a REAL error now —
    # raising beats silently training from divergent steps
    ts, extra = restore_checkpoint(path, ts_template)
    return ts, extra, path


def restore_checkpoint(path: str, ts_template: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the template's structure (and shardings via device_put /
    per-device assembly against the template leaves' shardings)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    tree = {"params": ts_template.params, "opt_state": ts_template.opt_state,
            "model_state": ts_template.model_state,
            "step": ts_template.step, "rng": ts_template.rng}

    if manifest.get("format", "dense") == "sharded":
        ts = _restore_sharded(path, manifest, tree)
        return ts, manifest.get("extra", {})

    arrays = dict(np.load(os.path.join(path, "arrays.npz"), allow_pickle=False))
    restored = _unflatten_like(tree, arrays)

    def place(new, old):
        sharding = getattr(old, "sharding", None)
        if sharding is not None:
            return jax.device_put(new, sharding)
        return jax.device_put(new)

    placed = jax.tree_util.tree_map(place, restored, tree)
    ts = TrainState(params=placed["params"], opt_state=placed["opt_state"],
                    model_state=placed["model_state"], step=placed["step"],
                    rng=placed["rng"])
    return ts, manifest.get("extra", {})


def _restore_sharded(path: str, manifest: Dict, tree) -> TrainState:
    """Per-device reassembly: every process indexes the shard files (shared
    filesystem / object store) but DECOMPRESSES only the blocks its local
    devices own under the TEMPLATE's sharding (NpzFile members are lazy) —
    a same-grid multi-process restore never materializes a full table on
    any host. Saved blocks that match the template's shard grid are placed
    directly; a differing grid host-stitches just the affected leaf."""
    # lazy index: (key, span) -> (NpzFile, member name); nothing is read yet
    files = [np.load(f, allow_pickle=False)
             for f in sorted(glob.glob(os.path.join(path, "shards_*.npz")))]
    index: Dict[str, Dict[str, Tuple] ] = {}
    for npz in files:
        for name in npz.files:
            key, span = name.rsplit("::", 1)
            index.setdefault(key, {})[span] = (npz, name)

    shapes = manifest["shapes"]

    def load(key, span):
        npz, name = index[key][span]
        return npz[name]

    def restore_leaf(key: str, old):
        if key not in index:
            raise KeyError(f"checkpoint missing key {key!r}")
        shape = tuple(shapes[key])
        if hasattr(old, "shape") and tuple(old.shape) != shape:
            raise ValueError(f"shape mismatch for {key!r}: checkpoint "
                             f"{shape} vs template {old.shape}")
        spans = index[key]
        sharding = getattr(old, "sharding", None)
        if sharding is None or not isinstance(old, jax.Array):
            return jax.device_put(_stitch(spans, load, shape, key))
        per_dev = []
        stitched = None  # built at most once per leaf (topology change)
        for dev, idx in sharding.addressable_devices_indices_map(shape).items():
            span = _span_key(idx, shape)
            if span in spans:
                block = load(key, span)
            else:  # topology changed: stitch this leaf, slice per device
                if stitched is None:
                    stitched = _stitch(spans, load, shape, key)
                block = stitched[_span_slices(span)]
            per_dev.append(jax.device_put(block, dev))
        return jax.make_array_from_single_device_arrays(
            shape, sharding, per_dev)

    flat_old = _flatten(tree)
    flat_new = {k: restore_leaf(k, v) for k, v in flat_old.items()}
    placed = _unflatten_like(tree, flat_new)
    return TrainState(params=placed["params"], opt_state=placed["opt_state"],
                      model_state=placed["model_state"], step=placed["step"],
                      rng=placed["rng"])


def _stitch(spans: Dict[str, Tuple], load, shape: Tuple[int, ...],
            key: str) -> np.ndarray:
    """Assemble the full host array from saved blocks (dense fallback —
    only for unsharded templates or changed topologies)."""
    if "scalar" in spans:
        return load(key, "scalar")
    full_span = _span_key(tuple(slice(0, d) for d in shape), shape)
    if full_span in spans:
        return load(key, full_span)
    out = None
    for span in spans:
        arr = load(key, span)
        if out is None:
            out = np.zeros(shape, arr.dtype)
        out[_span_slices(span)] = arr
    if out is None:
        raise KeyError(f"no blocks saved for {key!r}")
    return out
