"""Checkpoint / resume.

The reference only checkpoints in its embedding trainer
(``ModelCheckpoint(save_best_only, weights_only)``,
``kon/model/embedding/walk_core_model.py:203-227``) and saves nothing in the
CTR path. Here checkpointing is first-class (SURVEY §5.4): full TrainState
(params + optimizer moments + model state + step + rng) and data-iterator
position, atomic write, keep-last-k GC, resume-by-step.

Format: one ``.npz`` of '/'-joined keypath → array + a JSON manifest — fully
self-contained (no orbax version coupling), works for sharded arrays (they
are fetched to host; re-placement happens through the caller's shardings).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

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


def save_checkpoint(ckpt_dir: str, ts: TrainState, *,
                    extra: Optional[Dict[str, Any]] = None,
                    keep: int = 3) -> str:
    """Atomically write step-stamped checkpoint; GC old ones (keep last k)."""
    step = int(jax.device_get(ts.step))
    os.makedirs(ckpt_dir, exist_ok=True)
    tree = {"params": ts.params, "opt_state": ts.opt_state,
            "model_state": ts.model_state, "step": ts.step, "rng": ts.rng}
    flat = {k: np.asarray(jax.device_get(v)) for k, v in _flatten(tree).items()}

    final = os.path.join(ckpt_dir, f"ckpt_{step:010d}")
    tmp = tempfile.mkdtemp(dir=ckpt_dir, prefix=".tmp_")
    try:
        np.savez(os.path.join(tmp, "arrays.npz"), **flat)
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump({"step": step, "keys": sorted(flat),
                       "extra": extra or {}}, f)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise

    for old in all_checkpoints(ckpt_dir)[:-keep]:
        shutil.rmtree(old, ignore_errors=True)
    return final


def all_checkpoints(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = [os.path.join(ckpt_dir, d) for d in os.listdir(ckpt_dir)
           if re.fullmatch(r"ckpt_\d{10}", d)]
    return sorted(out)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    cks = all_checkpoints(ckpt_dir)
    return cks[-1] if cks else None


def restore_checkpoint(path: str, ts_template: TrainState
                       ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the template's structure (and shardings via device_put
    against the template leaves' shardings when present)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    arrays = dict(np.load(os.path.join(path, "arrays.npz"), allow_pickle=False))
    tree = {"params": ts_template.params, "opt_state": ts_template.opt_state,
            "model_state": ts_template.model_state,
            "step": ts_template.step, "rng": ts_template.rng}
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
