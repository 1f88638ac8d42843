"""Scoring / model export.

The reference has no serving layer (models die with the Python process;
nothing is saved in the CTR path — SURVEY §5.4). Here: a jitted batch
``Scorer`` with static-shape padding, and a self-contained export format
(params npz + schema/hyperparam JSON) that ``load_scorer`` restores without
the training code path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .features.schema import DenseSpec, FeatureSet, SeqSpec, SparseSpec
from .models import get_model
from .models.base import Model
from .train.loop import iter_batches


class Scorer:
    """Batched scoring with one compiled apply (pads the tail batch)."""

    def __init__(self, model: Model, params, model_state=None,
                 batch_size: int = 4096):
        self.model = model
        self.params = params
        self.model_state = model_state or {}
        self.batch_size = batch_size

        def fwd(params, state, batch):
            logits, _, _ = model.apply(params, state, batch, train=False)
            return jax.nn.sigmoid(logits)

        self._fwd = jax.jit(fwd)

    def predict_proba(self, data: Dict[str, Any]) -> np.ndarray:
        n = len(next(v for k, v in data.items() if k != "seq"))
        if "label" not in data:  # iter_batches keys off 'label' for length
            data = dict(data)
            data["label"] = np.zeros(n, np.float32)
        out = np.empty(n, np.float32)
        pos = 0
        for batch in iter_batches(data, self.batch_size):
            p = np.asarray(self._fwd(self.params, self.model_state, batch))
            take = int(batch["weight"].sum())
            out[pos:pos + take] = p[:take]
            pos += take
        return out


class ShardedScorer:
    """Multi-chip scoring: embedding tables row-sharded over the mesh's
    'model' axis (a serving fleet whose tables outgrow one chip's HBM),
    batch sharded over 'data'; lookups ride the same collective exchange as
    sharded training. Output matches the single-device ``Scorer`` bit-for-
    policy (same f32 math, different device layout)."""

    def __init__(self, model: Model, params, mesh, model_state=None,
                 batch_size: int = 4096, exchange: str = "psum"):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.context import sharded_embeddings
        from .parallel.mesh import DATA_AXIS, MODEL_AXIS
        from .parallel.train import _pad_tables, param_spec_tree

        if batch_size % mesh.shape[DATA_AXIS]:
            raise ValueError(f"batch_size {batch_size} must divide the "
                             f"data axis ({mesh.shape[DATA_AXIS]})")
        self.model = model
        self.mesh = mesh
        self.batch_size = batch_size
        self._exchange = exchange
        self._ctx = sharded_embeddings
        params = _pad_tables(params, mesh.shape[MODEL_AXIS])
        specs = param_spec_tree(params)
        self.params = jax.device_put(
            params, jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda s: isinstance(s, P)))
        rep = NamedSharding(mesh, P())
        self.model_state = (jax.device_put(model_state, rep)
                            if model_state else {})

        def fwd(params, state, batch):
            logits, _, _ = model.apply(params, state, batch, train=False)
            return jax.nn.sigmoid(logits)

        self._fwd = jax.jit(fwd)

    def predict_proba(self, data: Dict[str, Any]) -> np.ndarray:
        from .parallel.train import shard_batch
        n = len(next(v for k, v in data.items() if k != "seq"))
        if "label" not in data:
            data = dict(data)
            data["label"] = np.zeros(n, np.float32)
        out = np.empty(n, np.float32)
        pos = 0
        for batch in iter_batches(data, self.batch_size):
            take = int(batch["weight"].sum())
            sb = shard_batch(batch, self.mesh)
            with self._ctx(self.mesh, mode=self._exchange):
                p = np.asarray(self._fwd(self.params, self.model_state, sb))
            out[pos:pos + take] = p[:take]
            pos += take
        return out


# ---------------------------------------------------------------------------
# export / load
# ---------------------------------------------------------------------------


def _fs_to_json(fs: FeatureSet) -> dict:
    return {
        "dense": [dataclasses.asdict(d) for d in fs.dense],
        "sparse": [dataclasses.asdict(s) for s in fs.sparse],
        "seq": [dataclasses.asdict(s) for s in fs.seq],
    }


def _fs_from_json(d: dict) -> FeatureSet:
    return FeatureSet(
        dense=tuple(DenseSpec(**x) for x in d["dense"]),
        sparse=tuple(SparseSpec(**x) for x in d["sparse"]),
        seq=tuple(SeqSpec(**{**x, "session_shape":
                             tuple(x["session_shape"])
                             if x.get("session_shape") else None})
                  for x in d["seq"]),
    )


def export_model(path: str, model_name: str, fs: FeatureSet, params,
                 model_state=None, hyperparams: Optional[dict] = None) -> str:
    os.makedirs(path, exist_ok=True)
    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(
            {"params": params, "state": model_state or {}})[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in p)
        flat[key] = np.asarray(jax.device_get(leaf))
    np.savez(os.path.join(path, "weights.npz"), **flat)
    with open(os.path.join(path, "model.json"), "w") as f:
        json.dump({"model": model_name, "feature_set": _fs_to_json(fs),
                   "hyperparams": hyperparams or {}}, f)
    return path


def quantize_for_serving(model: Model, params) -> Dict[str, Any]:
    """int8-quantize every vocab-row table for serving into PACKED rows
    (``ops.embedding.quantize_table`` / ``quantize_fused``, per-row
    pow2-absmax): the fused cross+linear pair becomes ``{'qpl': int8
    (V, D+3)}`` — layout ``[q_cross·D, e_cross, q_lin, e_lin]`` with the
    pow2 scale EXPONENT stored in-row, so ONE gather fetches value bytes
    and scales together — and aux (V, W>1) tables (FFM blocks, OENN
    orders) become ``{'qp': int8 (V, W+1)}`` (``[q·W, e]``). ~4× less
    serving HBM for the tables (the dominant memory term) and FASTER than
    f32 at the board batch (PERF.md int8 rows: fewer bytes/row through
    the row-gather bottleneck). Training states cannot be quantized (no
    vjp through the int8 gather) — serving only."""
    from .ops.embedding import quantize_fused, quantize_table
    from .train.sparse import aux_row_tables

    out = dict(params)
    emb = dict(params.get("embedding", {}))
    if "table" in emb and "linear" in emb:
        # both column groups pack into ONE int8 (V, D+3) row — one serving
        # gather replaces the f32 table+linear pair (no int8 width cliff
        # through 16, measured). Mixed-width sub-tables (table{d}) keep
        # their own packed-qp rows; align{d} projections stay f32.
        packed = quantize_fused(jnp.asarray(emb.pop("table")),
                                jnp.asarray(emb.pop("linear")))
        emb.update(packed)
    for g, t in list(emb.items()):
        if (g.startswith("table") and hasattr(t, "ndim") and t.ndim == 2
                and t.shape[1] > 1):
            emb[g] = quantize_table(jnp.asarray(t))
    out["embedding"] = emb
    for k, t in aux_row_tables(model, params).items():
        if t.shape[1] > 1:
            out[k] = quantize_table(jnp.asarray(t))
    return out


def load_scorer(path: str, batch_size: int = 4096,
                quantize: Optional[str] = None) -> Scorer:
    """``quantize='int8'`` loads the row tables in int8 serving storage
    (:func:`quantize_for_serving`)."""
    with open(os.path.join(path, "model.json")) as f:
        meta = json.load(f)
    fs = _fs_from_json(meta["feature_set"])
    hp = {k: (tuple(v) if isinstance(v, list) else v)
          for k, v in meta["hyperparams"].items()}
    model = get_model(meta["model"], fs, **hp)
    params_t, state_t = model.init(jax.random.PRNGKey(0))
    arrays = dict(np.load(os.path.join(path, "weights.npz")))

    def fill(template, prefix):
        paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, old in paths:
            key = prefix + "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in p)
            leaves.append(jnp.asarray(arrays[key]))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    params = fill(params_t, "params/")
    state = fill(state_t, "state/") if state_t else {}
    if quantize == "int8":
        params = quantize_for_serving(model, params)
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r}")
    return Scorer(model, params, state, batch_size)
