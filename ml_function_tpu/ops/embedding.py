"""Fused embedding tables.

The reference builds one ``tf.keras.layers.Embedding`` per feature inside
``SparseEmbed`` (``kon/model/ctr_model/layer/interactive_layer/interactive_layer.py:189-247``),
which on TPU would mean F tiny gathers and F tiny tables. Here ALL vocabs are
concatenated into ONE table, and — because TPU gather cost is per-ROW, not
per-byte — the first-order ("linear") weights are fused in as an extra
column: table shape (total_vocab, D+1). A whole (B, F) id matrix is embedded
with a single gather that yields both the cross embeddings and the linear
terms; the table is also the unit of row-sharding for the multi-host path
(``parallel/embedding.py``).

Storage is SPLIT by column group — ``table`` (V, D) cross embeddings and
``linear`` (V, 1) first-order weights — because v5e gather/scatter tiling
falls off a cliff at widths ∉ {1..8}: one (V, D+1) gather costs 5.0 ms at
the Criteo step shape where the (V, 8) + (V, 1) pair costs 2.96 ms (XLA
overlaps them), and the backward scatters land on the fast widths natively
(measured in PERF.md). Both gathers share the same precomputed global ids,
and lookups that need only one column group (seq lookups, linear-only
towers) issue only that gather.

Backward: XLA scatter-add at native widths is the measured floor (~6.5
ns/element; dedup/hints/dtype don't move it — PERF.md). The opt-in Pallas
merge-scatter (``ops/kernels/embedding_grad.py``) builds the dense grad
scatter-free for wide-D tables.

Semantics preserved from the reference:
- id 0 of each vocab is the padding/unknown row (``mask_zero``,
  interactive_layer.py:205): sequence lookups return a mask and the padding
  row is zeroed at use sites;
- ``pre_weight`` warm-start (interactive_layer.py:216): ``init`` accepts
  per-vocab prebuilt matrices (applied to the cross columns);
- per-feature L2 on embeddings (``emb_reg``, default 1e-8,
  data_prepare.py:96): computed from gathered rows via ``l2_from_*``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.schema import FeatureSet
from .base import Params, normal_init, split_rngs

# ML_FUNCTION_TPU_MERGE_SCATTER=1 opts in to the Pallas merge-scatter
# backward (ops/kernels/embedding_grad.py). Default is XLA's scatter-add —
# measured faster at Criteo shapes (the one-hot tiles blow VMEM); the kernel
# remains for large-D tables where it wins.
_USE_MERGE_SCATTER = os.environ.get("ML_FUNCTION_TPU_MERGE_SCATTER") == "1"


def _gather(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    if _USE_MERGE_SCATTER:
        from .kernels.embedding_grad import fused_gather
        return fused_gather(table, flat_ids)
    from .kernels.embedding_grad import split_gather
    # custom vjp: backward is a direct ``.at[ids].add`` scatter in width-≤8
    # column groups (v5e scatter is ~3× slower at widths ∉ {1..8}, and
    # jnp.take's default vjp lowers ~2 ms slower than the explicit scatter
    # at the Criteo step shape — measured, PERF.md)
    return split_gather(table, flat_ids, 8)


# ---------------------------------------------------------------------------
# row tape: the sparse-gradient interception point (train/sparse.py)
#
# Under ``row_tape(...)`` the FusedEmbedding lookups do NOT read the tables:
# - record mode: each lookup appends its (column group, global ids) to the
#   tape and returns zeros — the forward run is dead code except the id
#   expressions (XLA DCEs the rest);
# - inject mode: each lookup returns the next pre-gathered rows array, which
#   the caller differentiates as an INPUT — the cotangent stays (N, W) rows
#   and the dense (V, W) table gradient never materializes.
# ---------------------------------------------------------------------------

# Thread-local active tape: two sparse steps traced concurrently (threads)
# must not interleave tape records / mispair injected rows (ADVICE r3).
import threading

_TAPE_TLS = threading.local()


class RowTape:
    def __init__(self, mode: str, rows=None):
        assert mode in ("record", "inject")
        self.mode = mode
        self.records = []          # [(group, gids)] in call order
        self._rows = list(rows or [])
        self._i = 0

    def gather(self, group: str, gids: jax.Array, width: int) -> jax.Array:
        if self.mode == "record":
            self.records.append((group, gids))
            return jnp.zeros(gids.shape + (width,), jnp.float32)
        rows = self._rows[self._i]
        self._i += 1
        assert rows.shape == gids.shape + (width,), \
            f"row tape out of sync: {rows.shape} vs {gids.shape + (width,)}"
        return rows


class row_tape:
    """Context manager activating a RowTape for FusedEmbedding lookups."""

    def __init__(self, tape: RowTape):
        self.tape = tape

    def __enter__(self):
        prev = getattr(_TAPE_TLS, "tape", None)
        assert prev is None or prev.mode != self.tape.mode, (
            f"a {self.tape.mode!r} RowTape is already active on this thread "
            "— nested tapes of the same mode would interleave records")
        self._prev, _TAPE_TLS.tape = prev, self.tape
        return self.tape

    def __exit__(self, *exc):
        _TAPE_TLS.tape = self._prev
        return False


def active_row_tape():
    return getattr(_TAPE_TLS, "tape", None)


# ---------------------------------------------------------------------------
# int8 row quantization (serving): per-row symmetric scale PACKED into the
# int8 row as a power-of-2 exponent column — ONE int8 (V, W+1) gather per
# lookup. HBM is the binding constraint for production tables (the sparse
# path exists because of it): ~4× less serving table memory, and the packed
# int8 gather is FASTER than the f32 one on v5e (measured at 213k ids:
# int8 (V,9) packed 3.59 ms vs f32 (V,8) 3.78 ms vs the int8+separate-f32-
# scale pair 4.74 ms — v5e gathers are per-ROW-bound, so a second scale
# gather costs a full gather; packing eliminates it). The pow2 scale costs
# ≤1 bit of precision vs an exact absmax scale (max |err| ≤ rowmax/127).
# ---------------------------------------------------------------------------


def quantize_table(table: jax.Array) -> Dict[str, jax.Array]:
    """(V, W) f32 → {'qp': int8 (V, W+1)}: W value columns scaled by a
    per-row power-of-2, whose exponent lives in the last column."""
    absmax = jnp.maximum(jnp.max(jnp.abs(table), axis=1, keepdims=True),
                         1e-30)
    e = jnp.clip(jnp.ceil(jnp.log2(absmax / 127.0)), -126, 126)
    q = jnp.clip(jnp.round(table * jnp.exp2(-e)), -127, 127)
    return {"qp": jnp.concatenate([q, e], axis=1).astype(jnp.int8)}


def is_quantized(table) -> bool:
    return isinstance(table, dict) and "qp" in table


def _dequant_gather(tdict: Dict[str, jax.Array],
                    flat_ids: jax.Array) -> jax.Array:
    rows = jnp.take(tdict["qp"], flat_ids, axis=0)
    return (rows[:, :-1].astype(jnp.float32)
            * jnp.exp2(rows[:, -1:].astype(jnp.float32)))


def quantize_fused(table: jax.Array, linear: jax.Array
                   ) -> Dict[str, jax.Array]:
    """cross (V, D) + linear (V, 1) → {'qpl': int8 (V, D+3)} — layout
    [q_cross×D, e_cross, q_lin, e_lin]. ONE serving gather covers both
    column groups (int8 gathers show NO width cliff through 16 on v5e —
    measured flat ~3.6 ms at widths 9-16 for 213k ids — so the packed row
    costs the same as the packed cross alone and saves the whole (V, 1)
    linear gather)."""
    ct = quantize_table(table)["qp"]
    lt = quantize_table(linear)["qp"]
    return {"qpl": jnp.concatenate([ct, lt], axis=1)}


def is_quantized_fused(params) -> bool:
    return isinstance(params, dict) and "qpl" in params


def _dequant_fused(params: Dict[str, jax.Array], flat_ids: jax.Array
                   ) -> Tuple[jax.Array, jax.Array]:
    r = jnp.take(params["qpl"], flat_ids, axis=0)
    d = r.shape[1] - 3
    cross = (r[:, :d].astype(jnp.float32)
             * jnp.exp2(r[:, d:d + 1].astype(jnp.float32)))
    lin = (r[:, d + 1].astype(jnp.float32)
           * jnp.exp2(r[:, d + 2].astype(jnp.float32)))
    return cross, lin


def gather_rows(table: jax.Array, ids: jax.Array,
                tape_key: Optional[str] = None) -> jax.Array:
    """(…,) row ids → (…, W) rows, with the tuned custom-vjp backward
    (columns split into ≤8-wide groups so fwd gathers and bwd scatters land
    on v5e's fast widths — PERF.md). For auxiliary tables (FFM blocks,
    OENN per-order tables, pretrained side tables) that live outside a
    ``FusedEmbedding``.

    ``tape_key`` opts the lookup into the sparse-row path (train/sparse.py):
    under an active RowTape the call records/injects under that key instead
    of reading ``table``, so aux tables ride the same O(ids/step) row
    updates as the fused tables. Keys 'table'/'linear' are reserved for the
    FusedEmbedding column groups; aux keys name the param's top-level slot
    (e.g. 'ffm', 'order2'). Under a tape ``table`` may be the zero-row
    placeholder the sparse step substitutes — only its width is read."""
    if tape_key is not None:
        tape = active_row_tape()
        if tape is not None:
            width = int(table["qp"].shape[-1] - 1
                        if is_quantized(table) else table.shape[-1])
            return tape.gather(tape_key, ids, width)
    flat = ids.reshape(-1)
    if is_quantized(table):  # int8 serving storage (quantize_table)
        w = table["qp"].shape[-1] - 1
        return _dequant_gather(table, flat).reshape(ids.shape + (w,))
    return _gather(table, flat).reshape(ids.shape + (table.shape[-1],))


@dataclass(frozen=True)
class FusedEmbedding:
    """One fused table per COLUMN GROUP over a FeatureSet's vocabs:
    ``table`` (V, D) cross embeddings + ``linear`` (V, 1) first-order
    weights (when ``with_linear``). All vocabs share rows via global
    offsets; both gathers share the same ids.

    Per-feature widths (reference ``sparseFea.cross_unit`` +
    ``AlignLayer``, data_prepare.py:59 / core_layer.py:240-257): vocabs
    declaring a NARROWER dim than the primary width form per-width
    sub-tables — ``table{d}`` (V_d, d) + ``linear{d}`` (V_d, 1) with their
    own row space (``fs.aux_vocab_offsets``) — and a learned ``align{d}``
    (d, D) projection recombines their lookups to the primary width, so
    models always see uniform (B, ·, D). Narrow rows cost d (not D)
    floats — the vocab-size-scaled-dim memory trick."""

    feature_set: FeatureSet
    with_linear: bool = True

    @property
    def dim(self) -> int:
        return self.feature_set.embed_dim

    @property
    def width(self) -> int:
        return self.dim + (1 if self.with_linear else 0)

    def _narrow_dims(self) -> Tuple[int, ...]:
        d0 = self.dim
        return tuple(sorted(d for d in self.feature_set.width_groups
                            if d != d0))

    def init(self, rng, pre_weight: Optional[Mapping[str, np.ndarray]] = None) -> Params:
        fs = self.feature_set
        r1, r2 = jax.random.split(jax.random.fold_in(rng, 0))
        table = normal_init(r1, (fs.total_vocab, self.dim), stddev=0.05)
        if pre_weight:
            offs = fs.vocab_offsets
            tab = np.asarray(table).copy()
            for name, w in pre_weight.items():
                w = np.asarray(w, dtype=np.float32)
                tab[offs[name]:offs[name] + w.shape[0], :w.shape[1]] = w
            table = jnp.asarray(tab)
        out = {"table": table}
        if self.with_linear:
            out["linear"] = normal_init(r2, (fs.total_vocab, 1), stddev=0.05)
        for gi, d in enumerate(self._narrow_dims()):
            rg = jax.random.fold_in(rng, 101 + gi)
            ra, rb, rc = jax.random.split(rg, 3)
            v = fs.aux_total_vocab(d)
            out[f"table{d}"] = normal_init(ra, (v, d), stddev=0.05)
            if self.with_linear:
                out[f"linear{d}"] = normal_init(rb, (v, 1), stddev=0.05)
            from .base import glorot_uniform
            out[f"align{d}"] = glorot_uniform(rc, (d, self.dim))
        return out

    # ---- keyed row access (tape / int8 / collective aware) --------------

    def _keyed_rows(self, params: Params, key: str, gids: jax.Array,
                    width: int) -> jax.Array:
        tape = active_row_tape()
        if tape is not None:
            return tape.gather(key, gids, width)
        t = params[key]
        if is_quantized(t):
            flat = gids.reshape(-1)
            return _dequant_gather(t, flat).reshape(gids.shape + (width,))
        return self._rows(t, gids)

    def _sparse_mixed(self, params: Params, ids: jax.Array,
                      want_cross: bool, want_linear: bool):
        """Per-width-group routing for FeatureSets with narrow sparse
        fields: each group gathers from its own table (+Align to the
        primary width); columns re-interleave in the original field
        order. Returns (cross (B, F, D) | None, linear (B, F) | None)."""
        fs = self.feature_set
        d0 = self.dim
        F = len(fs.sparse)
        cross_cols: list = [None] * F
        lin_cols: list = [None] * F
        for d in sorted(fs.width_groups):
            cols = [i for i, s in enumerate(fs.sparse) if s.dim == d]
            if not cols:
                continue
            if d == d0:
                offs = fs.vocab_offsets
                tkey, lkey = "table", "linear"
            else:
                offs = fs.aux_vocab_offsets(d)
                tkey, lkey = f"table{d}", f"linear{d}"
            off_arr = jnp.asarray([offs[fs.sparse[i].vocab] for i in cols],
                                  jnp.int32)
            gids = ids[:, cols] + off_arr[None, :]
            if d == d0 and is_quantized_fused(params):
                cr, ln = _dequant_fused(params, gids.reshape(-1))
                cr = cr.reshape(gids.shape + (d0,))
                ln = ln.reshape(gids.shape)
            else:
                cr = (self._keyed_rows(params, tkey, gids, d)
                      if want_cross else None)
                ln = (self._keyed_rows(params, lkey, gids, 1)[..., 0]
                      if want_linear else None)
            if want_cross and cr is not None and d != d0:
                from .base import bf16_matmul
                cr = bf16_matmul(cr, params[f"align{d}"])   # (B, n, D)
            for j, i in enumerate(cols):
                if want_cross and cr is not None:
                    cross_cols[i] = cr[:, j, :]
                if want_linear and ln is not None:
                    lin_cols[i] = ln[:, j]
        cross = (jnp.stack(cross_cols, axis=1) if want_cross else None)
        lin = (jnp.stack(lin_cols, axis=1) if want_linear else None)
        return cross, lin

    def _has_narrow_sparse(self) -> bool:
        d0 = self.dim
        return any(s.dim != d0 for s in self.feature_set.sparse)

    # ---- lookups --------------------------------------------------------
    #
    # When a mesh with model-axis > 1 is active (parallel.context), lookups
    # route through the collective mask+psum exchange over row-sharded
    # tables; otherwise a single custom-vjp gather per column group.

    def _sharded(self):
        from ..parallel import context as pctx
        if pctx.model_axis_size() > 1:
            from ..parallel.embedding import ShardedLookup
            return ShardedLookup(pctx.active_mesh(), self.feature_set,
                                 mode=pctx.exchange_mode(),
                                 compress=pctx.exchange_compress(),
                                 capacity=pctx.exchange_capacity())
        return None

    def _rows(self, table: jax.Array, global_ids: jax.Array) -> jax.Array:
        """(…,) global row ids → (…, W) rows of ONE table (collective or
        local; int8 serving tables dequantize per gathered row)."""
        if is_quantized(table):
            flat = global_ids.reshape(-1)
            w = table["qp"].shape[-1] - 1
            return _dequant_gather(table, flat).reshape(
                global_ids.shape + (w,))
        sh = self._sharded()
        if sh is not None:
            return sh.lookup(table, global_ids)
        flat = global_ids.reshape(-1)
        rows = _gather(table, flat)
        return rows.reshape(global_ids.shape + (table.shape[-1],))

    def _global_sparse_ids(self, ids: jax.Array) -> jax.Array:
        offs = jnp.asarray(self.feature_set.sparse_offsets())
        return ids + offs[None, :]

    def _sparse_rows(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        """(B, F) LOCAL sparse ids → (B, F, W) rows via the grouped
        (per-vocab, overlapped) gather; falls back to the collective path
        when a model-sharded mesh is active."""
        gids = self._global_sparse_ids(ids)
        if is_quantized(table):
            return self._rows(table, gids)
        sh = self._sharded()
        if sh is not None:
            return sh.lookup(table, gids)
        from .kernels.embedding_grad import grouped_gather
        return grouped_gather(table, gids,
                              self.feature_set.sparse_groups(), 8)

    def sparse_all(self, params: Params, ids: jax.Array
                   ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """(B, F) ids → ((B, F, D) cross, (B, F) linear or None). Per-vocab
        grouped gathers per column group — all of them overlap on-device."""
        if self._has_narrow_sparse():
            return self._sparse_mixed(params, ids, True, self.with_linear)
        tape = active_row_tape()
        if tape is not None:
            gids = self._global_sparse_ids(ids)
            cross = tape.gather("table", gids, self.dim)
            if self.with_linear:
                return cross, tape.gather("linear", gids, 1)[..., 0]
            return cross, None
        if is_quantized_fused(params):  # int8 serving: ONE packed gather
            gids = self._global_sparse_ids(ids)
            cross, lin = _dequant_fused(params, gids.reshape(-1))
            return (cross.reshape(ids.shape + (self.dim,)),
                    lin.reshape(ids.shape) if self.with_linear else None)
        cross = self._sparse_rows(params["table"], ids)
        if self.with_linear:
            return cross, self._sparse_rows(params["linear"], ids)[..., 0]
        return cross, None

    def sparse(self, params: Params, ids: jax.Array) -> jax.Array:
        """(B, F) ids → (B, F, D) cross embeddings (no linear gather)."""
        if self._has_narrow_sparse():
            return self._sparse_mixed(params, ids, True, False)[0]
        tape = active_row_tape()
        if tape is not None:
            return tape.gather("table", self._global_sparse_ids(ids), self.dim)
        if is_quantized_fused(params):
            gids = self._global_sparse_ids(ids)
            cross, _ = _dequant_fused(params, gids.reshape(-1))
            return cross.reshape(ids.shape + (self.dim,))
        return self._sparse_rows(params["table"], ids)

    def sparse_linear(self, params: Params, ids: jax.Array) -> jax.Array:
        """(B, F) ids → (B, F) first-order weights (no cross gather)."""
        if self._has_narrow_sparse():
            return self._sparse_mixed(params, ids, False, True)[1]
        tape = active_row_tape()
        if tape is not None:
            return tape.gather("linear", self._global_sparse_ids(ids),
                               1)[..., 0]
        if is_quantized_fused(params):
            gids = self._global_sparse_ids(ids)
            _, lin = _dequant_fused(params, gids.reshape(-1))
            return lin.reshape(ids.shape)
        return self._sparse_rows(params["linear"], ids)[..., 0]

    def seq(self, params: Params, name: str, ids: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
        """(B, L) ids → ((B, L, D) embeddings with pad rows zeroed, (B, L) mask).
        Narrow-width seq vocabs gather from their width-group sub-table and
        Align to the primary D."""
        spec = self.feature_set.seq_spec(name)
        mask = ids != 0
        if spec.dim != self.dim:
            d = spec.dim
            off = self.feature_set.aux_vocab_offsets(d)[spec.vocab]
            rows = self._keyed_rows(params, f"table{d}", ids + off, d)
            from .base import bf16_matmul
            rows = bf16_matmul(rows, params[f"align{d}"])
            return rows * mask[..., None], mask
        off = self.feature_set.seq_offset(name)
        tape = active_row_tape()
        if tape is not None:
            rows = tape.gather("table", ids + off, self.dim)
        elif is_quantized_fused(params):
            cross, _ = _dequant_fused(params, (ids + off).reshape(-1))
            rows = cross.reshape(ids.shape + (self.dim,))
        else:
            rows = self._rows(params["table"], ids + off)
        return rows * mask[..., None], mask

    # ---- regularization -------------------------------------------------

    def l2_from_sparse(self, emb: jax.Array) -> jax.Array:
        """emb_l2-weighted ||rows||² from ALREADY-GATHERED (B, F, D) values —
        no second lookup (equivalent to regularizing the used rows, as the
        reference's per-embedding ``emb_reg`` does, interactive_layer.py:229)."""
        coef = jnp.asarray([s.emb_l2 for s in self.feature_set.sparse],
                           jnp.float32)
        return jnp.sum(coef * jnp.sum(jnp.square(emb), axis=(0, 2)))

    def l2_from_seq(self, name: str, emb: jax.Array) -> jax.Array:
        """Same for a gathered (B, L, D) sequence (pad rows already zeroed)."""
        return self.feature_set.seq_spec(name).emb_l2 * jnp.sum(jnp.square(emb))

    def l2_loss(self, params: Params, sparse_ids: Optional[jax.Array] = None,
                seq_ids: Optional[Mapping[str, jax.Array]] = None) -> jax.Array:
        """Sum of emb_l2 * ||rows used this step||^2 (per-spec coefficients).

        NOTE: re-gathers; prefer l2_from_sparse/l2_from_seq on values you
        already looked up (the hot-path models do)."""
        fs = self.feature_set
        total = jnp.asarray(0.0, jnp.float32)
        if sparse_ids is not None and len(fs.sparse):
            total = total + self.l2_from_sparse(self.sparse(params, sparse_ids))
        if seq_ids:
            for name, ids in seq_ids.items():
                emb, _ = self.seq(params, name, ids)
                total = total + self.l2_from_seq(name, emb)
        return total


# ---------------------------------------------------------------------------
# pooling helpers (reference SeqBaseLayer, behavior_layer.py:32-51)
# ---------------------------------------------------------------------------


def masked_sum_pool(seq: jax.Array, mask: jax.Array) -> jax.Array:
    """(B, L, D), (B, L) → (B, D) sum over valid steps."""
    return jnp.sum(seq * mask[..., None], axis=1)


def masked_mean_pool(seq: jax.Array, mask: jax.Array) -> jax.Array:
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
    return jnp.sum(seq * mask[..., None], axis=1) / denom
