"""Sparse-row optimizer over ROW-SHARDED tables — the production shape:
tables too big for one chip (row-sharded over ``model``, parallel/embedding)
AND too big for full-table moment streams (sparse updates, train/sparse).

Step anatomy (one jit):
1. record lookup ids via the RowTape (forward is dead code except id
   expressions — ids depend on the batch only);
2. gather rows OUTSIDE the loss through the collective exchange
   (ShardedLookup: psum or a2a — the same path the dense forward uses);
3. differentiate dense params + gathered rows (cotangents stay (N, W));
4. row update inside ``shard_map`` over (data, model): each device
   all-gathers the (ids, row-grads) of its model column over ``data``
   (grad traffic ∝ ids/step — same class as the forward exchange),
   dedup-sums duplicates, translates to local row offsets, and applies the
   row optimizer to the rows its table shard OWNS (unowned slots clip to
   row 0 with exact-zero deltas). Moments live sharded next to their rows.

Equivalence: loss and updated tables match the single-device sparse step
exactly (tests/test_parallel_sparse.py); RowAdagrad in turn matches dense
``optax.adagrad``.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import Model
from ..train.loop import TrainState
from ..train.sparse import dedup_sum, sparse_step_core
from .embedding import ShardedLookup
from .mesh import DATA_AXIS, MODEL_AXIS
from .train import create_sharded_state


def create_sparse_sharded_state(model: Model, rng, dense_opt, row_opt,
                                mesh: Mesh) -> TrainState:
    """Params as in ``create_sharded_state`` (tables padded + row-sharded
    under jit); optimizer state = {'dense': optax on non-table params,
    'rows': {group: row state}} with row-optimizer moments sharded exactly
    like their tables."""
    # identity optimizer for the base init: never materialize full-table
    # dense moments (the whole point of the sparse path)
    base = create_sharded_state(model, rng, optax.identity(), mesh)
    emb = base.params.get("embedding", {})
    dense_tree = dict(base.params)
    dense_tree["embedding"] = {}
    rep = NamedSharding(mesh, P())
    dshapes = jax.eval_shape(dense_opt.init, dense_tree)
    dense_state = jax.jit(
        dense_opt.init,
        out_shardings=jax.tree_util.tree_map(lambda _: rep, dshapes))(
        dense_tree)

    def init_rows(table):
        shapes = jax.eval_shape(row_opt.init, table)
        sh = {k: NamedSharding(mesh, P(MODEL_AXIS, None)
                               if v.ndim >= 2 else P(MODEL_AXIS))
              for k, v in shapes.items()}
        return jax.jit(row_opt.init, out_shardings=sh)(table)

    return TrainState(
        params=base.params,
        opt_state={"dense": dense_state,
                   "rows": {g: init_rows(t) for g, t in emb.items()}},
        model_state=base.model_state, step=base.step, rng=base.rng)


def make_sparse_sharded_train_step(model: Model, dense_opt, row_opt,
                                   mesh: Mesh, donate: bool = True,
                                   exchange: str = "psum",
                                   compress=None) -> Callable:
    fs = model.feature_set
    sl = ShardedLookup(mesh, fs, mode=exchange, compress=compress)

    def _row_update(table, state, gids, grads):
        """shard_map body: table/state (local rows block), gids/grads (local
        batch shard). Returns updated local blocks."""
        r = table.shape[0]
        j = jax.lax.axis_index(MODEL_AXIS)
        ids_all = jax.lax.all_gather(gids, DATA_AXIS, axis=0, tiled=True)
        g_all = jax.lax.all_gather(grads, DATA_AXIS, axis=0, tiled=True)
        sid, g, is_end = dedup_sum(ids_all, g_all)
        local = sid - j * r
        owned = (local >= 0) & (local < r)
        sid_local = jnp.clip(local, 0, r - 1)
        new_table, new_state = row_opt.apply_rows(
            table, state, sid_local, jnp.where(owned[:, None], g, 0.0),
            is_end & owned)
        return new_table, new_state

    def train_step(ts: TrainState, batch):
        # shared record → collective gather → inject → grad → dense update
        out, rng, new_params, dense_state, per_group = sparse_step_core(
            model, dense_opt, ts, batch,
            lambda group, table, gids: sl.lookup(table, gids))

        emb = ts.params.get("embedding", {})
        new_emb = dict(emb)
        row_states = dict(ts.opt_state["rows"])
        for g, (gids, grads) in per_group.items():
            state_specs = jax.tree_util.tree_map(
                lambda x: P(MODEL_AXIS, None) if x.ndim >= 2
                else P(MODEL_AXIS), row_states[g])
            # TODO(vma): the static checker cannot infer that values derived
            # from all_gather(tiled=True) are replicated over 'data' (same
            # limitation as the a2a exchange, parallel/embedding.py) —
            # re-enable once it can see through tiled gathers. Correctness
            # is pinned by tests/test_parallel_sparse.py equality vs the
            # single-device step.
            fn = jax.shard_map(
                _row_update, mesh=mesh,
                in_specs=(P(MODEL_AXIS, None), state_specs,
                          P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=(P(MODEL_AXIS, None), state_specs),
                check_vma=False,
            )
            new_emb[g], row_states[g] = fn(emb[g], row_states[g], gids,
                                           grads)
        new_params = dict(new_params)
        new_params["embedding"] = new_emb

        new_ts = TrainState(params=new_params,
                            opt_state={"dense": dense_state,
                                       "rows": row_states},
                            model_state=out.pop("model_state"),
                            step=ts.step + 1, rng=rng)
        return new_ts, out

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
