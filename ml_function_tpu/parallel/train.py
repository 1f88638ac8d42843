"""Multi-chip training: pjit train step over a (data, model) mesh.

Greenfield vs. the reference (single-device Keras fit, SURVEY §2.10).
Sharding layout:
- batch: leading axis over ``data``;
- fused embedding tables (+ their Adam moments): rows over ``model``;
- dense tower params: replicated (tiny); XLA inserts the gradient
  all-reduce over ``data`` automatically;
- embedding lookups inside the step run the shard_map mask+psum exchange
  (``parallel/embedding.py``) via the active-mesh context.

Usage::

    mesh = make_mesh(data=4, model=2)
    sts = create_sharded_state(model, rng, optimizer, mesh)
    step = make_sharded_train_step(model, optimizer, mesh)
    sts, out = step(sts, shard_batch(batch, mesh))
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.base import Model
from ..ops.base import Params
from ..train.loop import TrainState, loss_fn
from ..train.metrics import update_metrics
from .context import sharded_embeddings
from .embedding import pad_table_for_shards
from .mesh import DATA_AXIS, MODEL_AXIS


def _is_table_path(path) -> bool:
    keys = [str(getattr(k, "key", getattr(k, "idx", None))) for k in path]
    # all row-table column groups of FusedEmbedding: "table"/"linear" plus
    # per-width sub-tables "table{d}"/"linear{d}" (mixed-width schemas);
    # the tiny align{d} projections stay replicated
    return "embedding" in keys and any(
        k.startswith("table") or k.startswith("linear") for k in keys)


def _is_expert_path(path) -> bool:
    """MoE expert stacks (MMoE/PLE: ``experts.w``/``experts.b`` leaves of
    shape (E, ...)) — shard the leading expert axis over ``model`` (EP).
    GSPMD inserts the gate-mix reduction over the expert axis itself."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return "experts" in keys


def _is_aux_path(path, aux_keys) -> bool:
    """Top-level aux vocab-row tables (FFM blocks, OENN per-order tables):
    the leading dict key names the table (train/sparse.aux_row_tables)."""
    if not path or not aux_keys:
        return False
    return str(getattr(path[0], "key", getattr(path[0], "idx", ""))) \
        in aux_keys


def aux_table_keys(model: Model) -> Tuple[str, ...]:
    """Aux vocab-row table keys of ``model`` from its init's SHAPES (no
    arrays materialize). Empty for non-traceable inits (numpy warm-starts)
    — the host-init fallback re-detects on concrete params."""
    try:
        shapes = jax.eval_shape(lambda r: model.init(r)[0],
                                jax.random.PRNGKey(0))
    except jax.errors.ConcretizationTypeError:
        return ()
    v = model.feature_set.total_vocab
    return tuple(k for k, t in shapes.items()
                 if k != "embedding" and hasattr(t, "ndim") and t.ndim == 2
                 and tuple(t.shape)[0] == v)


def param_spec_tree(params: Params, aux_keys: Tuple[str, ...] = ()) -> Any:
    """PartitionSpec tree: embedding tables row-sharded, MoE expert stacks
    expert-sharded, aux vocab-row tables (``aux_keys``) row-sharded, rest
    replicated. Works on any tree whose paths carry the table/expert dict
    keys — optimizer moment trees mirror the param paths
    (``mu['embedding']['table']`` …), so the SAME rule shards Adam/Adagrad
    moments onto their table shard's owner."""

    def spec(path, x):
        if _is_table_path(path) and x.ndim >= 2:
            return P(MODEL_AXIS, None)
        if _is_aux_path(path, aux_keys) and x.ndim >= 2:
            return P(MODEL_AXIS, None)
        if _is_expert_path(path) and x.ndim >= 2:
            return P(*((MODEL_AXIS,) + (None,) * (x.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _pad_tables(tree: Params, num_shards: int,
                aux_keys: Tuple[str, ...] = ()) -> Params:
    return jax.tree_util.tree_map_with_path(
        lambda path, x: pad_table_for_shards(x, num_shards)
        if (_is_table_path(path) or (_is_aux_path(path, aux_keys)
                                     and x.ndim >= 2)) else x, tree)


def create_sharded_state(model: Model, rng, optimizer, mesh: Mesh) -> TrainState:
    """Sharded init: params are created UNDER ``jit`` with ``out_shardings``,
    so each device materializes only its own table shard — no process ever
    holds the full padded table. This is what makes multi-process multi-host
    runs possible (devices of other hosts are not addressable, so the old
    host-init + ``device_put`` route cannot work there); single-process runs
    take the same path and stay bit-identical (jax PRNG is deterministic
    under jit).

    Optimizer moments are created from the already-sharded params
    (``zeros_like`` inherits sharding), so Adam state for a table shard
    lives on the shard's owner. Models whose ``init`` is not traceable
    (e.g. numpy ``pre_weight`` warm-starts) fall back to host init — valid
    single-process only."""
    init_rng, state_rng = jax.random.split(rng)  # same split as
    # train.loop.create_train_state so single-chip and sharded runs from one
    # seed are bit-comparable
    m = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    aux_keys = aux_table_keys(model)  # FFM/OENN-class tables: shard like
    # the fused groups (VERDICT r4 weak #2 — the LARGEST tables must not
    # stay replicated)

    def init_all(r):
        params, model_state = model.init(r)
        return _pad_tables(params, m, aux_keys), model_state

    def shardings_for(tree):
        specs = param_spec_tree(tree, aux_keys)
        return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                      is_leaf=lambda s: isinstance(s, P))

    try:
        shapes = jax.eval_shape(init_all, init_rng)
        out_sh = (shardings_for(shapes[0]),
                  jax.tree_util.tree_map(lambda _: rep, shapes[1]))
        params, model_state = jax.jit(init_all, out_shardings=out_sh)(init_rng)
    except jax.errors.ConcretizationTypeError:
        # common parent of TracerArray/TracerBool/TracerInteger conversion
        # errors — a Python `if`/`int()` on a tracer in warm-start code must
        # also reach the host-init fallback (ADVICE r3)
        if jax.process_count() > 1:
            raise RuntimeError(
                f"model {model.name!r} has a non-traceable init (numpy "
                "warm-start?); multi-process init requires jit-traceable "
                "init — convert pre_weight arrays to jnp before init")
        params, model_state = init_all(init_rng)
        v = model.feature_set.total_vocab
        aux_keys = tuple(k for k, t in params.items()
                         if k != "embedding" and hasattr(t, "ndim")
                         and t.ndim == 2 and t.shape[0] == v)
        params = _pad_tables(params, m, aux_keys)
        params = jax.device_put(params, shardings_for(params))
        model_state = jax.device_put(model_state, rep) if model_state else {}
    # moments get EXPLICIT shardings: jit does not propagate input shardings
    # into fresh zeros_like outputs, so without this Adam state for a 2 GB
    # table would land replicated (or on one device, crashing multi-process)
    opt_shapes = jax.eval_shape(optimizer.init, params)
    opt_state = jax.jit(optimizer.init,
                        out_shardings=shardings_for(opt_shapes))(params)
    # scalar state is placed through jit (device_put to a sharding that spans
    # other processes' devices is not legal; jit-with-out-shardings is)
    place_rep = jax.jit(lambda x: x, out_shardings=rep)
    return TrainState(params=params, opt_state=opt_state,
                      model_state=model_state,
                      step=place_rep(jnp.zeros((), jnp.int32)),
                      rng=place_rep(state_rng))


def shard_batch(batch: Dict, mesh: Mesh,
                per_host: Optional[bool] = None) -> Dict:
    """Place a batch row-sharded over ``data``.

    ``per_host`` (default: auto — on when multi-process): ``batch`` holds
    only THIS host's rows (its ``host_batch_slice`` of the global batch);
    ``jax.make_array_from_process_local_data`` assembles the global array
    without any host ever holding the full batch. Single-process: a plain
    ``device_put`` of the full batch."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    multi = jax.process_count() > 1 if per_host is None else per_host

    def put(x):
        if multi:
            import numpy as np
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    out = {}
    for k, v in batch.items():
        out[k] = {n: put(a) for n, a in v.items()} if isinstance(v, dict) else put(v)
    return out


def make_sharded_train_step(model: Model, optimizer, mesh: Mesh,
                            donate: bool = True,
                            exchange: str = "psum",
                            compress=None,
                            capacity=None,
                            seq_shard: bool = False,
                            pp_microbatches: int = 0) -> Callable:
    """``capacity``: a2a per-bucket UNIQUE-id cap (None = lossless worst
    case; tuned value from ``planner.plan_capacity``). With a finite
    capacity the step output carries ``a2a_overflow`` — the global count of
    unique ids dropped this step (XLA CSEs the counter's bucketing math
    with the real exchange, so it is near-free). ``seq_shard=True`` shards
    lifelong-sequence KEY axes over ``model`` (SIM's GSU routes through
    ``parallel/longseq.py``; equality vs the unsharded model pinned in
    tests/test_seq_parallel.py)."""
    fs = model.feature_set
    # the overflow counter reconstructs PRIMARY-table global ids; mixed-
    # width schemas route lookups per width group inside FusedEmbedding,
    # so the counter only covers uniform-width sets (the a2a drops remain
    # lossless at the default capacity either way)
    observe_overflow = (exchange == "a2a" and capacity is not None
                        and not fs.mixed_width)
    if observe_overflow:
        from .embedding import ShardedLookup
        sl_obs = ShardedLookup(mesh, fs, mode="a2a", capacity=capacity)

    def train_step(ts: TrainState, batch):
        rng, step_rng = jax.random.split(ts.rng)
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(model, p, ts.model_state, batch, step_rng),
            has_aux=True)
        (total, (logits, new_state, aux, bce)), grads = grad_fn(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(params=params, opt_state=opt_state,
                            model_state=new_state, step=ts.step + 1, rng=rng)
        out = {"loss": total, "bce": bce, "logits": logits,
               "label": batch["label"]}
        if observe_overflow:
            ov = jnp.zeros((), jnp.int32)
            if "sparse" in batch and len(fs.sparse):
                offs = jnp.asarray(fs.sparse_offsets())
                ov = ov + sl_obs.overflow_count(batch["sparse"]
                                                + offs[None, :])
            for name, ids in batch.get("seq", {}).items():
                ov = ov + sl_obs.overflow_count(ids + fs.seq_offset(name))
            out["a2a_overflow"] = ov
        return new_ts, out

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def run(ts, batch):
        with sharded_embeddings(mesh, mode=exchange, compress=compress,
                                capacity=capacity, seq_shard=seq_shard,
                                pp_microbatches=pp_microbatches):
            return jitted(ts, batch)

    def lower(ts, batch):
        # AOT inspection path (utils/hlo_stats.py): trace under the same
        # collective-exchange context the run path uses
        with sharded_embeddings(mesh, mode=exchange, compress=compress,
                                capacity=capacity, seq_shard=seq_shard,
                                pp_microbatches=pp_microbatches):
            return jitted.lower(ts, batch)

    run.lower = lower
    return run


def make_sharded_eval_step(model: Model, mesh: Mesh,
                           exchange: str = "psum",
                           compress=None,
                           seq_shard: bool = False) -> Callable:
    def eval_step(params, model_state, metrics, batch):
        logits, _, _ = model.apply(params, model_state, batch, train=False)
        return update_metrics(metrics, logits, batch["label"],
                              batch.get("weight"))

    jitted = jax.jit(eval_step)

    def run(params, model_state, metrics, batch):
        with sharded_embeddings(mesh, mode=exchange, compress=compress,
                                seq_shard=seq_shard):
            return jitted(params, model_state, metrics, batch)

    return run
