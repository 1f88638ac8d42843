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

from typing import Any, Callable, Dict, Tuple

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
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    # both column groups of FusedEmbedding ("table" cross, "linear" 1st-order)
    return "embedding" in keys and ("table" in keys or "linear" in keys)


def _is_expert_path(path) -> bool:
    """MoE expert stacks (MMoE/PLE: ``experts.w``/``experts.b`` leaves of
    shape (E, ...)) — shard the leading expert axis over ``model`` (EP).
    GSPMD inserts the gate-mix reduction over the expert axis itself."""
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    return "experts" in keys


def param_spec_tree(params: Params) -> Any:
    """PartitionSpec tree: embedding tables row-sharded, MoE expert stacks
    expert-sharded, rest replicated."""

    def spec(path, x):
        if _is_table_path(path):
            return P(MODEL_AXIS, None)
        if _is_expert_path(path) and x.ndim >= 2:
            return P(*((MODEL_AXIS,) + (None,) * (x.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _pad_tables(tree: Params, num_shards: int) -> Params:
    return jax.tree_util.tree_map_with_path(
        lambda path, x: pad_table_for_shards(x, num_shards)
        if _is_table_path(path) else x, tree)


def create_sharded_state(model: Model, rng, optimizer, mesh: Mesh) -> TrainState:
    """Init on host, pad tables to the shard grid, place with shardings.

    Optimizer moments are created from the already-sharded params
    (``zeros_like`` inherits sharding), so Adam state for a table shard
    lives on the shard's owner."""
    init_rng, state_rng = jax.random.split(rng)  # same split as
    # train.loop.create_train_state so single-chip and sharded runs from one
    # seed are bit-comparable
    params, model_state = model.init(init_rng)
    m = mesh.shape[MODEL_AXIS]
    params = _pad_tables(params, m)
    specs = param_spec_tree(params)
    params = jax.device_put(
        params,
        jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                               is_leaf=lambda s: isinstance(s, P)))
    opt_state = jax.jit(optimizer.init)(params)
    rep = NamedSharding(mesh, P())
    model_state = jax.device_put(model_state, rep) if model_state else {}
    return TrainState(params=params, opt_state=opt_state,
                      model_state=model_state,
                      step=jax.device_put(jnp.zeros((), jnp.int32), rep),
                      rng=jax.device_put(state_rng, rep))


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        return jax.device_put(x, sh)

    out = {}
    for k, v in batch.items():
        out[k] = {n: put(a) for n, a in v.items()} if isinstance(v, dict) else put(v)
    return out


def make_sharded_train_step(model: Model, optimizer, mesh: Mesh,
                            donate: bool = True,
                            exchange: str = "psum",
                            compress=None) -> Callable:
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
        return new_ts, {"loss": total, "bce": bce, "logits": logits,
                        "label": batch["label"]}

    jitted = jax.jit(train_step, donate_argnums=(0,) if donate else ())

    def run(ts, batch):
        with sharded_embeddings(mesh, mode=exchange, compress=compress):
            return jitted(ts, batch)

    return run


def make_sharded_eval_step(model: Model, mesh: Mesh,
                           exchange: str = "psum",
                           compress=None) -> Callable:
    def eval_step(params, model_state, metrics, batch):
        logits, _, _ = model.apply(params, model_state, batch, train=False)
        return update_metrics(metrics, logits, batch["label"],
                              batch.get("weight"))

    jitted = jax.jit(eval_step)

    def run(params, model_state, metrics, batch):
        with sharded_embeddings(mesh, mode=exchange, compress=compress):
            return jitted(params, model_state, metrics, batch)

    return run
