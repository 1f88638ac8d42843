"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

SURVEY §2.10 marks PP "not needed for these shallow models; optional
stage-split later" — this module is that optional tier, built so deep
tower stacks (e.g. many-block AutoInt/BST variants or DCN-v2 stacks at
production width) can split across chips when their weights outgrow one
core's HBM share.

Design (TPU-idiomatic, no host scheduler): the whole schedule is ONE
``lax.scan`` inside ``shard_map``. Each device owns one stage's params
(stacked tree sharded on the leading axis). At tick t, stage s computes
microbatch ``t - s`` (when 0 ≤ t - s < M) and hands its activation to
stage s+1 with a single ``ppermute`` — the classic fill/drain bubble of
GPipe, S + M - 1 ticks total. Because the hand-off is a collective inside
the traced scan, XLA overlaps the ICI transfer with the next tick's
compute, and ``jax.grad`` differentiates straight through (ppermute's
transpose is the reverse permute), giving the backward pipeline for free.

Constraints (asserted): every stage maps (mb, width) → (mb, width) with
one shared activation width (the ring carry has a single static shape),
and the microbatch count M must divide the per-data-shard batch.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def stack_stage_params(per_stage_params) -> jax.Array:
    """[stage0_tree, stage1_tree, ...] → one tree with a leading stage
    axis (the axis ``make_pipeline`` shards over the pipeline axis)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *per_stage_params)


def pipeline_spec_tree(stacked_params, axis_name: str = MODEL_AXIS):
    """PartitionSpec tree for stacked stage params: leading axis sharded."""
    return jax.tree_util.tree_map(
        lambda x: P(*((axis_name,) + (None,) * (x.ndim - 1))), stacked_params)


def make_pipeline(mesh: Mesh, stage_fn: Callable, n_microbatches: int,
                  axis_name: str = MODEL_AXIS,
                  data_axis: str = DATA_AXIS) -> Callable:
    """Build ``call(stacked_params, x) -> y`` running ``stage_fn`` as an
    S-stage pipeline over ``axis_name`` (S = mesh size of that axis),
    composing with batch sharding over ``data_axis``.

    ``stage_fn(stage_params, x)``: one stage's forward, (mb, d) → (mb, d);
    ``stacked_params``: any pytree whose leaves have leading dim S.
    """
    n_stages = mesh.shape[axis_name]
    m = n_microbatches

    def local_fn(params_local, x_local):
        # params_local leaves: (1, ...) — this device's stage
        sparams = jax.tree_util.tree_map(lambda a: a[0], params_local)
        s_idx = jax.lax.axis_index(axis_name)
        b, d = x_local.shape
        mb = b // m
        x_mb = x_local.reshape(m, mb, d)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(act_in, t):
            # stage 0 injects microbatch t (clamped: beyond M it recycles
            # mb 0, whose output is never selected)
            inp = jnp.where(s_idx == 0, x_mb[jnp.clip(t, 0, m - 1)], act_in)
            out = stage_fn(sparams, inp)
            act_next = jax.lax.ppermute(out, axis_name, perm)
            return act_next, out

        # the carry becomes shard-varying over BOTH mesh axes (batch rows
        # differ over data; the ppermute hand-off varies it over the
        # pipeline axis) — mark it so the scan carry types line up
        act0 = jax.lax.pcast(jnp.zeros((mb, d), x_local.dtype),
                             (data_axis, axis_name), to="varying")
        ticks = jnp.arange(n_stages + m - 1)
        _, outs = jax.lax.scan(tick, act0, ticks)       # (T, mb, d)
        # the last stage's outputs at ticks S-1 .. S+M-2 are the results;
        # psum replicates them across the pipeline axis
        y = outs[n_stages - 1:]                          # (M, mb, d)
        y = jnp.where(s_idx == n_stages - 1, y, 0.0)
        y = jax.lax.psum(y, axis_name)
        return y.reshape(b, d)

    # in_specs for the params tree must mirror its structure — built on
    # first call (shard_map retraces only on structure change)
    def call(stacked_params, x):
        d = mesh.shape[data_axis]
        if x.shape[0] % (d * m) != 0:
            raise ValueError(
                f"batch {x.shape[0]} must divide into {d} data shards × "
                f"{m} microbatches")
        specs = pipeline_spec_tree(stacked_params, axis_name)
        run = jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(specs, P(data_axis)),
            out_specs=P(data_axis))
        return run(stacked_params, x)

    return call
