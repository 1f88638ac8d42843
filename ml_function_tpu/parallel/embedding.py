"""Sharded embedding store: row-sharded fused table + collective lookup.

Greenfield component (the reference is single-device; SURVEY §2.10), built to
BASELINE.json's north star: "sparse categorical embedding tables row-sharded
across a multi-host TPU pod slice with all-to-all ID exchange and gather".

Layout: the fused table (total_vocab, D) is row-sharded over the ``model``
mesh axis in contiguous blocks of ``rows_per_shard = ceil(V / m)``; the batch
is sharded over ``data``. Device (i, j) holds batch shard i and table shard j.

Lookup (inside ``shard_map``):
1. each device gathers rows for the ids it OWNS (mask + clamped local gather
   — static shapes, no host roundtrip);
2. ``psum`` over ``model`` combines per-shard partial results into the full
   (B_local, F, D) activation for the device's batch shard.

This is the mask+psum exchange: each device moves exactly one (B_local·F·D)
buffer over ICI. For the hot DeepFM/xDeepFM shapes (F·D ≈ 208 floats/row) it
is bandwidth-equivalent to the id-all-to-all variant without its two hops and
sort; dedup-a2a becomes worthwhile for D ≫ 64 or power-law repeated ids and
is left as the documented upgrade path. The backward of ``psum`` is identity
(gradient already sharded), so each table shard receives exactly its rows'
gradients — the sparse-update path stays local to the owning device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..features.schema import FeatureSet
from .mesh import DATA_AXIS, MODEL_AXIS


def rows_per_shard(total_vocab: int, num_shards: int) -> int:
    return -(-total_vocab // num_shards)  # cdiv


def pad_table_for_shards(table: jax.Array, num_shards: int) -> jax.Array:
    """Pad rows so the table divides evenly across shards."""
    v = table.shape[0]
    target = rows_per_shard(v, num_shards) * num_shards
    if target == v:
        return table
    pad = jnp.zeros((target - v,) + table.shape[1:], table.dtype)
    return jnp.concatenate([table, pad], axis=0)


def _local_lookup(table_shard: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows owned by this model-axis shard; zeros elsewhere; psum.

    ``ids`` are global ids of any shape; returns (*ids.shape, D) embeddings.
    Runs INSIDE shard_map: ``table_shard`` is the local (rows, D) block.
    """
    r = table_shard.shape[0]
    j = jax.lax.axis_index(MODEL_AXIS)
    lo = j * r
    local = ids - lo
    owned = (local >= 0) & (local < r)
    safe = jnp.clip(local, 0, r - 1)
    rows = jnp.take(table_shard, safe, axis=0)
    rows = jnp.where(owned[..., None], rows, 0.0)
    return jax.lax.psum(rows, MODEL_AXIS)


@dataclass(frozen=True)
class ShardedLookup:
    """Collective lookup ops bound to a mesh. Table params live row-sharded;
    call :meth:`sparse` / :meth:`seq` inside a pjit'd step — the function is
    wrapped in shard_map over (data, model)."""

    mesh: Mesh
    feature_set: FeatureSet

    # --- sharding specs -------------------------------------------------

    def table_spec(self) -> P:
        return P(MODEL_AXIS, None)

    def padded_vocab(self) -> int:
        m = self.mesh.shape[MODEL_AXIS]
        return rows_per_shard(self.feature_set.total_vocab, m) * m

    # --- lookups --------------------------------------------------------

    def lookup(self, table: jax.Array, global_ids: jax.Array) -> jax.Array:
        """(…,) global row ids → (…, width) rows via mask+psum collective.
        FusedEmbedding handles offsets/masks/column-slicing on top."""
        fn = jax.shard_map(
            _local_lookup, mesh=self.mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )
        return fn(table, global_ids)

    # kept for direct use in tests/tools
    def sparse(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        """(B, F) ids → (B, F, width) via one collective lookup."""
        offs = jnp.asarray(self.feature_set.sparse_offsets())
        return self.lookup(table, ids + offs[None, :])
