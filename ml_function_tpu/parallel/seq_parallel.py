"""Sequence-axis parallelism: distributed attention over sharded keys.

SURVEY §5.7: the reference handles long sequences only algorithmically
(sessions / NTM compression / SIM retrieval); true sequence sharding is
greenfield. Here the KEY/VALUE sequence of a lifelong behavior stream is
sharded across a mesh axis; queries (the handful of candidate-conditioned
positions) are replicated. Two interchangeable implementations:

- ``dist_attention``: each shard computes a partial attention (out_i, lse_i)
  against its local keys; partials merge with the logsumexp-weighted psum
  identity out = Σ_i out_i·exp(lse_i − lse_total). One collective.
- ``ring_attention``: K/V blocks rotate around the axis with ``ppermute``
  while each shard accumulates online-softmax state (m, l, acc) — the
  bandwidth-optimal ring form (comm overlaps compute under XLA async
  collective permute).

Both reduce to exact softmax attention; tests check them against the dense
computation on the 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e9


def _local_attention_stats(q, k, v, bias, scale):
    """Partial attention of q against local keys.

    q: (B, H, Lq, Dh); k, v: (B, H, Lkl, Dh); bias: (B, Lkl).
    Returns (acc (B,H,Lq,Dh) = unnormalized P·V, m (B,H,Lq,1), l (B,H,Lq,1)).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = s + bias[:, None, None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF)  # all-masked shards stay finite
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    return acc, m, l


def dist_attention_local(q, k_local, v_local, bias_local, axis_name,
                         scale=None):
    """Runs INSIDE shard_map: exact attention over keys sharded on
    ``axis_name``, merged with one psum."""
    scale = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    acc, m, l = _local_attention_stats(q, k_local, v_local, bias_local, scale)
    # max is only an exponent shift — treat as constant (pmax has no VJP;
    # stop_gradient must be INSIDE so pmax never sees a tangent)
    m_glob = jax.lax.pmax(jax.lax.stop_gradient(m), axis_name)
    alpha = jnp.exp(m - m_glob)
    l_glob = jax.lax.psum(l * alpha, axis_name)
    out = jax.lax.psum(acc * alpha, axis_name) / jnp.maximum(l_glob, 1e-30)
    return out


def ring_attention_local(q, k_local, v_local, bias_local, axis_name,
                         scale=None):
    """Runs INSIDE shard_map: ring variant — K/V/bias rotate via ppermute,
    online-softmax accumulation; no final collective."""
    scale = scale if scale is not None else 1.0 / np.sqrt(q.shape[-1])
    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k, v, bias, m, l, acc = carry
        a_i, m_i, l_i = _local_attention_stats(q, k, v, bias, scale)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_i - m_new)
        l = l * alpha + l_i * beta
        acc = acc * alpha + a_i * beta
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        bias = jax.lax.ppermute(bias, axis_name, perm)
        return (k, v, bias, m_new, l, acc), None

    b, h, lq, dh = q.shape
    # accumulators become shard-varying inside the loop — mark them so the
    # scan carry types line up under shard_map
    def vary(x):
        return jax.lax.pcast(x, axis_name, to="varying")

    init = (k_local, v_local, bias_local,
            vary(jnp.full((b, h, lq, 1), NEG_INF)),
            vary(jnp.zeros((b, h, lq, 1))),
            vary(jnp.zeros((b, h, lq, dh))))
    (k, v, bias, m, l, acc), _ = jax.lax.scan(step, init, None, length=n)
    return acc / jnp.maximum(l, 1e-30)


def make_seq_parallel_attention(mesh: Mesh, axis_name: str = "model",
                                mode: str = "dist"):
    """Top-level callable: q replicated over ``axis_name``; k/v/mask sharded
    on their sequence axis. Shapes: q (B,H,Lq,Dh); k,v (B,H,Lk,Dh);
    mask (B, Lk) — Lk must divide by the axis size."""
    inner = dist_attention_local if mode == "dist" else ring_attention_local

    def local_fn(q, k, v, bias):
        return inner(q, k, v, bias, axis_name)

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, None, axis_name, None),
                  P(None, None, axis_name, None), P(None, axis_name)),
        out_specs=P(),
        # dist mode's psum/pmax merge is provably replicated — the static
        # checker verifies it (r5). The ring result is replicated after a
        # full rotation, but the checker can't see through the ppermute
        # accumulation — mechanically guarded by the vs-dense equality
        # tests instead.
        check_vma=(mode == "dist"),
    )

    def call(q, k, v, mask: Optional[jax.Array] = None):
        b, lk = k.shape[0], k.shape[2]
        if mask is None:
            mask = jnp.ones((b, lk), bool)
        bias = jnp.where(mask, 0.0, NEG_INF)
        return fn(q.astype(jnp.float32), k.astype(jnp.float32),
                  v.astype(jnp.float32), bias.astype(jnp.float32))

    return call
