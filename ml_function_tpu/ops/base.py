"""Minimal functional parameter system.

Blocks are frozen dataclasses with ``init(rng) -> params`` and
``__call__(params, ...) -> out``. Parameters are plain nested dicts of
``jnp.ndarray`` — directly jittable, shardable with ``pjit``, and
optimizer-friendly. No module framework, no tracing magic, no import-time side
effects (the reference executes singletons + ``print(os.getcwd())`` on import,
``kon/model/ctr_model/model/models.py:17-28`` — deliberately not reproduced).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Parameters are stored/updated in float32; compute casts to bfloat16 inside
# blocks where MXU-bound (matmul) and accumulates in float32.
PARAM_DTYPE = jnp.float32


def split_rngs(rng: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    keys = jax.random.split(rng, max(len(names), 1))
    return {n: k for n, k in zip(names, keys)}


def glorot_uniform(rng: jax.Array, shape, dtype=PARAM_DTYPE) -> jax.Array:
    fan_in, fan_out = shape[-2], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def normal_init(rng: jax.Array, shape, stddev=0.05, dtype=PARAM_DTYPE) -> jax.Array:
    return jax.random.normal(rng, shape, dtype) * stddev


def uniform_init(rng: jax.Array, shape, scale=0.05, dtype=PARAM_DTYPE) -> jax.Array:
    return jax.random.uniform(rng, shape, dtype, -scale, scale)


def zeros(shape, dtype=PARAM_DTYPE) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=PARAM_DTYPE) -> jax.Array:
    return jnp.ones(shape, dtype)


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def bf16_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """MXU-friendly matmul: bf16 inputs, f32 accumulation.

    ``ML_FUNCTION_TPU_F32_MATMUL=1`` keeps the inputs f32 — the numerics
    A/B knob (e.g. attributing small AUC deltas to the bf16 cast; measured:
    DeepFM/xDeepFM/DIN parity shows no bf16 cost, MMoE at tiny epoch
    budgets shows ~+0.004 AUC for f32 — CONVERGENCE.md)."""
    import os
    if os.environ.get("ML_FUNCTION_TPU_F32_MATMUL") == "1":
        return jax.lax.dot_general(
            x, w, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
