"""Device mesh construction.

The reference has NO distributed layer (SURVEY §2.10: no tf.distribute /
horovod / NCCL anywhere) — this is greenfield, mandated by BASELINE.json.

Axes:
- ``data``  — batch sharding (DP); gradients all-reduce over it.
- ``model`` — embedding-table row sharding (TP for the sparse part);
  lookups exchange ids/rows over it (ICI within a slice).

A v5e-16 would typically run ``make_mesh(data=4, model=4)``; a single host
``make_mesh(data=n_local)``. CPU tests use the 8-device virtual platform.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard an embedding table over 'model'."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))
