"""Sharding context: routes embedding lookups through collectives when a
mesh with a non-trivial ``model`` axis is active.

Models call ``FusedEmbedding.sparse/seq`` unchanged; under
``with sharded_embeddings(mesh): ...`` those lookups run the shard_map
mask+psum exchange (``parallel/embedding.py``) instead of a local gather.
One model code path, two execution modes — the TPU-native analogue of the
reference's cuDNN-vs-CPU backend selection (rnn_demo.py:486-501), but for
the sharded embedding store.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

from jax.sharding import Mesh

from .mesh import MODEL_AXIS

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def model_axis_size() -> int:
    mesh = active_mesh()
    if mesh is None:
        return 1
    return mesh.shape.get(MODEL_AXIS, 1)


def exchange_mode() -> str:
    return getattr(_state, "mode", "psum")


def exchange_compress() -> Optional[str]:
    return getattr(_state, "compress", None)


def exchange_capacity() -> Optional[int]:
    return getattr(_state, "capacity", None)


def seq_shard_active() -> bool:
    """True when long-sequence KEY-axis sharding is requested: lifelong
    models (SIM's GSU, models/longseq.py) route their long-stream
    processing through ``parallel/longseq.py`` so each device holds only
    an L/M block of the stream."""
    return bool(getattr(_state, "seq_shard", False))


def pp_microbatches() -> int:
    """> 0 when pipeline parallelism is requested: deep tower stacks
    (AutoInt's block stack) route through ``parallel/pipeline.py`` with
    this many microbatches, one stage per ``model``-axis device."""
    return int(getattr(_state, "pp_microbatches", 0))


@contextlib.contextmanager
def sharded_embeddings(mesh: Mesh, mode: str = "psum",
                       compress: Optional[str] = None,
                       capacity: Optional[int] = None,
                       seq_shard: bool = False,
                       pp_microbatches: int = 0):
    """``mode``: 'psum' (mask+psum) or 'a2a' (id all-to-all exchange) —
    see parallel/embedding.py for the trade-off. ``compress='bf16'`` ships
    the exchanged row payloads in bfloat16 (half the ICI bytes).
    ``capacity`` bounds UNIQUE ids per a2a (src→dst) bucket (None = the
    lossless worst case; derive a tuned value from frequency stats with
    ``parallel.planner.plan_capacity``). ``seq_shard=True`` additionally
    shards lifelong-sequence KEY axes over ``model``
    (``parallel/longseq.py``). ``pp_microbatches`` > 0 pipelines deep
    tower stacks over ``model`` (``parallel/pipeline.py``)."""
    prev = getattr(_state, "mesh", None)
    prev_mode = getattr(_state, "mode", "psum")
    prev_compress = getattr(_state, "compress", None)
    prev_capacity = getattr(_state, "capacity", None)
    prev_seq = getattr(_state, "seq_shard", False)
    prev_pp = getattr(_state, "pp_microbatches", 0)
    _state.mesh = mesh
    _state.mode = mode
    _state.compress = compress
    _state.capacity = capacity
    _state.seq_shard = seq_shard
    _state.pp_microbatches = pp_microbatches
    try:
        yield
    finally:
        _state.mesh = prev
        _state.mode = prev_mode
        _state.compress = prev_compress
        _state.capacity = prev_capacity
        _state.seq_shard = prev_seq
        _state.pp_microbatches = prev_pp
