"""Sequence-sharded lifelong-stream processing: the SIM GSU with the long
KEY axis sharded over the ``model`` mesh axis.

SURVEY §5.7 mandates true sequence sharding for MIMN/SIM-class lifelong
sequences. ``parallel/seq_parallel.py`` provides the attention primitives
(dist/ring); this module composes sequence sharding into the REAL model
path: SIM's General Search Unit (soft search + top-k reduction,
``models/longseq.py``) runs with each device holding only its
``L/M``-length block of the 16k-key stream — activation memory and scoring
FLOPs per device drop by M, which is exactly the compute that outgrows a
chip at production shapes (PERF.md: the (B, 16k, D) long activation is
0.5 GB at B=512/D=16 — per-device it becomes 1/M of that).

Per device (i, j) inside ONE shard_map over (data, model):

1. row fetch for the LOCAL id block through the owner-routed a2a exchange
   (``parallel/embedding._a2a_fetch`` — the same deduped-id collective the
   replicated-id lookup uses, minus the closing all_gather: each device
   keeps only its block's rows, so no device ever materializes the full
   (B_loc, L, D) activation);
2. local soft-search scores against the (replicated-over-model) candidate
   + local top-k over the L/M block;
3. one small ``all_gather`` over ``model`` of the (B_loc, k) block winners
   (scores, global indices, rows, masks) and a lexicographic (-score,
   index) merge — EXACTLY ``jax.lax.top_k``'s tie semantics over the full
   axis, so the sharded GSU equals the unsharded one.

The reduced (B, k, D) output is tiny and replicated over ``model``; the
ESU (MHA + target attention) runs on it unchanged. Gradients flow through
the top-k row gather and the a2a fetch transpose back onto the owning
table shards.

Wire cost per device per long field: ids a2a (S ints, S = B_loc·L/M) +
row a2a (≤ cap·M·D floats) + the (B_loc·k·(D+3)) merge gather — vs the
replicated-key path's (B_loc·L·D) psum/all_gather activation. At L=16k,
M=8, k=128 that is ~8× less ICI traffic and M× less HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..features.schema import FeatureSet
from .embedding import _a2a_fetch, pad_table_for_shards, rows_per_shard
from .mesh import DATA_AXIS, MODEL_AXIS


def seq_sharded_soft_search(mesh: Mesh, fs: FeatureSet,
                            long_fields: Sequence[str],
                            top_k: int,
                            table: jax.Array,
                            seq_ids: Dict[str, jax.Array],
                            cand: jax.Array,
                            capacity: Optional[int] = None,
                            compress: Optional[str] = None
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Soft-search GSU with the long axis sharded over ``model``.

    ``table``: the row-sharded fused cross table (V, D). ``seq_ids``: the
    batch's seq dict (uses ``long_fields`` entries, each (B, L) LOCAL ids).
    ``cand``: (B, Σ dims) candidate embedding slice vocab-matched to the
    long fields (the same ``cand_long`` the unsharded soft search scores
    against, models/longseq.py). Returns ``(top_idx (B, k) int32 —
    positions into the long axis, red_mask (B, k))``; the caller
    re-gathers ONLY the selected rows differentiably (SIM's
    ``_regather_selected``), so no gradient flows through this scoring
    pass at all — the merge ships scores+indices, not row payloads.

    Equality: bit-compatible with the unsharded soft search (same per-row
    float ops; top-k merge replicates ``lax.top_k`` tie semantics).
    ``L`` must divide by the model-axis size."""
    m = mesh.shape[MODEL_AXIS]
    d = fs.embed_dim
    L = fs.seq_spec(long_fields[0]).max_len
    for n in long_fields:
        if fs.seq_spec(n).max_len != L:
            raise ValueError("seq-sharded GSU needs equal max_len across "
                             f"long fields (got {n}: "
                             f"{fs.seq_spec(n).max_len} vs {L})")
    if L % m:
        raise ValueError(f"long length {L} must divide the model axis {m} "
                         "for sequence sharding")
    lb = L // m
    k = min(top_k, L)
    k_loc = min(k, lb)
    offsets = [fs.seq_offset(n) for n in long_fields]
    nf = len(long_fields)

    def body(table_shard, cand_loc, *ids_blocks):
        j = jax.lax.axis_index(MODEL_AXIS)
        b_loc = cand_loc.shape[0]
        s = b_loc * lb
        # a bucket can never hold more uniques than its owner shard has
        # ROWS — clamping to r keeps the fetch lossless while bounding the
        # exchange buffers by the vocab, not the stream length (the 16k-key
        # case: S = B_loc·L/M ids but only ≤ r distinct rows exist)
        cap = min(capacity or s, table_shard.shape[0])
        rows_f, masks = [], None
        for ids_blk, off in zip(ids_blocks, offsets):
            gids = (ids_blk.astype(jnp.int32) + off).reshape(-1)
            rows = _a2a_fetch(table_shard, gids, cap, compress)
            rows = rows.reshape(b_loc, lb, d)
            mask_f = ids_blk != 0
            rows = rows * mask_f[..., None]     # pad rows zeroed (fe.seq)
            rows_f.append(rows)
            masks = mask_f if masks is None else (masks | mask_f)
        rows = jnp.concatenate(rows_f, axis=-1)   # (B_loc, lb, nf·d)
        scores = jnp.einsum("bld,bd->bl", rows, cand_loc)
        scores = jnp.where(masks, scores, -jnp.inf)

        loc_s, loc_i = jax.lax.top_k(scores, k_loc)
        gidx = (j * lb + loc_i).astype(jnp.int32)
        sel_mask = jnp.take_along_axis(masks, loc_i, axis=1)

        cat_s = jax.lax.all_gather(loc_s, MODEL_AXIS, axis=1, tiled=True)
        cat_i = jax.lax.all_gather(gidx, MODEL_AXIS, axis=1, tiled=True)
        cat_m = jax.lax.all_gather(sel_mask, MODEL_AXIS, axis=1, tiled=True)

        # lexicographic (-score, global index) merge == lax.top_k over the
        # full axis (ties prefer the lower index)
        perm0 = jnp.broadcast_to(jnp.arange(m * k_loc, dtype=jnp.int32),
                                 cat_s.shape)
        _, _, perm = jax.lax.sort((-cat_s, cat_i, perm0), dimension=1,
                                  num_keys=2)
        sel = perm[:, :k]
        top_idx = jnp.take_along_axis(cat_i, sel, axis=1)
        red_mask = jnp.take_along_axis(cat_m, sel, axis=1)
        return top_idx, red_mask

    table = pad_table_for_shards(table, m)  # no-op on already-padded tables
    ids_specs = tuple(P(DATA_AXIS, MODEL_AXIS) for _ in range(nf))
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS)) + ids_specs,
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        # same tiled-collective vma limitation as parallel/embedding's a2a
        # (outputs ARE replicated over model after the merge; guarded
        # mechanically by the equality test vs the unsharded GSU). The
        # scoring pass carries NO gradient (integer/bool outputs) — the
        # caller re-gathers the selected rows differentiably (SIM's
        # _regather_selected), which also drops the row payload from the
        # merge entirely.
        check_vma=False,
    )
    return jax.lax.stop_gradient(
        fn(table, cand, *(seq_ids[n] for n in long_fields)))


def seq_shard_wire_bytes(batch_per_dev: int, L: int, m: int, d: int,
                         k: int, nf: int = 1, bytes_per: int = 4
                         ) -> Dict[str, float]:
    """Per-device ICI bytes of one seq-sharded GSU vs the replicated-key
    alternative (for docs/SCALING.md §8 — the SP wire budget)."""
    s = batch_per_dev * (L // m)
    a2a_ids = s * 4 * 2                      # request + (int32) echo ids
    a2a_rows = s * d * bytes_per             # worst-case row payload back
    merge = batch_per_dev * min(k, L // m) * (m - 1) * (d + 3) * bytes_per
    sharded = nf * (a2a_ids + a2a_rows) + merge
    replicated = nf * batch_per_dev * L * d * bytes_per  # full activation
    return {"sharded_bytes": float(sharded),
            "replicated_bytes": float(replicated),
            "ratio": float(replicated / max(sharded, 1.0))}
