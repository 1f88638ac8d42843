"""Fast embedding backward: sort + segmented-combine + Pallas merge-scatter.

Why: XLA's TPU scatter-add serializes duplicate-index updates — the backward
of a (B·F,)-id gather into a multi-million-row table costs ~40 ns/row
(~9 ms for a Criteo-shaped DeepFM step), 10-20× the roofline, and dominates
the whole train step. The reference never hits this (TF on GPU uses
IndexedSlices); on TPU we build the dense gradient ourselves:

1. sort the (N,) flattened ids (argsort, ~0.4 ms for N=213k);
2. segmented Hillis-Steele combine: log2(N) shifted adds turn each
   duplicate-run's TAIL into the run total; non-tails are masked to a
   sentinel id → after this the surviving (id, value) pairs are UNIQUE and
   sorted;
3. per-table-chunk boundaries via ``searchsorted`` (C ≈ V/R queries, cheap);
4. a Pallas kernel walks table chunks (grid=C): DMAs the chunk's update
   slice (static size R — unique ids per chunk can't exceed the chunk's R
   rows), builds a (R, R) one-hot in registers, and emits the (R, D) dense
   grad tile with ONE MXU matmul — no serialized scatter anywhere.

The result is a dense (V, D) gradient produced at ~memcpy speed, fed to the
(dense) optimizer. Wrapped as ``fused_gather`` (custom_vjp), used by
``FusedEmbedding`` for every sparse/seq lookup.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _combine_sorted_duplicates(s_ids: jax.Array, s_ct: jax.Array,
                               sentinel: int) -> Tuple[jax.Array, jax.Array]:
    """Segmented inclusive scan over equal-id runs; keep only run tails.

    After the scan, position i holds the sum of its run's prefix ending at i;
    the run tail holds the full sum. Non-tail ids → sentinel, values → 0.
    """
    n = s_ids.shape[0]
    sh = 1
    while sh < n:
        same = jnp.concatenate(
            [jnp.zeros((min(sh, n),), bool), s_ids[sh:] == s_ids[:-sh]])
        shifted = jnp.concatenate(
            [jnp.zeros((min(sh, n), s_ct.shape[1]), s_ct.dtype), s_ct[:-sh]])
        s_ct = s_ct + jnp.where(same[:, None], shifted, 0.0)
        sh *= 2
    is_tail = jnp.concatenate([s_ids[:-1] != s_ids[1:], jnp.ones((1,), bool)])
    u_ids = jnp.where(is_tail, s_ids, sentinel)
    u_ct = jnp.where(is_tail[:, None], s_ct, 0.0)
    return u_ids, u_ct


def _merge_scatter_kernel(starts_ref, ids_ref, ct_ref, out_ref,
                          ids_vmem, ct_vmem, sems):
    """One table chunk: DMA the (already unique+sorted) update slice, emit the
    dense (R, D) tile via one-hotᵀ @ updates on the MXU.

    The DMA window is 128-aligned (Mosaic slice-tiling requirement) and
    K = R + 128 entries wide, which always covers the chunk's ≤R unique
    updates; out-of-range ids mask to zero in the one-hot.
    """
    c = pl.program_id(0)
    r = out_ref.shape[0]          # chunk rows
    k = ids_vmem.shape[0]         # DMA window (≥ r + 1024, mult of 1024)
    n = ids_ref.shape[0]
    start = jnp.minimum(starts_ref[c], n - k)
    start = (start // 1024) * 1024  # Mosaic 1-D slice tiling: 1024-aligned
    start = pl.multiple_of(start, 1024)

    cp_ids = pltpu.make_async_copy(ids_ref.at[pl.ds(start, k)], ids_vmem,
                                   sems.at[0])
    # updates arrive TRANSPOSED (D, N): lane-dim slices are wide + aligned
    cp_ct = pltpu.make_async_copy(ct_ref.at[:, pl.ds(start, k)], ct_vmem,
                                  sems.at[1])
    cp_ids.start()
    cp_ct.start()
    cp_ids.wait()
    cp_ct.wait()

    local = ids_vmem[:] - c * r                         # (K,)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, r), 1)
    # f32 one-hot: ids are unique after dedup, so each output row receives
    # exactly one f32 update — the matmul is EXACT (bf16 would quantize)
    onehot = (local[:, None] == row_ids).astype(jnp.float32)
    out_ref[:, :] = jax.lax.dot_general(
        onehot, ct_vmem[:, :],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32 (one-hot selects)
    )


def _merge_scatter(starts: jax.Array, u_ids: jax.Array, u_ct: jax.Array,
                   num_rows: int, chunk_rows: int,
                   interpret: bool) -> jax.Array:
    n, d = u_ct.shape
    c = num_rows // chunk_rows
    k = _round_up(chunk_rows + 1024, 1024)
    return pl.pallas_call(
        _merge_scatter_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(c,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),      # ids (N,) in HBM
                pl.BlockSpec(memory_space=pl.ANY),      # ctᵀ (D, N) in HBM
            ],
            out_specs=pl.BlockSpec((chunk_rows, d), lambda c, s: (c, 0)),
            scratch_shapes=[
                pltpu.VMEM((k,), jnp.int32),
                pltpu.VMEM((d, k), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_rows, d), jnp.float32),
        interpret=interpret,
    )(starts, u_ids, u_ct.T)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("num_rows", "chunk_rows"))
def dense_grad_from_updates(flat_ids: jax.Array, ct: jax.Array,
                            num_rows: int, chunk_rows: int = 512) -> jax.Array:
    """(N,) int32 ids + (N, D) cotangents → (num_rows, D) dense gradient.

    Equivalent to ``zeros.at[ids].add(ct)`` but scatter-free (sort + combine
    + merge-scatter). Deterministic: combination order is the sorted order.
    """
    n, d = ct.shape
    num_rows_p = _round_up(num_rows, chunk_rows)
    # pad updates so the kernel's fixed-size 1024-aligned window always fits
    pad = _round_up(n + chunk_rows + 3072, 1024) - n
    sentinel = num_rows_p + 1
    ids_p = jnp.concatenate(
        [flat_ids.astype(jnp.int32), jnp.full((pad,), sentinel, jnp.int32)])
    ct_p = jnp.concatenate([ct, jnp.zeros((pad, d), ct.dtype)])

    order = jnp.argsort(ids_p)
    s_ids = ids_p[order]
    s_ct = ct_p[order].astype(jnp.float32)
    u_ids, u_ct = _combine_sorted_duplicates(s_ids, s_ct, sentinel)
    # compact: non-tails were renamed to the sentinel, breaking sortedness —
    # a second (stable) sort pushes them to the end and restores the
    # "chunk c's updates are one contiguous slice" invariant the kernel needs
    order2 = jnp.argsort(u_ids, stable=True)
    u_ids = u_ids[order2]
    u_ct = u_ct[order2]

    chunk_edges = (jnp.arange(num_rows_p // chunk_rows, dtype=jnp.int32)
                   * chunk_rows)
    starts = jnp.searchsorted(u_ids, chunk_edges).astype(jnp.int32)

    interpret = jax.default_backend() == "cpu"
    out = _merge_scatter(starts, u_ids, u_ct, num_rows_p, chunk_rows,
                         interpret)
    return out[:num_rows]


# ---------------------------------------------------------------------------
# custom-vjp gather
# ---------------------------------------------------------------------------


@jax.custom_vjp
def fused_gather(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    """(V, D) table, (N,) ids → (N, D) rows. Forward = XLA gather; backward =
    scatter-free dense-grad pipeline above."""
    return jnp.take(table, flat_ids, axis=0)


def _fused_gather_fwd(table, flat_ids):
    return jnp.take(table, flat_ids, axis=0), (flat_ids, table.shape[0])


def _fused_gather_bwd(res, ct):
    flat_ids, num_rows = res
    grad = dense_grad_from_updates(flat_ids, ct, num_rows)
    return grad, None


fused_gather.defvjp(_fused_gather_fwd, _fused_gather_bwd)


# ---------------------------------------------------------------------------
# width-split gather: one forward gather, width-aligned backward scatters
# ---------------------------------------------------------------------------
#
# Measured on v5e: XLA scatter-add runs ~5 ns/ELEMENT and falls off a cliff
# at odd widths — (V, 9) costs 23 ms where (V, 8) costs 7.3 ms and (V, 1)
# 1.5 ms. The fused cross+linear table is (V, D+1), so the naive backward
# pays the 9-wide cliff. This custom vjp keeps the single forward gather but
# scatters the cotangent as an 8-wide + 1-wide pair, then concatenates.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def split_gather(table: jax.Array, flat_ids: jax.Array, split: int) -> jax.Array:
    return jnp.take(table, flat_ids, axis=0)


def _split_gather_fwd(table, flat_ids, split):
    return jnp.take(table, flat_ids, axis=0), (flat_ids, table.shape[0])


def _split_gather_bwd(split, res, ct):
    flat_ids, num_rows = res
    w = ct.shape[-1]
    parts = []
    for lo in range(0, w, split):
        hi = min(lo + split, w)
        parts.append(
            jnp.zeros((num_rows, hi - lo), ct.dtype).at[flat_ids].add(
                ct[:, lo:hi]))
    grad = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return grad, None


split_gather.defvjp(_split_gather_fwd, _split_gather_bwd)


# ---------------------------------------------------------------------------
# Grouped gather: split ONE fused-table lookup into per-vocab-group lookups.
#
# Measured on v5e (Criteo step shape, 8192×26 ids → (2.6M, 8) table): XLA
# runs INDEPENDENT gathers/scatters concurrently but serializes within one —
# one fused gather costs 3.97 ms where 26 per-field gathers cost 1.21 ms,
# and one fused scatter-add costs 10.2 ms where 26 disjoint-row-range
# scatters cost 1.69 ms (PERF.md). Since the fused table is laid out as
# contiguous per-vocab row ranges (features/schema.py vocab_offsets), the
# (B, F) sparse lookup decomposes exactly: forward gathers each vocab
# group's id columns separately (full-table gathers — no slicing needed);
# backward scatters each group's cotangent into ITS OWN row range and
# concatenates the ranges (zero blocks for vocabs no sparse column uses,
# e.g. seq vocabs sharing the table).
#
# ``groups`` is static: tuple of (lo, hi, cols) — table row range [lo, hi)
# and the tuple of id-matrix columns whose ids live in it. Ranges must be
# disjoint and sorted by lo. ``split`` width-splits the backward scatter as
# in split_gather (v5e width cliff at >8).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_gather(table: jax.Array, ids: jax.Array,
                   groups: Tuple[Tuple[int, int, Tuple[int, ...]], ...],
                   split: int = 8) -> jax.Array:
    """(V, W) table, (B, F) global row ids → (B, F, W) rows."""
    return _grouped_fwd_only(table, ids, groups)


def _grouped_fwd_only(table, ids, groups):
    b, f = ids.shape
    cols_out = [None] * f
    for _, _, cols in groups:
        rows = jnp.take(table, ids[:, list(cols)].reshape(-1), axis=0)
        rows = rows.reshape(b, len(cols), table.shape[-1])
        for j, c in enumerate(cols):
            cols_out[c] = rows[:, j]
    return jnp.stack(cols_out, axis=1)


def _grouped_gather_fwd(table, ids, groups, split):
    return _grouped_fwd_only(table, ids, groups), (ids, table.shape[0])


def _grouped_gather_bwd(groups, split, res, ct):
    ids, num_rows = res
    w = ct.shape[-1]
    blocks = []  # (lo, grad_block) per group, plus zero gap fills
    for lo, hi, cols in groups:
        cl = list(cols)
        sub_ids = ids[:, cl].reshape(-1) - lo
        sub_ct = ct[:, cl].reshape(-1, w)
        parts = []
        for c0 in range(0, w, split):
            c1 = min(c0 + split, w)
            parts.append(jnp.zeros((hi - lo, c1 - c0), ct.dtype)
                         .at[sub_ids].add(sub_ct[:, c0:c1]))
        blocks.append((lo, hi, parts[0] if len(parts) == 1
                       else jnp.concatenate(parts, axis=-1)))
    pieces, pos = [], 0
    for lo, hi, blk in blocks:
        if lo > pos:
            pieces.append(jnp.zeros((lo - pos, w), ct.dtype))
        pieces.append(blk)
        pos = hi
    if pos < num_rows:
        pieces.append(jnp.zeros((num_rows - pos, w), ct.dtype))
    grad = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)
    return grad, None


grouped_gather.defvjp(_grouped_gather_fwd, _grouped_gather_bwd)
