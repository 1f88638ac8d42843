"""Embedding shard planner: frequency-aware table layout.

Greenfield component (the reference is single-device, SURVEY §2.10); the
idea — choose the embedding-table placement with a COST MODEL instead of
hoping uniform row blocks balance — follows the retrieved sharding work
("Pre-train and Search: Efficient Embedding Table Sharding with Pre-trained
Neural Cost Models", PAPERS.md). v5e cost model is simple and measured
(PERF.md): gather/scatter time is per-ROW, so a shard's step cost is the
number of batch ids it OWNS. The fused table (ops/embedding.py) is
row-sharded in contiguous blocks (parallel/embedding.py), so WHICH vocabs
co-locate in a block decides per-shard load: CTR id streams are power-law
and fields differ in lookups/row by orders of magnitude (a 10-row "gender"
vocab serves B lookups/step; a 10M-row ad-id vocab also serves B), so
uniform blocks can concentrate all hot vocabs on one shard.

``plan_field_order`` permutes the VOCAB order of a ``FeatureSet`` (fields
keep their names; models address fields by name, so only the fused-table
layout changes) with a greedy least-loaded-zone assignment, and reports
expected per-shard loads before/after under actual contiguous block
boundaries. Build the pipeline AND the model from the returned FeatureSet —
layout is derived from spec order, so both sides must see the same order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from ..features.schema import FeatureSet
from .embedding import rows_per_shard


def _vocab_lookups(fs: FeatureSet) -> Dict[str, float]:
    """Expected lookups per example per vocab: 1 per sparse field + max_len
    per sequence field (padding rows still cost a gathered row)."""
    out: Dict[str, float] = {}
    for s in fs.sparse:
        out[s.vocab] = out.get(s.vocab, 0.0) + 1.0
    for s in fs.seq:
        out[s.vocab] = out.get(s.vocab, 0.0) + float(s.max_len)
    return out


def expected_shard_loads(fs: FeatureSet, n_shards: int,
                         freq: Optional[Mapping[str, np.ndarray]] = None
                         ) -> np.ndarray:
    """Expected ids-owned per example for each of the ``n_shards`` contiguous
    row blocks of the fused table, under the FeatureSet's CURRENT vocab
    order.

    ``freq``: optional per-vocab id-popularity arrays (any positive scale;
    normalized internally — e.g. raw training counts from the encoders).
    Missing vocabs are treated as uniform."""
    freq = freq or {}
    lookups = _vocab_lookups(fs)
    r = rows_per_shard(fs.total_vocab, n_shards)
    loads = np.zeros(n_shards)
    for name, size in fs.vocabs:
        off = fs.vocab_offsets[name]
        f = np.asarray(freq.get(name, np.ones(size)), dtype=np.float64)
        if f.shape[0] != size:
            raise ValueError(f"freq for vocab {name!r} has {f.shape[0]} "
                             f"entries, vocab_size is {size}")
        cum = np.concatenate([[0.0], np.cumsum(f / f.sum())])
        w = lookups.get(name, 0.0)
        for s in range(n_shards):
            lo = min(max(s * r - off, 0), size)
            hi = min(max((s + 1) * r - off, 0), size)
            loads[s] += w * (cum[hi] - cum[lo])
    return loads


@dataclass(frozen=True)
class ShardPlan:
    feature_set: FeatureSet            # reordered — use for pipeline AND model
    vocab_order: Tuple[str, ...]
    loads_before: np.ndarray           # expected ids-owned/example per shard
    loads_after: np.ndarray

    @property
    def imbalance_before(self) -> float:
        return float(self.loads_before.max() / max(self.loads_before.mean(),
                                                   1e-12))

    @property
    def imbalance_after(self) -> float:
        return float(self.loads_after.max() / max(self.loads_after.mean(),
                                                  1e-12))


def plan_field_order(fs: FeatureSet, n_shards: int,
                     freq: Optional[Mapping[str, np.ndarray]] = None
                     ) -> ShardPlan:
    """Greedy balanced layout: vocabs (sorted by expected load, desc) are
    assigned to the currently least-loaded of ``n_shards`` zones, subject to
    a row-capacity cap so zones stay block-aligned; the new vocab order is
    the zone concatenation. Whole vocabs move — shared-vocab field groups
    stay intact — and per-id ``freq`` still shapes the reported loads."""
    lookups = _vocab_lookups(fs)
    sizes = dict(fs.vocabs)
    order_by_load = sorted(sizes, key=lambda v: -lookups.get(v, 0.0))
    cap = rows_per_shard(fs.total_vocab, n_shards)

    zone_load = np.zeros(n_shards)
    zone_rows = np.zeros(n_shards, dtype=np.int64)
    zones: Tuple[list, ...] = tuple([] for _ in range(n_shards))
    for v in order_by_load:
        fits = np.where(zone_rows + sizes[v] <= cap)[0]
        candidates = fits if fits.size else np.arange(n_shards)
        z = int(candidates[np.argmin(zone_load[candidates])])
        zones[z].append(v)
        zone_load[z] += lookups.get(v, 0.0)
        zone_rows[z] += sizes[v]

    new_order = [v for zone in zones for v in zone]
    rank = {v: i for i, v in enumerate(new_order)}
    # stable-reorder spec groups by their vocab's zone position
    new_sparse = tuple(sorted(fs.sparse, key=lambda s: rank[s.vocab]))
    new_seq = tuple(sorted(fs.seq, key=lambda s: rank[s.vocab]))
    new_fs = FeatureSet(dense=fs.dense, sparse=new_sparse, seq=new_seq)

    return ShardPlan(
        feature_set=new_fs,
        vocab_order=tuple(new_order),
        loads_before=expected_shard_loads(fs, n_shards, freq),
        loads_after=expected_shard_loads(new_fs, n_shards, freq),
    )
