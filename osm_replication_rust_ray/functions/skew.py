"""Skew handling for hot keys (north_rule: dense urban cells).

Two tools:

- ``key_census(ds, key)``: per-key row counts (two-phase; cheap) —
  drives the salting decision (how hot is the hottest cell?).
- ``salted_aggregate(ds, key, aggs, n_salts)``: groupby where each key
  is split across ``n_salts`` synthetic sub-keys (deterministic row
  hash), partial-aggregated per (key, salt), then re-aggregated per
  key.  The wide shuffle moves ``n_keys x n_salts`` pre-combined rows
  instead of raw rows, and no single reducer sees a whole hot key.

For associative/commutative aggs (min/max/sum/count) the per-batch
partial combine in ``map_batches`` already bounds reducer load at one
row per (key, block); explicit salting matters when the groupby must
see rows (map_groups-style holistic work) or when block-level combine
is ineffective (a hot key spread over every block at low multiplicity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_AGG_NP = {"min": "min", "max": "max", "sum": "sum", "count": "count"}


def key_census(ds, key: str, top_k: int = 50):
    """-> small Dataset of the top_k hottest keys with counts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(k, return_counts=True)
        return pa.table(
            {key: pa.array(uniq), "n": pa.array(counts, pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n_rows"))
        .sort("n_rows", descending=True)
        .limit(top_k)
    )


def salted_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16):
    """Two-phase salted grouped aggregate -> Dataset[key, *aggs].

    Phase 1 groups on (key, salt) where salt = per-row round-robin
    index modulo n_salts, so a hot key fans out over n_salts reducers
    independent of its value distribution.  Phase 2 re-aggregates the
    n_salts partials per key (tiny).
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    def add_salt(batch: pa.Table) -> pa.Table:
        n = len(batch)
        # per-row round-robin salt: uniform fan-out regardless of the
        # value distribution (a value-derived salt collapses onto one
        # reducer when a hot key's values are constant/low-cardinality,
        # e.g. count over identical values).  The final aggregate is
        # salt-invariant for associative/commutative ops, so block-split
        # nondeterminism of the salt cannot change results.
        salt = np.arange(n, dtype=np.int64) % n_salts
        # per-batch partial combine on (key, salt)
        t = pa.table(
            {
                key: batch[key],
                "__salt": pa.array(salt, pa.int64()),
                **{c: batch[c] for c in {c for c, _ in aggs.values()}},
            }
        )
        pa_aggs = []
        names = [key, "__salt"]
        for out_col, (col, op) in aggs.items():
            pa_aggs.append((col, _AGG_NP[op]))
            names.append(out_col)
        return t.group_by([key, "__salt"]).aggregate(pa_aggs).rename_columns(names)

    phase1 = ds.map_batches(add_salt, batch_format="pyarrow", batch_size=65536)

    ray_aggs = []
    for out_col, (_col, op) in aggs.items():
        cls = {"min": Min, "max": Max, "sum": Sum, "count": Sum}[op]
        ray_aggs.append(cls(out_col, alias_name=out_col))
    merged = phase1.groupby([key, "__salt"]).aggregate(*ray_aggs)

    # phase 2: collapse salts (n_keys x n_salts rows -> n_keys rows).
    # The input is bounded by n_keys x n_salts pre-combined rows, so a
    # second all-to-all round is pure overhead at moderate key domains
    # (measured: ~1.6 s flat for 1024 cells x 8 salts); route through
    # the adaptive ladder — single-task local merge when the exact
    # materialized count is small, sorted-segment beyond (e.g. res-9
    # cells x 16 salts at 100 TB).  Phase-1 counts collapse as sums.
    from .agg import small_sorted_aggregate

    phase2_aggs = {
        out: (out, "sum" if op in ("sum", "count") else op)
        for out, (_col, op) in aggs.items()
    }
    return small_sorted_aggregate(
        merged.drop_columns(["__salt"]), key, phase2_aggs
    )
