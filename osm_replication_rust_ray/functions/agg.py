"""High-cardinality grouped aggregation without per-group Python.

``Dataset.groupby().aggregate`` invokes Python once per group per
aggregate — fine for thousands of groups, pathological for millions.
``sorted_segment_aggregate`` replaces it for high-cardinality keys:

1. ``ds.sort(key)`` — Ray's range-partition shuffle (C-level block
   sorts); equal keys land in one partition, but a partition may still
   be SPLIT across output blocks by block-size limits, so a key run can
   straddle adjacent blocks.
2. per block (map_batches, batch = whole block): vectorized
   ``np.<op>.reduceat`` segment reduction.  INTERIOR key runs are
   final; the FIRST and LAST run of each block are emitted as partial
   rows (a straddling key is necessarily a boundary run in every block
   it touches).
3. boundary partials (<= 2 rows per block) go through the ordinary
   Ray groupby-aggregate — tiny, so per-group Python is irrelevant —
   and are unioned with the interior stream.

Supported ops: min, max, sum, count (count aggregates the implicit row
count; pass any column). All outputs int64/float64 per input dtype.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_REDUCERS = {
    "min": np.minimum,
    "max": np.maximum,
    "sum": np.add,
}


def _segment_reduce(batch: pa.Table, key: str, aggs: dict[str, tuple[str, str]],
                    starts: np.ndarray, ends: np.ndarray, take: np.ndarray):
    keys = batch[key].to_numpy(zero_copy_only=False)
    cols = {key: pa.array(keys[starts[take]])}
    for out_col, (col, op) in aggs.items():
        if op == "count":
            r = (ends - starts).astype(np.int64)
        else:
            v = batch[col].to_numpy(zero_copy_only=False)
            r = _REDUCERS[op].reduceat(v, starts)
        cols[out_col] = pa.array(r[take])
    return pa.table(cols)


def sorted_segment_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]]):
    """-> Dataset with one row per key: columns [key] + aggs keys.

    ``aggs``: out_col -> (in_col, op), op in {min,max,sum,count}.
    """
    from ray.data.aggregate import Count, Max, Min, Sum

    sorted_ds = ds.sort(key)

    def per_block(batch: pa.Table) -> pa.Table:
        """Reduce every key run; flag the block's first/last run as
        boundary (they may continue in an adjacent block)."""
        n = len(batch)
        if n == 0:
            # keep the key's real dtype (string keys supported)
            cols = {key: batch[key]}
            for out_col in aggs:
                cols[out_col] = pa.array([], pa.int64())
            cols["__boundary"] = pa.array([], pa.bool_())
            return pa.table(cols)
        keys = batch[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        ends = np.concatenate((starts[1:], [n]))
        n_runs = len(starts)
        take = np.arange(n_runs)
        t = _segment_reduce(batch, key, aggs, starts, ends, take)
        flag = np.zeros(n_runs, bool)
        flag[0] = True
        flag[-1] = True
        return t.append_column("__boundary", pa.array(flag))

    # ONE execution of the (shuffled) sort feeds both branches: the
    # reduced run-level table is output-sized, so materializing it is
    # cheap, and it pins the block boundaries the flags refer to (a
    # second lazy execution could re-split the sort differently).
    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    def split(batch: pa.Table, want_boundary: bool) -> pa.Table:
        import pyarrow.compute as pc

        mask = batch["__boundary"]
        if not want_boundary:
            mask = pc.invert(mask)
        return batch.filter(mask).drop_columns(["__boundary"])

    interior = reduced.map_batches(
        lambda b: split(b, False), batch_format="pyarrow"
    )
    partials = reduced.map_batches(
        lambda b: split(b, True), batch_format="pyarrow"
    )
    ray_aggs = []
    for out_col, (_col, op) in aggs.items():
        if op == "min":
            ray_aggs.append(Min(out_col, alias_name=out_col))
        elif op == "max":
            ray_aggs.append(Max(out_col, alias_name=out_col))
        elif op in ("sum", "count"):
            ray_aggs.append(Sum(out_col, alias_name=out_col))
    merged = partials.groupby(key).aggregate(*ray_aggs)
    # merged is boundary-run-sized (<= 2 rows per sorted block): fold
    # it into ONE block so the union adds +1 block, not +input-blocks.
    # Without this, ITERATED callers (the CC / PageRank fixpoints)
    # double their block count every round — sort cost then grows
    # exponentially with rounds (measured: 8 -> 2048 blocks and
    # 0.4 s -> 87 s per round by round 8 on constant 105k-row data).
    return interior.union(merged.repartition(1))


def local_group_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]]):
    """Single-task C-level grouped aggregate for SMALL (bounded)
    inputs: ``repartition(1)`` + one pyarrow ``group_by`` — no
    range-partition sort, no hash-shuffle aggregator actors.  A
    distributed-diff run chains dozens of tiny aggregations whose
    fixed sort/shuffle latency dominates wall time at test scale;
    callers gate on a measured row count (``small_sorted_aggregate``)
    so the scale path is unchanged."""

    def fn(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            cols = {key: batch[key]}
            for out_col, (col, op) in aggs.items():
                t = pa.int64() if op == "count" else batch[col].type
                cols[out_col] = pa.array([], t)
            return pa.table(cols)
        if any(op == "count" for _c, op in aggs.values()):
            batch = batch.append_column(
                "__one", pa.array(np.ones(len(batch), np.int64))
            )
        specs, seen = [], set()
        for _out, (col, op) in aggs.items():
            pair = ("__one", "sum") if op == "count" else (col, op)
            if pair not in seen:
                seen.add(pair)
                specs.append(pair)
        gb = batch.group_by(key).aggregate(specs)
        cols = {key: gb[key]}
        for out_col, (col, op) in aggs.items():
            c, o = ("__one", "sum") if op == "count" else (col, op)
            cols[out_col] = gb[f"{c}_{o}"]
        return pa.table(cols)

    mat = ds.materialize()
    if mat.count() == 0:
        # repartition(1) drops empty blocks and with them the schema;
        # type the empty result explicitly from the input schema
        import ray.data

        schema = mat.schema()
        if schema is None:
            return mat
        types = dict(zip(schema.names, schema.types))
        fields = [(key, types[key])] + [
            (out, pa.int64() if op == "count" else types[col])
            for out, (col, op) in aggs.items()
        ]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    return mat.repartition(1).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


# measured (round 4): single-task pyarrow group_by min/min over int64
# keys does 1.4M rows / 600k groups in 0.22 s, 4M rows / 1.4M groups in
# 0.59 s — while ONE distributed range-sort round costs multiple
# seconds of orchestration regardless of size.  One join-partition's
# worth of rows (ROWS_PER_JOIN_PART) is the natural "fits one task"
# bound; inputs beyond it take the sorted-segment scale path exactly
# as before.
_LOCAL_AGG_ROWS = 4_000_000


def small_sorted_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]]):
    """``sorted_segment_aggregate`` with a measured small-input fast
    path: materialize the (already bounded, pre-combined) input, and
    below ``_LOCAL_AGG_ROWS`` rows run the single-task local aggregate
    instead of the sort.  For the high-cardinality case the sorted
    path runs exactly as before — on the materialized input, which the
    sort's all-to-all would have pinned anyway."""
    mat = ds.materialize()
    if mat.count() <= _LOCAL_AGG_ROWS:
        return local_group_aggregate(mat, key, aggs)
    return sorted_segment_aggregate(mat, key, aggs)


# measured: Ray hash-agg is Python-per-group — ~fine to ~10-20k groups,
# 25 s at 147k; the sort path costs a flat ~2 s shuffle.  Round 4: the
# single-task pyarrow local path (re-gated on the EXACT count inside
# small_sorted_aggregate) beats one distributed sort round up to
# _LOCAL_AGG_ROWS input rows (0.6 s at 4M rows / 1.4M groups), so the
# strategy threshold now matches it.
_SORT_AGG_THRESHOLD = _LOCAL_AGG_ROWS


def adaptive_group_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]],
                             est_rows: int | None = None):
    """Cardinality-driven strategy choice, as real engines make it:
    below ``_SORT_AGG_THRESHOLD`` input rows the whole input fits one
    task and the single-task pyarrow ``group_by`` wins (measured at
    sf0.1: dedup_exact 1.9-6 s via Ray hash-agg -> sub-second local;
    Ray's hash agg pays shuffle machinery plus per-group Python even
    at 5k groups); beyond it, sorted-segment aggregation — per-group
    Python is the measured scale-killer there.  ``est_rows`` is an
    upper bound on the group count (input rows); None means unknown
    -> sort path.  The small branch routes through
    ``small_sorted_aggregate``, which re-checks the EXACT count after
    materializing, so a bad estimate degrades to the sort path rather
    than an oversized single task."""
    if est_rows is not None and 0 < est_rows < _SORT_AGG_THRESHOLD:
        return small_sorted_aggregate(ds, key, aggs)
    return sorted_segment_aggregate(ds, key, aggs)


def ray_hash_aggregate(ds, key: str, aggs: dict[str, tuple[str, str]]):
    """Ray ``groupby.aggregate`` expressed with this module's aggs
    spec.  Kept as the parity reference for the strategy-equivalence
    tests — in the engine paths it lost to BOTH alternatives
    (single-task local under ~262k rows, sorted-segment above), so
    ``adaptive_group_aggregate`` no longer routes to it."""
    from ray.data.aggregate import Max, Min, Sum

    cls = {"min": Min, "max": Max, "sum": Sum, "count": Sum}
    pre = ds
    if any(op == "count" for _c, op in aggs.values()):
        # emulate count via a ones column so all strategies agree
        def add_one(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__one", pa.array(np.ones(len(batch), np.int64))
            )

        pre = ds.map_batches(add_one, batch_format="pyarrow")
    ray_aggs = []
    for out_col, (col, op) in aggs.items():
        src = "__one" if op == "count" else col
        ray_aggs.append(cls[op](src, alias_name=out_col))
    out = pre.groupby(key).aggregate(*ray_aggs)
    drop = [c for c in ("__one",) if c in out.schema().names]
    return out.drop_columns(drop) if drop else out


def sorted_distinct(ds, cols: list[str]):
    """DISTINCT over ``cols`` without per-group Python.

    ``groupby(cols).aggregate`` invokes Python once per DISTINCT row —
    output-sized, pathological when the dedup output is large (e.g.
    near-dup pair lists).  Same shape as sorted_segment_aggregate:
    range-partition sort on ``cols``; one row per equal-tuple run per
    block (vectorized); INTERIOR runs are final, the <=2 boundary runs
    per block (a run straddling blocks is a boundary run in every
    block it touches) merge in a driver-side pandas dedup bounded by
    BLOCK COUNT, then rejoin as one small block.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def pre_dedup(batch: pa.Table) -> pa.Table:
        # keys-only inputs (every current caller): per-block C-level
        # dedup BEFORE the sort, so the all-to-all moves at most the
        # per-block distinct count instead of the full input — ~1000x
        # smaller for low-cardinality distincts (1.5k users over 2M
        # events), one cheap hash pass otherwise.  Tables carrying
        # payload columns pass through whole: the representative-row
        # semantics need full rows at the sort.
        if sorted(batch.column_names) == sorted(cols):
            return batch.group_by(cols).aggregate([])
        return batch

    sorted_ds = ds.map_batches(
        pre_dedup, batch_format="pyarrow", batch_size=None
    ).sort(cols)

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column("__boundary", pa.array([], pa.bool_()))
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in cols]
        new_run = np.ones(n, bool)
        eq = np.ones(n - 1, bool)
        for a in arrs:
            eq &= a[1:] == a[:-1]
        new_run[1:] = ~eq
        starts = np.flatnonzero(new_run)
        t = batch.take(pa.array(starts))
        flag = np.zeros(len(starts), bool)
        flag[0] = True
        flag[-1] = True
        return t.append_column("__boundary", pa.array(flag))

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # pins the block boundaries the flags refer to

    interior = reduced.map_batches(
        lambda b: b.filter(pc.invert(b["__boundary"])).drop_columns(["__boundary"]),
        batch_format="pyarrow",
    )
    boundary = reduced.map_batches(
        lambda b: b.filter(b["__boundary"]).drop_columns(["__boundary"]),
        batch_format="pyarrow",
    ).take_all()  # <= 2 rows per block
    if not boundary:
        return interior
    merged = pd.DataFrame(boundary).drop_duplicates(subset=cols)
    import ray.data

    return interior.union(
        ray.data.from_arrow(pa.Table.from_pandas(merged, preserve_index=False))
    )


def sorted_segment_last(ds, key: str, order: list[str],
                        out_cols: list[str] | None = None):
    """One row per key: the row whose ``order`` tuple is largest
    (grouped argmax / last-writer-wins) with no per-key Python on the
    wide path.

    Same shape as :func:`sorted_segment_aggregate`: sort by
    ``[key, *order]`` (range-partition shuffle), take the last row of
    every key run per block (vectorized), emit interior runs as final
    and the <=2 boundary runs per block as partials.  The boundary
    merge runs ``map_groups`` over a set bounded by BLOCK COUNT, not
    rows — the same bounded-merge pattern as ``functions/asof.py``.

    Rows must be unique per (key, *order) for a deterministic result.
    """
    sort_cols = [key] + list(order)
    sorted_ds = ds.sort(sort_cols)
    keep = out_cols  # None -> all columns

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return batch.append_column("__boundary", pa.array([], pa.bool_()))
        keys = batch[key].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        ends = np.concatenate((starts[1:], [np.int64(n)]))
        t = batch.take(pa.array(ends - 1))
        flag = np.zeros(len(starts), bool)
        flag[0] = True
        flag[-1] = True
        return t.append_column("__boundary", pa.array(flag))

    # one pinned execution: run-level output is key-sized, cheap to
    # materialize, and freezes the block boundaries the flags refer to
    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    import pyarrow.compute as pc

    def interior_split(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(b["__boundary"])).drop_columns(["__boundary"])
        return t.select(keep) if keep else t

    def boundary_split(b: pa.Table) -> pa.Table:
        return b.filter(b["__boundary"]).drop_columns(["__boundary"])

    interior = reduced.map_batches(interior_split, batch_format="pyarrow")
    partials = reduced.map_batches(boundary_split, batch_format="pyarrow")

    def merge_last(group: pa.Table) -> pa.Table:
        arrs = [group[c].to_numpy(zero_copy_only=False) for c in order]
        idx = int(np.lexsort(arrs[::-1])[-1])
        t = group.slice(idx, 1)
        return t.select(keep) if keep else t

    merged = partials.groupby(key).map_groups(
        merge_last, batch_format="pyarrow"
    )
    return interior.union(merged)
