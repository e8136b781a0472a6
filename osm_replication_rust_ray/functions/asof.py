"""Distributed as-of (backward) join — a custom operator Ray Data
lacks natively (SURVEY §2 custom-operator mandate; the reference's
modified-children bbox semantics, src/osmxml/bbox.rs:60-67, is this
join's sequential special case).

``asof_join(probes, states, by, on, state_cols)``: for every probe row,
attach the state row with the LARGEST ``on`` value <= the probe's
``on`` within the same ``by`` key (inclusive; null columns when no such
state exists).

Partitioning strategy (the documented assumption): one range-partition
sort by (by, on, src) co-locates each key's timeline; within a sorted
block a vectorized reset-at-key-boundary cumulative-max resolves every
probe that has an in-block predecessor state. A probe whose key run
starts mid-timeline (its states live in earlier blocks) is EXACTLY
resolvable from the per-(block, key) last-state summaries: all its
candidate states precede its block, and the latest of them is the last
state of the latest earlier block for that key. Unresolved probes +
summaries form a small merge set (grouped by key), so the wide path
never sees per-row Python.

States must be unique per (by, on) for a deterministic result (ties
between states at identical timestamps are otherwise order-dependent —
same caveat as DuckDB's ASOF JOIN).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _carry_indices(keys: np.ndarray, is_state: np.ndarray) -> np.ndarray:
    """Per row: index of the latest state row at-or-before it with the
    same key, or -1 (vectorized reset-at-key-change cumulative max)."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64)
    run_start = np.concatenate(([True], keys[1:] != keys[:-1]))
    run_id = np.cumsum(run_start) - 1
    base = np.int64(n + 2)
    last_state = np.where(is_state, np.arange(n, dtype=np.int64), -1)
    lifted = last_state + run_id * base
    carried = np.maximum.accumulate(lifted)
    return carried - run_id * base


def asof_join(
    probes,
    states,
    by: str,
    on: str,
    state_cols: list[str],
    num_blocks: int | None = None,
):
    """-> Dataset: probe columns + ``state_cols`` (as-of values).

    ``probes`` / ``states``: Ray Datasets sharing ``by`` (int64 key)
    and ``on`` (int64 or timestamp ordering column).
    """
    pschema = probes.schema()
    sschema = states.schema()
    probe_cols = list(pschema.names)
    ptypes = dict(zip(pschema.names, pschema.types))
    stypes = dict(zip(sschema.names, sschema.types))

    def tag_probe(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in probe_cols}
        cols["__src"] = pa.array(np.ones(len(batch), np.int8))
        for c in state_cols:
            cols[c] = pa.nulls(len(batch), stypes[c])
        return pa.table(cols)

    def tag_state(batch: pa.Table) -> pa.Table:
        cols = {}
        for c in probe_cols:
            if c in (by, on):
                cols[c] = batch[c]
            else:
                cols[c] = pa.nulls(len(batch), ptypes[c])
        cols["__src"] = pa.array(np.zeros(len(batch), np.int8))
        for c in state_cols:
            cols[c] = batch[c]
        return pa.table(cols)

    unified = probes.map_batches(tag_probe, batch_format="pyarrow").union(
        states.map_batches(tag_state, batch_format="pyarrow")
    )
    # state rows (src=0) sort BEFORE probe rows at equal (by, on):
    # inclusive "at or before" semantics
    sorted_ds = unified.sort(key=[by, on, "__src"])

    out_schema_cols = probe_cols + state_cols

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            cols = {c: batch[c] for c in out_schema_cols}
            cols["__kind"] = pa.array([], pa.string())
            return pa.table(cols)
        keys = batch[by].to_numpy(zero_copy_only=False)
        src = batch["__src"].to_numpy(zero_copy_only=False)
        is_state = src == 0
        carry = _carry_indices(keys, is_state)
        is_probe = ~is_state
        probe_idx = np.nonzero(is_probe)[0]
        resolved_m = carry[probe_idx] >= 0
        res_rows = probe_idx[resolved_m]
        res_state = carry[probe_idx][resolved_m]
        parts = []
        # resolved probes
        t = batch.take(pa.array(res_rows))
        cols = {c: t[c] for c in probe_cols}
        st = batch.take(pa.array(res_state))
        for c in state_cols:
            cols[c] = st[c]
        cols["__kind"] = pa.array(["r"] * len(res_rows), pa.string())
        parts.append(pa.table(cols))
        # unresolved probes (raw)
        unres = probe_idx[~resolved_m]
        t = batch.take(pa.array(unres))
        cols = {c: t[c] for c in probe_cols}
        for c in state_cols:
            cols[c] = t[c]  # nulls
        cols["__kind"] = pa.array(["u"] * len(unres), pa.string())
        parts.append(pa.table(cols))
        # per-key last state summary
        if is_state.any():
            sidx = np.nonzero(is_state)[0]
            skeys = keys[sidx]
            last_of_run = np.concatenate((skeys[1:] != skeys[:-1], [True]))
            summ = sidx[last_of_run]
            t = batch.take(pa.array(summ))
            cols = {c: t[c] for c in probe_cols}
            for c in state_cols:
                cols[c] = t[c]
            cols["__kind"] = pa.array(["s"] * len(summ), pa.string())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts, promote_options="permissive")

    # one pinned execution feeds both the resolved stream and the merge
    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    resolved = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "r")).drop_columns(["__kind"]),
        batch_format="pyarrow",
    )
    pending = reduced.map_batches(
        lambda b: b.filter(pc.not_equal(b["__kind"], "r")),
        batch_format="pyarrow",
    )

    def merge_group(group: pa.Table) -> pa.Table:
        kinds = np.asarray(group["__kind"])
        ons = group[on].to_numpy(zero_copy_only=False)
        src = np.where(kinds == "s", 0, 1).astype(np.int8)
        order = np.lexsort((src, ons))
        g = group.take(pa.array(order))
        keys = np.zeros(len(g), np.int64)  # single key per group
        carry = _carry_indices(keys, np.asarray(g["__kind"]) == "s")
        probe_rows = np.nonzero(np.asarray(g["__kind"]) == "u")[0]
        cols = {}
        t = g.take(pa.array(probe_rows))
        for c in probe_cols:
            cols[c] = t[c]
        have = carry[probe_rows] >= 0
        st_idx = np.where(have, carry[probe_rows], 0)
        st = g.take(pa.array(st_idx))
        for c in state_cols:
            vals = st[c]
            cols[c] = pc.if_else(pa.array(have), vals, pa.nulls(len(t), vals.type))
        return pa.table(cols)

    merged = pending.groupby(by).map_groups(merge_group, batch_format="pyarrow")
    return resolved.union(merged)
