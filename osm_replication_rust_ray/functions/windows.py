"""Per-key ordered window operators without per-key Python.

The measured Ray-2.49 pitfall: ``groupby().map_groups`` invokes Python
once per group, so per-user windows over 10^8 users would mean 10^8
interpreter calls.  Both operators here instead use ONE range-partition
sort on ``[key, ts, id]`` and fully vectorized per-block kernels; the
only Python-per-group work is a boundary merge whose size is bounded by
BLOCK COUNT (a key run straddling blocks contributes run-level
summaries, never rows) — the same machinery proven in
``functions/asof.py``.

- ``sessionize``: per-key event count + session count (a new session
  opens when the gap to the previous event exceeds ``gap_us``).
- ``running_sum_cents``: per-row running cumulative sum (integer cents)
  in ``(ts, id)`` order — block-spanning keys get a scalar prefix
  offset per (block, key), computed from per-block run summaries on the
  driver (<= 1 summary row per block), so even a single giant key never
  funnels its rows through a merge group.

Both assume rows are unique per (key, ts, id) — the same determinism
caveat as the SQL window ``ORDER BY ts, id`` twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _runs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """starts, ends, run_id for maximal equal-key runs."""
    n = len(keys)
    start_mask = np.concatenate(([True], keys[1:] != keys[:-1]))
    starts = np.flatnonzero(start_mask)
    ends = np.concatenate((starts[1:], [np.int64(n)]))
    run_id = np.cumsum(start_mask) - 1
    return starts, ends, run_id


def _ts_int(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp/int column -> int64 (us for timestamp[us])."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").view(np.int64)
    return arr.astype(np.int64)


def sessionize(ds, key: str, ts: str, order_id: str, gap_us: int):
    """-> Dataset[key, n_events, n_sessions].

    A session break is a gap strictly greater than ``gap_us``
    microseconds between consecutive events of the same key in
    ``(ts, order_id)`` order; n_sessions = breaks + 1.
    """
    sorted_ds = ds.sort([key, ts, order_id])

    def per_block(batch: pa.Table) -> pa.Table:
        """Run-level partials: interior runs are final, the block's
        first/last runs may continue in adjacent blocks."""
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "first_ts": pa.array([], pa.int64()),
                    "last_ts": pa.array([], pa.int64()),
                    "__boundary": pa.array([], pa.bool_()),
                }
            )
        keys = batch[key].to_numpy(zero_copy_only=False)
        t = _ts_int(batch[ts])
        starts, ends, run_id = _runs(keys)
        n_runs = len(starts)
        # gap flags between consecutive rows WITHIN a run
        diff = np.empty(n, np.int64)
        diff[0] = 0
        diff[1:] = t[1:] - t[:-1]
        is_gap = (diff > gap_us) & np.concatenate(([False], run_id[1:] == run_id[:-1]))
        gaps_per_run = np.add.reduceat(is_gap.astype(np.int64), starts)
        flag = np.zeros(n_runs, bool)
        flag[0] = True
        flag[-1] = True
        return pa.table(
            {
                key: pa.array(keys[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "n_gaps": pa.array(gaps_per_run, pa.int64()),
                "first_ts": pa.array(t[starts], pa.int64()),
                "last_ts": pa.array(t[ends - 1], pa.int64()),
                "__boundary": pa.array(flag),
            }
        )

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # pins block boundaries (sort re-exec would re-split)

    def final_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: t[key],
                "n_events": t["n_events"],
                "n_sessions": pc.add(t["n_gaps"], 1),
            }
        )

    interior = reduced.map_batches(
        lambda b: final_cols(b.filter(pc.invert(b["__boundary"]))),
        batch_format="pyarrow",
    )
    partials = reduced.map_batches(
        lambda b: b.filter(b["__boundary"]),
        batch_format="pyarrow",
    )

    def merge(group: pa.Table) -> pa.Table:
        # <= a few run-summaries per key (one per block the key spans)
        ft = group["first_ts"].to_numpy(zero_copy_only=False)
        lt = group["last_ts"].to_numpy(zero_copy_only=False)
        order = np.argsort(ft, kind="stable")
        ft, lt = ft[order], lt[order]
        inter_gaps = int(np.sum((ft[1:] - lt[:-1]) > gap_us))
        n_events = int(pc.sum(group["n_events"]).as_py())
        n_gaps = int(pc.sum(group["n_gaps"]).as_py()) + inter_gaps
        return pa.table(
            {
                key: group.slice(0, 1)[key],
                "n_events": pa.array([n_events], pa.int64()),
                "n_sessions": pa.array([n_gaps + 1], pa.int64()),
            }
        )

    merged = partials.groupby(key).map_groups(merge, batch_format="pyarrow")
    return interior.union(merged)


def running_sum_cents(ds, key: str, ts: str, order_id: str, value: str):
    """-> Dataset[key, order_id, cum_cents]: per-key running sum of
    round-half-up integer cents of ``value`` in ``(ts, order_id)``
    order, one output row per input row.

    Within a block every non-first run's cumsum is complete (the key
    changed at the run start).  Rows of each block's FIRST run need the
    prefix of the same key from earlier blocks — a single scalar per
    (block, key), reconstructed from one summary row per block: blocks
    are ordered by their first-row sort key, and a key spans a
    CONTIGUOUS chain of blocks, so the prefix is the accumulated
    last-run sum walked along that chain (driver-side, O(n_blocks)).
    """
    sorted_ds = ds.sort([key, ts, order_id])

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table(
                {
                    "__kind": pa.array([], pa.string()),
                    key: pa.array([], pa.int64()),
                    order_id: pa.array([], pa.int64()),
                    "cum_cents": pa.array([], pa.int64()),
                    "tag_ts": pa.array([], pa.int64()),
                    "tag_id": pa.array([], pa.int64()),
                    "s_first_key": pa.array([], pa.int64()),
                    "s_first_sum": pa.array([], pa.int64()),
                    "s_last_key": pa.array([], pa.int64()),
                    "s_last_sum": pa.array([], pa.int64()),
                }
            )
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value].to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
        starts, ends, run_id = _runs(keys)
        cum = np.cumsum(cents)
        run_prefix = (cum - cents)[starts][run_id]  # exclusive prefix at run start
        within = cum - run_prefix                   # inclusive within-run cumsum
        pending = run_id == 0
        # block tag = first row's (key, ts, id): unique, orders blocks
        tag_k, tag_t, tag_i = int(keys[0]), int(t[0]), int(ids[0])
        nulls = pa.nulls(n, pa.int64())
        rows = pa.table(
            {
                "__kind": pa.array(
                    np.where(pending, "p", "f"), pa.string()
                ),
                key: pa.array(keys, pa.int64()),
                order_id: pa.array(ids, pa.int64()),
                "cum_cents": pa.array(within, pa.int64()),
                "tag_ts": pa.array(
                    np.where(pending, tag_t, 0), pa.int64()
                ),
                "tag_id": pa.array(
                    np.where(pending, tag_i, 0), pa.int64()
                ),
                "s_first_key": nulls,
                "s_first_sum": nulls,
                "s_last_key": nulls,
                "s_last_sum": nulls,
            }
        )
        first_sum = int(within[ends[0] - 1])
        last_sum = int(within[-1])
        summ = pa.table(
            {
                "__kind": pa.array(["s"], pa.string()),
                key: pa.array([tag_k], pa.int64()),
                order_id: pa.array([0], pa.int64()),
                "cum_cents": pa.array([0], pa.int64()),
                "tag_ts": pa.array([tag_t], pa.int64()),
                "tag_id": pa.array([tag_i], pa.int64()),
                "s_first_key": pa.array([int(keys[0])], pa.int64()),
                "s_first_sum": pa.array([first_sum], pa.int64()),
                "s_last_key": pa.array([int(keys[-1])], pa.int64()),
                "s_last_sum": pa.array([last_sum], pa.int64()),
            }
        )
        return pa.concat_tables([rows, summ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()

    # one summary row per block — tiny driver-side walk in block order
    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    summaries.sort(key=lambda r: (r[key], r["tag_ts"], r["tag_id"]))
    offsets: dict[tuple[int, int, int], int] = {}
    carry: dict[int, int] = {}
    for s in summaries:
        fk, lk = s["s_first_key"], s["s_last_key"]
        off = carry.get(fk, 0)
        if off:
            offsets[(fk, s["tag_ts"], s["tag_id"])] = off
        carry = {lk: (off + s["s_last_sum"]) if fk == lk else s["s_last_sum"]}
    # offsets is <= n_blocks entries; ship via closure

    def apply_offsets(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["__kind"], "s"))
        cum = b["cum_cents"].to_numpy(zero_copy_only=False).copy()
        if offsets:
            pend = np.asarray(pc.equal(b["__kind"], "p"))
            if pend.any():
                ks = b[key].to_numpy(zero_copy_only=False)
                tt = b["tag_ts"].to_numpy(zero_copy_only=False)
                ti = b["tag_id"].to_numpy(zero_copy_only=False)
                # pending rows carry their source block's tag; a batch
                # spans few source blocks, so the distinct-tag loop is
                # O(blocks per batch) with vectorized adds inside
                trip = np.stack([ks, tt, ti], axis=1)
                for tag_row in np.unique(trip[pend], axis=0):
                    o = offsets.get(tuple(int(x) for x in tag_row))
                    if o:
                        cum[pend & np.all(trip == tag_row, axis=1)] += o
        return pa.table(
            {
                key: b[key],
                order_id: b[order_id],
                "cum_cents": pa.array(cum, pa.int64()),
            }
        )

    return reduced.map_batches(apply_offsets, batch_format="pyarrow")


def grouped_topk(ds, key: str, val: str, tid: str, k: int,
                 val_type: "pa.DataType" = None):
    """Windowed top-k per group: rows with
    ``row_number() OVER (PARTITION BY key ORDER BY val DESC, tid) <= k``
    plus their rank ``rk``.

    ``val_type``: Arrow type of the ranked value column (default
    float64 for back-compat).  Pass ``pa.int64()`` for integer rank
    values (timestamps!): the float64 default is only EXACT while
    |val| < 2^53 — beyond that, distinct int64 microsecond timestamps
    alias after the cast and ranks silently tie (round-4 advice
    item).  With int64 the whole path stays integer-exact.

    Scale shape: a vectorized per-batch partial top-k per group first
    (a group contributes <= k rows per block), then ONE sort of the
    candidate stream and a per-block segmented rank.  The only
    cross-block state is the count of same-key rows in earlier blocks —
    a scalar per (block, key) resolved by the bounded driver walk
    (running_sum_cents pattern); pending rows are <= k per block
    because a nonzero carry can only DEMOTE a candidate."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        tids = batch[tid].to_numpy(zero_copy_only=False)
        vals = batch[val].to_numpy(zero_copy_only=False)
        order = np.lexsort((tids, -vals, keys))
        ks = keys[order]
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        runs = np.diff(np.concatenate((starts, [len(ks)])))
        pos = np.arange(len(ks)) - np.repeat(starts, runs)
        return batch.take(pa.array(order[pos < k], pa.int64()))

    cands = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
    sorted_ds = cands.sort([key, val, tid],
                           descending=[False, True, False])
    val_t = val_type if val_type is not None else pa.float64()
    val_np = np.int64 if pa.types.is_integer(val_t) else np.float64

    def per_block(batch: pa.Table) -> pa.Table:
        schema = {
            "__kind": pa.string(), key: pa.int64(), tid: pa.int64(),
            val: val_t, "rk": pa.int64(), "pos": pa.int64(),
            "tag_id": pa.int64(), "s_val": val_t,
            "s_last_key": pa.int64(), "s_last_cnt": pa.int64(),
        }
        n = len(batch)
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in schema.items()})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        tids = batch[tid].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val].to_numpy(zero_copy_only=False).astype(val_np)
        starts, ends, run_id = _runs(keys)
        pos = np.arange(n) - starts[run_id]
        tag = int(tids[0])

        def rows(kind, idx, rk=None, posv=None):
            m = len(idx)
            return pa.table({
                "__kind": pa.array([kind] * m, pa.string()),
                key: pa.array(keys[idx], pa.int64()),
                tid: pa.array(tids[idx], pa.int64()),
                val: pa.array(vals[idx], val_t),
                "rk": pa.array(rk if rk is not None
                               else np.zeros(m, np.int64), pa.int64()),
                "pos": pa.array(posv if posv is not None
                                else np.zeros(m, np.int64), pa.int64()),
                "tag_id": pa.array(np.full(m, tag, np.int64), pa.int64()),
                "s_val": pa.nulls(m, val_t),
                "s_last_key": pa.nulls(m, pa.int64()),
                "s_last_cnt": pa.nulls(m, pa.int64()),
            })

        first_end = int(ends[0])
        fin = np.flatnonzero((pos < k) & (np.arange(n) >= first_end))
        pend = np.flatnonzero((pos < k) & (np.arange(n) < first_end))
        summ = pa.table({
            "__kind": pa.array(["s"], pa.string()),
            key: pa.array(keys[:1], pa.int64()),
            tid: pa.array([tag], pa.int64()),
            val: pa.array(vals[:1], val_t),
            "rk": pa.array([0], pa.int64()),
            "pos": pa.array([0], pa.int64()),
            "tag_id": pa.array([tag], pa.int64()),
            "s_val": pa.array(vals[:1], val_t),
            "s_last_key": pa.array(keys[-1:], pa.int64()),
            "s_last_cnt": pa.array([int(n - starts[-1])], pa.int64()),
        })
        return pa.concat_tables(
            [rows("f", fin, rk=pos[fin] + 1),
             rows("p", pend, posv=pos[pend]), summ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None
    ).materialize()  # pins block boundaries

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    # block order = first-row sort key (key asc, val desc, tid asc)
    summaries.sort(key=lambda r: (r[key], -r["s_val"], r["tag_id"]))
    offsets: dict[int, int] = {}
    carry: dict[int, int] = {}
    for r in summaries:
        fk, lk = r[key], r["s_last_key"]
        m = carry.get(fk, 0)
        if m:
            offsets[r["tag_id"]] = m
        carry = {lk: (m + r["s_last_cnt"]) if fk == lk
                 else r["s_last_cnt"]}

    def resolve(batch: pa.Table) -> pa.Table:
        fin = batch.filter(pc.equal(batch["__kind"], "f"))
        out = [fin.select([key, tid, val, "rk"])]
        pend = batch.filter(pc.equal(batch["__kind"], "p"))
        if len(pend):
            pos = pend["pos"].to_numpy(zero_copy_only=False).copy()
            tags = pend["tag_id"].to_numpy(zero_copy_only=False)
            for t in np.unique(tags):
                m = offsets.get(int(t), 0)
                if m:
                    pos[tags == t] += m
            keep = np.flatnonzero(pos < k)
            kept = pend.take(pa.array(keep, pa.int64()))
            out.append(pa.table({
                key: kept[key], tid: kept[tid], val: kept[val],
                "rk": pa.array(pos[keep] + 1, pa.int64()),
            }))
        return pa.concat_tables(out)

    return reduced.map_batches(resolve, batch_format="pyarrow")


def window_dedup(ds, key: str, ts: str, order_id: str, window_us: int):
    """Row-level WINDOWED DEDUP (telemetry burst suppression): keep an
    event iff there is NO same-key event within the previous
    ``window_us`` (strictly: kept when ``ts - prev_ts > window_us`` or
    no predecessor).  One sort; within a block every row's predecessor
    is local EXCEPT the block's first row (sorted by key, a run that
    starts mid-block starts a new key) — so the cross-block state is
    exactly the previous block's LAST row, one (key, ts) scalar pair
    per block resolved in a block-count-bounded driver walk.

    -> Dataset[key, order_id, ts_us] of the kept rows.
    """
    sorted_ds = ds.sort([key, ts, order_id])

    def per_block(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({
                "__kind": pa.array([], pa.string()),
                key: pa.array([], pa.int64()),
                order_id: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "tag_key": pa.array([], pa.int64()),
                "tag_ts": pa.array([], pa.int64()),
                "tag_id": pa.array([], pa.int64()),
                "s_last_key": pa.array([], pa.int64()),
                "s_last_ts": pa.array([], pa.int64()),
            })
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False)
        same_prev = np.zeros(n, bool)
        same_prev[1:] = keys[1:] == keys[:-1]
        gap_ok = np.ones(n, bool)
        gap_ok[1:] = (t[1:] - t[:-1]) > window_us
        keep = ~same_prev | gap_ok
        keep[0] = True  # provisional; row 0 resolves via the carry
        kind = np.where(np.arange(n) == 0, "p", "f")
        sel = keep
        nulls = pa.nulls(int(sel.sum()), pa.int64())
        rows = pa.table({
            "__kind": pa.array(kind[sel], pa.string()),
            key: pa.array(keys[sel], pa.int64()),
            order_id: pa.array(ids[sel], pa.int64()),
            "ts_us": pa.array(t[sel], pa.int64()),
            "tag_key": pa.array(np.full(int(sel.sum()), keys[0]),
                                pa.int64()),
            "tag_ts": pa.array(np.full(int(sel.sum()), t[0]), pa.int64()),
            "tag_id": pa.array(np.full(int(sel.sum()), ids[0]),
                               pa.int64()),
            "s_last_key": nulls,
            "s_last_ts": nulls,
        })
        summ = pa.table({
            "__kind": pa.array(["s"], pa.string()),
            key: pa.array([int(keys[0])], pa.int64()),
            order_id: pa.array([0], pa.int64()),
            "ts_us": pa.array([0], pa.int64()),
            "tag_key": pa.array([int(keys[0])], pa.int64()),
            "tag_ts": pa.array([int(t[0])], pa.int64()),
            "tag_id": pa.array([int(ids[0])], pa.int64()),
            "s_last_key": pa.array([int(keys[-1])], pa.int64()),
            "s_last_ts": pa.array([int(t[-1])], pa.int64()),
        })
        return pa.concat_tables([rows, summ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    summaries.sort(key=lambda r: (r["tag_key"], r["tag_ts"], r["tag_id"]))
    # drop[tag] = True when the block's first row has a same-key
    # predecessor within the window in the PREVIOUS block
    drop: dict[tuple[int, int, int], bool] = {}
    prev_key = prev_ts = None
    for s in summaries:
        tag = (s["tag_key"], s["tag_ts"], s["tag_id"])
        if prev_key is not None and prev_key == s["tag_key"] \
                and s["tag_ts"] - prev_ts <= window_us:
            drop[tag] = True
        prev_key, prev_ts = s["s_last_key"], s["s_last_ts"]

    def resolve(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["__kind"], "s"))
        if len(b) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             order_id: pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64())})
        pend = np.asarray(pc.equal(b["__kind"], "p"))
        keep = np.ones(len(b), bool)
        if drop and pend.any():
            tk = b["tag_key"].to_numpy(zero_copy_only=False)
            tt = b["tag_ts"].to_numpy(zero_copy_only=False)
            ti = b["tag_id"].to_numpy(zero_copy_only=False)
            for i in np.nonzero(pend)[0]:
                if drop.get((int(tk[i]), int(tt[i]), int(ti[i]))):
                    keep[i] = False
        return pa.table({
            key: b[key].filter(pa.array(keep)),
            order_id: b[order_id].filter(pa.array(keep)),
            "ts_us": b["ts_us"].filter(pa.array(keep)),
        })

    return reduced.map_batches(resolve, batch_format="pyarrow")


def grouped_rank_pick(ds, key: str, val: str, tid: str,
                      target_of: dict[int, int]):
    """Exact per-group order statistic: the row whose 1-based
    ``row_number() OVER (PARTITION BY key ORDER BY val, tid)`` equals
    ``target_of[key]`` (e.g. the lower median at (n+1)//2).

    Unlike ``grouped_topk`` the target rank can sit anywhere in the
    group, so no per-block partial pruning applies; the shape is ONE
    sort of (key, val, tid) plus the engine's standard cross-block
    carry: a block's only incomplete run is its first, and the count
    of same-key rows in EARLIER blocks is a single scalar resolved by
    the bounded driver walk over per-block summary rows (one per
    block).  ``target_of`` is bounded by the group domain (callers
    pass the counts-table output — the documented partitioning
    assumption, same as every broadcast lookup in the engine)."""
    sorted_ds = ds.sort([key, val, tid]).materialize()

    def per_block(batch: pa.Table) -> pa.Table:
        schema = {
            "__kind": pa.string(), key: pa.int64(), val: pa.int64(),
            tid: pa.int64(), "pos": pa.int64(), "tag_id": pa.int64(),
            "s_val": pa.int64(), "s_last_key": pa.int64(),
            "s_last_cnt": pa.int64(), "s_n": pa.int64(),
        }
        n = len(batch)
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in schema.items()})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val].to_numpy(zero_copy_only=False).astype(np.int64)
        tids = batch[tid].to_numpy(zero_copy_only=False).astype(np.int64)
        starts, ends, run_id = _runs(keys)
        pos = np.arange(n) - starts[run_id]
        tag = int(tids[0])

        def rows(kind, idx):
            m = len(idx)
            return pa.table({
                "__kind": pa.array([kind] * m, pa.string()),
                key: pa.array(keys[idx], pa.int64()),
                val: pa.array(vals[idx], pa.int64()),
                tid: pa.array(tids[idx], pa.int64()),
                "pos": pa.array(pos[idx], pa.int64()),
                "tag_id": pa.array(np.full(m, tag, np.int64), pa.int64()),
                "s_val": pa.nulls(m, pa.int64()),
                "s_last_key": pa.nulls(m, pa.int64()),
                "s_last_cnt": pa.nulls(m, pa.int64()),
                "s_n": pa.nulls(m, pa.int64()),
            })

        # candidate rows: complete runs resolve locally (carry 0);
        # first-run rows stay pending until the driver walk fixes the
        # carry.  A row is worth emitting only if SOME target could
        # select it; the target map is known here, so filter now.
        tgt = np.array([target_of.get(int(k), 0) for k in keys], np.int64)
        first_end = int(ends[0])
        local_hit = (pos + 1 == tgt) & (np.arange(n) >= first_end)
        # the unknown carry is >= 0, so a first-run row with local
        # rank already past its target can never be selected
        pending = (np.arange(n) < first_end) & (tgt > 0) & (pos + 1 <= tgt)
        summ = pa.table({
            "__kind": pa.array(["s"], pa.string()),
            key: pa.array(keys[:1], pa.int64()),
            val: pa.array(vals[:1], pa.int64()),
            tid: pa.array([tag], pa.int64()),
            "pos": pa.array([0], pa.int64()),
            "tag_id": pa.array([tag], pa.int64()),
            "s_val": pa.array(vals[:1], pa.int64()),
            "s_last_key": pa.array(keys[-1:], pa.int64()),
            "s_last_cnt": pa.array([int(n - starts[-1])], pa.int64()),
            "s_n": pa.array([n], pa.int64()),
        })
        return pa.concat_tables(
            [rows("f", np.flatnonzero(local_hit)),
             rows("p", np.flatnonzero(pending)), summ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow").take_all()
    # block order = first-row sort key (key, val, tid)
    summaries.sort(key=lambda r: (r[key], r["s_val"], r["tag_id"]))
    offsets: dict[int, int] = {}
    carry: dict[int, int] = {}
    for r in summaries:
        fk, lk = r[key], r["s_last_key"]
        m = carry.get(fk, 0)
        if m:
            offsets[r["tag_id"]] = m
        carry = {lk: (m + r["s_n"]) if fk == lk else r["s_last_cnt"]}

    def resolve(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["__kind"], "s"))
        out = {key: pa.array([], pa.int64()),
               val: pa.array([], pa.int64()),
               tid: pa.array([], pa.int64())}
        if len(b) == 0:
            return pa.table(out)
        keys = b[key].to_numpy(zero_copy_only=False)
        pos = b["pos"].to_numpy(zero_copy_only=False)
        tags = b["tag_id"].to_numpy(zero_copy_only=False)
        pend = np.asarray(pc.equal(b["__kind"], "p"))
        rank = pos + 1
        if offsets and pend.any():
            add = np.array([offsets.get(int(t), 0) for t in tags],
                           np.int64)
            rank = rank + np.where(pend, add, 0)
        tgt = np.array([target_of.get(int(k), 0) for k in keys], np.int64)
        keep = pa.array(rank == tgt)
        return pa.table({key: b[key].filter(keep),
                         val: b[val].filter(keep),
                         tid: b[tid].filter(keep)})

    return reduced.map_batches(resolve, batch_format="pyarrow")


SCD2_OPEN_US = 1 << 62  # open-ended validity sentinel ("current" row)


def scd2_intervals(ds, key: str, ts: str, order_id: str, attr: str):
    """Slowly-changing-dimension TYPE-2 build from a change log: per
    key ordered by (ts, order_id), every row becomes a VERSION with
    ``valid_from_us = ts`` and ``valid_to_us`` = the NEXT same-key
    row's ts (``SCD2_OPEN_US`` when none — the current version).

    The LEAD mirror of ``window_dedup``'s LAG carry: after ONE sort,
    every row's successor is block-local EXCEPT the block's LAST row,
    so the cross-block state is exactly the NEXT block's first
    (key, ts) — one scalar pair per block, resolved in a
    block-count-bounded driver walk and broadcast back.  Attribute
    payload (``attr``) rides the sort once and is never joined.

    -> Dataset[key, order_id, attr, valid_from_us, valid_to_us,
               is_current]
    """
    sorted_ds = ds.sort([key, ts, order_id])

    def per_block(batch: pa.Table) -> pa.Table:
        schema = {
            "__kind": pa.string(), key: pa.int64(), order_id: pa.int64(),
            attr: pa.string(), "valid_from_us": pa.int64(),
            "valid_to_us": pa.int64(), "tag_key": pa.int64(),
            "tag_ts": pa.int64(), "tag_id": pa.int64(),
        }
        n = len(batch)
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in schema.items()})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False).astype(np.int64)
        vto = np.full(n, SCD2_OPEN_US, np.int64)
        same_next = keys[:-1] == keys[1:]
        vto[:-1][same_next] = t[1:][same_next]
        kind = np.full(n, "f", dtype=object)
        kind[-1] = "p"  # last row's successor lives in the next block
        first = (int(keys[0]), int(t[0]), int(ids[0]))
        last = (int(keys[-1]), int(t[-1]), int(ids[-1]))
        rows = pa.table({
            "__kind": pa.array(kind.astype(str), pa.string()),
            key: pa.array(keys, pa.int64()),
            order_id: pa.array(ids, pa.int64()),
            attr: batch[attr],
            "valid_from_us": pa.array(t, pa.int64()),
            "valid_to_us": pa.array(vto, pa.int64()),
            "tag_key": pa.array(np.full(n, first[0]), pa.int64()),
            "tag_ts": pa.array(np.full(n, first[1]), pa.int64()),
            "tag_id": pa.array(np.full(n, first[2]), pa.int64()),
        })
        summ = pa.table({
            "__kind": pa.array(["s"], pa.string()),
            key: pa.array([last[0]], pa.int64()),
            order_id: pa.array([last[2]], pa.int64()),
            attr: pa.array([""], pa.string()),
            "valid_from_us": pa.array([last[1]], pa.int64()),
            "valid_to_us": pa.array([0], pa.int64()),
            "tag_key": pa.array([first[0]], pa.int64()),
            "tag_ts": pa.array([first[1]], pa.int64()),
            "tag_id": pa.array([first[2]], pa.int64()),
        })
        return pa.concat_tables([rows, summ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    # global block order = order of the blocks' first rows
    summaries.sort(key=lambda r: (r["tag_key"], r["tag_ts"], r["tag_id"]))
    # pending fix: block b's LAST row (key,ts,id) -> valid_to from
    # block b+1's first row (same key) or the open sentinel
    fix: dict[tuple[int, int, int], int] = {}
    for i, s in enumerate(summaries):
        pend = (s[key], s["valid_from_us"], s[order_id])
        if i + 1 < len(summaries):
            nxt = summaries[i + 1]
            if nxt["tag_key"] == s[key]:
                fix[pend] = int(nxt["tag_ts"])

    def resolve(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["__kind"], "s"))
        out_cols = [key, order_id, attr, "valid_from_us", "valid_to_us"]
        if len(b) == 0:
            empty = pa.table({c: pa.array([], pa.int64() if c != attr
                                          else pa.string())
                              for c in out_cols})
            return empty.append_column(
                "is_current", pa.array([], pa.int64()))
        vto = b["valid_to_us"].to_numpy(zero_copy_only=False).copy()
        pend = np.asarray(pc.equal(b["__kind"], "p"))
        if fix and pend.any():
            ks = b[key].to_numpy(zero_copy_only=False)
            vf = b["valid_from_us"].to_numpy(zero_copy_only=False)
            ids = b[order_id].to_numpy(zero_copy_only=False)
            for i in np.nonzero(pend)[0]:
                got = fix.get((int(ks[i]), int(vf[i]), int(ids[i])))
                if got is not None:
                    vto[i] = got
        return pa.table({
            key: b[key], order_id: b[order_id], attr: b[attr],
            "valid_from_us": b["valid_from_us"],
            "valid_to_us": pa.array(vto, pa.int64()),
            "is_current": pa.array(
                (vto == SCD2_OPEN_US).astype(np.int64), pa.int64()),
        })

    return reduced.map_batches(resolve, batch_format="pyarrow")


def adjacent_pair_sums(ds, key: str, ts: str, order_id: str, val: str,
                       terms: dict, est_keys: int | None = None):
    """Grouped sums over CONSECUTIVE-row pairs — the shared engine
    under lag-1 autocorrelation, time-weighted averages, and any
    other per-key statistic of the form ``sum f(row_i, row_{i+1})``
    in each key's (ts, order_id) order.

    ``terms`` maps output column -> ``f(v0, v1, t0, t1) -> int64
    array`` evaluated vectorized on the pair arrays (prev-value,
    next-value, prev-ts-us, next-ts-us).  All terms MUST be
    int64-exact — the per-block partial sums use ``np.add.reduceat``
    on the key-sorted pair stream, so nothing passes through floats.

    Shape: ONE sort; every pair is block-local except each block's
    (last row, next block's first row) boundary — reconstructed on
    the driver from one summary row per block (bounded walk, the
    engine's standard carry) and appended as extra partial rows
    before the final adaptive grouped sum.

    -> Dataset[key, *terms]
    """
    import ray.data as rd

    from ..functions.agg import adaptive_group_aggregate

    tnames = list(terms)
    sorted_ds = ds.sort([key, ts, order_id]).materialize()

    def per_block(batch: pa.Table) -> pa.Table:
        schema = {"__kind": pa.string(), key: pa.int64()}
        schema.update({t: pa.int64() for t in tnames})
        schema.update({
            "tag_key": pa.int64(), "tag_ts": pa.int64(),
            "tag_id": pa.int64(), "sf_key": pa.int64(),
            "sf_ts": pa.int64(), "sf_val": pa.int64(),
            "sl_key": pa.int64(), "sl_ts": pa.int64(),
            "sl_val": pa.int64(),
        })
        n = len(batch)
        if n == 0:
            return pa.table({c: pa.array([], t) for c, t in schema.items()})
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val].to_numpy(zero_copy_only=False).astype(np.int64)
        same = keys[1:] == keys[:-1]
        pk = keys[:-1][same]
        v0, v1 = vals[:-1][same], vals[1:][same]
        t0, t1 = t[:-1][same], t[1:][same]
        cols = {}
        if len(pk):
            starts = np.nonzero(
                np.concatenate([[True], pk[1:] != pk[:-1]]))[0]
            cols[key] = pk[starts]
            for name, f in terms.items():
                cols[name] = np.add.reduceat(
                    f(v0, v1, t0, t1).astype(np.int64), starts)
        else:
            cols[key] = np.array([], np.int64)
            for name in tnames:
                cols[name] = np.array([], np.int64)
        m = len(cols[key])
        first = (int(keys[0]), int(t[0]), int(ids[0]))
        part = {
            "__kind": pa.array(["f"] * m, pa.string()),
            key: pa.array(cols[key], pa.int64()),
        }
        part.update({name: pa.array(cols[name], pa.int64())
                     for name in tnames})
        zeros = pa.array(np.zeros(m, np.int64), pa.int64())
        part.update({
            "tag_key": zeros, "tag_ts": zeros, "tag_id": zeros,
            "sf_key": zeros, "sf_ts": zeros, "sf_val": zeros,
            "sl_key": zeros, "sl_ts": zeros, "sl_val": zeros,
        })
        summ = {
            "__kind": pa.array(["s"], pa.string()),
            key: pa.array([0], pa.int64()),
        }
        summ.update({name: pa.array([0], pa.int64()) for name in tnames})
        summ.update({
            "tag_key": pa.array([first[0]], pa.int64()),
            "tag_ts": pa.array([first[1]], pa.int64()),
            "tag_id": pa.array([first[2]], pa.int64()),
            "sf_key": pa.array([int(keys[0])], pa.int64()),
            "sf_ts": pa.array([int(t[0])], pa.int64()),
            "sf_val": pa.array([int(vals[0])], pa.int64()),
            "sl_key": pa.array([int(keys[-1])], pa.int64()),
            "sl_ts": pa.array([int(t[-1])], pa.int64()),
            "sl_val": pa.array([int(vals[-1])], pa.int64()),
        })
        return pa.concat_tables([pa.table(part), pa.table(summ)])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    summaries.sort(key=lambda r: (r["tag_key"], r["tag_ts"], r["tag_id"]))
    extra = {key: []}
    extra.update({name: [] for name in tnames})
    for a, b in zip(summaries, summaries[1:]):
        if a["sl_key"] == b["sf_key"]:
            v0 = np.array([a["sl_val"]], np.int64)
            v1 = np.array([b["sf_val"]], np.int64)
            t0 = np.array([a["sl_ts"]], np.int64)
            t1 = np.array([b["sf_ts"]], np.int64)
            extra[key].append(int(a["sl_key"]))
            for name, f in terms.items():
                extra[name].append(int(f(v0, v1, t0, t1)[0]))

    partials = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "f")).select(
            [key] + tnames),
        batch_format="pyarrow",
    )
    if extra[key]:
        boundary = rd.from_arrow(pa.table(
            {c: pa.array(v, pa.int64()) for c, v in extra.items()}))
        partials = partials.union(boundary)
    return adaptive_group_aggregate(
        partials, key, {name: (name, "sum") for name in tnames},
        est_rows=est_keys,
    )


def adjacent_pair_scatter(ds, key: str, ts: str, order_id: str, val: str,
                          scatter_fn):
    """CONSECUTIVE-row pair SCATTER — adjacent_pair_sums' sibling for
    operators that emit derived ROWS per pair (e.g. rasterizing the
    segment between consecutive trajectory points) instead of grouped
    sums.

    ``scatter_fn(k, v0, v1, t0, t1) -> pa.Table`` receives the pair
    arrays (key, prev/next value, prev/next ts-us) and returns partial
    rows of any fixed schema — ideally already combined per block
    (e.g. per-cell counts) so only partials cross the next shuffle.

    Same shape as adjacent_pair_sums: ONE sort, block-local pairs,
    one summary row per block; block-boundary pairs are reconstructed
    on the driver (bounded walk) and scattered once there.

    -> Dataset[scatter_fn schema] (caller aggregates the partials)
    """
    import ray.data as rd

    sorted_ds = ds.sort([key, ts, order_id]).materialize()
    probe = scatter_fn(np.array([], np.int64), np.array([], np.int64),
                       np.array([], np.int64), np.array([], np.int64),
                       np.array([], np.int64))
    out_schema = probe.schema

    def per_block(batch: pa.Table) -> pa.Table:
        meta = {
            "tag_key": pa.int64(), "tag_ts": pa.int64(),
            "tag_id": pa.int64(), "sf_key": pa.int64(),
            "sf_ts": pa.int64(), "sf_val": pa.int64(),
            "sl_key": pa.int64(), "sl_ts": pa.int64(),
            "sl_val": pa.int64(),
        }
        n = len(batch)
        cols = {f.name: f.type for f in out_schema}
        if n == 0:
            empty = {c: pa.array([], t) for c, t in cols.items()}
            empty["__kind"] = pa.array([], pa.string())
            empty.update({c: pa.array([], t) for c, t in meta.items()})
            return pa.table(empty)
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = _ts_int(batch[ts])
        ids = batch[order_id].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[val].to_numpy(zero_copy_only=False).astype(np.int64)
        same = keys[1:] == keys[:-1]
        part = scatter_fn(keys[:-1][same], vals[:-1][same], vals[1:][same],
                          t[:-1][same], t[1:][same])
        m = len(part)
        body = {c: part[c] for c in cols}
        body["__kind"] = pa.array(["f"] * m, pa.string())
        zeros = pa.array(np.zeros(m, np.int64), pa.int64())
        body.update({c: zeros for c in meta})
        summ = {c: pa.nulls(1, ty) for c, ty in cols.items()}
        summ["__kind"] = pa.array(["s"], pa.string())
        summ.update({
            "tag_key": pa.array([int(keys[0])], pa.int64()),
            "tag_ts": pa.array([int(t[0])], pa.int64()),
            "tag_id": pa.array([int(ids[0])], pa.int64()),
            "sf_key": pa.array([int(keys[0])], pa.int64()),
            "sf_ts": pa.array([int(t[0])], pa.int64()),
            "sf_val": pa.array([int(vals[0])], pa.int64()),
            "sl_key": pa.array([int(keys[-1])], pa.int64()),
            "sl_ts": pa.array([int(t[-1])], pa.int64()),
            "sl_val": pa.array([int(vals[-1])], pa.int64()),
        })
        order = ["__kind"] + list(cols) + list(meta)
        return pa.concat_tables([
            pa.table({c: body[c] for c in order}),
            pa.table({c: summ[c] for c in order}),
        ])

    reduced = sorted_ds.map_batches(
        per_block, batch_format="pyarrow", batch_size=None).materialize()

    summaries = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "s")),
        batch_format="pyarrow",
    ).take_all()
    summaries.sort(key=lambda r: (r["tag_key"], r["tag_ts"], r["tag_id"]))
    bk, bv0, bv1, bt0, bt1 = [], [], [], [], []
    for a, b in zip(summaries, summaries[1:]):
        if a["sl_key"] == b["sf_key"]:
            bk.append(int(a["sl_key"]))
            bv0.append(int(a["sl_val"]))
            bv1.append(int(b["sf_val"]))
            bt0.append(int(a["sl_ts"]))
            bt1.append(int(b["sf_ts"]))

    partials = reduced.map_batches(
        lambda b: b.filter(pc.equal(b["__kind"], "f")).select(
            [f.name for f in out_schema]),
        batch_format="pyarrow",
    )
    if bk:
        boundary = scatter_fn(
            np.array(bk, np.int64), np.array(bv0, np.int64),
            np.array(bv1, np.int64), np.array(bt0, np.int64),
            np.array(bt1, np.int64))
        partials = partials.union(rd.from_arrow(boundary))
    return partials
