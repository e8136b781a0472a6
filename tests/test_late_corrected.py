"""Sequential micro-batch parity for late_corrected_windows: an
event-AT-A-TIME watermark simulator (open windows -> finalize when the
watermark passes close -> re-emit on each late arrival) must produce
exactly the query's per-(user, window) final/on-time/correction
numbers — the distributed carry pattern may change cost, never the
emission semantics (round-4 verdict item #5)."""

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _mix64(x):
    from osm_replication_rust_ray.sources.synth import _mix64 as m

    return m(x)


def simulate(users, event_ids, ts_us, cents, win_us, late_us, arr_key):
    """Event-at-a-time reference: returns {(user, win): (n_events,
    sum_cents, sum_on_time, n_corrections, n_emits)}.

    Standard engine semantics (Flink-style): the watermark closes a
    window when it passes window-end + allowed lateness, whether or
    not the window ever held an element (empty windows are never
    emitted); an element arriving after its window is closed is a
    late CORRECTION re-emit.  n_emits = one close-time emission iff
    the window had on-time elements, plus one re-emit per
    correction."""
    arr = (_mix64(event_ids.astype(np.uint64) ^ np.uint64(arr_key))
           >> np.uint64(2)).astype(np.int64)
    order = np.lexsort((event_ids, arr))
    state: dict[tuple, list] = {}  # (u, w) -> [n, sum, on_time, corr]
    wm = None
    for i in order:
        u, t, c = int(users[i]), int(ts_us[i]), int(cents[i])
        w = t // win_us
        st = state.setdefault((u, w), [0, 0, 0, 0])
        st[0] += 1
        st[1] += c
        if wm is not None and wm >= (w + 1) * win_us + late_us:
            st[3] += 1  # window already closed -> correction
        else:
            st[2] += c
        wm = t if wm is None else max(wm, t)
    return {k: (v[0], v[1], v[2], v[3],
                (1 if v[0] - v[3] > 0 else 0) + v[3])
            for k, v in state.items()}


def test_sequential_parity_on_sf0001(ray_session):
    from osm_replication_rust_ray.pipelines.queries import (
        _LCW_LATE_US,
        _LCW_WIN_US,
        _WM_ARR_KEY,
        q_late_corrected_windows,
    )

    t = pq.read_table(f"{SF_DIR}/events.parquet",
                      columns=["user_id", "event_id", "ts", "value"])
    users = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    evs = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts_us = t["ts"].to_numpy(zero_copy_only=False).astype(
        "datetime64[us]").view(np.int64)
    cents = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 100 + 0.5).astype(np.int64)
    exp = simulate(users, evs, ts_us, cents,
                   _LCW_WIN_US, _LCW_LATE_US, _WM_ARR_KEY)
    got = {}
    for r in q_late_corrected_windows(SF_DIR).take_all():
        got[(r["user_id"], r["win"])] = (
            r["n_events"], r["sum_cents"], r["sum_cents_on_time"],
            r["n_corrections"],
            (1 if r["n_events"] - r["n_corrections"] > 0 else 0)
            + r["n_corrections"])
    assert got == exp
    # the stream must actually exercise corrections
    assert sum(v[3] for v in exp.values()) > 0
    assert any(v[3] == 0 for v in exp.values())  # and on-time windows
