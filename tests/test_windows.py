"""Window operators (functions/windows.py, agg.sorted_segment_last):
vectorized per-key windows with block-boundary carry.

Covers the round-1 verdict's scale-killer class: these replace
``groupby().map_groups`` per-key Python finals, so the tests force
many small blocks (keys straddling block boundaries) and include a
>=1M-row / ~200k-key scale probe that the old per-group path could not
finish in test time.
"""

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osm_replication_rust_ray.functions.agg import sorted_segment_last
from osm_replication_rust_ray.functions.windows import (
    running_sum_cents,
    sessionize,
)

GAP_US = 1800 * 1_000_000


def _events(n_rows, n_keys, seed=7, hot_frac=0.0):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n_rows)
    if hot_frac:
        hot = rng.random(n_rows) < hot_frac
        keys[hot] = 0  # one giant key spanning many blocks
    ts = np.sort(rng.integers(0, 10**12, n_rows))
    rng.shuffle(ts)  # decouple ts order from row order
    return pa.table(
        {
            "user_id": pa.array(keys, pa.int64()),
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(rng.random(n_rows) * 100 - 50),
        }
    )


def _ds(table, blocks=16):
    return ray.data.from_arrow(table).repartition(blocks)


def _pdf(table):
    return table.to_pandas().sort_values(["user_id", "ts", "event_id"])


def test_sessionize_matches_pandas():
    t = _events(20000, 40, hot_frac=0.3)  # hot key 0 spans every block
    got = (
        sessionize(_ds(t), "user_id", "ts", "event_id", GAP_US)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    tsus = df["ts"].astype("int64")
    gaps = tsus.diff()
    newkey = df["user_id"] != df["user_id"].shift()
    brk = (~newkey) & (gaps > GAP_US)
    want = (
        pd.DataFrame(
            {
                "user_id": df["user_id"],
                "brk": brk.astype(int),
            }
        )
        .groupby("user_id")
        .agg(n_events=("brk", "size"), n_sessions=("brk", "sum"))
        .reset_index()
    )
    want["n_sessions"] += 1
    pd.testing.assert_frame_equal(
        got, want.astype({"n_events": "int64", "n_sessions": "int64"}),
        check_like=True,
    )


def test_running_sum_cents_matches_pandas():
    t = _events(20000, 40, hot_frac=0.3)
    got = (
        running_sum_cents(_ds(t), "user_id", "ts", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.assign(cents=cents)
    df["cum_cents"] = df.groupby("user_id")["cents"].cumsum()
    want = (
        df[["user_id", "event_id", "cum_cents"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_sorted_segment_last_matches_pandas():
    t = _events(20000, 500, hot_frac=0.2)
    got = (
        sorted_segment_last(
            _ds(t), "user_id", ["ts", "event_id"],
            out_cols=["user_id", "event_id", "value"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    want = (
        df.groupby("user_id", sort=True)
        .tail(1)[["user_id", "event_id", "value"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


def test_single_key_all_blocks():
    """Pathological: ONE key across every block (pure carry path)."""
    n = 5000
    t = pa.table(
        {
            "user_id": pa.array(np.zeros(n, np.int64)),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * (GAP_US // 2), pa.timestamp("us")
            ),
            "value": pa.array(np.ones(n)),
        }
    )
    sess = sessionize(_ds(t, 8), "user_id", "ts", "event_id", GAP_US).to_pandas()
    assert len(sess) == 1
    assert sess["n_events"].iloc[0] == n
    assert sess["n_sessions"].iloc[0] == 1  # every gap == GAP_US/2
    run = (
        running_sum_cents(_ds(t, 8), "user_id", "ts", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
    )
    assert (run["cum_cents"].to_numpy() == (np.arange(n) + 1) * 100).all()


def test_scale_probe_no_per_key_python():
    """>=1M rows, ~200k keys: the old per-group map_groups final took
    minutes at this cardinality (measured 160k groups ~ 65 s for ONE
    pass); the vectorized path must clear all three operators well
    inside a minute each."""
    t = _events(1_000_000, 200_000, seed=11)
    start = time.monotonic()
    n_last = sorted_segment_last(
        _ds(t, 32), "user_id", ["ts", "event_id"],
        out_cols=["user_id", "event_id", "value"],
    ).count()
    n_sess = sessionize(_ds(t, 32), "user_id", "ts", "event_id", GAP_US).count()
    n_run = running_sum_cents(
        _ds(t, 32), "user_id", "ts", "event_id", "value"
    ).count()
    elapsed = time.monotonic() - start
    n_keys = len(np.unique(t["user_id"].to_numpy()))
    assert n_last == n_keys
    assert n_sess == n_keys
    assert n_run == 1_000_000
    assert elapsed < 120, f"scale probe too slow: {elapsed:.1f}s"
