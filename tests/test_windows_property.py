"""Property-based checks for the vectorized window operators: for ANY
key/ts layout (duplicated keys across blocks, ties in ts, singleton and
giant runs) the sort+carry machinery must equal the obvious pandas
computation.  Complements test_windows.py's fixed fixtures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_replication_rust_ray.functions.agg import sorted_segment_last
from osm_replication_rust_ray.functions.windows import (
    running_sum_cents,
    sessionize,
)

GAP_US = 10 * 1_000_000


@st.composite
def event_frames(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    n_keys = draw(st.integers(min_value=1, max_value=8))
    keys = draw(
        st.lists(
            st.integers(min_value=0, max_value=n_keys - 1),
            min_size=n, max_size=n,
        )
    )
    # ts with deliberate collisions (small domain)
    ts = draw(
        st.lists(
            st.integers(min_value=0, max_value=40 * 1_000_000),
            min_size=n, max_size=n,
        )
    )
    blocks = draw(st.integers(min_value=1, max_value=5))
    return keys, ts, blocks


def _table(keys, ts):
    n = len(keys)
    return pa.table(
        {
            "user_id": pa.array(np.asarray(keys, np.int64)),
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(np.asarray(ts, np.int64), pa.timestamp("us")),
            "value": pa.array((np.arange(n) % 7 - 3) * 0.25),
        }
    )


def _pdf(t):
    return t.to_pandas().sort_values(["user_id", "ts", "event_id"])


@settings(max_examples=12, deadline=None)
@given(event_frames())
def test_sessionize_property(frame):
    keys, ts, blocks = frame
    t = _table(keys, ts)
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = (
        sessionize(ds, "user_id", "ts", "event_id", GAP_US)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    tsus = df["ts"].astype("int64")
    brk = (df["user_id"] == df["user_id"].shift()) & (tsus.diff() > GAP_US)
    want = (
        pd.DataFrame({"user_id": df["user_id"], "brk": brk.astype(int)})
        .groupby("user_id")
        .agg(n_events=("brk", "size"), n_sessions=("brk", "sum"))
        .reset_index()
    )
    want["n_sessions"] = (want["n_sessions"] + 1).astype("int64")
    want["n_events"] = want["n_events"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_like=True)


@settings(max_examples=12, deadline=None)
@given(event_frames())
def test_running_sum_property(frame):
    keys, ts, blocks = frame
    t = _table(keys, ts)
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = (
        running_sum_cents(ds, "user_id", "ts", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    cents = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    df = df.assign(c=cents)
    df["cum_cents"] = df.groupby("user_id")["c"].cumsum()
    want = (
        df[["user_id", "event_id", "cum_cents"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)


@settings(max_examples=12, deadline=None)
@given(event_frames())
def test_sorted_segment_last_property(frame):
    keys, ts, blocks = frame
    t = _table(keys, ts)
    ds = ray.data.from_arrow(t).repartition(blocks)
    got = (
        sorted_segment_last(
            ds, "user_id", ["ts", "event_id"],
            out_cols=["user_id", "event_id"],
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = _pdf(t)
    want = (
        df.groupby("user_id", sort=True)
        .tail(1)[["user_id", "event_id"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_like=True)
