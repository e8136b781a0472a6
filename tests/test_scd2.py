"""scd2_intervals: brute LEAD parity with keys crossing many blocks."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import (
    SCD2_OPEN_US,
    scd2_intervals,
)


def brute(keys, ts, ids, attrs):
    rows = sorted(zip(keys, ts, ids, attrs))
    out = set()
    for j, (k, t, i, a) in enumerate(rows):
        nxt = SCD2_OPEN_US
        if j + 1 < len(rows) and rows[j + 1][0] == k:
            nxt = rows[j + 1][1]
        out.add((k, i, a, t, nxt, 1 if nxt == SCD2_OPEN_US else 0))
    return out


def run(ray_session, keys, ts, ids, attrs, parts):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),  # int ts path of _ts_int
        "event_id": pa.array(ids, pa.int64()),
        "etype": pa.array(attrs, pa.string()),
    })).repartition(parts)
    got = scd2_intervals(ds, "key", "ts", "event_id", "etype").to_pandas()
    return {(int(r.key), int(r.event_id), r.etype, int(r.valid_from_us),
             int(r.valid_to_us), int(r.is_current))
            for r in got.itertuples()}


@pytest.mark.parametrize("seed,parts", [(2, 11), (9, 17)])
def test_scd2_random_parity(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    n = 1200
    keys = rng.integers(0, 5, n).astype(np.int64)  # few keys, long runs
    ts = rng.integers(0, 4000, n).astype(np.int64)  # dense, many ties
    ids = np.arange(n, dtype=np.int64)
    attrs = [f"t{int(x)}" for x in rng.integers(0, 3, n)]
    assert run(ray_session, keys, ts, ids, attrs, parts) == \
        brute(keys.tolist(), ts.tolist(), ids.tolist(), attrs)


def test_scd2_single_key_chain(ray_session):
    # one key spanning every block: each version closes at the next
    n = 40
    keys = np.zeros(n, np.int64)
    ts = (np.arange(n) * 7).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    attrs = ["a"] * n
    got = run(ray_session, keys, ts, ids, attrs, 13)
    want = {(0, i, "a", 7 * i,
             7 * (i + 1) if i + 1 < n else SCD2_OPEN_US,
             0 if i + 1 < n else 1) for i in range(n)}
    assert got == want


def test_scd2_every_key_distinct(ray_session):
    # no successors at all: every row is its key's current version
    n = 30
    keys = np.arange(n, dtype=np.int64)
    ts = np.full(n, 100, np.int64)
    ids = np.arange(n, dtype=np.int64)
    got = run(ray_session, keys, ts, ids, ["x"] * n, 7)
    assert all(c == SCD2_OPEN_US and cur == 1
               for (_k, _i, _a, _f, c, cur) in got)
