"""window_dedup: brute LAG parity with bursts crossing many blocks."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import window_dedup


def brute(keys, ts, ids, w):
    rows = sorted(zip(keys, ts, ids))
    out = set()
    prev = {}
    for k, t, i in rows:
        if k not in prev or t - prev[k] > w:
            out.add((k, i, t))
        prev[k] = t
    return out


def run(ray_session, keys, ts, ids, w, parts):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),  # int ts path of _ts_int
        "event_id": pa.array(ids, pa.int64()),
    })).repartition(parts)
    got = window_dedup(ds, "key", "ts", "event_id", w).to_pandas()
    return {(int(r.key), int(r.event_id), int(r.ts_us))
            for r in got.itertuples()}


@pytest.mark.parametrize("seed,parts", [(1, 11), (6, 17)])
def test_window_dedup_random_parity(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    n = 1200
    keys = rng.integers(0, 4, n).astype(np.int64)  # few keys -> long
    ts = rng.integers(0, 5000, n).astype(np.int64)  # dense bursts
    ids = np.arange(n, dtype=np.int64)
    w = 7
    assert run(ray_session, keys, ts, ids, w, parts) == \
        brute(keys.tolist(), ts.tolist(), ids.tolist(), w)


def test_window_dedup_single_key_chain(ray_session):
    # one key spanning every block: carries must chain correctly
    n = 60
    keys = np.zeros(n, np.int64)
    ts = (np.arange(n) * 5).astype(np.int64)  # uniform 5 gaps
    ids = np.arange(n, dtype=np.int64)
    kept = run(ray_session, keys, ts, ids, 4, 13)
    assert kept == {(0, i, 5 * i) for i in range(n)}  # all gaps > 4
    kept = run(ray_session, keys, ts, ids, 5, 13)
    assert kept == {(0, 0, 0)}  # gap == window suppresses
