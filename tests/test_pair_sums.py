"""adjacent_pair_sums: brute LAG-pair parity across many blocks."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import adjacent_pair_sums

TERMS = {
    "n_pairs": lambda v0, v1, t0, t1: np.ones(len(v0), np.int64),
    "s01": lambda v0, v1, t0, t1: v0 * v1,
    "wdur": lambda v0, v1, t0, t1: v0 * (t1 - t0),
}


def brute(keys, ts, ids, vals):
    rows = sorted(zip(keys, ts, ids, vals))
    out = {}
    for (k0, t0, _i0, v0), (k1, t1, _i1, v1) in zip(rows, rows[1:]):
        if k0 != k1:
            continue
        agg = out.setdefault(k0, {"n_pairs": 0, "s01": 0, "wdur": 0})
        agg["n_pairs"] += 1
        agg["s01"] += v0 * v1
        agg["wdur"] += v0 * (t1 - t0)
    return {(k, a["n_pairs"], a["s01"], a["wdur"])
            for k, a in out.items()}


def run(ray_session, keys, ts, ids, vals, parts):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "event_id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.int64()),
    })).repartition(parts)
    got = adjacent_pair_sums(ds, "key", "ts", "event_id", "v", TERMS,
                             est_keys=len(keys)).to_pandas()
    return {(int(r.key), int(r.n_pairs), int(r.s01), int(r.wdur))
            for r in got.itertuples()}


@pytest.mark.parametrize("seed,parts", [(5, 13), (11, 19)])
def test_pair_sums_random_parity(ray_session, seed, parts):
    rng = np.random.default_rng(seed)
    n = 1100
    keys = rng.integers(0, 4, n).astype(np.int64)  # long per-key runs
    ts = rng.integers(0, 3000, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    vals = rng.integers(-50, 200, n).astype(np.int64)
    assert run(ray_session, keys, ts, ids, vals, parts) == \
        brute(keys.tolist(), ts.tolist(), ids.tolist(), vals.tolist())


def test_pair_sums_one_key_per_block(ray_session):
    # a single key, one row per block: EVERY pair is a boundary pair
    n = 24
    keys = np.zeros(n, np.int64)
    ts = np.arange(n, dtype=np.int64) * 10
    ids = np.arange(n, dtype=np.int64)
    vals = np.arange(1, n + 1, dtype=np.int64)
    got = run(ray_session, keys, ts, ids, vals, n)
    want = brute(keys.tolist(), ts.tolist(), ids.tolist(), vals.tolist())
    assert got == want
