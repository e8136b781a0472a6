"""CUSUM: brute parity with keys spanning many blocks (the (T,M,X,D)
combine chain is what gate data rarely stresses), plus edge shapes."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.cusum import cusum_max


def brute(users, ts, ids, vals, target):
    rows = sorted(zip(users, ts, ids, vals))
    out = {}
    state = {}
    for u, t, i, v in rows:
        d = int(np.floor(v * 100.0 + 0.5)) - target
        c, mx, net = state.get(u, (0, 0, 0))
        c = max(0, c + d)
        state[u] = (c, max(mx, c), net + d)
    return {u: (mx, net) for u, (c, mx, net) in state.items()}


def run(ray_session, users, ts, ids, vals, target, parts):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_id": pa.array(ids, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(parts)
    got = cusum_max(ds, "user_id", "ts", "event_id", "value",
                    target).to_pandas()
    return {int(r.user_id): (int(r.cusum_max), int(r.net_cents))
            for r in got.itertuples()}


@pytest.mark.parametrize("seed,n_users,n,parts", [(2, 3, 400, 13),
                                                  (7, 50, 2000, 9)])
def test_cusum_random_parity(ray_session, seed, n_users, n, parts):
    rng = np.random.default_rng(seed)
    users = rng.integers(0, n_users, n).astype(np.int64)
    ts = rng.permutation(n).astype("datetime64[us]")
    ids = np.arange(n, dtype=np.int64)
    vals = np.round(rng.uniform(0, 100, n), 2)
    got = run(ray_session, users, ts, ids, vals, 5000, parts)
    assert got == brute(users.tolist(), ts.tolist(), ids.tolist(),
                        vals.tolist(), 5000)


def test_cusum_all_below_target(ray_session):
    n = 50
    users = np.zeros(n, np.int64)
    ts = np.arange(n).astype("datetime64[us]")
    ids = np.arange(n, dtype=np.int64)
    vals = np.full(n, 1.0)
    got = run(ray_session, users, ts, ids, vals, 5000, 7)
    assert got[0][0] == 0  # drift never leaves the floor
    assert got[0][1] == n * (100 - 5000)
