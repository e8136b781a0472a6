"""grouped_topk: brute-force parity with keys spanning many blocks
(the per-(block, key) rank-carry chain is the part gate data rarely
exercises — few keys x many partitions forces it)."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import grouped_topk


def brute_topk(keys, vals, tids, k):
    rows = sorted(zip(keys, -vals, tids))
    out = set()
    rk = {}
    for key, nv, t in rows:
        r = rk.get(key, 0) + 1
        rk[key] = r
        if r <= k:
            out.add((int(key), int(t), float(-nv), r))
    return out


@pytest.mark.parametrize("n_keys,k", [(4, 3), (60, 5)])
def test_grouped_topk_parity(ray_session, n_keys, k):
    import ray.data

    rng = np.random.default_rng(n_keys * 10 + k)
    n = 5000
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    vals = rng.integers(0, 40, n).astype(np.float64)  # heavy ties
    tids = rng.permutation(n).astype(np.int64)
    t = pa.table({"g": keys, "v": vals, "t": tids})
    ds = ray.data.from_arrow(t).repartition(17)
    got = {
        (r["g"], r["t"], r["v"], r["rk"])
        for r in grouped_topk(ds, "g", "v", "t", k).take_all()
    }
    assert got == brute_topk(keys, vals, tids, k)


def test_grouped_topk_int64_exact_beyond_2_53(ray_session):
    """val_type=int64 must rank values that ALIAS under a float64
    cast (the round-4 advice hazard: int64 microsecond timestamps
    beyond 2^53).  Adjacent int64s differing in the last bit are
    indistinguishable as float64."""
    import ray.data

    base = 1 << 60
    # two keys, values base..base+7 (consecutive — float64 spacing at
    # 2^60 is 256, so ALL of these collapse to the same float)
    keys = np.repeat(np.array([1, 2], np.int64), 8)
    vals = np.concatenate([np.arange(base, base + 8, dtype=np.int64)] * 2)
    tids = np.arange(16, dtype=np.int64)
    assert len(np.unique(vals[:8].astype(np.float64))) == 1  # premise
    ds = ray.data.from_arrow(
        pa.table({"g": keys, "v": vals, "t": tids})).repartition(5)
    got = sorted(
        (r["g"], r["v"], r["rk"])
        for r in grouped_topk(ds, "g", "v", "t", 3,
                              val_type=pa.int64()).take_all())
    exp = sorted((g, base + 7 - i, i + 1)
                 for g in (1, 2) for i in range(3))
    assert got == exp
