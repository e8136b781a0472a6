"""grouped_rank_pick: brute-force parity with keys spanning many
blocks (few keys x many partitions forces nonzero carries, including
a single key spanning 3+ blocks) + the grouped_median gate shape."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.windows import grouped_rank_pick


def brute_pick(keys, vals, tids, target):
    rows = sorted(zip(keys, vals, tids))
    out = set()
    rk = {}
    for key, v, t in rows:
        r = rk.get(key, 0) + 1
        rk[key] = r
        if target.get(int(key)) == r:
            out.add((int(key), int(v), int(t)))
    return out


@pytest.mark.parametrize("n_keys,parts", [(1, 9), (3, 17), (50, 17)])
def test_rank_pick_parity(ray_session, n_keys, parts):
    import ray.data

    rng = np.random.default_rng(n_keys * 100 + parts)
    n = 4000
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    vals = rng.integers(0, 25, n).astype(np.int64)  # heavy ties
    tids = rng.permutation(n).astype(np.int64)
    counts = {int(k): int(c) for k, c in
              zip(*np.unique(keys, return_counts=True))}
    # medians plus edge ranks (first / last) to stress the carry
    target = {}
    for i, (k, c) in enumerate(sorted(counts.items())):
        target[k] = [1, c, (c + 1) // 2][i % 3]
    t = pa.table({"g": keys, "v": vals, "t": tids})
    ds = ray.data.from_arrow(t).repartition(parts)
    got = {
        (r["g"], r["v"], r["t"])
        for r in grouped_rank_pick(ds, "g", "v", "t", target).take_all()
    }
    assert got == brute_pick(keys, vals, tids, target)
    assert len(got) == len(target)


def test_rank_pick_skips_absent_keys(ray_session):
    import ray.data

    t = pa.table({
        "g": pa.array([1, 1, 2, 2], pa.int64()),
        "v": pa.array([5, 3, 9, 7], pa.int64()),
        "t": pa.array([0, 1, 2, 3], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    got = grouped_rank_pick(ds, "g", "v", "t", {1: 2}).take_all()
    assert [(r["g"], r["v"], r["t"]) for r in got] == [(1, 5, 0)]
