"""interval_coverage: exact union length + island count per key.

Brute-force parity on adversarial data (few keys spanning many blocks,
heavy overlap, touching/nested/duplicate intervals) — exercises the
carry-cummax chain across blocks, not just within-block sweeps."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.intervals import (
    _SENT,
    interval_coverage,
    segmented_cummax_excl,
)


def brute_coverage(keys, s, e):
    out = {}
    for k in np.unique(keys):
        iv = sorted(
            (int(a), int(b)) for a, b in zip(s[keys == k], e[keys == k])
        )
        cov = isl = 0
        cur_s = cur_e = None
        for a, b in iv:
            if cur_e is None or a > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                cur_s, cur_e = a, b
                isl += 1
            else:
                cur_e = max(cur_e, b)
        if cur_e is not None:
            cov += cur_e - cur_s
        out[int(k)] = (cov, isl)
    return out


def test_segmented_cummax_excl_brute():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1000, 500).astype(np.int64)
    run_id = np.sort(rng.integers(0, 40, 500)).astype(np.int64)
    got = segmented_cummax_excl(x, run_id)
    for i in range(len(x)):
        js = [j for j in range(i) if run_id[j] == run_id[i]]
        want = max((int(x[j]) for j in js), default=int(_SENT))
        assert int(got[i]) == want, i


@pytest.mark.parametrize("n_keys", [3, 50])
def test_interval_coverage_parity(ray_session, n_keys):
    import ray.data

    rng = np.random.default_rng(n_keys)
    n = 4000
    keys = rng.integers(0, n_keys, n).astype(np.int64)
    s = rng.integers(0, 100_000, n).astype(np.int64)
    e = s + rng.integers(1, 5_000, n).astype(np.int64)
    # duplicates + touching intervals
    s[::17] = s[0]
    e[::17] = e[0]
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"k": keys, "s": s, "e": e, "id": ids})
    ds = ray.data.from_arrow(t).repartition(13)
    got = {
        r["k"]: (r["covered_us"], r["n_islands"])
        for r in interval_coverage(
            ds, "k", "s", "e", "id", est_keys=n
        ).take_all()
    }
    assert got == brute_coverage(keys, s, e)
