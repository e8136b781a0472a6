"""rolling_median brute parity with the carry chain genuinely
exercised: the sorted stream is REPARTITIONED to many small blocks so
both _segment_offsets walks (rank pass and pick pass) cross key runs
over block boundaries."""

import numpy as np
import pyarrow as pa
import pytest

W = 7


def brute(users, sids, ts, cents):
    out = {}
    for u in set(users.tolist()):
        m = users == u
        order = np.lexsort((sids[m], ts[m]))
        c = cents[m][order]
        s = sids[m][order]
        for j in range(len(c)):
            lo = max(0, j - W + 1)
            vals = sorted(zip(c[lo:j + 1], s[lo:j + 1]))
            out[(int(u), j)] = int(vals[(len(vals) + 1) // 2 - 1][0])
    return out


@pytest.mark.parametrize("blocks", [1, 13])
def test_rolling_median_brute_parity(ray_session, monkeypatch, blocks):
    import ray.data as rd

    from osm_replication_rust_ray.pipelines import queries as Q

    rng = np.random.default_rng(31)
    n = 160
    users = rng.integers(0, 4, n).astype(np.int64)
    sids = rng.permutation(n).astype(np.int64)
    ts = rng.integers(0, 50, n).astype(np.int64)  # heavy ts ties
    cents = rng.integers(0, 30, n).astype(np.int64)  # heavy value ties
    t = pa.table({
        "user_id": users, "event_id": sids,
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(cents / 100.0, pa.float64()),
    })
    monkeypatch.setattr(
        Q, "_read",
        lambda sf, tbl, columns=None: rd.from_arrow(
            t.select(columns) if columns else t).repartition(blocks))
    monkeypatch.setattr(Q, "table_rows", lambda sf, tbl: n)
    got = {(r["user_id"], r["rn"]): r["median_cents"]
           for r in Q.q_rolling_median("unused").take_all()}
    assert got == brute(users, sids, ts, cents)


def brute_hampel(users, sids, ts, cents, K=3):
    out = {}
    med = brute(users, sids, ts, cents)
    for u in set(users.tolist()):
        m = users == u
        order = np.lexsort((sids[m], ts[m]))
        c = cents[m][order]
        s = sids[m][order]
        for j in range(len(c)):
            lo = max(0, j - W + 1)
            md = med[(int(u), j)]
            devs = sorted((abs(int(x) - md), int(si))
                          for x, si in zip(c[lo:j + 1], s[lo:j + 1]))
            mad = devs[(len(devs) + 1) // 2 - 1][0]
            out[(int(u), j)] = (int(c[j]), md, mad,
                                int(abs(int(c[j]) - md) > K * mad))
    return out


@pytest.mark.parametrize("blocks", [1, 13])
def test_hampel_brute_parity(ray_session, monkeypatch, blocks):
    """The interior/boundary med+mad split must survive many small
    blocks (runs straddling every boundary)."""
    import ray.data as rd

    from osm_replication_rust_ray.pipelines import queries as Q

    rng = np.random.default_rng(77)
    n = 140
    users = rng.integers(0, 3, n).astype(np.int64)
    sids = rng.permutation(n).astype(np.int64)
    ts = rng.integers(0, 40, n).astype(np.int64)
    cents = rng.integers(0, 25, n).astype(np.int64)
    t = pa.table({
        "user_id": users, "event_id": sids,
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(cents / 100.0, pa.float64()),
    })
    monkeypatch.setattr(
        Q, "_read",
        lambda sf, tbl, columns=None: rd.from_arrow(
            t.select(columns) if columns else t).repartition(blocks))
    monkeypatch.setattr(Q, "table_rows", lambda sf, tbl: n)
    got = {(r["user_id"], r["rn"]):
           (r["cents"], r["med"], r["mad"], r["is_outlier"])
           for r in Q.q_hampel_outliers("unused").take_all()}
    assert got == brute_hampel(users, sids, ts, cents)
