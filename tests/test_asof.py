"""Distributed as-of join vs pandas merge_asof on random data,
including cross-block resolution (many blocks, few keys)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_asof_join_matches_pandas(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.asof import asof_join

    rng = np.random.RandomState(3)
    n_p, n_s = 5000, 2000
    pk = rng.randint(0, 40, n_p).astype(np.int64)  # few keys => straddling
    pt = rng.randint(0, 10**6, n_p).astype(np.int64)
    sk = rng.randint(0, 40, n_s).astype(np.int64)
    st_ = rng.randint(0, 10**6, n_s).astype(np.int64)
    sv = rng.randint(0, 10**9, n_s).astype(np.int64)
    # unique (key, t) states
    sdf = (
        pd.DataFrame({"k": sk, "t": st_, "v": sv})
        .sort_values(["k", "t", "v"])
        .groupby(["k", "t"], as_index=False)
        .tail(1)
    )
    pdf = pd.DataFrame({"k": pk, "t": pt, "pid": np.arange(n_p, dtype=np.int64)})

    probes = ray.data.from_arrow(
        pa.Table.from_pandas(pdf, preserve_index=False)
    ).repartition(7)
    states = ray.data.from_arrow(
        pa.Table.from_pandas(sdf, preserve_index=False)
    ).repartition(5)
    got = (
        asof_join(probes, states, by="k", on="t", state_cols=["v"])
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        pdf.sort_values("t"),
        sdf.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("pid").reset_index(drop=True)
    assert len(got) == len(want)
    gv = got["v"].to_numpy(dtype=np.float64, na_value=np.nan)
    wv = want["v"].to_numpy(dtype=np.float64, na_value=np.nan)
    both_nan = np.isnan(gv) & np.isnan(wv)
    assert (both_nan | (gv == wv)).all()


def test_range_join_matches_brute_force(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.rangejoin import range_join

    rng = np.random.RandomState(8)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(3000, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 10**6, 3000).astype(np.int64)),
        }
    )
    lo = rng.randint(0, 10**6, 400).astype(np.int64)
    iv = pa.table(
        {
            "iid": pa.array(np.arange(400, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(lo + rng.randint(0, 5000, 400)),
        }
    )
    got = range_join(
        ray.data.from_arrow(pts).repartition(5),
        ray.data.from_arrow(iv).repartition(3),
        point_col="v",
        lo_col="lo",
        hi_col="hi",
        bucket_width=2048,
    ).to_pandas()
    pdf, idf = pts.to_pandas(), iv.to_pandas()
    want = {
        (int(p.pid), int(i.iid))
        for p in pdf.itertuples()
        for i in idf.itertuples()
        if i.lo <= p.v <= i.hi
    }
    assert {(int(a), int(b)) for a, b in zip(got["pid"], got["iid"])} == want


def test_range_join_broadcast_matches_shuffle(ray_session):
    """interval_rows/bytes hints route the bucket join to the
    broadcast path; results must equal the shuffle path's."""
    import ray.data

    from osm_replication_rust_ray.functions.rangejoin import range_join

    rng = np.random.RandomState(9)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(2000, dtype=np.int64)),
            "v": pa.array(rng.randint(0, 10**5, 2000).astype(np.int64)),
        }
    )
    lo = rng.randint(0, 10**5, 300).astype(np.int64)
    iv = pa.table(
        {
            "iid": pa.array(np.arange(300, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(lo + rng.randint(0, 3000, 300)),
        }
    )

    def run(**hints):
        df = range_join(
            ray.data.from_arrow(pts).repartition(5),
            ray.data.from_arrow(iv).repartition(3),
            point_col="v", lo_col="lo", hi_col="hi",
            bucket_width=1024, **hints,
        ).to_pandas()
        return set(zip(df["pid"].astype(int), df["iid"].astype(int)))

    # hints=0 (unknown) -> shuffle; small hints -> broadcast
    assert run() == run(interval_rows_hint=600, interval_bytes_hint=20000)
