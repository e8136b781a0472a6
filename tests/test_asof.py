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
