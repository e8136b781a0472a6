"""Exact AUC: brute pairwise parity (incl. ties) across block splits."""

import numpy as np
import pyarrow as pa


def test_auc_histogram_matches_pairwise(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.agg import (
        adaptive_group_aggregate,
    )

    rng = np.random.default_rng(9)
    n = 800
    sc = rng.integers(-50, 50, n).astype(np.int64)  # heavy ties
    pos = rng.random(n) < 0.4
    # brute: 2*U = sum over (p, n) pairs of 2*[sp>sn] + 1*[sp==sn]
    sp, sn = sc[pos], sc[~pos]
    u2 = int(2 * (sp[:, None] > sn[None, :]).sum()
             + (sp[:, None] == sn[None, :]).sum())

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "sc": b["sc"],
            "np_": pa.array(
                b["pos"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "nn_": pa.array(
                (~b["pos"].to_numpy(zero_copy_only=False)).astype(
                    np.int64)),
        })
        g = t.group_by("sc").aggregate([("np_", "sum"), ("nn_", "sum")])
        return g.rename_columns(["sc", "np_", "nn_"])

    ds = ray.data.from_arrow(pa.table({
        "sc": pa.array(sc), "pos": pa.array(pos)})).repartition(7)
    hist = adaptive_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=64),
        "sc", {"np_": ("np_", "sum"), "nn_": ("nn_", "sum")},
        est_rows=n).to_pandas().sort_values("sc")
    below = hist["nn_"].cumsum() - hist["nn_"]
    got = int((hist["np_"] * (2 * below + hist["nn_"])).sum())
    assert got == u2
