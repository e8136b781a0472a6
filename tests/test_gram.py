"""Gram-matrix accumulation: block-split invariance + float64 brute
parity of the fixed-point rule."""

import numpy as np
import pyarrow as pa


def test_gram_matrix_block_invariance(ray_session):
    import ray.data

    from osm_replication_rust_ray.pipelines.queries import GRAM_SCALE

    rng = np.random.default_rng(4)
    n, d = 700, 16
    e = (rng.standard_normal((n, d)) * 0.3).astype(np.float32)
    q = np.floor(e.astype(np.float64) * GRAM_SCALE).astype(np.int64)
    exp = q.T @ q

    from osm_replication_rust_ray.functions.agg import (
        adaptive_group_aggregate,
    )

    iu = np.triu_indices(d)
    jk = (iu[0] * d + iu[1]).astype(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        m = np.stack(b["embedding"].to_numpy(zero_copy_only=False))
        qq = np.floor(m.astype(np.float64) * GRAM_SCALE).astype(np.int64)
        g = qq.T @ qq
        return pa.table({"jk": pa.array(jk, pa.int64()),
                         "g": pa.array(g[iu], pa.int64())})

    for parts in (1, 7):
        ds = ray.data.from_arrow(pa.table({
            "embedding": pa.array(list(e), pa.list_(pa.float32())),
        })).repartition(parts)
        merged = adaptive_group_aggregate(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=128),
            "jk", {"gram": ("g", "sum")}, est_rows=parts * len(jk),
        ).to_pandas()
        got = dict(zip(merged["jk"].astype(int),
                       merged["gram"].astype(int)))
        assert got == {int(a * d + b): int(exp[a, b])
                       for a, b in zip(*iu)}
