"""Pivot/unpivot round trip + profiler with engineered NULLs."""

import numpy as np
import pyarrow as pa


def test_pivot_widen_is_exact():
    from osm_replication_rust_ray.pipelines.queries import _PIVOT_TYPES

    # direct kernel check of the widen scatter: duplicate-free wide
    # rows from sparse long input
    n_t = len(_PIVOT_TYPES)
    key = np.array([7 * n_t + 0, 7 * n_t + 4, 2 * n_t + 1], np.int64)
    cnt = np.array([3, 5, 9], np.int64)
    users = np.unique(key // n_t)
    pos = np.searchsorted(users, key // n_t)
    wide = np.zeros((len(users), n_t), np.int64)
    wide[pos, key % n_t] = cnt
    assert users.tolist() == [2, 7]
    assert wide[0].tolist() == [0, 9, 0, 0, 0]
    assert wide[1].tolist() == [3, 0, 0, 0, 5]


def test_profiler_counts_nulls_and_distincts(ray_session):
    import ray.data

    from osm_replication_rust_ray.functions.agg import sorted_distinct

    vals = pa.array([1, 1, None, 3, None, 3, 4], pa.int64())
    ds = ray.data.from_arrow(pa.table({"c": vals})).repartition(3)
    nn = sum(r["nn"] for r in ds.map_batches(
        lambda b: pa.table({"nn": pa.array([b["c"].null_count],
                                           pa.int64())}),
        batch_format="pyarrow").take_all())
    import pyarrow.compute as pc

    nonnull = ds.map_batches(lambda b: b.filter(pc.is_valid(b["c"])),
                             batch_format="pyarrow")
    nd = sorted_distinct(nonnull, ["c"]).count()
    assert (nn, nd) == (2, 3)
