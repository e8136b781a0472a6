"""Deterministic replication (SURVEY §7 hard part #7 / north_rule):
identical join rows and tile assignments across runs, batch sizes, and
parallelism levels."""

import pandas as pd


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_flagship_assignments_invariant_to_parallelism(ray_session):
    from osm_replication_rust_ray.pipelines.spatial import flagship_assignments

    runs = []
    for parallelism, batch_size, concurrency in (
        (2, 8192, 1),
        (8, 1024, 2),
        (16, 333, 3),
    ):
        df = flagship_assignments(
            n_rows=4000,
            concurrency=concurrency,
            batch_size=batch_size,
            parallelism=parallelism,
        ).to_pandas()
        runs.append(_sorted(df))
    assert runs[0].equals(runs[1])
    assert runs[0].equals(runs[2])


def test_query_outputs_invariant_to_rerun(ray_session):
    from osm_replication_rust_ray.pipelines.queries import (
        q_knn_nearest_feature,
        q_pip_polygon_join,
    )

    sf = "/root/testdata/sf0.001"
    a = _sorted(q_pip_polygon_join(sf).to_pandas())
    b = _sorted(q_pip_polygon_join(sf).to_pandas())
    assert a.equals(b)
    k1 = _sorted(q_knn_nearest_feature(sf).to_pandas())
    k2 = _sorted(q_knn_nearest_feature(sf).to_pandas())
    assert k1.equals(k2)
