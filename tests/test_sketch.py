"""HyperLogLog sketch: determinism, mergeability, error bound vs exact."""

import numpy as np

from osm_replication_rust_ray.functions.sketch import (
    hll_estimate,
    hll_fold,
    hll_merge,
)


def test_hll_error_bound_and_merge():
    rng = np.random.RandomState(2)
    a = rng.randint(0, 10**12, 40000).astype(np.int64)
    b = rng.randint(0, 10**12, 40000).astype(np.int64)
    ra = hll_fold(a)
    rb = hll_fold(b)
    merged = hll_merge(ra, rb)
    exact = len(np.unique(np.concatenate([a, b])))
    est = hll_estimate(merged)
    assert abs(est - exact) / exact < 0.05
    # merge == fold of concat (idempotent, order-free)
    both = hll_fold(np.concatenate([b, a]))
    assert (merged == both).all()
    # determinism
    assert (hll_fold(a) == ra).all()


def test_hll_small_cardinality_linear_counting():
    v = np.arange(50, dtype=np.int64)
    est = hll_estimate(hll_fold(v))
    assert abs(est - 50) / 50 < 0.1


def test_approx_distinct_pipeline(ray_session):
    from osm_replication_rust_ray.pipelines.queries import (
        q_approx_distinct_users,
        q_distinct_users,
    )

    sf = "/root/testdata/sf0.01"
    approx = q_approx_distinct_users(sf).to_pandas().set_index("event_type")
    exact = q_distinct_users(sf).to_pandas().set_index("event_type")
    for et in exact.index:
        e = exact.loc[et, "n_users"]
        a = approx.loc[et, "approx_n"]
        assert abs(a - e) / e < 0.08, (et, a, e)
