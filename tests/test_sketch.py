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


# ---------------- Misra-Gries ----------------

def test_mg_superset_and_bound_over_random_merge_trees():
    import numpy as np

    from osm_replication_rust_ray.functions.sketch import mg_compress

    rng = np.random.default_rng(0)
    for trial in range(30):
        n_keys = int(rng.integers(5, 200))
        stream = rng.choice(
            n_keys, size=2000,
            p=np.random.default_rng(trial).dirichlet(np.ones(n_keys)))
        k = int(rng.integers(4, 40))
        blocks = np.array_split(stream, rng.integers(1, 20))
        summaries = []
        for b in blocks:
            u, c = np.unique(b, return_counts=True)
            summaries.append(mg_compress(u, c, k))
        while len(summaries) > 1:
            a = summaries.pop(0)
            b = summaries.pop(0)
            summaries.append(mg_compress(
                np.concatenate([a[0], b[0]]),
                np.concatenate([a[1], b[1]]), k))
        fk, fc = summaries[0]
        assert len(fk) <= k
        u, c = np.unique(stream, return_counts=True)
        thresh = len(stream) / (k + 1)
        heavy = set(u[c > thresh])
        # superset guarantee: every true heavy hitter survives
        assert heavy <= set(fk)
        # estimate bound: true - N/(k+1) <= est <= true
        true_of = dict(zip(u.tolist(), c.tolist()))
        for key, est in zip(fk.tolist(), fc.tolist()):
            assert est <= true_of[key]
            assert true_of[key] - est <= thresh


def test_mg_compress_small_input_exact():
    import numpy as np

    from osm_replication_rust_ray.functions.sketch import mg_compress

    keys = np.array(["a", "b", "a", "c"], object)
    cnts = np.array([5, 3, 2, 1])
    k_out, c_out = mg_compress(keys, cnts, k=8)
    assert dict(zip(k_out.tolist(), c_out.tolist())) == {
        "a": 7, "b": 3, "c": 1}
