"""K-means kernels (functions/cluster.py): fixed-order assignment vs
a plain numpy reference, Lloyd iterations vs a single-process
reference, empty-cluster retention, and multi-block stability."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.cluster import (
    assign_fixed_order,
    embedding_matrix,
    kmeans_fit,
    kmeans_partials,
)


def _dataset(x: np.ndarray, n_blocks: int = 1):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(x)), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _ref_lloyd(x, init, n_iter):
    c = init.copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(len(c)):
            if (a == j).any():
                c[j] = x[a == j].mean(axis=0)
    return c


def test_assign_matches_plain_argmin():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 16))
    cents = rng.normal(size=(5, 16))
    got = assign_fixed_order(x, cents)
    want = np.argmin(
        ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), axis=1
    )
    assert np.array_equal(got, want)


def test_assign_tie_breaks_to_lowest_cluster():
    x = np.zeros((3, 4))
    cents = np.ones((4, 4))  # all equidistant
    assert assign_fixed_order(x, cents).tolist() == [0, 0, 0]


def test_partials_shapes_and_totals():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 8))
    cents = rng.normal(size=(3, 8))
    counts, sums = kmeans_partials(x, cents)
    assert counts.sum() == 100
    assert np.allclose(sums.sum(axis=0), x.sum(axis=0))


def test_kmeans_fit_matches_reference_single_block(ray_session):
    rng = np.random.default_rng(2)
    # three separated blobs (float32-quantized like the real column)
    x = np.concatenate(
        [rng.normal(c, 0.05, size=(40, 6)) for c in (-2.0, 0.0, 2.0)]
    ).astype(np.float32).astype(np.float64)
    init = x[:3].copy()
    got, counts = kmeans_fit(_dataset(x), 3, 4, init)
    want = _ref_lloyd(x, x[:3].copy(), 4)
    assert np.allclose(got, want, rtol=0, atol=1e-12)
    assert counts.sum() == len(x)


def test_kmeans_fit_multi_block_stable(ray_session):
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [rng.normal(c, 0.05, size=(50, 4)) for c in (-1.0, 1.0)]
    ).astype(np.float32).astype(np.float64)
    init = x[:2].copy()
    c1, n1 = kmeans_fit(_dataset(x), 2, 3, init)
    c4, n4 = kmeans_fit(_dataset(x, n_blocks=4), 2, 3, init)
    # block-order partial sums may differ in the last ulp; assignments
    # and counts must be identical, centroids near-identical
    assert np.array_equal(n1, n4)
    assert np.allclose(c1, c4, rtol=0, atol=1e-12)
    assert np.array_equal(
        assign_fixed_order(x, c1), assign_fixed_order(x, c4)
    )


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    x = np.full((10, 3), 5.0)
    init = np.array([[5.0, 5.0, 5.0], [999.0, 999.0, 999.0]])
    cents, counts = kmeans_fit(_dataset(x), 2, 2, init)
    assert counts.tolist() == [10, 0]
    assert cents[1].tolist() == [999.0, 999.0, 999.0]


def test_embedding_matrix_empty_batch():
    t = pa.table(
        {"embedding": pa.array([], pa.list_(pa.float32()))}
    )
    assert embedding_matrix(t).shape == (0, 0)
