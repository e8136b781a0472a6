"""power_iteration sanity: the exact-integer 3-round estimate must
align with numpy's true dominant eigenvector of the same gram matrix
(the gate pins engine==oracle arithmetic; this pins that the
arithmetic computes the right THING)."""

import numpy as np

SF_DIR = "/root/testdata/sf0.001"


def test_aligns_with_numpy_eigenvector(ray_session):
    from osm_replication_rust_ray.pipelines.queries import (
        q_gram_matrix,
        q_power_iteration,
    )

    gram = q_gram_matrix(SF_DIR).take_all()
    d = max(r["k"] for r in gram) + 1
    G = np.zeros((d, d))
    for r in gram:
        G[r["j"], r["k"]] = G[r["k"], r["j"]] = r["gram"]
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, np.argmax(evals)]
    v = np.array([r["v"] for r in sorted(
        q_power_iteration(SF_DIR).take_all(), key=lambda r: r["j"])],
        dtype=np.float64)
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99
