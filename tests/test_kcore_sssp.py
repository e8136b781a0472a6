"""k-core + bounded weighted SSSP: brute-force parity on random
graphs injected via the _tri_edges seam (the gate's derived graph
exercises only one topology per sf), plus cap-exhaustion behavior."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.pipelines import queries as Q


def make_edge_ds(edges, parts=3):
    import ray.data as rd

    es = sorted({tuple(sorted(e)) for e in edges if e[0] != e[1]})
    return rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in es], pa.int64()),
        "b": pa.array([e[1] for e in es], pa.int64()),
    })).repartition(parts), es


def brute_kcore(n, es, k):
    alive = set()
    for a, b in es:
        alive.add(a)
        alive.add(b)
    while True:
        deg = {}
        for a, b in es:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        new = {v for v in alive if deg.get(v, 0) >= k}
        if new == alive:
            return {v: deg[v] for v in alive}
        alive = new


def brute_sssp(n, es, seed_mod, max_hops, wfn):
    adj = {}
    for a, b in es:
        w = wfn(a, b)
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {v: 0 for v in range(n) if v % seed_mod == 0}
    for _ in range(max_hops):
        cur = dict(dist)
        for v, d in cur.items():
            for u, w in adj.get(v, ()):
                if d + w < dist.get(u, 1 << 60):
                    dist[u] = d + w
    return dist


@pytest.mark.parametrize("seed,k", [(7, 3), (8, 5)])
def test_kcore_random_parity(ray_session, monkeypatch, seed, k):
    rng = np.random.default_rng(seed)
    n, m = 90, 420
    edges = rng.integers(0, n, (m, 2))
    edge_ds, es = make_edge_ds(edges)
    monkeypatch.setattr(Q, "KCORE_K", k)
    monkeypatch.setattr(Q, "_tri_edges", lambda sf: (edge_ds, n, len(es)))
    got = {int(r.node): int(r.deg)
           for r in Q.q_k_core("unused").to_pandas().itertuples()}
    assert got == brute_kcore(n, es, k)


def test_kcore_cap_exhaustion_raises(ray_session, monkeypatch):
    # k=2 peels a path graph from both ends, one pair per round; a
    # 1-round cap cannot reach the (empty) fixpoint -> must raise
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    edge_ds, es = make_edge_ds(edges)
    monkeypatch.setattr(Q, "KCORE_K", 2)
    monkeypatch.setattr(Q, "KCORE_MAX_ROUNDS", 1)
    monkeypatch.setattr(Q, "_tri_edges", lambda sf: (edge_ds, n, len(es)))
    with pytest.raises(RuntimeError, match="did not converge"):
        Q.q_k_core("unused")


def test_sssp_random_parity(ray_session, monkeypatch):
    rng = np.random.default_rng(21)
    n, m = 100, 260
    edges = rng.integers(0, n, (m, 2))
    edge_ds, es = make_edge_ds(edges)
    monkeypatch.setattr(Q, "_tri_edges", lambda sf: (edge_ds, n, len(es)))

    def wfn(a, b):
        return int(Q._edge_weight(np.array([a]), np.array([b]))[0])

    got = {int(r.node): int(r.dist)
           for r in Q.q_sssp_bounded("unused").to_pandas().itertuples()}
    assert got == brute_sssp(n, es, Q.SSSP_SEED_MOD, Q.SSSP_MAX_HOPS, wfn)


def test_sssp_chain_truncates_at_hop_cap(ray_session, monkeypatch):
    # 0 -1- 1 -2- 2 -3- 3 ... chain from the single seed 0: nodes past
    # SSSP_MAX_HOPS edges must be absent even though paths exist
    n = Q.SSSP_MAX_HOPS + 4
    edges = [(i, i + 1) for i in range(n - 1)]
    edge_ds, es = make_edge_ds(edges, parts=2)
    monkeypatch.setattr(Q, "SSSP_SEED_MOD", 1 << 30)
    monkeypatch.setattr(Q, "_tri_edges", lambda sf: (edge_ds, n, len(es)))
    # seed rule: node % mod == 0 -> only node 0
    got = {int(r.node): int(r.dist)
           for r in Q.q_sssp_bounded("unused").to_pandas().itertuples()}
    def wfn(a, b):
        return int(Q._edge_weight(np.array([a]), np.array([b]))[0])
    exp = brute_sssp(n, es, 1 << 30, Q.SSSP_MAX_HOPS, wfn)
    assert got == exp
    assert set(got) == set(range(Q.SSSP_MAX_HOPS + 1))
