"""Property tests for round-5 kernel helpers."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_replication_rust_ray.functions.triangles import _pairs_in_segments


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=9), min_size=0,
                max_size=30))
def test_pairs_in_segments_matches_brute(sizes):
    """lead built from segment sizes -> exactly the within-segment
    unordered pairs (j < k), each once, in segment-local order."""
    lead = np.concatenate(
        [np.arange(c - 1, -1, -1) for c in sizes]
    ).astype(np.int64) if sizes else np.empty(0, np.int64)
    i1, i2 = _pairs_in_segments(lead)
    got = set(zip(i1.tolist(), i2.tolist()))
    exp = set()
    base = 0
    for c in sizes:
        for a in range(c):
            for b in range(a + 1, c):
                exp.add((base + a, base + b))
        base += c
    assert got == exp
    assert len(i1) == len(got)  # no duplicates


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=60),
       st.integers(min_value=0, max_value=200),
       st.integers(min_value=0, max_value=2 ** 31))
def test_cc_local_kernel_matches_union_find(n, m, seed):
    import pyarrow as pa

    from osm_replication_rust_ray.functions.cc import _cc_local_kernel

    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, m).astype(np.int64)
    b = rng.integers(0, n, m).astype(np.int64)
    # symmetrized input, as connected_components feeds the kernel
    t = pa.table({"src": np.concatenate([a, b]),
                  "dst": np.concatenate([b, a])})
    got = {r["node"].as_py(): r["cluster_rep"].as_py()
           for r in _cc_local_kernel([t]).to_struct_array()} \
        if m else {}
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp = {}
    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for v in set(a.tolist()) | set(b.tolist()):
        exp[v] = find(v)
    assert got == exp
