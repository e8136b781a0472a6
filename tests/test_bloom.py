"""Broadcast Bloom filter: no-false-negative invariant, probe parity
with a naive per-key implementation, and determinism across calls."""

import numpy as np

from osm_replication_rust_ray.functions.bloom import (
    bloom_positions,
    bloom_probe,
    build_bloom,
)
from osm_replication_rust_ray.sources.synth import _mix64


def test_no_false_negatives_and_probe_parity():
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 2**63, 500).astype(np.uint64)
    others = rng.integers(0, 2**63, 2000).astype(np.uint64)
    m, k = 4096, 3
    bits = build_bloom(keys, m, k)
    assert bloom_probe(bits, keys, k).all()  # members always hit
    # naive per-key probe matches the vectorized one
    got = bloom_probe(bits, others, k)
    for i in range(0, 2000, 97):
        want = all(
            bits[int(_mix64(np.array([others[i] + np.uint64(j)], np.uint64))[0]) % m]
            for j in range(k)
        )
        assert bool(got[i]) == want


def test_positions_deterministic_and_in_range():
    keys = np.arange(100, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    p1 = bloom_positions(keys, 256, 4)
    p2 = bloom_positions(keys, 256, 4)
    assert (p1 == p2).all() and p1.min() >= 0 and p1.max() < 256


def test_empty_inputs():
    bits = build_bloom(np.empty(0, np.uint64), 64, 2)
    assert not bits.any()
    assert len(bloom_probe(bits, np.empty(0, np.uint64), 2)) == 0
