"""Broadcast Bloom-filter membership (blocklist filtering).

The production hygiene step this models: drop every image whose
perceptual hash appears in a known-bad blocklist.  At 100 TB the
blocklist itself can be large (10^8 hashes); a Bloom filter with k
probes replaces the exact sorted-set broadcast at ~10 bits/key instead
of 64, at the cost of a bounded false-positive rate — false NEGATIVES
are impossible, so the filter is safe to use as a pre-screen (exact
verify only on the flagged survivors).

Everything here is splitmix64 arithmetic so the gate's DuckDB oracle
reproduces the EXACT bit array and probe results (not just bounds):
bit position j of key h is ``mix64((h + j) mod 2^64) mod m``.

No reference analogue (the reference has no corpus-hygiene ops); part
of the LLM-pipeline operator set alongside decontam / dedup.
"""

from __future__ import annotations

import numpy as np

from ..sources.synth import _mix64


def bloom_positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(keys), k) int64 bit positions for uint64 ``keys``."""
    keys = np.asarray(keys, np.uint64)
    out = np.empty((len(keys), k), np.int64)
    for j in range(k):
        out[:, j] = (_mix64(keys + np.uint64(j)) % np.uint64(m)).astype(np.int64)
    return out


def build_bloom(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """Dense boolean bit array (length m) with every key's k bits set."""
    bits = np.zeros(m, bool)
    if len(keys):
        bits[bloom_positions(keys, m, k).ravel()] = True
    return bits


def bloom_probe(bits: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Membership probe: True where ALL k bit positions are set."""
    if not len(keys):
        return np.empty(0, bool)
    pos = bloom_positions(keys, len(bits), k)
    return bits[pos].all(axis=1)
