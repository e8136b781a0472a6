"""Hamming-ball phash near-dup: pigeonhole-banding exactness.

The gate's SQL oracle shares the 4x16-bit banding construction (to
stay fast at gate n), so this test pins the claim both sides rely on
independently: the banded pair set EQUALS the brute-force O(N^2)
Hamming<=3 pair set.
"""

import numpy as np
import pytest

from osm_replication_rust_ray.functions.dedup import (
    PHASH_BANDS,
    PHASH_MAX_DIST,
    hamming64,
    phash_band_rows,
)
from osm_replication_rust_ray.pipelines.queries import (
    PHASH_HAM_VARIANT_EVERY,
    _phash_variant_mask,
    q_phash_hamming,
)
from osm_replication_rust_ray.sources.synth import _mix64, payload_batch


def _universe(n: int):
    """(item_id, phash) arrays exactly as the gate derives them."""
    tbl = payload_batch(np.arange(n), with_bytes=False)
    ph = tbl["phash"].to_numpy(zero_copy_only=False)
    i = np.arange(n, dtype=np.int64)
    v = i % PHASH_HAM_VARIANT_EVERY == 0
    phv = (ph[v].view(np.uint64) ^ _phash_variant_mask(i[v])).view(np.int64)
    return np.concatenate([i, i[v] + n]), np.concatenate([ph, phv])

def _brute_pairs(ids: np.ndarray, ph: np.ndarray) -> set:
    u = ph.view(np.uint64)
    out = set()
    for a in range(len(ids)):
        d = hamming64(np.full(len(ids) - a - 1, u[a]), u[a + 1:])
        for off in np.nonzero(d <= PHASH_MAX_DIST)[0]:
            b = a + 1 + off
            lo, hi = sorted((int(ids[a]), int(ids[b])))
            out.add((lo, hi, int(d[off])))
    return out


def _banded_pairs(ids: np.ndarray, ph: np.ndarray) -> set:
    rows = phash_band_rows(ids, ph)
    band = rows["band"].to_numpy(zero_copy_only=False)
    key = rows["key"].to_numpy(zero_copy_only=False)
    rid = rows["item_id"].to_numpy(zero_copy_only=False)
    rph = rows["phash"].to_numpy(zero_copy_only=False)
    out = set()
    bk = band * (1 << 16) + key
    order = np.argsort(bk, kind="stable")
    bk, rid, rph = bk[order], rid[order], rph[order]
    starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
    ends = np.r_[starts[1:], len(bk)]
    for s, e in zip(starts, ends):
        for x in range(s, e):
            d = hamming64(np.full(e - x - 1, rph[x]), rph[x + 1:e])
            ok = np.nonzero((d <= PHASH_MAX_DIST) & (rid[x] != rid[x + 1:e]))[0]
            for off in ok:
                y = x + 1 + off
                lo, hi = sorted((int(rid[x]), int(rid[y])))
                out.add((lo, hi, int(d[off])))
    return out


def test_banding_equals_brute_force():
    ids, ph = _universe(1500)
    assert _banded_pairs(ids, ph) == _brute_pairs(ids, ph)
    # the universe actually exercises distances 1..3 and 0 (exact dups)
    dists = {d for (_, _, d) in _brute_pairs(ids, ph)}
    assert {0, 3} <= dists


def test_adversarial_band_boundaries():
    # pairs engineered to differ by exactly 3 bits inside ONE band
    # (all other bands equal) and 4 bits spread 1-per-band (must NOT
    # match: distance 4 > cap, and no band agrees... bands DO agree —
    # 4 bits in 4 bands of a 64-bit word leave no band equal, so the
    # banding candidate set misses it, which is correct: it exceeds
    # the distance cap anyway)
    base = _mix64(np.arange(8, dtype=np.uint64))
    a = base[0]
    within = a ^ np.uint64((1 << 2) | (1 << 7) | (1 << 15))  # 3 bits, band 0
    spread = a ^ np.uint64((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    ids = np.arange(3, dtype=np.int64)
    ph = np.array([a, within, spread], np.uint64).view(np.int64)
    got = _banded_pairs(ids, ph)
    assert (0, 1, 3) in got
    assert not any(x == 0 and y == 2 for (x, y, _) in got)
    assert _banded_pairs(ids, ph) == _brute_pairs(ids, ph)


@pytest.mark.usefixtures("ray_session")
def test_gate_query_matches_brute_force():
    res = q_phash_hamming("/root/testdata/sf0.001", n_rows=3000).to_pandas()
    got = set(zip(res.id_a, res.id_b, res.hamming))
    ids, ph = _universe(3000)
    assert got == _brute_pairs(ids, ph)
