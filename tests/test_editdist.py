"""Edit-distance similarity join: kernel parity vs a reference DP,
completeness of the PassJoin shift-window blocking (recall 1.0 by the
pigeonhole argument), and full-pipeline parity against brute force."""

import random

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.editdist import (
    _seg_layout,
    banded_levenshtein,
    edit_distance_join,
)


def ref_lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = min(dp[j] + 1, dp[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, dp[j] = dp[j], cur
    return dp[n]


def rand_edits(rng, s: str, k: int, alph: str) -> str:
    b = list(s)
    for _ in range(k):
        op = rng.choice("ids")
        if op == "i":
            b.insert(rng.randint(0, len(b)), rng.choice(alph))
        elif op == "d" and b:
            del b[rng.randint(0, len(b) - 1)]
        elif op == "s" and b:
            b[rng.randint(0, len(b) - 1)] = rng.choice(alph)
    return "".join(b)


@pytest.mark.parametrize("d", [1, 2, 4, 7])
def test_kernel_parity_random(d):
    rng = random.Random(100 + d)
    alph = "abcdef"
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 40)))
        if rng.random() < 0.6:
            b = rand_edits(rng, a, rng.randint(0, d + 3), alph)
        else:
            b = "".join(rng.choice(alph)
                        for _ in range(rng.randint(0, 40)))
        pairs.append((a, b))
    pairs += [("", ""), ("", "ab"), ("abc", ""), ("same", "same")]
    got = banded_levenshtein([p[0] for p in pairs],
                             [p[1] for p in pairs], d)
    exp = np.array([min(ref_lev(a, b), d + 1) for a, b in pairs])
    assert (got == exp).all()


def test_kernel_unicode_codepoints():
    # one substitution of a multi-byte char must count as ONE edit
    # (char-level semantics, matching DuckDB's levenshtein)
    got = banded_levenshtein(["café", "你好世界"],
                             ["cafe", "你好世"], 2)
    assert got.tolist() == [1, 1]


def test_seg_layout_tiles_exactly():
    lens = np.array([1, 4, 5, 9, 47, 300, 553])
    for d in (1, 2, 4):
        s, ln = _seg_layout(lens, d)
        assert (ln.sum(axis=1) == lens).all()
        assert (s[:, 0] == 0).all()
        assert (s[:, 1:] == (s + ln)[:, :-1]).all()
        # segment lengths differ by at most one (even partition)
        assert (ln.max(axis=1) - ln.min(axis=1) <= 1).all()


def _brute_pairs(texts, ids, d):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dist = ref_lev(texts[i], texts[j])
            if dist <= d:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, dist))
    return out


@pytest.mark.parametrize("seed,front_loaded", [(1, False), (2, True)])
def test_join_recall_complete(ray_session, seed, front_loaded):
    """End-to-end: every true pair found (recall 1.0), no extras.
    front_loaded=True clusters all edits at the string START — the
    maximum-displacement case for the +-d shift window."""
    import ray.data

    rng = random.Random(seed)
    alph = "abcdefgh "
    d = 3
    texts, ids = [], []
    for base_i in range(25):
        base = "".join(rng.choice(alph) for _ in range(rng.randint(30, 90)))
        texts.append(base)
        ids.append(len(ids) * 7 + 1)
        for _ in range(rng.randint(0, 3)):
            k = rng.randint(0, d + 2)
            if front_loaded:
                edited = rand_edits(rng, base[: 2 * d], k, alph) + base[2 * d:]
            else:
                edited = rand_edits(rng, base, k, alph)
            texts.append(edited)
            ids.append(len(ids) * 7 + 1)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(6)
    got = edit_distance_join(ds, d, n_part=4, est_docs=len(ids)).to_pandas()
    got_set = set(zip(got["id_a"].astype(int), got["id_b"].astype(int),
                      got["dist"].astype(int)))
    assert got_set == _brute_pairs(texts, ids, d)


def test_join_no_pairs_stable_schema(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["completely different alpha",
                          "zzzz qqqq wwww eeee rrrr"], pa.string()),
    }))
    got = edit_distance_join(ds, 2, n_part=2, est_docs=2)
    assert got.count() == 0
    # typed schema survives the empty result (to_pandas drops columns
    # on zero-row datasets, so assert on the dataset schema)
    assert sorted(got.schema().names) == ["dist", "id_a", "id_b"]
