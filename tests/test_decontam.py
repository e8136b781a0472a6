"""Decontamination kernels (functions/decontam.py) and PII scrub
(functions/text.py:pii_scrub): vectorized shingling pinned against a
per-row Python reference, doc-boundary / short-doc edges, membership
probe, and regex semantics vs DuckDB's RE2."""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.decontam import (
    distinct_per_doc,
    membership,
    shingle_window_hashes,
)
from osm_replication_rust_ray.functions.text import PII_PATTERNS, pii_scrub

DOCS = [
    "a b c d e f g h i j",       # 10 tokens -> 3 windows at k=8
    "x y z",                      # too short -> 0 windows
    "a b c d e f g h",            # exactly k -> 1 window
    "a b c d e f g h i j",       # duplicate of doc 0
    "",                           # empty
]


def _py_windows(text: str, k: int = 8) -> list[str]:
    t = text.split(" ")
    return [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]


def test_window_counts_and_doc_boundaries():
    doc_idx, wh = shingle_window_hashes(pa.array(DOCS), k=8)
    counts = np.bincount(doc_idx, minlength=len(DOCS))
    assert counts.tolist() == [3, 0, 1, 3, 0]
    # no window may span two docs: identical docs yield identical hash
    # multisets, short docs contribute nothing
    h0 = sorted(wh[doc_idx == 0].tolist())
    h3 = sorted(wh[doc_idx == 3].tolist())
    assert h0 == h3
    # equal strings hash equal across separate calls (cross-batch
    # consistency is what the broadcast set relies on)
    _, wh2 = shingle_window_hashes(pa.array([DOCS[2]]), k=8)
    assert wh2.tolist() == [wh[doc_idx == 2][0]]


def test_string_identity_matches_python_reference():
    """Two windows hash equal IFF their shingle strings are equal (no
    collisions at test scale) — checked against the per-row
    reference on a corpus with engineered overlaps."""
    docs = [
        "p q r s t u v w extra words here",
        "junk p q r s t u v w",          # shares shingle 'p q r s t u v w'
        "nothing in common at all here now yes",
    ]
    doc_idx, wh = shingle_window_hashes(pa.array(docs), k=8)
    strings = [
        (d, s) for d, text in enumerate(docs)
        for s in _py_windows(text, 8)
    ]
    assert len(strings) == len(wh)
    by_hash: dict[int, set[str]] = {}
    for (d, s), h in zip(strings, wh.tolist()):
        by_hash.setdefault(h, set()).add(s)
    assert all(len(v) == 1 for v in by_hash.values())
    # the engineered overlap is found
    shared = set(_py_windows(docs[0], 8)) & set(_py_windows(docs[1], 8))
    assert shared == {"p q r s t u v w"}


def test_distinct_per_doc_and_membership():
    d = np.array([0, 0, 0, 1, 1], np.int64)
    w = np.array([5, 5, 9, 5, 5], np.uint64)
    d_u, w_u = distinct_per_doc(d, w)
    assert d_u.tolist() == [0, 0, 1]
    assert w_u.tolist() == [5, 9, 5]
    bench = np.array([5], np.uint64)
    assert membership(w_u, bench).tolist() == [True, False, True]
    assert membership(w_u, np.empty(0, np.uint64)).tolist() == [False] * 3
    # probe above the set's max (the searchsorted clamp edge)
    assert membership(np.array([99], np.uint64), bench).tolist() == [False]


def test_empty_and_all_short_batches():
    doc_idx, wh = shingle_window_hashes(pa.array(["a b", "c"]), k=8)
    assert len(doc_idx) == 0 and len(wh) == 0
    d_u, w_u = distinct_per_doc(doc_idx, wh)
    assert len(d_u) == 0 and len(w_u) == 0


def test_ngram_repetition_stats():
    from osm_replication_rust_ray.functions.decontam import (
        ngram_repetition_stats,
    )

    docs = [
        "spam spam spam spam spam",   # 4 identical 2-grams
        "a b c d e",                  # all distinct
        "a b a b a b c",              # 'a b' x3, 'b a' x2, 'b c' x1
        "one",                        # too short -> zeros
    ]
    s = ngram_repetition_stats(pa.array(docs), k=2)
    assert s["n_grams"].tolist() == [4, 4, 6, 0]
    assert s["n_distinct"].tolist() == [1, 4, 3, 0]
    assert s["dup_frac"].tolist() == [0.75, 0.0, 0.5, 0.0]
    assert s["top_frac"].tolist() == [1.0, 0.25, 0.5, 0.0]


def test_pii_scrub_patterns_and_order():
    clean, counts = pii_scrub(
        pa.array(
            [
                "mail a.b+c@ex-1.co and 415-555-1234 or 10.1.2.3 "
                "ssn 123-45-6789",
                "no pii here at all",
                "two mails x@y.io z@w.net, phone 415 555 0000",
            ]
        )
    )
    assert clean.to_pylist() == [
        "mail <EMAIL> and <PHONE> or <IP> ssn <SSN>",
        "no pii here at all",
        "two mails <EMAIL> <EMAIL>, phone <PHONE>",
    ]
    assert counts["<EMAIL>"].to_pylist() == [1, 0, 2]
    assert counts["<PHONE>"].to_pylist() == [1, 0, 1]
    assert counts["<SSN>"].to_pylist() == [1, 0, 0]
    assert counts["<IP>"].to_pylist() == [1, 0, 0]
    # email is scrubbed FIRST, so its digit runs never count as ids
    clean2, counts2 = pii_scrub(pa.array(["u123-45-6789@h.com"]))
    assert clean2.to_pylist() == ["<EMAIL>"]
    assert counts2["<SSN>"].to_pylist() == [0]


def test_pii_scrub_matches_duckdb_re2():
    import duckdb

    rows = [
        "a@b.co 1.2.3.4 999-88-7777 call 123.456.7890",
        "边界 no-ascii text ip 255.255.255.255",
        "dot.end@x.yz. trailing 1.2.3.4.5 five-octet",
    ]
    con = duckdb.connect()
    expr = "t"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM (SELECT unnest(?) AS t)", [rows]
        ).fetchall()
    ]
    clean, _ = pii_scrub(pa.array(rows))
    assert clean.to_pylist() == want


def test_vocab_census_tiebreak_and_topk(ray_session, tmp_path):
    """Engineered tie: tokens with equal counts must rank token-asc,
    and top_k truncates deterministically."""
    import pyarrow.parquet as pq
    import ray

    from osm_replication_rust_ray.pipelines.queries import q_vocab_census

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["b a c", "a b zz", "c b a zz"], pa.string()
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_vocab_census(str(tmp_path), top_k=3).to_pandas()
    # counts: a=3 b=3 c=2 zz=2 -> top3 = a,b then c (ties token-asc)
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["n"].tolist() == [3, 3, 2]


def test_doc_term_tf_kernel():
    from osm_replication_rust_ray.functions.text import doc_term_tf

    d, t, f = doc_term_tf(pa.array(["a b a", "b", "c c c"]))
    assert list(zip(d.tolist(), t.tolist(), f.tolist())) == [
        (0, "a", 2), (0, "b", 1), (1, "b", 1), (2, "c", 3),
    ]
    d0, t0, f0 = doc_term_tf(pa.array([], pa.string()))
    assert len(d0) == 0 and len(t0) == 0 and len(f0) == 0


def test_tfidf_top_term_tiebreak(ray_session, tmp_path):
    """Equal fixed-point scores fall to term-asc; rarer terms beat
    commoner ones at equal tf."""
    import pyarrow.parquet as pq

    from osm_replication_rust_ray.pipelines.queries import q_tfidf_top_term

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            # 'rare' appears only in doc 0 (df=1); 'b' in all (df=3)
            "text": pa.array(["b rare b", "b zz", "b zz"], pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    out = q_tfidf_top_term(str(tmp_path)).to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)
    # doc0: rare tf1/df1 = 1.0 > b tf2/df3 -> 'rare'
    assert out["term"].tolist() == ["rare", "zz", "zz"]
    assert out["df"].tolist() == [1, 2, 2]
