"""Text-analysis kernels for the documents table (training-data ops).

Vectorized (numpy / pyarrow.compute) per-batch functions: token
counting, substring-occurrence counting (quality / language markers),
prefix polynomial fingerprinting, shingling for MinHash / Jaccard.

Counting semantics are chosen to be replicable in the DuckDB oracle:

- tokens = single-space separators, count(' ') + 1 (equals
  ``len(string_split(text, ' '))`` including empty fields)
- substring occurrences = non-overlapping left-to-right count
  (``str.count`` == ``(len(t) - len(replace(t, s, ''))) / len(s)``)
- fingerprint = sum(ascii(text[i]) * 31**i, i < 16) mod 2**31-1
  (terms fit int64; oracle unrolls the 16 terms)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FP_PRIME = 2_147_483_647  # 2**31 - 1
FP_LEN = 16
FP_BASE = 31


def token_counts(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """count(' ') + 1 per string (int64)."""
    n_sp = pc.count_substring(texts, " ")
    return pc.add(pc.cast(n_sp, pa.int64()), 1)


def substr_counts(texts, pattern: str) -> pa.Array:
    """Non-overlapping occurrence count of ``pattern`` (int64)."""
    return pc.cast(pc.count_substring(texts, pattern), pa.int64())


def prefix_fingerprint(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Polynomial rolling-hash fingerprint of the first 16 chars.

    fp = sum(ord(text[i]) * 31**i) % (2**31-1); absent chars count 0.
    Vectorized: pad/slice to a fixed (n, 16) byte matrix.
    """
    sliced = pc.utf8_slice_codeunits(texts, 0, FP_LEN)
    padded = pc.utf8_rpad(sliced, FP_LEN, "\x00")
    joined = "".join(padded.to_pylist())
    mat = np.frombuffer(joined.encode("latin1"), dtype=np.uint8).reshape(-1, FP_LEN)
    coef = np.array([pow(FP_BASE, i, FP_PRIME) for i in range(FP_LEN)], np.int64)
    return (mat.astype(np.int64) @ coef) % FP_PRIME


def prefix_fingerprint_sql(col: str) -> str:
    terms = " + ".join(
        f"CAST(coalesce(ascii(substr({col}, {i + 1}, 1)), 0) AS BIGINT)"
        f" * {pow(FP_BASE, i, FP_PRIME)}"
        for i in range(FP_LEN)
    )
    return f"(({terms}) % {FP_PRIME})"


def substr_count_sql(col: str, pattern: str) -> str:
    p = pattern.replace("'", "''")
    return f"((len({col}) - len(replace({col}, '{p}', ''))) // {len(pattern)})"


def token_count_sql(col: str) -> str:
    return f"(len({col}) - len(replace({col}, ' ', '')) + 1)"


# ---------------- language-marker scoring ----------------

# marker words per label (synthetic corpus vocabulary; the operator's
# point is the scoring mechanics, not linguistic accuracy)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", [" the ", " a "]),
    ("es", [" data ", " row "]),
    ("de", [" table ", " value "]),
]


def lang_scores(texts) -> dict[str, pa.Array]:
    out = {}
    for lang, markers in LANG_MARKERS:
        s = None
        for m in markers:
            c = substr_counts(texts, m)
            s = c if s is None else pc.add(s, c)
        out[f"score_{lang}"] = s
    return out


def lang_predict(scores: dict[str, pa.Array]) -> pa.Array:
    """argmax with first-listed-language tie-break."""
    arrs = [np.asarray(scores[f"score_{lang}"]) for lang, _ in LANG_MARKERS]
    names = [lang for lang, _ in LANG_MARKERS]
    best = np.full(len(arrs[0]), names[-1], dtype=object)
    best_score = arrs[-1].copy()
    for name, arr in zip(reversed(names[:-1]), reversed(arrs[:-1])):
        take = arr >= best_score
        best[take] = name
        best_score = np.where(take, arr, best_score)
    return pa.array(best, pa.string())


def lang_predict_sql(col: str) -> tuple[list[tuple[str, str]], str]:
    """-> ([(score_col, sql)], predict_sql) matching lang_scores/predict."""
    score_sqls = []
    for lang, markers in LANG_MARKERS:
        expr = " + ".join(substr_count_sql(col, m) for m in markers)
        score_sqls.append((f"score_{lang}", f"({expr})"))
    names = [n for n, _ in LANG_MARKERS]
    cases = []
    for i, name in enumerate(names[:-1]):
        conds = " AND ".join(
            f"score_{name} >= score_{other}" for other in names[i + 1:]
        )
        cases.append(f"WHEN {conds} THEN '{name}'")
    pred = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    return score_sqls, pred


# ---------------- BPE-ish regex tokenization ----------------

# GPT-2-style pre-tokenizer pattern (public; simplified to stdlib `re`
# AND RE2: no \p classes, no lookahead — DuckDB's regexp_extract_all
# must count identical tokens for the oracle) — contractions, letter
# runs, digit runs, punct runs, whitespace runs.
_BPE_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)
import re as _re

_BPE_RE = _re.compile(_BPE_PATTERN)


def bpe_token_counts(texts: list[str]) -> np.ndarray:
    """Token counts under the BPE-ish pre-tokenizer (compiled once at
    module import — once per worker process, the stateful-setup rule)."""
    return np.array([len(_BPE_RE.findall(t)) for t in texts], np.int64)


# ---------------- shingling (MinHash / Jaccard inputs) ----------------

def word_shingles(text: str, k: int = 2) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ---------------- PII redaction (training-data scrubbing) ----------------

# (pattern, placeholder) in application ORDER — emails first so the
# digit patterns never fire inside an address, then phone / SSN-style
# ids / IPv4.  RE2 syntax on both sides: pyarrow's
# replace_substring_regex and DuckDB's regexp_replace are both RE2, so
# the oracle replicates the scrub byte-for-byte.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def pii_scrub(texts: pa.Array | pa.ChunkedArray):
    """Sequentially redact each PII pattern, counting matches BEFORE
    each replacement (non-overlapping, left-to-right — the same
    semantics as DuckDB's regexp_extract_all/regexp_replace 'g').
    Returns (clean_texts, {placeholder: count_array}).  Whole-batch
    pyarrow kernels; no per-row Python."""
    counts: dict[str, pa.Array] = {}
    cur = texts
    for pat, repl in PII_PATTERNS:
        counts[repl] = pc.count_substring_regex(cur, pat)
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    return cur, counts


# ---------------- TF / TF-IDF kernels (vectorized) ----------------

def doc_term_tf(texts: pa.Array | pa.ChunkedArray):
    """Per-document term frequencies for a batch, fully vectorized:
    one split, one lexsort over (doc, term), run-length segment
    counts.  Returns (doc_index, term, tf) numpy arrays — one entry
    per DISTINCT (doc, term) pair, doc_index being the row's position
    within the batch."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):  # pragma: no cover
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets)
    offs = offs - offs[0]
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64))
    doc_of = np.searchsorted(offs, np.arange(len(flat)), side="right") - 1
    order = np.lexsort((flat, doc_of))
    d_s, t_s = doc_of[order], flat[order]
    new = np.ones(len(d_s), bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (t_s[1:] != t_s[:-1])
    bounds = np.flatnonzero(new)
    tf = np.diff(np.append(bounds, len(d_s))).astype(np.int64)
    return d_s[bounds].astype(np.int64), t_s[bounds], tf


# American Soundex letter classes (simplified: no H/W separator rule)
SOUNDEX_CLASSES = [("[BFPV]", "1"), ("[CGJKQSXZ]", "2"), ("[DT]", "3"),
                   ("[L]", "4"), ("[MN]", "5"), ("[R]", "6"),
                   ("[AEIOUYHW]", "0")]


def soundex_words(texts: pa.ChunkedArray):
    """(word, valid_mask): the first ASCII-letter run of each text,
    uppercased AFTER extraction so Unicode case rules stay out of the
    contract; null where the text has no ASCII letters."""
    ex = pc.extract_regex(texts, "(?P<w>[A-Za-z]+)")
    word = pc.utf8_upper(pc.struct_field(ex, "w"))
    return word, pc.is_valid(word)


def soundex_codes(words) -> pa.Array:
    """Simplified American Soundex entirely as RE2 chains: letter
    classes -> digit-run collapse (RE2 has no backreferences, so one
    pattern per digit; the identical 7+7 chain runs in the DuckDB
    oracle) -> keep head letter -> drop zeros -> pad to 4."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    head = pc.utf8_slice_codeunits(words, 0, 1)
    digits = words
    for pat, rep in SOUNDEX_CLASSES:
        digits = pc.replace_substring_regex(digits, pat, rep)
    for d in "0123456":
        digits = pc.replace_substring_regex(digits, d + d + "+", d)
    tail = pc.replace_substring(
        pc.utf8_slice_codeunits(digits, 1, 2**30), "0", "")
    return pc.utf8_slice_codeunits(
        pc.binary_join_element_wise(head, tail, "000", ""), 0, 4)
