"""BPE doubled-space merge semantics vs a greedy reference."""

import pyarrow as pa
import pyarrow.compute as pc

J = "\x1f"


def doubled(text: str) -> str:
    return " " + text.replace(" ", "  ") + " "


def tokens(td: str) -> list[str]:
    return td.strip(" ").split("  ")


def arrow_merge(td: str, t0: str, t1: str) -> str:
    arr = pa.array([td], pa.string())
    out = pc.replace_substring(
        arr, pattern=f" {t0}  {t1} ", replacement=f" {t0}{J}{t1} ")
    return out[0].as_py()


def greedy_merge(toks: list[str], t0: str, t1: str) -> list[str]:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == t0 and toks[i + 1] == t1:
            out.append(t0 + J + t1)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def check(text: str, t0: str, t1: str):
    got = tokens(arrow_merge(doubled(text), t0, t1))
    want = greedy_merge(text.split(" "), t0, t1)
    assert got == want, (text, t0, t1, got, want)


def test_merge_basic():
    check("the fast cat the fast dog", "the", "fast")


def test_merge_overlapping_same_token():
    # "a a a" merging (a, a): greedy takes the FIRST pair only
    check("a a a", "a", "a")
    check("a a a a", "a", "a")
    check("a a a a a", "a", "a")


def test_merge_no_substring_false_positive():
    # token "xa" must not match pair (a, b)
    check("xa b a b", "a", "b")


def test_merge_adjacent_pairs():
    check("a b a b", "a", "b")


def test_second_round_with_merged_token():
    td = doubled("x y z x y z")
    td = arrow_merge(td, "x", "y")
    toks = tokens(td)
    assert toks == ["x" + J + "y", "z", "x" + J + "y", "z"]
    td = arrow_merge(td, "x" + J + "y", "z")
    assert tokens(td) == ["x" + J + "y" + J + "z"] * 2


def test_duckdb_replace_parity():
    import duckdb

    cases = [("a a a b a", "a", "a"), ("xa b a b", "a", "b"),
             ("q r q r q", "q", "r")]
    for text, t0, t1 in cases:
        td = doubled(text)
        pat, rep = f" {t0}  {t1} ", f" {t0}{J}{t1} "
        db = duckdb.sql(
            "SELECT replace(?, ?, ?)", params=[td, pat, rep]).fetchone()[0]
        assert db == arrow_merge(td, t0, t1)
