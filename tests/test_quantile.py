"""Exact distributed quantiles (functions/quantile.py).

Pins the iterative-histogram-refinement result against the trivial
sort-based rank rule on adversarial distributions: duplicates-heavy,
extreme-range, tiny groups (rank clamping), single-value groups.
"""

import numpy as np
import pyarrow as pa
import pytest

from osm_replication_rust_ray.functions.quantile import (
    QuantileConvergenceError,
    exact_group_quantiles,
)

QS = [("p01", 1, 100), ("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4),
      ("p99", 99, 100), ("max", 1, 1)]


def _expected(groups: dict[str, np.ndarray]):
    out = {}
    for g, vals in groups.items():
        s = np.sort(vals)
        n = len(s)
        for label, num, den in QS:
            rank = max(1, (num * n + den - 1) // den)
            out[(g, label)] = int(s[rank - 1])
    return out


def _run(groups: dict[str, np.ndarray]):
    import ray.data

    g_col = np.concatenate(
        [np.full(len(v), g, object) for g, v in groups.items()]
    )
    v_col = np.concatenate(list(groups.values())).astype(np.int64)
    tbl = pa.table({"g": pa.array(list(g_col), pa.string()),
                    "v": pa.array(v_col, pa.int64())})

    def factory():
        return ray.data.from_arrow(tbl).repartition(7)

    res = exact_group_quantiles(factory, "g", "v", QS,
                                est_groups=len(groups))
    got = {}
    for row in res.to_pylist():
        got[(row["g"], row["q_label"])] = int(row["value"])
    return got


@pytest.mark.usefixtures("ray_session")
def test_adversarial_distributions():
    rng = np.random.default_rng(42)
    groups = {
        # heavy duplicates: long runs straddle histogram buckets
        "dups": np.repeat(rng.integers(-50, 50, 200), 97),
        # extreme 64-bit-ish range forces multiple refinement rounds
        "wide": rng.integers(-(2**62), 2**62, 5000),
        # tiny group: p01 rank clamps to 1
        "tiny": np.array([7, -3, 12]),
        # single value, many copies: every quantile equals it
        "const": np.full(1000, -123456789),
        # two-point bimodal: quantiles sit exactly on the jump
        "bimodal": np.concatenate([np.full(500, 10), np.full(500, 20)]),
    }
    assert _run(groups) == _expected(groups)


@pytest.mark.usefixtures("ray_session")
def test_dense_small_range_uses_collect_path():
    # range fits one histogram round; exercises the exact-collect arm
    rng = np.random.default_rng(7)
    groups = {"a": rng.integers(0, 300, 4000),
              "b": rng.integers(100, 110, 4000)}
    assert _run(groups) == _expected(groups)


def test_convergence_error_type():
    assert issubclass(QuantileConvergenceError, RuntimeError)
