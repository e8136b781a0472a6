"""Benchmark harness (driver-run per round; BASELINE.md protocol).

Default mode: owns one Ray session (``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)``), runs the headline spatial-join +
tile-assignment pipeline plus a representative query suite over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "headline_rows": R, "headline_rows_per_s": T,
     "host_quiet": bool, "host_probe_s": [...]}

The line is kept COMPACT (the driver tail-captures it); the bulky
diagnostics — n=3 per-query samples and per-stage wall times — go to
the BENCH_STAGES.json sidecar next to this script.  ``host_quiet`` is
the 3-matmul burst-credit-throttle probe (BASELINE.md protocol): when
false, cross-round per-query comparisons are noise-dominated.

--scaling: runs the headline pipeline twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both
throughputs + scaling efficiency (sandbox evidence for the N->4N
cluster criterion, BASELINE.json north_rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline scale: rows of synthetic payload pushed through
# extents -> cells -> polygon-tree spatial join -> tile counts
# (large enough that per-core compute dominates pipeline startup)
HEADLINE_ROWS = int(os.environ.get("GRAFT_HEADLINE_ROWS", "2000000"))

# Timed set: stable round-over-round (round-4 verdict item #8).
# Policy: an entry stays timed while its per-query best is >= ~0.3 s
# at sf0.1 on a quiet host; entries measured under that in BENCH_r04
# moved to SMOKE_QUERIES (still run once per bench — a crash fails
# the bench — but excluded from the timed JSON so per-query n=1
# driver timings stay comparable as the registry grows).  The
# iterative graph family stays timed deliberately: round 5 changed
# its execution regimes and the deltas should be visible.
BENCH_QUERIES = [
    "pip_polygon_join",
    "tile_counts",
    "bbox_aggregate",
    "knn_nearest_feature",
    "minhash_dup_pairs",
    "ann_topk",
    "embedding_near_dup",
    "lww_upsert",
    "grouped_any",
    "sessionization",
    "decode_psnr",
    "revenue_by_nation",
    "hot_cell_stats",
    "asof_last_order",
    "range_join_prices",
    "strtree_pip",
    "tile_pyramid",
    "polygon_raster",
    "phash_hamming",
    "exact_quantiles",
    "bm25_search",
    "heavy_hitters",
    "segment_clip",
    "zonal_stats",
    "patch_stats",
    "bloom_blocklist",
    "augment_ops",
    "pagerank",
    "gap_fill",
    "radius_join",
    "moving_sum_7d",
    "interval_coverage",
    "mode_event",
    "topk_per_group",
    "ntile_orders",
    "funnel",
    "co_occurrence",
    "mad_value",
    "skyline",
    "morph_ops",
    "sample_quantile",
    "ann_sq8",
    "unigram_surprisal",
    "hist_equalize",
    "edit_distance_join",
    "dbscan",
    "conv_ops",
    "triangle_counts",
    "blob_ops",
    "partitioned_ingest",
    "cusum",
    "outlier_flags",
    "interval_overlap",
    "bfs_hops",
    "otsu_ops",
    "quadtree",
    "pivot_events",
    "profile_orders",
    "multi_detector_dedup",
    "table_diff",
    "incremental_agg",
    "window_dedup",
    "knn_graph",
    "random_walks",
    "m4_downsample",
    "rect_union_area",
    "closest_pair",
    "segment_raster",
    "trajectory_stats",
    "ewma_half",
    "polyline_simplify",
    "move_directions",
    "soundex_blocking",
    "canny_edges",
    "late_events",
    "tree_score",
    # round-5 additions (all >= ~0.3 s measured at sf0.1)
    "late_corrected_windows",
    "epoch_shuffle",
    "rolling_median",
    "hampel_outliers",
    "hits_scores",
    "label_propagation",
    "power_iteration",
    "pushdown_filter",
    "copurchase_topk",
    "grouped_p95",
    "survivorship_dedup",
    "image_dedup_clusters",
    "assoc_rules",
    "modularity",
    "rolling_active_users",
]

# Run once per bench, untimed (correctness smoke only): every entry
# here measured under ~0.3 s at sf0.1 in BENCH_r04 — their n=1 driver
# timings are startup noise, not signal.
SMOKE_QUERIES = [
    "token_quality",
    "dedup_exact",
    "hex_cell_counts",
    "topk_customers",
    "verdict_ladder",
    "stratified_split",
    "trend_slope",
    "ring_simplify",
    "hilbert_order",
    "ring_area_centroid",
    "focal_sum",
    "gram_matrix",
    "convex_hull",
    "auc",
    "json_extract",
    "k_anonymity",
    # round-5 additions measured < 0.3 s at sf0.1
    "phrase_blocklist",
    "top_terms_per_lang",
    "caption_census",
    "dup_ratio_by_source",
    "knn_classify",
]


def _consume(ds) -> int:
    """Stream-consume a Dataset; return row count (no driver materialize
    of payloads — count via block metadata).  Queries returning bounded
    driver-side results (pyarrow Table / pandas DataFrame) count rows
    directly."""
    import pyarrow as pa

    if isinstance(ds, pa.Table):
        return ds.num_rows
    if hasattr(ds, "count"):
        return ds.count()
    return len(ds)


def run_headline(num_cpus: int) -> tuple[int, float]:
    """rows, seconds for the headline spatial-join + tiling pipeline."""
    from osm_replication_rust_ray.pipelines.spatial import (
        assignment_counts,
        flagship_assignments,
    )

    t0 = time.perf_counter()
    width = max(2, num_cpus - max(1, num_cpus // 8))
    ds = flagship_assignments(
        n_rows=HEADLINE_ROWS,
        # autoscaling pool from HALF width (round-3 verdict item #4: a
        # fixed full-width pool made a one-shot cold run pay ~27 actor
        # spawns before the first batch; half width overlaps the rest
        # of the spawns with the first processing wave).  Headroom for
        # the upstream generate tasks stays (pool max < num_cpus).
        concurrency=(max(2, width // 2), width),
        batch_size=8192,
        # enough blocks that actor waves stay balanced (blocks per actor
        # >> 1) without fragmenting into per-task overhead: scale block
        # count with the cluster size, bounded by a minimum block of rows
        parallelism=min(
            max(num_cpus * 8, 16), max(16, HEADLINE_ROWS // 32768)
        ),
    )
    assignment_counts(ds)  # returns the (small) counts DataFrame
    dt = time.perf_counter() - t0
    return HEADLINE_ROWS, dt


def run_suite(reps: int = 3) -> tuple[dict[str, float], dict[str, list]]:
    """``reps`` samples per query (round-2 verdict item #10: n=3, all
    samples recorded so cross-round comparisons can separate noise from
    regression); the headline ``queries`` value stays the best sample —
    the sandbox host is shared and a single reading can be 2x off."""
    from osm_replication_rust_ray.pipelines.queries import QUERIES

    times: dict[str, float] = {}
    samples: dict[str, list] = {}
    for name in BENCH_QUERIES:
        fn, _sql = QUERIES[name]
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            ds = fn(SF_DIR)
            _consume(ds)
            runs.append(round(time.perf_counter() - t0, 3))
        samples[name] = runs
        times[name] = min(runs)
    for name in SMOKE_QUERIES:  # untimed: run once, must not crash
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        _consume(fn(SF_DIR))
        samples[name] = [round(time.perf_counter() - t0, 3)]
    return times, samples


def host_probe(reps: int = 3) -> tuple[list[float], bool]:
    """Quiet-host probe (round-3 verdict item #8, BASELINE.md protocol):
    ``reps`` consecutive 2000x2000 float64 matmuls.  On a quiet host the
    readings are stable (~0.2-1 s depending on BLAS threading); in the
    burst-credit-throttled state they swing by an order of magnitude
    within seconds (measured r3: 3.4 / 4.5 / 0.31 s).  Quiet means all
    samples under an absolute ceiling AND max/min spread under 2x."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((2000, 2000))
    b = rng.standard_normal((2000, 2000))
    a @ b  # warm BLAS / page in
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        a @ b
        times.append(round(time.perf_counter() - t0, 3))
    quiet = max(times) < 2.0 and max(times) / max(min(times), 1e-9) < 2.0
    return times, quiet


_STAGE_RE = None


def _parse_stage_times(stats_text: str) -> dict[str, float]:
    """Per-operator wall seconds out of ``Dataset.stats()`` text.

    Tolerant by design (the format is not a stable API): matches the
    per-operator header lines of the 2.49 summary; on format drift it
    returns {} rather than failing the bench."""
    global _STAGE_RE
    import re

    if _STAGE_RE is None:
        _STAGE_RE = re.compile(
            r"Operator (\d+) ([^:]+?):.*?(?:executed in|produced in)\s*"
            r"([0-9.]+)s",
        )
    out: dict[str, float] = {}
    for m in _STAGE_RE.finditer(stats_text):
        key = f"{m.group(1)}:{m.group(2).strip()}"
        out[key] = round(float(m.group(3)), 3)
    return out


def collect_stage_stats() -> dict[str, dict[str, float]]:
    """One extra (untimed) materializing run per query to harvest
    per-stage wall times (round-2 verdict item #5: prove WHERE time
    goes, so cross-round deltas can be attributed to a stage instead of
    argued about).  Separate from the timed samples: ``materialize()``
    changes the consumption pattern, so these runs are never used for
    the headline numbers."""
    from osm_replication_rust_ray.pipelines.queries import QUERIES

    stages: dict[str, dict[str, float]] = {}
    for name in BENCH_QUERIES:
        fn, _sql = QUERIES[name]
        try:
            ds = fn(SF_DIR)
            if not hasattr(ds, "materialize"):
                continue  # driver-side result (gate queries)
            parsed = _parse_stage_times(ds.materialize().stats())
            if parsed:
                stages[name] = parsed
        except Exception as exc:  # diagnostics must not fail the bench
            stages[name] = {"error": str(exc)[:120]}
    return stages


def main_bench() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    # Suite FIRST, 2M-row headline LAST: this host throttles for
    # ~1-3 min after a sustained burst (BASELINE.md burst-credit
    # mechanism), so running the headline first taxed the early suite
    # queries by 2-4x and made cross-round per-query comparison
    # noise-dominated.  COLD (first run: includes actor-pool worker
    # spawn — what a one-shot driver run sees) and WARM (second run,
    # pre-spawned workers — what a long-lived cluster sees) still
    # emit side by side, per the round-1 verdict's bench-hygiene ask.
    probe_pre, quiet_pre = host_probe()
    queries, samples = run_suite()
    # stage-stats diagnostics run BEFORE the heavy headline so the
    # per-operator walls (cross-round attribution) are not taxed by
    # the post-headline throttle window
    stages = {} if os.environ.get("GRAFT_NO_STAGE_STATS") else collect_stage_stats()
    # let the burst-credit throttle recover before the flagship
    # measurement (BASELINE.md: ~1-3 min of 2-4x slowdown after
    # sustained load; measured r3: headline warm 11.2 s straight after
    # the suite vs 3.3 s decoupled)
    time.sleep(int(os.environ.get("GRAFT_HEADLINE_COOLDOWN_S", "75")))
    probe_head, quiet_head = host_probe()
    cold_s = run_headline(NUM_CPUS)[1]
    warm_s = run_headline(NUM_CPUS)[1]
    headline_s = min(cold_s, warm_s)
    rows = HEADLINE_ROWS
    queries["headline_spatial_tiling"] = round(headline_s, 3)
    total = round(sum(queries.values()), 3)
    # Sidecar for the bulky diagnostics (round-3 verdict item #1: the
    # driver tail-captures ONE line; samples + per-stage maps outgrew it
    # in r3 and made BENCH_r03 unparseable).  The printed line stays
    # compact; everything else goes to BENCH_STAGES.json next to this
    # script.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_STAGES.json"
    )
    with open(sidecar, "w") as f:
        json.dump(
            {
                "samples": samples,
                "stages": stages,
                "host_probe_pre_suite_s": probe_pre,
                "host_probe_pre_headline_s": probe_head,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment suite wall time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "headline_rows": rows,
                "headline_rows_per_s": round(rows / headline_s, 1),
                "headline_cold_s": round(cold_s, 3),
                "headline_cold_rows_per_s": round(rows / cold_s, 1),
                "headline_warm_s": round(warm_s, 3),
                "headline_warm_rows_per_s": round(rows / warm_s, 1),
                "host_quiet": quiet_pre and quiet_head,
                "host_probe_s": probe_pre + probe_head,
            }
        )
    )
    ray.shutdown()


def main_scaling() -> None:
    """Same headline job at two parallelism levels in fresh processes.

    Uses a larger row count than the default bench so per-core compute
    dominates the fixed session/actor-startup overhead — the quantity
    the cluster-scaling criterion is about."""
    scaling_rows = os.environ.get("GRAFT_SCALING_ROWS", "24000000")
    pair = [
        int(x) for x in os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")
    ]
    probe, quiet = host_probe()
    results = {}
    for cpus in pair:
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SF_DIR"] = SF_DIR
        env["GRAFT_HEADLINE_ROWS"] = scaling_rows
        env["GRAFT_PIN_CPUS"] = "1"  # simulate an N-core node
        # best-of-2 FRESH processes per level: single readings on this
        # shared host vary ~15% and would corrupt the efficiency ratio
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, __file__, "--headline-only"],
                capture_output=True,
                text=True,
                env=env,
                check=True,
            )
            line = [
                ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
            ][-1]
            r = json.loads(line)
            if best is None or r["headline_rows_per_s"] > best["headline_rows_per_s"]:
                best = r
        results[cpus] = best
    lo, hi = pair
    t_lo = results[lo]["headline_rows_per_s"]
    t_hi = results[hi]["headline_rows_per_s"]
    eff = (t_hi / t_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency {lo}->{hi} cpus (fresh pinned sessions)",
                "value": round(eff, 3),
                "unit": "efficiency",
                f"rows_per_s_{lo}": t_lo,
                f"rows_per_s_{hi}": t_hi,
                "headline_rows": results[hi]["headline_rows"],
                "sf": SF_DIR,
                "host_quiet": quiet,
                "host_probe_s": probe,
            }
        )
    )


def run_epoch_shuffle(rows: int) -> float:
    """Seconds for the deterministic epoch-shuffle job at ``rows``
    rows: splitmix key -> ONE range-partition sort -> block-count
    carry ranks (pipelines/queries.q_epoch_shuffle's shape on a
    synthetic id table).  The all-to-all SORT primitive — the
    complementary scaling surface to the map/actor-pool-heavy
    headline."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from osm_replication_rust_ray.sources.synth import _mix64

    seed = np.uint64(0x5EED0001)

    def keyed(b: pa.Table) -> pa.Table:
        d = b["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        k = (_mix64(d ^ seed) >> np.uint64(1)).astype(np.int64)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "doc_id": pa.array(d.astype(np.int64),
                                            pa.int64())})

    t0 = time.perf_counter()
    s = rd.range(rows).map_batches(
        keyed, batch_format="pyarrow").sort(["k", "doc_id"]).materialize()
    summ = s.map_batches(
        lambda b: pa.table({
            "tag_k": pa.array([int(b["k"][0].as_py())], pa.int64()),
            "tag_d": pa.array([int(b["doc_id"][0].as_py())], pa.int64()),
            "cnt": pa.array([len(b)], pa.int64()),
        }) if len(b) else pa.table({
            "tag_k": pa.array([], pa.int64()),
            "tag_d": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64())}),
        batch_format="pyarrow", batch_size=None).take_all()
    summ.sort(key=lambda r: (r["tag_k"], r["tag_d"]))
    offsets, acc = {}, 0
    for r in summ:
        offsets[(r["tag_k"], r["tag_d"])] = acc
        acc += r["cnt"]

    def pos(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "epoch_pos": pa.array([], pa.int64())})
        import numpy as _np

        off = offsets[(int(b["k"][0].as_py()),
                       int(b["doc_id"][0].as_py()))]
        return pa.table({
            "doc_id": b["doc_id"],
            "epoch_pos": pa.array(
                off + _np.arange(len(b), dtype=_np.int64), pa.int64()),
        })

    n = s.map_batches(pos, batch_format="pyarrow",
                      batch_size=None).count()
    assert n == rows
    return time.perf_counter() - t0


def main_shuffle_only() -> None:
    import ray

    if os.environ.get("GRAFT_PIN_CPUS"):
        os.sched_setaffinity(0, range(NUM_CPUS))
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    rows = int(os.environ.get("GRAFT_SHUFFLE_ROWS", "24000000"))
    run_epoch_shuffle(200_000)  # warm workers
    dt = min(run_epoch_shuffle(rows) for _ in range(3))
    print(json.dumps({
        "headline_rows": rows, "headline_s": round(dt, 3),
        "headline_rows_per_s": round(rows / dt, 1),
        "num_cpus": NUM_CPUS,
    }))
    ray.shutdown()


def main_shuffle_scaling() -> None:
    """--shuffle-scaling: the --scaling protocol applied to the
    epoch-shuffle job — scaling evidence for the SHUFFLE-bound family
    (range-partition sort all-to-all), complementing the headline's
    map/actor-pool surface.  Extra evidence beyond the north_rule
    criterion; recorded in BASELINE.md."""
    rows = os.environ.get("GRAFT_SHUFFLE_ROWS", "24000000")
    pair = [int(x) for x in
            os.environ.get("GRAFT_SCALING_CPUS", "4,16").split(",")]
    probe, quiet = host_probe()
    results = {}
    for cpus in pair:
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env["GRAFT_SHUFFLE_ROWS"] = rows
        env["GRAFT_PIN_CPUS"] = "1"
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, __file__, "--shuffle-only"],
                capture_output=True, text=True, env=env, check=True)
            line = [ln for ln in out.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            r = json.loads(line)
            if best is None or (r["headline_rows_per_s"]
                                > best["headline_rows_per_s"]):
                best = r
        results[cpus] = best
    lo, hi = pair
    t_lo = results[lo]["headline_rows_per_s"]
    t_hi = results[hi]["headline_rows_per_s"]
    print(json.dumps({
        "metric": f"epoch-shuffle scaling {lo}->{hi} cpus",
        "value": round((t_hi / t_lo) / (hi / lo), 3),
        "unit": "efficiency",
        f"rows_per_s_{lo}": t_lo, f"rows_per_s_{hi}": t_hi,
        "rows": int(rows), "host_quiet": quiet, "host_probe_s": probe,
    }))


def main_headline_only() -> None:
    import ray

    if os.environ.get("GRAFT_PIN_CPUS"):
        # hard-limit this session (ray children inherit affinity) to
        # NUM_CPUS physical cores — local-mode stand-in for an N-core
        # node; without it ray's logical num_cpus does not bound the
        # actual CPU time and the small-N baseline reads too fast
        os.sched_setaffinity(0, range(NUM_CPUS))
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level="ERROR",
    )
    # warmup: spin up Ray workers / import modules so the measured
    # window reflects pipeline throughput, not process cold-start;
    # then best-of-3 to damp executor scheduling noise
    global HEADLINE_ROWS
    real_rows = HEADLINE_ROWS
    HEADLINE_ROWS = 50_000
    run_headline(NUM_CPUS)
    HEADLINE_ROWS = real_rows
    cold = run_headline(NUM_CPUS)[1]  # post-spawn but first full-size run
    dt = min([cold] + [run_headline(NUM_CPUS)[1] for _ in range(2)])
    rows = HEADLINE_ROWS
    print(
        json.dumps(
            {
                "headline_rows": rows,
                "headline_s": round(dt, 3),
                "headline_rows_per_s": round(rows / dt, 1),
                "headline_first_s": round(cold, 3),
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--shuffle-scaling" in sys.argv:
        main_shuffle_scaling()
    elif "--shuffle-only" in sys.argv:
        main_shuffle_only()
    elif "--headline-only" in sys.argv:
        main_headline_only()
    else:
        main_bench()
