"""Similarity search over an embedding column (training-data ops).

- ``TopKCosineActor``: brute-force cosine top-k of each corpus row
  against a broadcast query matrix (numpy matmul per batch).  This is
  Ray-Data-shaped for scale: the QUERY side is the small broadcast
  (ray.put once, read per actor), the CORPUS streams through
  map_batches, and the global top-k per query is a final small
  groupby-reduce over per-block partial top-ks — the corpus is never
  materialized.
- ``lsh_bucket_ids``: random-hyperplane sign buckets for the LSH/IVF
  scale path — bucket the corpus once, then probe only matching buckets
  (plus neighbors by Hamming-1 probes) per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import normalize_rows


class TopKCosineActor:
    """map_batches actor: corpus batch -> partial top-k rows per query.

    Output rows: (query_id, vec_id, sim) of this block's best k per
    query; a downstream groupby(query_id).map_groups merge keeps the
    global top-k. Deterministic tie-break: higher sim first, then lower
    vec_id.
    """

    def __init__(self, queries_ref, k: int = 5):
        import ray

        qids, qmat = (
            ray.get(queries_ref)
            if isinstance(queries_ref, ray.ObjectRef)
            else queries_ref
        )
        self.qids = np.asarray(qids, np.int64)
        self.qmat = normalize_rows(qmat)  # (Q, D)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        c = normalize_rows(np.asarray(batch["embedding"].to_pylist(), np.float64))
        cids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = self.qmat @ c.T  # (Q, B)
        k = min(self.k, sims.shape[1])
        # per query: partial top-k of this block (sim desc, vec_id asc)
        order = np.lexsort((cids[None, :].repeat(len(self.qids), 0), -sims), axis=1)
        top = order[:, :k]
        qcol = np.repeat(self.qids, k)
        vcol = cids[top.reshape(-1)]
        scol = np.take_along_axis(sims, top, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qcol, pa.int64()),
                "vec_id": pa.array(vcol, pa.int64()),
                "sim": pa.array(scol, pa.float64()),
            }
        )


def topk_merge(k: int):
    """map_groups fn merging partial top-ks -> global top-k with rank."""

    def merge(group: pa.Table) -> pa.Table:
        sims = group["sim"].to_numpy(zero_copy_only=False)
        vids = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, -sims))[:k]
        return pa.table(
            {
                "query_id": group["query_id"].take(pa.array(order)),
                "vec_id": pa.array(vids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return merge


def ann_topk_dataset(corpus_ds, queries: tuple[np.ndarray, np.ndarray], k: int = 5,
                     concurrency: int | tuple = 2, batch_size: int = 4096):
    """corpus Dataset (vec_id, embedding) -> global top-k Dataset."""
    import ray

    ref = ray.put(queries)
    partial = corpus_ds.map_batches(
        TopKCosineActor,
        fn_constructor_args=(ref, k),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return partial.groupby("query_id").map_groups(
        topk_merge(k), batch_format="pyarrow"
    )


# ---------------- IVF (k-means coarse quantizer) scale path ----------------

def kmeans_fit(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors -> (k, D)
    centroids. Runs on a driver-side SAMPLE (the coarse quantizer is
    tiny); assignment of the full corpus stays distributed."""
    x = normalize_rows(np.asarray(sample, np.float64))
    rng = np.random.RandomState(seed)
    init = rng.permutation(len(x))[:k]
    cent = x[init].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[j] = v / n
    return cent


def ivf_assign(mat: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """Nearest-centroid id per row (cosine)."""
    sims = normalize_rows(np.asarray(mat, np.float64)) @ centroids.T
    return np.argmax(sims, axis=1).astype(np.int64)


# ---------------- LSH sign-bucket scale path ----------------

def hyperplanes(dim: int, n_bits: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_bits))


def lsh_bucket_ids(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id (int64) per row."""
    signs = (np.asarray(mat, np.float64) @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return signs.astype(np.int64) @ weights


def lsh_bits_for(n_rows: int, target_occ: int = 256,
                 lo: int = 6, hi: int = 30) -> int:
    """Bucket-bit count scaled to corpus size: ~``target_occ`` rows per
    bucket in expectation (round-1 verdict: a FIXED n_bits makes the
    bucket self-join quadratic in occupancy — at 1e12 rows 64 buckets
    hold ~1e10 vectors each).  n_bits grows with log2(N)."""
    import math

    if n_rows <= target_occ:
        return lo
    return int(min(hi, max(lo, math.ceil(math.log2(n_rows / target_occ)))))


def centered_sub_bits(mat: np.ndarray, rep_buckets: np.ndarray,
                      rows: np.ndarray, hot_means: dict[int, np.ndarray],
                      planes_r: np.ndarray) -> np.ndarray:
    """Per-EMIT sub-bucket bits for hot-bucket re-splitting.

    Sub-bits are sign patterns of ``(x - mean_b) @ planes_r`` — planes
    through the hot bucket's own centroid.  Global (uncentered) planes
    cannot split a tight cluster: every member's sign is dominated by
    the shared center, so all land in one sub-bucket; centering makes
    the signs follow the within-cluster deviations instead.  The loop
    is over HOT buckets present in the batch (few by construction).
    """
    sub = np.zeros(len(rows), np.int64)
    for hb, mu in hot_means.items():
        m = rep_buckets == hb
        if m.any():
            sub[m] = lsh_bucket_ids(mat[rows[m]] - mu, planes_r)
    return sub


def resplit_keys(rep_buckets: np.ndarray, rows: np.ndarray,
                 sub_bits: np.ndarray, hot: np.ndarray, r: int):
    """Hot-bucket re-split of a multi-probe emit list.

    ``rep_buckets``/``rows``: the (emit -> base bucket, emit -> source
    row) arrays of a Hamming-1 probe expansion; ``sub_bits`` is per
    EMIT (see :func:`centered_sub_bits`).  Emits whose bucket is NOT in
    ``hot`` keep one entry with key ``bucket << r``; emits into a hot
    bucket fan out over ``r`` extra sign bits (their own Hamming-1
    probes included) so occupancy drops ~2^r.  Pairs inside a hot
    bucket differing in >=2 extra bits are missed — the standard
    multi-probe recall trade, pinned by the recall tests.

    Returns (keys, rows) arrays for the final emit table.
    """
    if hot.size == 0 or r == 0:
        return rep_buckets, rows
    ishot = np.isin(rep_buckets, hot)
    cold_keys = rep_buckets[~ishot] << r
    cold_rows = rows[~ishot]
    hb = rep_buckets[ishot] << r
    hrows = rows[ishot]
    hsub = sub_bits[ishot]
    key_parts = [cold_keys, hb | hsub]
    row_parts = [cold_rows, hrows]
    for j in range(r):
        key_parts.append(hb | (hsub ^ (1 << j)))
        row_parts.append(hrows)
    return np.concatenate(key_parts), np.concatenate(row_parts)
