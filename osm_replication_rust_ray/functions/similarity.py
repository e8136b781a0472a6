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
