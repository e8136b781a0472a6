"""Sequence packing (functions/pack.py): exact parity with a plain
cumsum reference, including the cross-block carry path."""
import numpy as np
import pyarrow as pa

from osm_replication_rust_ray.functions.pack import pack_sequences


def _ref(ids, counts, budget):
    order = np.argsort(ids)
    pre = np.concatenate(([0], np.cumsum(np.array(counts)[order])[:-1]))
    out = {}
    for i, oi in enumerate(order):
        p = int(pre[i])
        out[int(ids[oi])] = (
            p // budget, p % budget, p % budget + counts[oi] > budget
        )
    return out


def test_pack_sequences_multiblock(ray_session):
    import ray.data as rd

    rs = np.random.RandomState(3)
    n = 5000
    ids = rs.permutation(n) * 7 + 1  # unique, unsorted input order
    counts = rs.randint(1, 900, n)
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        )
    ).repartition(23)  # force many blocks through the sort + carry walk
    out = pack_sequences(ds, "doc_id", "n_tokens", 512).take_all()
    assert len(out) == n
    want = _ref(ids, counts, 512)
    for r in out:
        assert (r["bin_id"], r["bin_offset"], r["spans_bins"]) == want[r["doc_id"]]
    # bins are dense: every bin id in [0, max] appears or is spanned
    total = int(counts.sum())
    assert max(r["bin_id"] for r in out) <= total // 512
