"""M4 downsample: packed-argmin first/last vs brute per-bucket walk."""

import numpy as np
import pyarrow as pa


def test_m4_pack_argmin_semantics():
    # packed (rel_ts, id) argmin == lexicographic (ts, id) first
    bucket_us = 1000
    t = np.array([5, 5, 7, 1999, 1000, 1001], np.int64)
    ids = np.array([9, 3, 1, 2, 8, 4], np.int64)
    c = np.array([10, 20, 30, 40, 50, 60], np.int64)
    bucket = t // bucket_us
    pack = (t - bucket * bucket_us) * (1 << 20) + ids
    out = {}
    for b in np.unique(bucket):
        m = bucket == b
        first = c[m][np.argmin(pack[m])]
        last = c[m][np.argmax(pack[m])]
        rows = sorted(zip(t[m], ids[m], c[m]))
        assert first == rows[0][2] and last == rows[-1][2]
        out[int(b)] = (int(c[m].min()), int(c[m].max()), first, last)
    assert out[0] == (10, 30, 20, 30)
    assert out[1] == (40, 60, 50, 40)
