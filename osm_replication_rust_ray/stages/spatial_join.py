"""Payload spatial join — the engine's headline operator (J4 in SURVEY §2).

Assigns every payload row (image+caption with a derived geometry
extent) its polygon-tree paths and 3-way verdicts, replacing the
reference's per-polygon recursive diff fan-out (src/diffs.rs:168-191)
with ONE multi-label pass:

    verdict(row, poly) = keep    extent intersects the exact polygon
                         delete  extent intersects only the buffered one
                         drop    otherwise
    row is ASSIGNED to tree node P iff no ancestor of P dropped it;
    the emitted action is "delete" iff any node on the root→P path
    classified buffer-only (the action-rewrite composition of
    src/osmxml/filter.rs:231,256,294 chained through src/diffs.rs:174-185).

Scale shape (north_rule): a `map_batches` ACTOR POOL — each actor
builds, once in ``__init__``, the packed cell index (polygon covering
cells at adaptive resolution, `cells.cover_multipolygon`) and the
buffered-cover for candidate pruning; per batch, rows probe the index
via their covering cell ranges (vectorized), then only (row, polygon)
candidate pairs run the exact integer predicates.  The polygon set is
broadcast once via ``ray.put`` and read in the constructor — never
re-shipped per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..cells import DEFAULT_RES, LAT_OFFSET, LON_OFFSET, LON_SPAN, cell_res, cell_xy, cover_multipolygon, xy_at_res
from ..functions.strtree import STRtree
from ..geom import (
    BUFFER_DECIMICRO,
    MultiPolygon,
    boxes_intersect_buffered,
    boxes_intersect_multipolygon,
    points_in_buffered,
    points_in_multipolygon,
)


def parent_path(path: str) -> str | None:
    """'./a/b/c' -> './a/b', './a' -> None (tree root)."""
    i = path.rfind("/")
    if i <= 1:
        return None
    return path[:i]


# polygon count past which the packed STRtree (log-depth, O(1) build
# per poly) replaces the Morton-cell covers (O(cover cells) build per
# poly) as the DEFAULT candidate source — measured: cover build is
# ~linear in polys x cells while the tree bulk-load is one argsort
STRTREE_POLYS = 256


class PolyTreeIndex:
    """Cell-bucketed candidate index over a polygon tree (built per actor).

    ``candidates`` picks the candidate source: "cells" (Morton cover
    tables — wins for point probes against a SMALL polygon set),
    "strtree" (packed R-tree over buffered polygon bboxes — wins for
    large polygon sets and giant extents; the north-star's
    "STRtree-backed PIP stage"), or "auto" (strtree from
    ``STRTREE_POLYS`` polygons up).  Both sources yield candidate
    SUPERSETS refined by the same exact predicates, so verdicts are
    identical either way (pinned by tests/test_spatial_join.py)."""

    def __init__(
        self,
        entries: list[tuple[str, MultiPolygon]],
        buffer: int = BUFFER_DECIMICRO,
        res: int = DEFAULT_RES,
        max_cells: int = 4096,
        candidates: str = "auto",
    ):
        self.entries = entries
        self.buffer = buffer
        self.paths = [p for p, _ in entries]
        self.polys = [mp for _, mp in entries]
        self.parent_idx: list[int | None] = []
        path_to_idx = {p: i for i, p in enumerate(self.paths)}
        for p in self.paths:
            # nearest ANCESTOR that has a polygon: file-less directory
            # levels pass the diff through unchanged (src/diffs.rs:174-185)
            par = parent_path(p)
            while par is not None and par not in path_to_idx:
                par = parent_path(par)
            self.parent_idx.append(path_to_idx.get(par) if par else None)
        if candidates not in ("auto", "cells", "strtree"):
            raise ValueError(f"unknown candidate source {candidates!r}")
        self.cand_mode = (
            "strtree"
            if candidates == "strtree"
            or (candidates == "auto" and len(entries) >= STRTREE_POLYS)
            else "cells"
        )
        # candidate index: per cover-res dict (cell -> set of poly idx),
        # covers computed over the polygon EXPANDED by the buffer so
        # delete-zone rows stay candidates.  Skipped entirely in
        # strtree mode — the cover build is the expensive part of actor
        # init and the tree replaces it wholesale.
        self.by_res: dict[int, dict[int, list[int]]] = {}
        if self.cand_mode == "cells":
            for i, mp in enumerate(self.polys):
                exp = _expand_mp_bbox_cover(mp, buffer, res, max_cells)
                for c in exp.tolist():
                    r = int(cell_res([c])[0])
                    self.by_res.setdefault(r, {}).setdefault(c, []).append(i)
        # CSR form per res for vectorized probing: sorted cell keys ->
        # contiguous poly-id spans
        self.res_tables: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
        for r, d in sorted(self.by_res.items()):
            keys = np.array(sorted(d.keys()), dtype=np.int64)
            offs = np.zeros(len(keys) + 1, np.int64)
            ids_parts = []
            for j, c in enumerate(keys.tolist()):
                lst = d[c]
                offs[j + 1] = offs[j] + len(lst)
                ids_parts.append(np.asarray(lst, np.int64))
            pids = (
                np.concatenate(ids_parts) if ids_parts else np.empty(0, np.int64)
            )
            self.res_tables.append((r, keys, offs, pids))
        # STRtree over the BUFFERED polygon bboxes: candidate source for
        # giant extents (bbox overlap is a superset of buffered-polygon
        # intersection, so routing a row through the tree instead of the
        # cell tables preserves the exact downstream verdicts)
        bb = np.array([mp.bbox() for mp in self.polys], np.int64).reshape(-1, 4)
        self._bbox_tree = STRtree(
            bb[:, 0] - buffer, bb[:, 1] - buffer,
            bb[:, 2] + buffer, bb[:, 3] + buffer,
        )
        # CSR edge table over ALL polygons for the pair-segmented PIP
        # kernel (_points_in_polys_pairs): with many candidate polygons
        # per batch, one vectorized pass over the expanded (pair, edge)
        # array replaces ~n_polys small per-poly PIP calls whose FIXED
        # numpy overhead (~0.2 ms each) dominated at 1k polygons.
        self._edge_starts = np.zeros(len(self.polys) + 1, np.int64)
        ring_off = 0
        ex1, ey1, ex2, ey2, ering = [], [], [], [], []
        for i, mp in enumerate(self.polys):
            self._edge_starts[i + 1] = self._edge_starts[i] + len(mp.ex1)
            ex1.append(mp.ex1)
            ey1.append(mp.ey1)
            ex2.append(mp.ex2)
            ey2.append(mp.ey2)
            ering.append(mp.edge_ring_ids() + ring_off)
            ring_off += mp.n_rings
        self._ex1 = np.concatenate(ex1) if ex1 else np.empty(0, np.int64)
        self._ey1 = np.concatenate(ey1) if ey1 else np.empty(0, np.int64)
        self._ex2 = np.concatenate(ex2) if ex2 else np.empty(0, np.int64)
        self._ey2 = np.concatenate(ey2) if ey2 else np.empty(0, np.int64)
        self._ering = (
            np.concatenate(ering).astype(np.int64)
            if ering else np.empty(0, np.int64)
        )
        self._elox = np.minimum(self._ex1, self._ex2)
        self._ehix = np.maximum(self._ex1, self._ex2)
        self._eloy = np.minimum(self._ey1, self._ey2)
        self._ehiy = np.maximum(self._ey1, self._ey2)
        self._eup = (
            (self._ey2 > self._ey1).astype(np.int8)
            - (self._ey2 < self._ey1).astype(np.int8)
        )
        # ancestor bitmasks (multi-word for >64 polys) for vectorized
        # tree chaining: anc = ancestors only, path = ancestors | self
        n_polys = len(self.polys)
        self._n_words = max(1, (n_polys + 63) // 64)
        self._anc_mask = np.zeros((n_polys, self._n_words), np.uint64)
        self._path_mask = np.zeros((n_polys, self._n_words), np.uint64)
        for p in range(n_polys):
            a = self.parent_idx[p]
            while a is not None:
                self._anc_mask[p, a // 64] |= np.uint64(1 << (a % 64))
                a = self.parent_idx[a]
            self._path_mask[p] = self._anc_mask[p]
            self._path_mask[p, p // 64] |= np.uint64(1 << (p % 64))

    def candidate_pairs(self, minlon, minlat, maxlon, maxlat):
        """-> (row_idx, poly_idx) candidate pairs, deduplicated.

        Fully vectorized for rows whose extent falls in ONE cover cell
        per resolution (the overwhelming case: points and small boxes);
        multi-cell extents take a small Python fallback.
        """
        minlon = np.asarray(minlon, np.int64)
        minlat = np.asarray(minlat, np.int64)
        maxlon = np.asarray(maxlon, np.int64)
        maxlat = np.asarray(maxlat, np.int64)
        n = len(minlon)
        if self.cand_mode == "strtree":
            # tree over BUFFERED poly bboxes -> closed-interval overlap
            # is a superset of (buffered) polygon intersection; pairs
            # are unique by construction (one visit per (query, leaf))
            return self._bbox_tree.query(minlon, minlat, maxlon, maxlat)
        pair_rows: list[np.ndarray] = []
        pair_polys: list[np.ndarray] = []
        giant_any = np.zeros(n, bool)
        for r, keys, offs, pids in self.res_tables:
            if not len(keys):
                continue
            x0, y0 = xy_at_res(minlon, minlat, r)
            x1, y1 = xy_at_res(maxlon, maxlat, r)
            sx = x1 - x0 + 1
            sy = y1 - y0 + 1
            span = sx * sy
            # giant extents (rare) would explode the cell probe set:
            # route them through the packed STRtree over buffered poly
            # bboxes instead (below) — a conservative superset, refined
            # by the exact predicates downstream
            giant = span > 256
            if giant.any():
                giant_any |= giant
                span = np.where(giant, 0, span)
                sx = np.where(giant, 1, sx)
            # vectorized probe of every (row, cover-cell) combination:
            # rows repeated by their span, offsets unrolled arange-style
            total = int(span.sum())
            if total == 0:
                continue
            rep = np.repeat(np.arange(n), span)
            cum = np.cumsum(span)
            k = np.arange(total) - np.repeat(cum - span, span)
            rsx = np.repeat(sx, span)
            X = np.repeat(x0, span) + k % rsx
            Y = np.repeat(y0, span) + k // rsx
            cells = _morton_vec(X, Y, r)
            pos = np.searchsorted(keys, cells)
            posc = np.clip(pos, 0, len(keys) - 1)
            hit = keys[posc] == cells
            hrows, hpos = rep[hit], posc[hit]
            counts = offs[hpos + 1] - offs[hpos]
            tot2 = int(counts.sum())
            if tot2:
                starts = offs[hpos]
                cum2 = np.cumsum(counts)
                idx = (
                    np.arange(tot2)
                    - np.repeat(cum2 - counts, counts)
                    + np.repeat(starts, counts)
                )
                pair_rows.append(np.repeat(hrows, counts))
                pair_polys.append(pids[idx])
        if giant_any.any():
            g = np.nonzero(giant_any)[0]
            tq, tp = self._bbox_tree.query(
                minlon[g], minlat[g], maxlon[g], maxlat[g]
            )
            pair_rows.append(g[tq])
            pair_polys.append(tp)
        if not pair_rows:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        row_i = np.concatenate(pair_rows)
        poly_i = np.concatenate(pair_polys)
        # dedupe (row, poly)
        key = row_i * np.int64(len(self.polys)) + poly_i
        uniq = np.unique(key)
        return uniq // len(self.polys), uniq % len(self.polys)

    def candidates(self, minlon, minlat, maxlon, maxlat) -> list[np.ndarray]:
        """Per row: array of candidate polygon indices (compat shim)."""
        n = len(minlon)
        row_i, poly_i = self.candidate_pairs(minlon, minlat, maxlon, maxlat)
        out: list[np.ndarray] = [np.empty(0, np.int64)] * n
        if len(row_i):
            order = np.argsort(row_i, kind="stable")
            row_s, poly_s = row_i[order], poly_i[order]
            starts = np.searchsorted(row_s, np.arange(n))
            ends = np.searchsorted(row_s, np.arange(n), side="right")
            for i in range(n):
                if ends[i] > starts[i]:
                    out[i] = poly_s[starts[i] : ends[i]]
        return out

    def _points_in_polys_pairs(self, px, py, poly_i,
                               chunk_edges: int = 1 << 19) -> np.ndarray:
        """Boundary-inclusive PIP per (point, polygon) PAIR, one
        vectorized pass: each pair expands to its polygon's CSR edge
        slice; boundary/crossing predicates run on the flat expanded
        array; per-(pair, ring) parity folds back with reduceat +
        bincount.  Exactly geom.points_in_multipolygon's semantics
        (same _det_sign exact-fallback), restructured so the cost is
        O(total candidate edges), not O(candidate polygons) numpy-call
        overhead."""
        from ..geom import _det_sign

        npairs = len(poly_i)
        out = np.zeros(npairs, bool)
        if npairs == 0:
            return out
        ecnt = self._edge_starts[poly_i + 1] - self._edge_starts[poly_i]
        # chunk by pairs so the expanded array stays bounded (each
        # chunk ends at the pair whose cumulative edge count crosses
        # the next chunk_edges multiple)
        cum_all = np.cumsum(ecnt)
        n_chunks = max(1, int(-(-int(cum_all[-1]) // chunk_edges)))
        cutpos = np.searchsorted(
            cum_all, np.arange(1, n_chunks, dtype=np.int64) * chunk_edges,
            side="left",
        ) + 1
        cuts = np.unique(
            np.concatenate(([0], cutpos, [npairs]))
        ).tolist()
        for s, e in zip(cuts[:-1], cuts[1:]):
            cnt = ecnt[s:e]
            total = int(cnt.sum())
            if total == 0:
                continue
            rep = np.repeat(np.arange(e - s), cnt)
            cum = np.cumsum(cnt)
            k = np.arange(total) - np.repeat(cum - cnt, cnt)
            eidx = np.repeat(self._edge_starts[poly_i[s:e]], cnt) + k
            P = px[s:e][rep]
            Q = py[s:e][rep]
            x1, y1 = self._ex1[eidx], self._ey1[eidx]
            x2, y2 = self._ex2[eidx], self._ey2[eidx]
            inbox = (
                (P >= self._elox[eidx]) & (P <= self._ehix[eidx])
                & (Q >= self._eloy[eidx]) & (Q <= self._ehiy[eidx])
            )
            sgn0 = _det_sign(x2 - x1, Q - y1, P - x1, y2 - y1)
            on_b = inbox & (sgn0 == 0)
            cond = (y1 > Q) != (y2 > Q)
            crossing = cond & (sgn0 == self._eup[eidx])
            # per-(pair, ring) parity: ring edges are contiguous within
            # a pair's expanded slice, so segment boundaries are where
            # (pair, ring) changes
            ring = self._ering[eidx]
            bound = np.flatnonzero(
                np.concatenate(
                    ([True], (rep[1:] != rep[:-1]) | (ring[1:] != ring[:-1]))
                )
            )
            parity = np.add.reduceat(crossing.astype(np.int64), bound) % 2
            seg_pair = rep[bound]
            inside = np.bincount(
                seg_pair, weights=parity, minlength=e - s
            ) > 0
            onb = np.bincount(
                rep, weights=on_b.astype(np.int64), minlength=e - s
            ) > 0
            out[s:e] = inside | onb
        return out

    def verdicts(self, minlon, minlat, maxlon, maxlat):
        """-> (row_idx, poly_idx, verdict) arrays for assigned pairs.

        Vectorized: per-polygon exact/buffered predicates over its
        candidate rows, then bitmask tree-chaining (assigned iff every
        ancestor non-drop; action delete iff any delete on the path)."""
        minlon = np.asarray(minlon, np.int64)
        minlat = np.asarray(minlat, np.int64)
        maxlon = np.asarray(maxlon, np.int64)
        maxlat = np.asarray(maxlat, np.int64)
        n = len(minlon)
        row_i, poly_i = self.candidate_pairs(minlon, minlat, maxlon, maxlat)
        # sort candidates by polygon so each polygon's rows are one
        # contiguous segment — the per-poly masking below is a slice,
        # not an O(candidates) == scan per polygon (matters from ~1k
        # polygons up, where the scan is O(polys x candidates))
        if len(poly_i):
            seg_order = np.argsort(poly_i, kind="stable")
            row_i, poly_i = row_i[seg_order], poly_i[seg_order]
        vc = np.zeros(len(row_i), np.int8)  # 0 drop, 1 delete, 2 keep
        is_point = (minlon[row_i] == maxlon[row_i]) & (minlat[row_i] == maxlat[row_i])
        # point extents (the majority): ONE pair-segmented exact-PIP
        # pass across every (point, polygon) candidate — no per-poly
        # numpy-call overhead (matters at 1k polygons)
        pidx = np.flatnonzero(is_point)
        if len(pidx):
            exact_p = self._points_in_polys_pairs(
                minlon[row_i[pidx]], minlat[row_i[pidx]], poly_i[pidx]
            )
            vc[pidx[exact_p]] = 2
            if self.buffer > 0:
                # buffered refine only for the non-exact remainder,
                # per-poly (each segment contiguous: pidx ascending
                # over poly-sorted pairs).  buffer==0 adds nothing —
                # distance-0 points are already boundary-inclusive.
                todo = pidx[~exact_p]
                tp = poly_i[todo]
                t_starts = np.flatnonzero(
                    np.concatenate(([len(tp) > 0], tp[1:] != tp[:-1]))
                )
                t_ends = np.concatenate((t_starts[1:], [len(todo)]))
                for s0, s1 in zip(t_starts.tolist(), t_ends.tolist()):
                    sel = todo[s0:s1]
                    rows = row_i[sel]
                    buf = points_in_buffered(
                        minlon[rows], minlat[rows], self.polys[int(tp[s0])],
                        buffer=self.buffer,
                    )
                    vc[sel[buf]] = 1
        # box extents: per-poly exact/buffered rectangle predicates,
        # looping ONLY over polygons that actually have box candidates
        bidx = np.flatnonzero(~is_point)
        if len(bidx):
            bp = poly_i[bidx]  # ascending (pairs sorted by poly)
            b_starts = np.flatnonzero(
                np.concatenate(([True], bp[1:] != bp[:-1]))
            )
            b_ends = np.concatenate((b_starts[1:], [len(bidx)]))
            for s0, s1 in zip(b_starts.tolist(), b_ends.tolist()):
                sel = bidx[s0:s1]
                mp = self.polys[int(bp[s0])]
                rows = row_i[sel]
                exact = boxes_intersect_multipolygon(
                    minlon[rows], minlat[rows], maxlon[rows], maxlat[rows], mp
                )
                buf = exact.copy()
                todo = ~exact
                if todo.any():
                    buf[todo] = boxes_intersect_buffered(
                        minlon[rows][todo],
                        minlat[rows][todo],
                        maxlon[rows][todo],
                        maxlat[rows][todo],
                        mp,
                        buffer=self.buffer,
                    )
                vc[sel] = np.where(exact, 2, np.where(buf, 1, 0)).astype(np.int8)
        nonzero = vc > 0
        row_i, poly_i, vc = row_i[nonzero], poly_i[nonzero], vc[nonzero]
        # per-row assigned/delete bitmasks (multi-word)
        W = self._n_words
        assigned = np.zeros((n, W), np.uint64)
        deleted = np.zeros((n, W), np.uint64)
        word = (poly_i // 64).astype(np.int64)
        bit = np.uint64(1) << (poly_i % 64).astype(np.uint64)
        np.bitwise_or.at(assigned, (row_i, word), bit)
        dmask = vc == 1
        np.bitwise_or.at(deleted, (row_i[dmask], word[dmask]), bit[dmask])
        anc = self._anc_mask[poly_i]  # (m, W)
        path = self._path_mask[poly_i]
        ok = np.all((assigned[row_i] & anc) == anc, axis=1)
        any_del = np.any((deleted[row_i] & path) != 0, axis=1)
        row_o, poly_o, del_o = row_i[ok], poly_i[ok], any_del[ok]
        order = np.lexsort((poly_o, row_o))  # deterministic output order
        verdicts = np.where(del_o[order], "delete", "keep")
        return row_o[order], poly_o[order], verdicts.tolist()


def _morton(x: int, y: int, res: int) -> int:
    from ..cells import cell_from_xy

    return int(cell_from_xy(np.array([x]), np.array([y]), res)[0])


def _morton_vec(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    from ..cells import cell_from_xy

    return cell_from_xy(x, y, res)


def _expand_mp_bbox_cover(mp: MultiPolygon, buffer: int, res: int, max_cells: int):
    """Covering cells of the buffered polygon: cover cells whose rect is
    within ``buffer`` of the polygon (uses the buffered box predicate)."""
    minx, miny, maxx, maxy = mp.bbox()
    minx, miny = minx - buffer, miny - buffer
    maxx, maxy = maxx + buffer, maxy + buffer
    use = res
    while True:
        x0, y0 = xy_at_res([max(minx, -LON_OFFSET)], [max(miny, -LAT_OFFSET)], use)
        x1, y1 = xy_at_res([min(maxx, LON_OFFSET)], [min(maxy, LAT_OFFSET)], use)
        n = (int(x1[0]) - int(x0[0]) + 1) * (int(y1[0]) - int(y0[0]) + 1)
        if n <= max_cells or use == 0:
            break
        use -= 1
    xs = np.arange(int(x0[0]), int(x1[0]) + 1)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1)
    gx, gy = np.meshgrid(xs, ys)
    gx, gy = gx.ravel(), gy.ravel()
    den = np.int64(1 << use)
    minlon = (gx * LON_SPAN) // den - LON_OFFSET
    maxlon = ((gx + 1) * LON_SPAN) // den - LON_OFFSET
    minlat = (gy * LON_SPAN) // den - LAT_OFFSET
    maxlat = ((gy + 1) * LON_SPAN) // den - LAT_OFFSET
    hit = boxes_intersect_buffered(minlon, minlat, maxlon, maxlat, mp, buffer=buffer)
    from ..cells import cell_from_xy

    return cell_from_xy(gx[hit], gy[hit], use)


class SpatialJoinActor:
    """`map_batches` actor: payload batch (with extent columns) ->
    assignments (image_id, poly_path, verdict).

    Constructor takes either the entries list directly or a
    ``ray.ObjectRef`` to it (broadcast once with ``ray.put``)."""

    def __init__(self, entries_or_ref, buffer: int = BUFFER_DECIMICRO,
                 res: int = DEFAULT_RES):
        import ray

        entries = (
            ray.get(entries_or_ref)
            if isinstance(entries_or_ref, ray.ObjectRef)
            else entries_or_ref
        )
        self.index = PolyTreeIndex(entries, buffer=buffer, res=res)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows, polys, verdicts = self.index.verdicts(
            batch["minlon"].to_numpy(zero_copy_only=False),
            batch["minlat"].to_numpy(zero_copy_only=False),
            batch["maxlon"].to_numpy(zero_copy_only=False),
            batch["maxlat"].to_numpy(zero_copy_only=False),
        )
        ids = batch["image_id"].take(pa.array(rows))
        paths = pa.array([self.index.paths[p] for p in polys.tolist()], pa.string())
        return pa.table(
            {
                "image_id": ids,
                "poly_path": paths,
                "verdict": pa.array(verdicts, pa.string()),
            }
        )
