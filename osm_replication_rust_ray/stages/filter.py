"""Polygon diff filter — engine form of OsmXmlFilter (src/osmxml/filter.rs).

Classifies every diff element into a 3-way verdict against one polygon:

    keep    — geometry evidence inside the EXACT polygon (action kept)
    delete  — evidence only inside the 0.1°-BUFFERED polygon (action
              rewritten to "delete", src/osmxml/filter.rs:231,256,294)
    drop    — no evidence (row absent from output); ways/relations with
              no bbox annotation are silently dropped
              (src/osmxml/filter.rs:238-243,267-272)

Two layers:

1.  **Vectorized geometry precompute** (the hot path, numpy over Arrow
    columns): point-in-polygon for every diff node's NEW position and
    every needed store node's OLD position, against the exact and
    buffered polygons, plus the bbox-vs-buffered-polygon prefilter for
    ways/relations.  At planet scale this is the distributed part —
    `map_batches` over the diff + the store semi-join.

2.  **Per-diff evidence automaton** mirroring the reference's
    sequential memo sets (`PolyInfo::*_seen_in_poly`,
    src/osmxml/filter.rs:13-18) and `Iterator::any` short-circuit,
    consuming only precomputed booleans.  A minute diff is bounded (the
    reference holds these sets in RAM too), so this pass is cheap; it
    also reproduces the reference's store-lookup counts exactly
    (50 nodes / 7 ways / 2 relations on the saint_barthelemy fixture,
    src/osmxml/filter.rs:390-392).

The polygon-tree driver (`filter_tree`) replaces the reference's
recursive rayon fan-out (src/diffs.rs:168-191): each child filter runs
on its parent's OUTPUT rows; geometry memberships are computed once per
polygon and reused down the tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import (
    points_in_buffered_chordal,
    BUFFER_DECIMICRO,
    MultiPolygon,
    boxes_intersect_buffered,
    boxes_intersect_multipolygon,
    points_in_buffered,
    points_in_multipolygon,
)
from ..sources.store import Resolver


@dataclass
class PolyMembership:
    """Precomputed geometry memberships for one polygon over one diff."""

    # diff node NEW positions, keyed by row position in the elements table
    new_in_exact: dict[int, bool]
    new_in_buffered: dict[int, bool]
    # store OLD node positions, keyed by node id (only ids found in store)
    old_in_exact: dict[int, bool]
    old_in_buffered: dict[int, bool]
    # bbox-vs-buffered-poly gate per row position (ways/relations with bbox)
    bbox_hits_buffered: dict[int, bool]


def precompute_membership(
    elements: pa.Table,
    mp: MultiPolygon,
    resolver: Resolver,
    node_ids: np.ndarray,
    buffer: int = BUFFER_DECIMICRO,
    buffer_mode: str = "chordal",
) -> PolyMembership:
    """Vectorized PIP + bbox tests for one polygon.

    ``node_ids``: the needed-id closure (diff node ids ∪ way refs ∪
    relation-member closure) whose OLD store positions may be probed.

    ``buffer_mode``: "chordal" (the DEFAULT — GEOS quadrant-segment
    parity, geom.points_in_buffered_chordal, matches the reference's
    buffer(0.1, 8), src/osmxml/filter.rs:44-56, so keep/delete
    verdicts agree with the Rust binary even for points in the
    chord/arc gap band) or "euclidean" (exact round-join dilation,
    the documented engine alternative).  The bbox prefilter stays
    Euclidean in both modes: it only gates candidacy and
    Euclidean ⊇ chordal keeps it a valid superset."""
    in_buffered_fn = (
        points_in_buffered_chordal if buffer_mode == "chordal"
        else points_in_buffered
    )
    etype = np.asarray(elements["etype"])
    pos = elements["pos"].to_numpy(zero_copy_only=False)
    nmask = etype == "node"
    new_in_exact: dict[int, bool] = {}
    new_in_buffered: dict[int, bool] = {}
    if nmask.any():
        lat = elements["lat"].to_numpy(zero_copy_only=False)[nmask].astype(np.int64)
        lon = elements["lon"].to_numpy(zero_copy_only=False)[nmask].astype(np.int64)
        ex = points_in_multipolygon(lon, lat, mp)
        bf = in_buffered_fn(lon, lat, mp, buffer=buffer)
        for p, e, b in zip(pos[nmask].tolist(), ex.tolist(), bf.tolist()):
            new_in_exact[p] = e
            new_in_buffered[p] = b
    # old store positions
    old_in_exact: dict[int, bool] = {}
    old_in_buffered: dict[int, bool] = {}
    node_ids = np.asarray(node_ids, np.int64)
    if len(node_ids):
        found, olat, olon = resolver.read_nodes(node_ids)
        resolver.num_read_nodes -= len(node_ids)  # precompute is not a "read"
        f = np.nonzero(found)[0]
        if len(f):
            ex = points_in_multipolygon(olon[f], olat[f], mp)
            bf = in_buffered_fn(olon[f], olat[f], mp, buffer=buffer)
            for nid, e, b in zip(node_ids[f].tolist(), ex.tolist(), bf.tolist()):
                old_in_exact[nid] = e
                old_in_buffered[nid] = b
    # bbox gate for ways/relations that carry a bbox annotation
    bbox_hits: dict[int, bool] = {}
    wr = ~nmask
    if wr.any():
        minlat = elements["minlat"].to_numpy(zero_copy_only=False)[wr]
        valid = ~np.isnan(minlat.astype(np.float64))
        if valid.any():
            sub_pos = pos[wr][valid].tolist()
            mnlat = minlat[valid].astype(np.int64)
            mxlat = elements["maxlat"].to_numpy(zero_copy_only=False)[wr][valid].astype(np.int64)
            mnlon = elements["minlon"].to_numpy(zero_copy_only=False)[wr][valid].astype(np.int64)
            mxlon = elements["maxlon"].to_numpy(zero_copy_only=False)[wr][valid].astype(np.int64)
            hits = boxes_intersect_buffered(mnlon, mnlat, mxlon, mxlat, mp, buffer=buffer)
            for p, h in zip(sub_pos, hits.tolist()):
                bbox_hits[p] = bool(h)
    return PolyMembership(new_in_exact, new_in_buffered, old_in_exact, old_in_buffered, bbox_hits)


@dataclass
class _PolySets:
    """One PolyInfo's memo sets (src/osmxml/filter.rs:13-18)."""

    nodes_seen: set = field(default_factory=set)
    ways_seen: set = field(default_factory=set)
    relations_seen: set = field(default_factory=set)


class _Automaton:
    """Sequential evidence machine for ONE polygon over one diff's rows.

    ``exact=True`` consults exact-poly memberships, else buffered."""

    def __init__(self, memb: PolyMembership, resolver: Resolver):
        self.memb = memb
        self.resolver = resolver
        self.exact_sets = _PolySets()
        self.buff_sets = _PolySets()

    # ---- PolyInfo::node_in_poly (src/osmxml/filter.rs:118-131)
    def node_in_poly(self, sets: _PolySets, old_map: dict, nid: int) -> bool:
        if nid in sets.nodes_seen:
            return True
        self.resolver.num_read_nodes += 1
        hit = old_map.get(nid)  # None = store miss
        if hit:
            sets.nodes_seen.add(nid)
            return True
        return False

    def nodes_in_poly(self, sets, old_map, refs) -> bool:
        return any(self.node_in_poly(sets, old_map, int(r)) for r in refs)

    # ---- PolyInfo::way_in_poly (src/osmxml/filter.rs:135-148)
    def way_in_poly(self, sets, old_map, wid: int) -> bool:
        if wid in sets.ways_seen:
            return True
        refs = self.resolver.read_way(wid)
        if refs is not None and self.nodes_in_poly(sets, old_map, refs):
            sets.ways_seen.add(wid)
            return True
        return False

    # ---- PolyInfo::members_in_poly / relation_in_poly
    #      (src/osmxml/filter.rs:149-192)
    def members_in_poly(self, sets, old_map, members, prev: list[int]) -> bool:
        for m in members:
            t, r = m["type"], int(m["ref"])
            if t == "node":
                if self.node_in_poly(sets, old_map, r):
                    return True
            elif t == "way":
                if self.way_in_poly(sets, old_map, r):
                    return True
            elif t == "relation":
                if r in prev:
                    continue  # recursion dropped (src/osmxml/filter.rs:158-165)
                if self.relation_in_poly(sets, old_map, r, prev + [r]):
                    return True
            else:  # pragma: no cover
                raise ValueError(f"Unsupported relation member: {m}")
        return False

    def relation_in_poly(self, sets, old_map, rid: int, prev: list[int]) -> bool:
        if rid in sets.relations_seen:
            return True
        members = self.resolver.read_relation(rid)
        if members is not None and self.members_in_poly(sets, old_map, members, prev):
            sets.relations_seen.add(rid)
            return True
        return False

    # ---- update_node ladder (src/osmxml/filter.rs:219-236)
    def verdict_node(self, p: int, nid: int) -> str:
        new_buf = self.memb.new_in_buffered.get(p, False)
        in_buffered = new_buf or self.node_in_poly(
            self.buff_sets, self.memb.old_in_buffered, nid
        )
        if not in_buffered:
            return "drop"
        if self.memb.new_in_exact.get(p, False):
            self.exact_sets.nodes_seen.add(nid)
            self.buff_sets.nodes_seen.add(nid)
            return "keep"
        self.buff_sets.nodes_seen.add(nid)
        return "delete"

    # ---- update_way ladder (src/osmxml/filter.rs:237-261)
    def verdict_way(self, p: int, wid: int, refs) -> str:
        if not self.memb.bbox_hits_buffered.get(p, False):
            return "drop"
        refs = refs if refs is not None else []
        if self.nodes_in_poly(self.exact_sets, self.memb.old_in_exact, refs):
            self.exact_sets.ways_seen.add(wid)
            self.buff_sets.ways_seen.add(wid)
            return "keep"
        if self.nodes_in_poly(
            self.buff_sets, self.memb.old_in_buffered, refs
        ) or self.way_in_poly(self.buff_sets, self.memb.old_in_buffered, wid):
            self.buff_sets.ways_seen.add(wid)
            return "delete"
        return "drop"

    # ---- update_relation ladder (src/osmxml/filter.rs:262-299)
    def verdict_relation(self, p: int, rid: int, members) -> str:
        if not self.memb.bbox_hits_buffered.get(p, False):
            return "drop"
        members = members if members is not None else []
        if self.members_in_poly(self.exact_sets, self.memb.old_in_exact, members, []):
            self.exact_sets.relations_seen.add(rid)
            self.buff_sets.relations_seen.add(rid)
            return "keep"
        if self.members_in_poly(
            self.buff_sets, self.memb.old_in_buffered, members, []
        ) or self.relation_in_poly(self.buff_sets, self.memb.old_in_buffered, rid, []):
            self.buff_sets.relations_seen.add(rid)
            return "delete"
        return "drop"


def filter_verdicts(
    elements: pa.Table, memb: PolyMembership, resolver: Resolver
) -> np.ndarray:
    """Per-row verdict array ('keep'|'delete'|'drop') in table order.

    Reference-parity path: every element goes through the sequential
    automaton, reproducing the store-lookup counts exactly."""
    auto = _Automaton(memb, resolver)
    etypes = elements["etype"].to_pylist()
    ids = elements["id"].to_pylist()
    poss = elements["pos"].to_pylist()
    refs = elements["refs"].to_pylist()
    members = elements["members"].to_pylist()
    out = np.empty(len(etypes), dtype=object)
    for i, (t, eid, p) in enumerate(zip(etypes, ids, poss)):
        if t == "node":
            out[i] = auto.verdict_node(p, eid)
        elif t == "way":
            out[i] = auto.verdict_way(p, eid, refs[i])
        else:
            out[i] = auto.verdict_relation(p, eid, members[i])
    return out


def filter_verdicts_fast(
    elements: pa.Table, memb: PolyMembership, resolver: Resolver
) -> np.ndarray:
    """Same verdicts as ``filter_verdicts`` with the node majority
    vectorized (production hot path; does NOT preserve the lookup-count
    invariant — tests cross-check output equality).

    Node ladder algebra: in_buffered(row) = old_buffered(id) OR
    prefix-OR over this id's earlier-or-equal occurrences of
    new_in_buffered — the memo set's only effect on node verdicts —
    then keep iff new_in_exact(row). Way/relation rows replay the
    automaton in file order with node memo side-effects applied at
    their original positions (sets only grow, so state at each
    way/relation position is identical)."""
    import pandas as pd

    etype = np.asarray(elements["etype"])
    nmask = etype == "node"
    poss = elements["pos"].to_numpy(zero_copy_only=False)
    ids = elements["id"].to_numpy(zero_copy_only=False)
    n = len(etype)
    out = np.empty(n, dtype=object)

    node_verdicts: dict[int, str] = {}
    if nmask.any():
        npos = poss[nmask]
        nids = ids[nmask]
        new_buf = np.array(
            [memb.new_in_buffered.get(int(p), False) for p in npos], bool
        )
        new_ex = np.array(
            [memb.new_in_exact.get(int(p), False) for p in npos], bool
        )
        old_buf = np.array(
            [bool(memb.old_in_buffered.get(int(i), False)) for i in nids], bool
        )
        df = pd.DataFrame({"id": nids, "pos": npos, "nb": new_buf})
        prefix_nb = (
            df.sort_values(["id", "pos"], kind="stable")
            .groupby("id", sort=False)["nb"]
            .cummax()
        )
        prefix = np.empty(len(df), bool)
        prefix[prefix_nb.index.to_numpy()] = prefix_nb.to_numpy()
        in_buffered = prefix | old_buf
        v = np.where(~in_buffered, "drop", np.where(new_ex, "keep", "delete"))
        for p, s in zip(npos.tolist(), v.tolist()):
            node_verdicts[p] = s

    auto = _Automaton(memb, resolver)
    etypes = etype.tolist()
    refs = elements["refs"].to_pylist()
    members = elements["members"].to_pylist()
    for i in range(n):
        t = etypes[i]
        p = int(poss[i])
        eid = int(ids[i])
        if t == "node":
            s = node_verdicts[p]
            out[i] = s
            if s == "keep":
                auto.exact_sets.nodes_seen.add(eid)
                auto.buff_sets.nodes_seen.add(eid)
            elif s == "delete":
                auto.buff_sets.nodes_seen.add(eid)
        elif t == "way":
            out[i] = auto.verdict_way(p, eid, refs[i])
        else:
            out[i] = auto.verdict_relation(p, eid, members[i])
    return out


def filter_elements(
    elements: pa.Table,
    mp: MultiPolygon,
    resolver: Resolver,
    node_ids: np.ndarray,
    buffer: int = BUFFER_DECIMICRO,
    fast: bool = True,
    buffer_mode: str = "chordal",
) -> pa.Table:
    """One polygon filter: returns kept+deleted rows with the action
    rewrite applied (the engine's .osc-equivalent output)."""
    memb = precompute_membership(
        elements, mp, resolver, node_ids, buffer=buffer,
        buffer_mode=buffer_mode,
    )
    verdict_fn = filter_verdicts_fast if fast else filter_verdicts
    verdicts = verdict_fn(elements, memb, resolver)
    keep_mask = verdicts != "drop"
    sub = elements.filter(pa.array(keep_mask.astype(bool)))
    v = verdicts[keep_mask]
    action = np.asarray(sub["action"].to_pylist(), dtype=object)
    action[v == "delete"] = "delete"
    sub = sub.set_column(
        sub.schema.get_field_index("action"), "action", pa.array(action.tolist())
    )
    return sub


def filter_tree(
    elements: pa.Table,
    tree_polys: list[tuple[str, str, MultiPolygon]],
    tree_parent: dict[str, str | None],
    resolver: Resolver,
    node_ids: np.ndarray,
    buffer: int = BUFFER_DECIMICRO,
) -> pa.Table:
    """Multi-label assignment over a polygon tree.

    For each tree node with a polygon, the input is its parent's OUTPUT
    rows (reference chains outputs, src/diffs.rs:174-185).  Returns an
    assignments table (pos, etype, id, poly_path, action) — one row per
    (element, tree path) the element survives to, exactly the union of
    the per-path .osc outputs."""
    results = []
    outputs: dict[str | None, pa.Table] = {None: elements}
    for path, _name, mp in tree_polys:
        parent = tree_parent.get(path)
        src = outputs.get(parent)
        if src is None or src.num_rows == 0:
            outputs[path] = src if src is not None else elements.slice(0, 0)
            continue
        filtered = filter_elements(src, mp, resolver, node_ids, buffer=buffer)
        outputs[path] = filtered
        if filtered.num_rows:
            results.append(
                pa.table(
                    {
                        "pos": filtered["pos"],
                        "etype": filtered["etype"],
                        "id": filtered["id"],
                        "poly_path": pa.array(
                            [path] * filtered.num_rows, pa.string()
                        ),
                        "action": filtered["action"],
                    }
                )
            )
    if not results:
        return _empty_assignments()
    return pa.concat_tables(results)


def _empty_assignments() -> pa.Table:
    return pa.table(
        {
            "pos": pa.array([], pa.int64()),
            "etype": pa.array([], pa.string()),
            "id": pa.array([], pa.int64()),
            "poly_path": pa.array([], pa.string()),
            "action": pa.array([], pa.string()),
        }
    )


def _assignments_of(path: str, filtered: pa.Table) -> pa.Table:
    return pa.table(
        {
            "pos": filtered["pos"],
            "etype": filtered["etype"],
            "id": filtered["id"],
            "poly_path": pa.array([path] * filtered.num_rows, pa.string()),
            "action": filtered["action"],
        }
    )


def filter_tree_parallel(
    elements: pa.Table,
    tree_polys: list[tuple[str, str, MultiPolygon]],
    tree_parent: dict[str, str | None],
    resolver: Resolver,
    node_ids: np.ndarray,
    buffer: int = BUFFER_DECIMICRO,
) -> pa.Table:
    """Ray-parallel tree walk: sibling polygons filter concurrently
    (the reference's rayon par_iter, src/diffs.rs:187-190), with each
    child consuming its parent's OUTPUT via object-store refs — the
    chaining never touches the driver between levels.

    The resolver is put to the object store once and shared read-only
    by every task (the Arc<OsmCache> analogue, src/diffs.rs:123-131)."""
    import ray

    @ray.remote
    def _one(parent_out: pa.Table, mp: MultiPolygon, resolver_: Resolver,
             node_ids_: np.ndarray, buffer_: int) -> pa.Table:
        if parent_out.num_rows == 0:
            return parent_out
        return filter_elements(parent_out, mp, resolver_, node_ids_, buffer=buffer_)

    resolver_ref = ray.put(resolver)
    node_ids_ref = ray.put(np.asarray(node_ids, np.int64))
    root_ref = ray.put(elements)
    out_refs: dict[str | None, object] = {None: root_ref}
    for path, _name, mp in tree_polys:  # topological (parents first)
        parent = tree_parent.get(path)
        src = out_refs.get(parent, root_ref)
        out_refs[path] = _one.remote(src, mp, resolver_ref, node_ids_ref, buffer)
    results = []
    for path, _name, _mp in tree_polys:
        t = ray.get(out_refs[path])
        if t.num_rows:
            results.append(_assignments_of(path, t))
    if not results:
        return _empty_assignments()
    return pa.concat_tables(results)
