"""Distributed polygon diff filter — the scale path of OsmXmlFilter.

Produces verdicts IDENTICAL to the sequential automaton
(`stages/filter.py:filter_verdicts`, kept as the reference-parity /
lookup-count oracle) with the diff streaming through ``ray.data``
blocks.  The enabling observation: every memo set of the reference
(``PolyInfo::*_seen_in_poly``, src/osmxml/filter.rs:13-18) is MONOTONE
— evidence only accrues — so "id X is in the memo when file position p
is processed" collapses to a per-id scalar ``evidence position``:

    node  ev(id) = -1 if the OLD store point is in the polygon, else
                   the FIRST diff position whose NEW point is inside
    way   ev(id) = min(old-store-ref node evidence, first occurrence
                   position whose verdict was keep/delete)
    rel   ev(id) = min over the store-member closure of leaf node/way
                   evidence and nested relations' first-verdict
                   positions (incl. its own)

and every probe "is X in the memo at position p" becomes ``ev(X) < p``
(strict: the sets update after the probing element, and positions are
unique).  That turns the whole filter into hash joins + grouped MINs
(``functions/agg.py``) — no per-row Python, no as-of joins.  The
cross-relation dependency (a relation's keep/delete feeds another's
memo probe) is a monotone fixpoint over positions, iterated to
convergence (round count = longest earlier-position chain; 1-2 in
practice, the reference's sequential pass is the degenerate case).

Verdict ladders reproduced exactly (src/osmxml/filter.rs:219-299):
node keep iff its new point is in the EXACT polygon (exact ⊆ buffered
makes the in-buffered gate implied), way/relation keep from exact
evidence over NEW refs / diff members only, delete from buffered
evidence incl. store geometry and memos, bbox-gate short-circuit with
missing-bbox ways/relations silently dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.agg import small_sorted_aggregate
from ..geom import (
    BUFFER_DECIMICRO,
    MultiPolygon,
    boxes_intersect_buffered,
    points_in_buffered,
    points_in_buffered_chordal,
    points_in_multipolygon,
)
from .dist import (
    MTYPE_NODE,
    MTYPE_REL,
    MTYPE_WAY,
    DiffPlan,
    FixpointCapError,
    reroot,
    safe_join,
)

EV_OLD = np.int64(-1)              # static (old-store) evidence
EV_NONE = np.iinfo(np.int64).max   # no evidence

KEEP, DELETE, DROP = np.int8(0), np.int8(1), np.int8(2)
VERDICT_NAMES = np.array(["keep", "delete", "drop"])


def _ev_min_agg(ds, key: str, cols: list[str]):
    return small_sorted_aggregate(ds, key, {c: (c, "min") for c in cols})


def _fill_ev(batch: pa.Table, cols: list[str]) -> dict[str, np.ndarray]:
    out = {}
    for c in cols:
        col = batch[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count == 0 and pa.types.is_int64(col.type):
            out[c] = col.to_numpy(zero_copy_only=False)
        else:
            out[c] = pc.fill_null(
                pc.cast(col, pa.int64()), int(EV_NONE)
            ).to_numpy(zero_copy_only=False)
    return out


def _buffered_fn(buffer_mode: str):
    return (
        points_in_buffered_chordal if buffer_mode == "chordal"
        else points_in_buffered
    )


def filter_verdicts_dist(
    plan: DiffPlan,
    boxes,
    mp: MultiPolygon,
    buffer: int = BUFFER_DECIMICRO,
    buffer_mode: str = "chordal",
    rel_rounds_cap: int = 64,
):
    """-> Dataset (pos, verdict int8 0=keep/1=delete/2=drop) over every
    diff row in ``plan``.  ``boxes``: Dataset (pos, minlat..) from
    ``annotate_bbox_dist`` (nullable)."""
    import ray.data

    npart = plan.num_partitions
    in_buf = _buffered_fn(buffer_mode)

    # ---------------- node occurrence flags ----------------
    def node_flags(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch["lon"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pos": batch["pos"],
                "id": batch["id"],
                "new_ex": pa.array(points_in_multipolygon(lon, lat, mp)),
                "new_buf": pa.array(in_buf(lon, lat, mp, buffer=buffer)),
            }
        )

    # ---------------- bbox gate fn (ways + relations) ----------------
    def gate_fn(batch: pa.Table) -> pa.Table:
        n = len(batch)
        mn = batch["minlat"]
        valid = np.asarray(pc.is_valid(mn.combine_chunks() if isinstance(mn, pa.ChunkedArray) else mn))
        gate = np.zeros(n, bool)
        if valid.any():
            cols = {}
            for c in ("minlat", "maxlat", "minlon", "maxlon"):
                col = batch[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                cols[c] = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            hits = boxes_intersect_buffered(
                cols["minlon"][valid], cols["minlat"][valid],
                cols["maxlon"][valid], cols["maxlat"][valid],
                mp, buffer=buffer,
            )
            gate[np.flatnonzero(valid)] = hits
        return pa.table({"pos": batch["pos"], "id": batch["id"], "gate": pa.array(gate)})

    def clos_kind(k: int):
        return plan.clos.map_batches(
            lambda b, k=k: b.filter(pc.equal(b["kind"], k)).select(["src", "ref"]),
            batch_format="pyarrow",
        )

    # node flags, the bbox gate and the closure rel-projection are
    # mutually independent — overlap their materializations (round-3
    # verdict item #2: barrier chain -> antichain)
    from concurrent.futures import ThreadPoolExecutor

    def mk_nd():
        return plan.nodes.map_batches(
            node_flags, batch_format="pyarrow"
        ).materialize()

    def mk_gates():
        wr = plan.way_occ.union(plan.rel_occ)
        wr_box = safe_join(
            wr, boxes, "left_outer", npart, on=("pos",),
            payload={c: pa.int64() for c in ("minlat", "maxlat", "minlon", "maxlon")},
        )
        return wr_box.map_batches(gate_fn, batch_format="pyarrow").materialize()

    def mk_clos_rels():
        return clos_kind(MTYPE_REL).materialize()

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_nd = ex.submit(mk_nd)
        f_gates = ex.submit(mk_gates)
        f_cr = ex.submit(mk_clos_rels)
        nd = f_nd.result()
        gates = f_gates.result()
        clos_rels = f_cr.result()

    # ---------------- per-node-id evidence positions ----------------
    def first_src(batch: pa.Table) -> pa.Table:
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        ex = batch["new_ex"].to_numpy(zero_copy_only=False)
        bf = batch["new_buf"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": batch["id"],
                "ex_ev": pa.array(np.where(ex, pos, EV_NONE)),
                "buf_ev": pa.array(np.where(bf, pos, EV_NONE)),
            }
        )

    probe_ids = (
        nd.map_batches(lambda b: b.select(["id"]), batch_format="pyarrow")
        .union(
            plan.way_new_refs.map_batches(
                lambda b: pa.table({"id": b["ref"]}), batch_format="pyarrow"
            )
        )
        .union(
            plan.way_old_refs.map_batches(
                lambda b: pa.table({"id": b["ref"]}), batch_format="pyarrow"
            )
        )
        .union(
            plan.rel_node_probes.map_batches(
                lambda b: pa.table({"id": b["ref"]}), batch_format="pyarrow"
            )
        )
        .union(
            plan.rel_way_store_refs.map_batches(
                lambda b: pa.table({"id": b["ref"]}), batch_format="pyarrow"
            )
        )
    )
    from .dist import _local_dedup

    probe_ids = probe_ids.map_batches(_local_dedup(["id"]), batch_format="pyarrow")
    old_pts = safe_join(
        probe_ids,
        plan.flat.nodes.map_batches(
            lambda b: pa.table(
                {"nid": b["id"], "plat": b["lat"], "plon": b["lon"]}
            ),
            batch_format="pyarrow",
        ),
        "inner", npart, on=("id",), right_on=("nid",),
        payload={"plat": pa.int64(), "plon": pa.int64()},
        left_fields={"id": pa.int64()},
    )

    def old_flags(batch: pa.Table) -> pa.Table:
        lat = batch["plat"].to_numpy(zero_copy_only=False).astype(np.int64)
        lon = batch["plon"].to_numpy(zero_copy_only=False).astype(np.int64)
        ex = points_in_multipolygon(lon, lat, mp)
        bf = in_buf(lon, lat, mp, buffer=buffer)
        return pa.table(
            {
                "id": batch["id"],
                "ex_ev": pa.array(np.where(ex, EV_OLD, EV_NONE)),
                "buf_ev": pa.array(np.where(bf, EV_OLD, EV_NONE)),
            }
        )

    node_ev = _ev_min_agg(
        nd.map_batches(first_src, batch_format="pyarrow").union(
            old_pts.map_batches(old_flags, batch_format="pyarrow")
        ),
        "id", ["ex_ev", "buf_ev"],
    ).materialize()

    # ---------------- node verdicts ----------------
    nodes_ev = safe_join(
        nd,
        node_ev.map_batches(
            lambda b: pa.table(
                {"nev_id": b["id"], "n_ex": b["ex_ev"], "n_buf": b["buf_ev"]}
            ),
            batch_format="pyarrow",
        ),
        "left_outer", npart, on=("id",), right_on=("nev_id",),
        payload={"n_ex": pa.int64(), "n_buf": pa.int64()},
    )

    def node_verdict(batch: pa.Table) -> pa.Table:
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        ev = _fill_ev(batch, ["n_buf"])["n_buf"]
        new_ex = batch["new_ex"].to_numpy(zero_copy_only=False)
        in_buffered = ev <= pos
        v = np.where(~in_buffered, DROP, np.where(new_ex, KEEP, DELETE))
        return pa.table({"pos": batch["pos"], "verdict": pa.array(v.astype(np.int8))})

    node_verdicts = nodes_ev.map_batches(node_verdict, batch_format="pyarrow")

    # ---------------- way evidence ----------------
    nev_renamed = node_ev.map_batches(
        lambda b: pa.table(
            {"nev_id": b["id"], "n_ex": b["ex_ev"], "n_buf": b["buf_ev"]}
        ),
        batch_format="pyarrow",
    ).materialize()
    ev_payload = {"n_ex": pa.int64(), "n_buf": pa.int64()}

    def ref_join(refs_ds):
        return safe_join(
            refs_ds, nev_renamed, "left_outer", npart,
            on=("ref",), right_on=("nev_id",), payload=ev_payload,
            left_fields={"pos": pa.int64(), "id": pa.int64(), "ref": pa.int64()},
        )

    def agg_rows(key_out: str, key_src: str):
        def fn(batch: pa.Table) -> pa.Table:
            ev = _fill_ev(batch, ["n_ex", "n_buf"])
            return pa.table(
                {
                    key_out: batch[key_src],
                    "ex_ev": pa.array(ev["n_ex"]),
                    "buf_ev": pa.array(ev["n_buf"]),
                }
            )

        return fn

    new_agg = _ev_min_agg(
        ref_join(plan.way_new_refs).map_batches(
            agg_rows("pos", "pos"), batch_format="pyarrow"
        ),
        "pos", ["ex_ev", "buf_ev"],
    ).map_batches(
        lambda b: pa.table(
            {"pos": b["pos"], "new_ex_ev": b["ex_ev"], "new_buf_ev": b["buf_ev"]}
        ),
        batch_format="pyarrow",
    )
    # store-ref evidence covers BOTH diff way occurrences and ways
    # probed as relation members (way_in_poly reads store refs for
    # either, src/osmxml/filter.rs:135-148)
    store_ref_rows = plan.way_old_refs.map_batches(
        lambda b: pa.table({"pos": b["pos"], "id": b["id"], "ref": b["ref"]}),
        batch_format="pyarrow",
    ).union(
        plan.rel_way_store_refs.map_batches(
            lambda b: pa.table(
                {"pos": b["pos"], "id": b["wid"], "ref": b["ref"]}
            ),
            batch_format="pyarrow",
        )
    )
    store_agg = _ev_min_agg(
        ref_join(store_ref_rows).map_batches(
            agg_rows("wid", "id"), batch_format="pyarrow"
        ),
        "wid", ["ex_ev", "buf_ev"],
    ).map_batches(
        lambda b: pa.table(
            {"wid": b["wid"], "st_ex_ev": b["ex_ev"], "st_buf_ev": b["buf_ev"]}
        ),
        batch_format="pyarrow",
    ).materialize()

    way_gates = safe_join(
        gates, plan.way_occ.map_batches(
            lambda b: pa.table({"wpos": b["pos"]}), batch_format="pyarrow"
        ),
        "left_semi", npart, on=("pos",), right_on=("wpos",),
    )
    way_tab = safe_join(
        way_gates, new_agg, "left_outer", npart, on=("pos",),
        payload={"new_ex_ev": pa.int64(), "new_buf_ev": pa.int64()},
    )
    way_tab = safe_join(
        way_tab, store_agg, "left_outer", npart, on=("id",), right_on=("wid",),
        payload={"st_ex_ev": pa.int64(), "st_buf_ev": pa.int64()},
    ).materialize()

    def way_ev_occ(batch: pa.Table) -> pa.Table:
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        gate = batch["gate"].to_numpy(zero_copy_only=False)
        ev = _fill_ev(batch, ["new_ex_ev", "new_buf_ev", "st_buf_ev"])
        keep_ev = gate & (ev["new_ex_ev"] < pos)
        event = gate & ((ev["new_buf_ev"] < pos) | (ev["st_buf_ev"] < pos) | keep_ev)
        return pa.table(
            {
                "id": batch["id"],
                "keep_pos": pa.array(np.where(keep_ev, pos, EV_NONE)),
                "event_pos": pa.array(np.where(event, pos, EV_NONE)),
            }
        )

    way_first = _ev_min_agg(
        way_tab.map_batches(way_ev_occ, batch_format="pyarrow"),
        "id", ["keep_pos", "event_pos"],
    ).materialize()

    # per-way-id evidence for relation probes
    way_ev = _ev_min_agg(
        store_agg.map_batches(
            lambda b: pa.table(
                {"id": b["wid"], "ex_ev": b["st_ex_ev"], "buf_ev": b["st_buf_ev"]}
            ),
            batch_format="pyarrow",
        ).union(
            way_first.map_batches(
                lambda b: pa.table(
                    {"id": b["id"], "ex_ev": b["keep_pos"], "buf_ev": b["event_pos"]}
                ),
                batch_format="pyarrow",
            )
        ),
        "id", ["ex_ev", "buf_ev"],
    ).materialize()

    # ---------------- way verdicts ----------------
    way_tab2 = safe_join(
        way_tab,
        way_first.map_batches(
            lambda b: pa.table({"fid": b["id"], "f_event": b["event_pos"]}),
            batch_format="pyarrow",
        ),
        "left_outer", npart, on=("id",), right_on=("fid",),
        payload={"f_event": pa.int64()},
    )

    def way_verdict(batch: pa.Table) -> pa.Table:
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        gate = batch["gate"].to_numpy(zero_copy_only=False)
        ev = _fill_ev(
            batch, ["new_ex_ev", "new_buf_ev", "st_buf_ev", "f_event"]
        )
        keep = gate & (ev["new_ex_ev"] < pos)
        delete = (
            gate
            & ~keep
            & (
                (ev["new_buf_ev"] < pos)
                | (ev["st_buf_ev"] < pos)
                | (ev["f_event"] < pos)
            )
        )
        v = np.where(keep, KEEP, np.where(delete, DELETE, DROP))
        return pa.table({"pos": batch["pos"], "verdict": pa.array(v.astype(np.int8))})

    way_verdicts = way_tab2.map_batches(way_verdict, batch_format="pyarrow")

    # ---------------- relation evidence (fixpoint) ----------------
    kind_tab = {
        MTYPE_NODE: nev_renamed.map_batches(
            lambda b: pa.table(
                {"ref": b["nev_id"], "l_ex": b["n_ex"], "l_buf": b["n_buf"]}
            ),
            batch_format="pyarrow",
        ),
        MTYPE_WAY: way_ev.map_batches(
            lambda b: pa.table(
                {"ref": b["id"], "l_ex": b["ex_ev"], "l_buf": b["buf_ev"]}
            ),
            batch_format="pyarrow",
        ),
    }

    leaf_payload = {"l_ex": pa.int64(), "l_buf": pa.int64()}
    leaf_fields = {"src": pa.int64(), "ref": pa.int64()}

    # the closure-static and diff-member-static evidence tables are
    # independent — overlap them
    def mk_static_rel():
        static_rows = []
        for k in (MTYPE_NODE, MTYPE_WAY):
            joined = safe_join(
                clos_kind(k), kind_tab[k], "left_outer", npart, on=("ref",),
                payload=leaf_payload, left_fields=leaf_fields,
            )
            static_rows.append(
                joined.map_batches(
                    lambda b: pa.table(
                        {
                            "src": b["src"],
                            "ex_ev": pa.array(_fill_ev(b, ["l_ex"])["l_ex"]),
                            "buf_ev": pa.array(_fill_ev(b, ["l_buf"])["l_buf"]),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
        return _ev_min_agg(
            static_rows[0].union(static_rows[1]), "src", ["ex_ev", "buf_ev"]
        ).materialize()

    def mk_dm_static():
        # diff-member static part (node + way members) per occurrence
        dm_rows = []
        for refs_ds, tab in (
            (plan.rel_m_nodes, kind_tab[MTYPE_NODE]),
            (plan.rel_m_ways, kind_tab[MTYPE_WAY]),
        ):
            joined = safe_join(
                refs_ds, tab, "left_outer", npart, on=("ref",),
                payload=leaf_payload,
                left_fields={"pos": pa.int64(), "ref": pa.int64()},
            )
            dm_rows.append(
                joined.map_batches(
                    lambda b: pa.table(
                        {
                            "pos": b["pos"],
                            "ex_ev": pa.array(_fill_ev(b, ["l_ex"])["l_ex"]),
                            "buf_ev": pa.array(_fill_ev(b, ["l_buf"])["l_buf"]),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
        return _ev_min_agg(
            dm_rows[0].union(dm_rows[1]), "pos", ["ex_ev", "buf_ev"]
        ).map_batches(
            lambda b: pa.table(
                {"pos": b["pos"], "dm_ex": b["ex_ev"], "dm_buf": b["buf_ev"]}
            ),
            batch_format="pyarrow",
        ).materialize()

    with ThreadPoolExecutor(max_workers=2) as ex:
        f_sr = ex.submit(mk_static_rel)
        f_dm = ex.submit(mk_dm_static)
        static_rel = f_sr.result()
        dm_static = f_dm.result()

    rel_gates = safe_join(
        gates, plan.rel_occ.map_batches(
            lambda b: pa.table({"rpos": b["pos"]}), batch_format="pyarrow"
        ),
        "left_semi", npart, on=("pos",), right_on=("rpos",),
    )
    rel_base = safe_join(
        rel_gates, dm_static, "left_outer", npart, on=("pos",),
        payload={"dm_ex": pa.int64(), "dm_buf": pa.int64()},
    ).materialize()

    empty_first = ray.data.from_arrow(
        pa.schema(
            [("id", pa.int64()), ("keep_pos", pa.int64()), ("event_pos", pa.int64())]
        ).empty_table()
    )
    rel_first = empty_first
    rel_tab = None
    for _ in range(rel_rounds_cap):
        memo_rows = safe_join(
            clos_rels,
            rel_first.map_batches(
                lambda b: pa.table(
                    {"fid": b["id"], "f_keep": b["keep_pos"], "f_event": b["event_pos"]}
                ),
                batch_format="pyarrow",
            ),
            "left_outer", npart, on=("ref",), right_on=("fid",),
            payload={"f_keep": pa.int64(), "f_event": pa.int64()},
            left_fields=leaf_fields,
        ).map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"],
                    "ex_ev": pa.array(_fill_ev(b, ["f_keep"])["f_keep"]),
                    "buf_ev": pa.array(_fill_ev(b, ["f_event"])["f_event"]),
                }
            ),
            batch_format="pyarrow",
        )
        rel_ev = _ev_min_agg(
            static_rel.union(memo_rows), "src", ["ex_ev", "buf_ev"]
        ).map_batches(
            lambda b: pa.table(
                {"src": b["src"], "r_ex": b["ex_ev"], "r_buf": b["buf_ev"]}
            ),
            batch_format="pyarrow",
        )
        rel_ev = reroot(rel_ev)
        # rel-member terms per occurrence
        rm = safe_join(
            plan.rel_m_rels, rel_ev, "left_outer", npart,
            on=("ref",), right_on=("src",),
            payload={"r_ex": pa.int64(), "r_buf": pa.int64()},
            left_fields={"pos": pa.int64(), "ref": pa.int64()},
        ).map_batches(
            lambda b: pa.table(
                {
                    "pos": b["pos"],
                    "ex_ev": pa.array(_fill_ev(b, ["r_ex"])["r_ex"]),
                    "buf_ev": pa.array(_fill_ev(b, ["r_buf"])["r_buf"]),
                }
            ),
            batch_format="pyarrow",
        )
        rm_agg = _ev_min_agg(rm, "pos", ["ex_ev", "buf_ev"]).map_batches(
            lambda b: pa.table(
                {"pos": b["pos"], "rm_ex": b["ex_ev"], "rm_buf": b["buf_ev"]}
            ),
            batch_format="pyarrow",
        )
        tab = safe_join(
            rel_base, rm_agg, "left_outer", npart, on=("pos",),
            payload={"rm_ex": pa.int64(), "rm_buf": pa.int64()},
        )
        tab = safe_join(
            tab, rel_ev, "left_outer", npart, on=("id",), right_on=("src",),
            payload={"r_ex": pa.int64(), "r_buf": pa.int64()},
        ).materialize()

        def rel_occ_ev(batch: pa.Table) -> pa.Table:
            pos = batch["pos"].to_numpy(zero_copy_only=False)
            gate = batch["gate"].to_numpy(zero_copy_only=False)
            ev = _fill_ev(batch, ["dm_ex", "dm_buf", "rm_ex", "rm_buf", "r_buf"])
            keep = gate & (
                np.minimum(ev["dm_ex"], ev["rm_ex"]) < pos
            )
            event = gate & (
                np.minimum(np.minimum(ev["dm_buf"], ev["rm_buf"]), ev["r_buf"]) < pos
            )
            return pa.table(
                {
                    "id": batch["id"],
                    "keep_pos": pa.array(np.where(keep, pos, EV_NONE)),
                    "event_pos": pa.array(np.where(event, pos, EV_NONE)),
                }
            )

        new_first = reroot(_ev_min_agg(
            tab.map_batches(rel_occ_ev, batch_format="pyarrow"),
            "id", ["keep_pos", "event_pos"],
        ))
        rel_tab = tab
        # converged when the first-position tables are identical
        if rel_first.count() == new_first.count():
            if rel_first.count() == 0:
                break
            cmp = safe_join(
                rel_first,
                new_first.map_batches(
                    lambda b: pa.table(
                        {"id": b["id"], "nk": b["keep_pos"], "ne": b["event_pos"]}
                    ),
                    batch_format="pyarrow",
                ),
                "inner", npart, on=("id",),
                payload={"nk": pa.int64(), "ne": pa.int64()},
            )
            diffs = cmp.map_batches(
                lambda b: pa.table(
                    {
                        "c": pa.array(
                            (
                                b["keep_pos"].to_numpy(zero_copy_only=False)
                                != b["nk"].to_numpy(zero_copy_only=False)
                            )
                            | (
                                b["event_pos"].to_numpy(zero_copy_only=False)
                                != b["ne"].to_numpy(zero_copy_only=False)
                            )
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("c")
            matched = cmp.count()
            if not diffs and matched == new_first.count():
                rel_first = new_first
                break
        rel_first = new_first
    else:
        raise FixpointCapError(
            f"filter cross-relation fixpoint did not converge within "
            f"rel_rounds_cap={rel_rounds_cap} rounds (earlier-position "
            f"relation memo chain deeper than the cap); raise "
            f"rel_rounds_cap"
        )

    def rel_verdict(batch: pa.Table) -> pa.Table:
        pos = batch["pos"].to_numpy(zero_copy_only=False)
        gate = batch["gate"].to_numpy(zero_copy_only=False)
        ev = _fill_ev(batch, ["dm_ex", "dm_buf", "rm_ex", "rm_buf", "r_buf"])
        keep = gate & (np.minimum(ev["dm_ex"], ev["rm_ex"]) < pos)
        event = gate & (
            np.minimum(np.minimum(ev["dm_buf"], ev["rm_buf"]), ev["r_buf"]) < pos
        )
        v = np.where(keep, KEEP, np.where(event, DELETE, DROP))
        return pa.table({"pos": batch["pos"], "verdict": pa.array(v.astype(np.int8))})

    if rel_tab is not None:
        rel_verdicts = rel_tab.map_batches(rel_verdict, batch_format="pyarrow")
        return node_verdicts.union(way_verdicts).union(rel_verdicts)
    return node_verdicts.union(way_verdicts)


# ---------------- plan restriction + tree driver ----------------

_POS_TABLES = (
    "nodes", "way_occ", "way_new_refs", "way_old_refs", "rel_occ",
    "rel_m_nodes", "rel_m_ways", "rel_m_rels", "rel_node_probes",
    "rel_way_probes", "rel_rel_probes", "rel_way_store_refs",
)


def restrict_plan(plan: DiffPlan, keep_pos) -> DiffPlan:
    """New plan over the subset of diff rows whose pos is in
    ``keep_pos`` (Dataset with one column ``pos``) — the engine form of
    chaining each child polygon on its parent's OUTPUT rows
    (src/diffs.rs:174-185).  Closure and store views are
    restriction-independent and shared."""
    from dataclasses import replace

    from .dist import mat_concurrently

    kp = keep_pos.map_batches(
        lambda b: pa.table({"kpos": b["pos"]}), batch_format="pyarrow"
    ).materialize()
    lazy = [
        safe_join(
            getattr(plan, name), kp, "left_semi", plan.num_partitions,
            on=("pos",), right_on=("kpos",),
        )
        for name in _POS_TABLES
    ]
    lazy.append(
        safe_join(
            plan.diff.map_batches(
                lambda b: b.select(["pos", "etype", "id", "action"]),
                batch_format="pyarrow",
            ),
            kp, "left_semi", plan.num_partitions,
            on=("pos",), right_on=("kpos",),
        )
    )
    # the 13 per-table restrictions are independent — overlap them
    mats = mat_concurrently(lazy)
    fields = dict(zip(_POS_TABLES, mats[:-1]))
    fields["diff"] = mats[-1]
    return replace(plan, **fields)


def apply_verdicts(plan: DiffPlan, verdicts, poly_path: str | None = None,
                   actions=None):
    """-> Dataset (pos, etype, id, action[, poly_path]): surviving rows
    with the delete rewrite applied (src/osmxml/filter.rs:231,256,294).

    ``actions``: optional Dataset (pos, action) overriding the diff's
    own actions — used by the tree driver to chain a parent's REWRITTEN
    actions into its children (the reference feeds each child the
    parent's output .osc, so a parent-deleted row stays ``delete``
    downstream even when the child's own verdict is keep)."""
    meta = plan.diff.map_batches(
        lambda b: b.select(["pos", "etype", "id", "action"]),
        batch_format="pyarrow",
    )
    if actions is not None:
        meta = safe_join(
            meta.map_batches(
                lambda b: b.select(["pos", "etype", "id"]),
                batch_format="pyarrow",
            ),
            actions, "inner", plan.num_partitions, on=("pos",),
            payload={"action": pa.string()},
        )
    joined = safe_join(
        meta, verdicts, "inner", plan.num_partitions, on=("pos",),
        payload={"verdict": pa.int8()},
    )

    def fn(batch: pa.Table) -> pa.Table:
        v = batch["verdict"].to_numpy(zero_copy_only=False)
        keep = v != DROP
        t = batch.filter(pa.array(keep))
        vv = v[keep]
        action = pc.if_else(
            pa.array(vv == DELETE), pa.scalar("delete"), t["action"].combine_chunks()
        )
        cols = {
            "pos": t["pos"], "etype": t["etype"], "id": t["id"],
            "action": action,
        }
        if poly_path is not None:
            cols["poly_path"] = pa.array([poly_path] * len(t), pa.string())
        return pa.table(cols)

    return joined.map_batches(fn, batch_format="pyarrow")


def filter_tree_dist(
    plan: DiffPlan,
    boxes,
    tree_polys: list[tuple[str, str, MultiPolygon]],
    tree_parent: dict[str, str | None],
    buffer: int = BUFFER_DECIMICRO,
    buffer_mode: str = "chordal",
):
    """Distributed polygon-tree filter: each child consumes its
    parent's surviving rows; returns the assignments union
    (pos, etype, id, action, poly_path) as a Dataset."""
    outputs: dict[str | None, DiffPlan] = {None: plan}
    out_actions: dict[str | None, object] = {None: None}
    results = []
    for path, _name, mp in tree_polys:  # topological order
        parent = tree_parent.get(path)
        src_plan = outputs.get(parent)
        if src_plan is None:
            continue
        verdicts = filter_verdicts_dist(
            src_plan, boxes, mp, buffer=buffer, buffer_mode=buffer_mode
        ).materialize()
        kept = verdicts.map_batches(
            lambda b: b.filter(
                pc.not_equal(b["verdict"], int(DROP))
            ).select(["pos"]),
            batch_format="pyarrow",
        ).materialize()
        result = apply_verdicts(
            src_plan, verdicts, poly_path=path,
            actions=out_actions.get(parent),
        ).materialize()
        results.append(result)
        out_actions[path] = result.map_batches(
            lambda b: b.select(["pos", "action"]), batch_format="pyarrow"
        )
        outputs[path] = restrict_plan(plan, kept)
    if not results:
        import ray.data

        return ray.data.from_arrow(
            pa.schema(
                [("pos", pa.int64()), ("etype", pa.string()),
                 ("id", pa.int64()), ("action", pa.string()),
                 ("poly_path", pa.string())]
            ).empty_table()
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out
