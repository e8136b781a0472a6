"""Element store — the engine's replacement for the osmbin binary DB.

The reference stores the planet as seek-addressable files
(``src/osmbin.rs:32-45``: node.crd @ id*8, way.idx/way.data slabs,
relation JSON files).  The engine replaces this with an id-hash
**bucketed Parquet store** (columnar, resumable, cluster-readable):

    {dir}/nodes/bucket=K/part.parquet      id,lat,lon (decimicro int64)
    {dir}/ways/bucket=K/part.parquet       id, refs:list<int64>
    {dir}/relations/bucket=K/part.parquet  id, members, tags

- bulk import (S5)   = write all buckets from a source table
- random read (S6)   = Resolver: sorted-id numpy arrays + searchsorted
                       (vectorized batch lookup; negative results are
                       represented as misses, mirroring the negative
                       caching of src/osmbin.rs:428,467)
- Δ-apply (update_*) = last-writer-wins upsert / tombstone delete at
                       bucket granularity (only touched buckets are
                       rewritten — the unit of resumability)

At cluster scale the Resolver is not loaded whole: callers first
compute the (small) needed-id closure of a diff and load only matching
buckets (`Resolver.from_store(..., needed=...)`), the engine-side
equivalent of the reference's per-diff OsmCache (src/osmcache.rs:19-23).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_BUCKETS = 64

_TYPES = ("nodes", "ways", "relations")


def _bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    # splitmix-style mix so sequential OSM ids spread evenly
    x = ids.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(n_buckets)).astype(np.int64)


class ElementStore:
    """Bucketed parquet store of nodes/ways/relations."""

    def __init__(self, directory: str, n_buckets: int = DEFAULT_BUCKETS):
        self.dir = directory
        meta_path = os.path.join(directory, "store.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.n_buckets = json.load(f)["n_buckets"]
        else:
            self.n_buckets = n_buckets

    # ---------------- import ----------------
    def init(self):
        os.makedirs(self.dir, exist_ok=True)
        for t in _TYPES:
            os.makedirs(os.path.join(self.dir, t), exist_ok=True)
        with open(os.path.join(self.dir, "store.json"), "w") as f:
            json.dump({"n_buckets": self.n_buckets}, f)

    def _bucket_path(self, etype: str, bucket: int) -> str:
        return os.path.join(self.dir, etype, f"bucket={bucket}", "part.parquet")

    def write_table(self, etype: str, table: pa.Table):
        """Bulk import: hash-partition ``table`` by id into buckets
        (engine form of the id-indexed bulk importer, src/osmbin.rs:542-663)."""
        ids = table["id"].to_numpy(zero_copy_only=False)
        buckets = _bucket_of(ids, self.n_buckets)
        order = np.argsort(buckets, kind="stable")
        table = table.take(pa.array(order))
        buckets = buckets[order]
        bounds = np.searchsorted(buckets, np.arange(self.n_buckets + 1))
        for b in range(self.n_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            sub = table.slice(lo, hi - lo)
            sub = sub.take(
                pa.array(np.argsort(sub["id"].to_numpy(zero_copy_only=False)))
            )
            path = self._bucket_path(etype, b)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            pq.write_table(sub, path)

    def import_pbf(self, path: str):
        from .osmpbf import read_pbf

        nodes, ways, relations = read_pbf(path)
        self.init()
        self.write_table("nodes", nodes)
        self.write_table("ways", ways)
        self.write_table("relations", relations)

    # ---------------- read ----------------
    def read_type(self, etype: str, buckets: list[int] | None = None) -> pa.Table:
        tabs = []
        rng = range(self.n_buckets) if buckets is None else sorted(set(buckets))
        for b in rng:
            path = self._bucket_path(etype, b)
            if os.path.exists(path):
                tabs.append(pq.read_table(path))
        if not tabs:
            return None
        return pa.concat_tables(tabs)

    def read_for_ids(self, etype: str, ids: np.ndarray) -> pa.Table | None:
        """Load only the buckets containing ``ids`` and filter to them."""
        if len(ids) == 0:
            return None
        buckets = np.unique(_bucket_of(np.asarray(ids, np.int64), self.n_buckets))
        t = self.read_type(etype, buckets.tolist())
        if t is None:
            return None
        return t.filter(pc.is_in(t["id"], pa.array(np.unique(ids))))

    # ---------------- Δ-apply ----------------
    def apply_changes(self, elements: pa.Table):
        """Apply an OsmChange elements table (engine Δ-semantics of
        src/osmbin.rs:665-748): create/modify = upsert, delete =
        tombstone removal; last occurrence per id wins (``pos`` order).
        Rewrites only the touched buckets."""
        for etype, tname in (("node", "nodes"), ("way", "ways"), ("relation", "relations")):
            sub = elements.filter(pc.equal(elements["etype"], etype))
            if sub.num_rows == 0:
                continue
            ids = sub["id"].to_numpy(zero_copy_only=False)
            pos = sub["pos"].to_numpy(zero_copy_only=False)
            # last occurrence per id
            order = np.lexsort((pos, ids))
            last = np.ones(len(order), dtype=bool)
            sorted_ids = ids[order]
            last[:-1] = sorted_ids[1:] != sorted_ids[:-1]
            keep_idx = order[last]
            sub = sub.take(pa.array(keep_idx))
            ids = ids[keep_idx]
            buckets = _bucket_of(ids, self.n_buckets)
            for b in np.unique(buckets):
                in_b = buckets == b
                chg = sub.take(pa.array(np.nonzero(in_b)[0]))
                self._apply_bucket(tname, int(b), chg)

    def _apply_bucket(self, tname: str, bucket: int, chg: pa.Table):
        path = self._bucket_path(tname, bucket)
        old = pq.read_table(path) if os.path.exists(path) else None
        chg_ids = chg["id"].to_numpy(zero_copy_only=False)
        keep_mask_new = ~np.asarray(
            pc.equal(chg["action"], "delete").to_numpy(zero_copy_only=False)
        )
        # build replacement rows in store schema
        if tname == "nodes":
            new = pa.table(
                {
                    "id": chg["id"],
                    "lat": chg["lat"].cast(pa.int64()),
                    "lon": chg["lon"].cast(pa.int64()),
                }
            )
        elif tname == "ways":
            new = pa.table({"id": chg["id"], "refs": chg["refs"]})
        else:
            new = pa.table(
                {"id": chg["id"], "members": chg["members"], "tags": chg["tags"]}
            )
        new = new.filter(pa.array(keep_mask_new))
        parts = [new]
        if old is not None:
            old_keep = ~np.isin(
                old["id"].to_numpy(zero_copy_only=False), chg_ids
            )
            parts.append(old.filter(pa.array(old_keep)).select(new.column_names))
        merged = pa.concat_tables(parts, promote_options="permissive")
        merged = merged.take(
            pa.array(np.argsort(merged["id"].to_numpy(zero_copy_only=False)))
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, path)  # atomic, mirrors tmp+rename of src/diffs.rs:105-149

    def as_dataset(self, etype: str):
        """Ray-native bulk read of one element type: a streaming
        `read_parquet` over the bucket directory (the cluster-side
        counterpart of read_type — blocks map to buckets, so downstream
        joins on id stay co-partitioned with the store layout)."""
        import ray.data

        return ray.data.read_parquet(os.path.join(self.dir, etype))

    def destroy(self):
        shutil.rmtree(self.dir, ignore_errors=True)


class Resolver:
    """Vectorized batch reader over store tables (OsmReader analogue,
    src/osm.rs:197-247).  Lookup = sorted-array searchsorted; also
    counts lookups so tests can pin the reference's lookup-amplification
    invariants (src/osmxml/bbox.rs:269-271, src/osmxml/filter.rs:390-392).
    """

    def __init__(self, nodes: pa.Table | None, ways: pa.Table | None,
                 relations: pa.Table | None):
        if nodes is not None and nodes.num_rows:
            self._nid = nodes["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(self._nid)
            self._nid = self._nid[o]
            self._nlat = nodes["lat"].to_numpy(zero_copy_only=False).astype(np.int64)[o]
            self._nlon = nodes["lon"].to_numpy(zero_copy_only=False).astype(np.int64)[o]
        else:
            self._nid = np.empty(0, np.int64)
            self._nlat = self._nlon = np.empty(0, np.int64)
        self._ways: dict[int, list[int]] = {}
        if ways is not None and ways.num_rows:
            for row in ways.to_pylist():
                self._ways[row["id"]] = row["refs"]
        self._relations: dict[int, list[dict]] = {}
        if relations is not None and relations.num_rows:
            for row in relations.to_pylist():
                self._relations[row["id"]] = row["members"]
        self.num_read_nodes = 0
        self.num_read_ways = 0
        self.num_read_relations = 0

    @staticmethod
    def from_store(store: ElementStore, node_ids=None, way_ids=None, rel_ids=None):
        def grab(etype, ids):
            if ids is None:
                return store.read_type(etype)
            return store.read_for_ids(etype, np.asarray(ids, np.int64))

        return Resolver(
            grab("nodes", node_ids), grab("ways", way_ids), grab("relations", rel_ids)
        )

    @staticmethod
    def empty() -> "Resolver":
        return Resolver(None, None, None)

    # --- batch node lookup: (found, lat, lon)
    def read_nodes(self, ids: np.ndarray):
        ids = np.asarray(ids, np.int64)
        self.num_read_nodes += len(ids)
        if len(self._nid) == 0 or len(ids) == 0:
            z = np.zeros(len(ids), np.int64)
            return np.zeros(len(ids), bool), z, z
        idx = np.searchsorted(self._nid, ids)
        idx_c = np.clip(idx, 0, len(self._nid) - 1)
        found = (idx < len(self._nid)) & (self._nid[idx_c] == ids)
        lat = np.where(found, self._nlat[idx_c], 0)
        lon = np.where(found, self._nlon[idx_c], 0)
        return found, lat, lon

    def read_way(self, wid: int) -> list[int] | None:
        self.num_read_ways += 1
        return self._ways.get(int(wid))

    def read_relation(self, rid: int) -> list[dict] | None:
        self.num_read_relations += 1
        return self._relations.get(int(rid))

    # --- materialized joins (read_way_full / read_relation_full,
    #     src/osm.rs:203-246): element + resolved children; recursion
    #     cycle-guarded by the prev-relations path (dropped edge)
    def read_way_full(self, wid: int) -> dict | None:
        refs = self.read_way(wid)
        if refs is None:
            return None
        found, lat, lon = self.read_nodes(np.asarray(refs, np.int64))
        nodes = [
            {"id": int(r), "lat": int(la), "lon": int(lo)} if f else None
            for r, f, la, lo in zip(refs, found.tolist(), lat.tolist(), lon.tolist())
        ]
        return {"id": int(wid), "nodes": nodes}

    def read_relation_full(self, rid: int, prev: tuple = ()) -> dict | None:
        members = self.read_relation(rid)
        if members is None:
            return None
        if rid in prev:
            return None  # recursive edge dropped (src/osm.rs:219-223)
        out = []
        for m in members:
            ref, typ = int(m["ref"]), m["type"]
            if typ == "node":
                found, lat, lon = self.read_nodes(np.array([ref], np.int64))
                full = (
                    {"id": ref, "lat": int(lat[0]), "lon": int(lon[0])}
                    if found[0]
                    else None
                )
            elif typ == "way":
                full = self.read_way_full(ref)
            else:
                full = self.read_relation_full(ref, prev + (rid,))
            out.append({"role": m["role"], "type": typ, "ref": ref, "full": full})
        return {"id": int(rid), "members": out}


def check_store(store: ElementStore) -> pa.Table:
    """Referential-integrity audit (engine form of check_database,
    src/osmbin.rs:283-363): every way ref and relation member must
    resolve; returns a violations table (src_type, src_id, ref_type,
    ref_id).  Anti-join over sorted id arrays — no per-element probing.
    """
    resolver = Resolver.from_store(store)
    viol: dict[str, list] = {"src_type": [], "src_id": [], "ref_type": [], "ref_id": []}

    way_ids = np.array(sorted(resolver._ways), np.int64)
    for wid in way_ids.tolist():
        refs = np.asarray(resolver._ways[wid], np.int64)
        found, _, _ = resolver.read_nodes(refs)
        for r in refs[~found].tolist():
            viol["src_type"].append("way")
            viol["src_id"].append(wid)
            viol["ref_type"].append("node")
            viol["ref_id"].append(int(r))
    for rid, members in sorted(resolver._relations.items()):
        for m in members:
            ref, typ = int(m["ref"]), m["type"]
            if typ == "node":
                ok = bool(resolver.read_nodes(np.array([ref], np.int64))[0][0])
            elif typ == "way":
                ok = resolver.read_way(ref) is not None
            else:
                ok = resolver.read_relation(ref) is not None
            if not ok:
                viol["src_type"].append("relation")
                viol["src_id"].append(rid)
                viol["ref_type"].append(typ)
                viol["ref_id"].append(ref)
    return pa.table(
        {
            "src_type": pa.array(viol["src_type"], pa.string()),
            "src_id": pa.array(viol["src_id"], pa.int64()),
            "ref_type": pa.array(viol["ref_type"], pa.string()),
            "ref_id": pa.array(viol["ref_id"], pa.int64()),
        }
    )
