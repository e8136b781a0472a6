"""Continuous-replication micro-batch pipeline (§3.1 of SURVEY.md).

Engine form of the reference's flagship ``update`` binary
(``src/bin/update.rs:27-56`` -> ``src/update.rs:30-146``), preserving
its phase ordering per sequence number (``src/update.rs:90-143``):

    download/parse diff -> bbox-annotate (reads OLD geometry from the
    store) -> polygon-tree filter (sees the PRE-update world) ->
    per-path partitioned outputs -> apply diff to the store ->
    commit the sequence pointer LAST

plus the north_rule additions: per-partition lineage records with
row/byte counters in a checkpoint manifest, job lock, and mid-run
resume by anti-joining the done-partition set.

A minute-diff micro-batch is small (the reference streams it through
one process); the wide work here is the per-path output write, which
runs as a distributed groupby over the assignments table.  Re-applying
a diff to the store is idempotent (last-writer-wins upsert), so a crash
between store-apply and manifest-commit re-runs safely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import MultiPolygon
from ..sources.store import ElementStore, Resolver
from ..stages.bbox import annotate_bbox, needed_ids
from ..stages.filter import filter_tree
from ..state.manifest import CheckpointManifest, write_partitioned


def run_sequence(
    changes: pa.Table,
    store: ElementStore,
    tree_polys: list[tuple[str, str, MultiPolygon]],
    tree_parent: dict[str, str | None],
    out_dir: str,
    manifest: CheckpointManifest,
    sequence: int,
) -> pa.Table:
    """One micro-batch: returns the assignments table it wrote."""
    import ray.data

    # one resolver serves bbox AND filter phases — the engine analogue
    # of the OsmCache handoff (src/update.rs:124-131, src/osmcache.rs)
    import ray

    resolver = Resolver.from_store(store)
    annotated = annotate_bbox(changes, resolver)
    node_ids, _way_ids, _rel_ids = needed_ids(annotated, resolver)
    nid_arr = np.array(sorted(node_ids), np.int64)
    if ray.is_initialized():
        from ..stages.filter import filter_tree_parallel

        assignments = filter_tree_parallel(
            annotated, tree_polys, tree_parent, resolver, nid_arr
        )
    else:
        assignments = filter_tree(
            annotated, tree_polys, tree_parent, resolver, nid_arr
        )
    # Phase order matches the reference (src/update.rs:122-144): diff
    # outputs land first, then the osmbin-analogue store mutation, then
    # the sequence pointer flips LAST.  A crash during the distributed
    # write therefore leaves the store at PRE-update state, so a resume
    # re-runs bbox/filter against the same old geometry as a crash-free
    # run; only the tiny window between apply_changes and commit relies
    # on apply_changes being an idempotent last-writer-wins upsert.
    if assignments.num_rows:
        ds = ray.data.from_arrow(assignments)
        write_partitioned(
            ds, f"{out_dir}/seq={sequence}", "poly_path", manifest,
            sequence=sequence, commit=False,
        )
    store.apply_changes(changes)
    manifest.commit(sequence)
    return assignments


def run_update(
    changes_by_seq: dict[int, pa.Table],
    store: ElementStore,
    tree_polys: list[tuple[str, str, MultiPolygon]],
    tree_parent: dict[str, str | None],
    out_dir: str,
    manifest: CheckpointManifest,
    max_state: int | None = None,
) -> list[int]:
    """Sequential replication loop (cur_state+1 ..= remote,
    src/update.rs:64-74) under the job lock. Returns processed seqs."""
    manifest.acquire_lock()
    try:
        cur = manifest.sequence or 0
        remote = max(changes_by_seq) if changes_by_seq else cur
        if max_state is not None:
            remote = min(remote, max_state)  # clamp (src/update.rs:60-62)
        done: list[int] = []
        for seq in range(cur + 1, remote + 1):
            if seq not in changes_by_seq:
                continue
            run_sequence(
                changes_by_seq[seq], store, tree_polys, tree_parent,
                out_dir, manifest, seq,
            )
            done.append(seq)
        return done
    finally:
        manifest.release_lock()
