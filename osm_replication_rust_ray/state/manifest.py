"""Checkpoint manifest: per-partition lineage + resume (north_rule).

Engine analogue of the reference's commit protocol:

- tmp-file + atomic rename per output file (``src/diffs.rs:105-149``,
  ``-tmp.osc.gz`` then ``fs::rename``)
- the manifest (sequence pointer + per-partition lineage records with
  row/byte counters) is committed LAST, mirroring the ``state.txt``
  symlink flipped after all outputs land (``src/update.rs:138-143``)
- a re-run anti-joins the done-partition set and recomputes nothing
  (the reference re-runs from ``cur_state+1``, ``src/update.rs:64-74``)
- an exclusive job lock guards the manifest dir (``fd-lock`` around the
  whole run, ``src/bin/update.rs:30-41``)

Partition ids are caller-defined (poly-tree path for tile routing, key
range for id-partitioned stores) — anything stable across runs.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field


@dataclass
class PartitionRecord:
    partition_id: str
    rows: int
    bytes: int
    path: str | None = None
    meta: dict = field(default_factory=dict)


class CheckpointManifest:
    """JSON manifest in ``dir/manifest.json``; all mutation is staged in
    memory and lands atomically on ``commit(seq)``."""

    def __init__(self, directory: str):
        self.dir = directory
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "manifest.json")
        self._state: dict = {"sequence": None, "partitions": {}}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as f:
                self._state = json.load(f)
        self._staged: dict[str, dict] = {}
        self._lock_fd: int | None = None

    # -- job lock (one writer per manifest dir) --
    def acquire_lock(self) -> None:
        import fcntl

        fd = os.open(os.path.join(self.dir, "update.lock"), os.O_CREAT | os.O_RDWR)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            os.close(fd)
            raise RuntimeError("another run holds the manifest lock") from e
        self._lock_fd = fd

    def release_lock(self) -> None:
        if self._lock_fd is not None:
            os.close(self._lock_fd)
            self._lock_fd = None

    # -- lineage --
    @property
    def sequence(self):
        return self._state.get("sequence")

    def done(self) -> set[str]:
        return {
            pid
            for pid, rec in self._state["partitions"].items()
            if rec.get("status") == "done"
        }

    def totals(self) -> tuple[int, int]:
        rows = sum(r.get("rows", 0) for r in self._state["partitions"].values())
        nbytes = sum(r.get("bytes", 0) for r in self._state["partitions"].values())
        return rows, nbytes

    def stage(self, rec: PartitionRecord) -> None:
        self._staged[rec.partition_id] = {
            "status": "done",
            "rows": int(rec.rows),
            "bytes": int(rec.bytes),
            "path": rec.path,
            **({"meta": rec.meta} if rec.meta else {}),
        }

    def commit(self, sequence: int | None = None) -> None:
        """Atomic: merge staged records, bump sequence, tmp+rename."""
        self._state["partitions"].update(self._staged)
        if sequence is not None:
            self._state["sequence"] = sequence
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".manifest-tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(self._state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)  # the commit point
        self._staged.clear()


def atomic_write_parquet(table, path: str) -> int:
    """Write a pyarrow table via tmp + rename; returns bytes written."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path), suffix="-tmp.parquet"
    )
    os.close(fd)
    pq.write_table(table, tmp)
    nbytes = os.path.getsize(tmp)
    os.replace(tmp, path)
    return nbytes


def write_partitioned(ds, out_dir: str, key_col: str,
                      manifest: CheckpointManifest, sequence: int | None = None,
                      max_keys: int = 4096, commit: bool = True,
                      id_prefix: str = ""):
    """Resumable partitioned write: one parquet dir per key value.

    - rows whose key is already committed in ``manifest`` are skipped
      entirely (anti-join against the done set, applied at the batch
      level — no recomputation of finished partitions)
    - each partition writes via tmp+rename, then its lineage record
      (rows / bytes / path) is staged; the manifest commits LAST
    - key domain must be bounded (tile/tree routing); the per-group
      write runs distributed via groupby().map_groups
    - ``id_prefix`` scopes the lineage partition ids (e.g.
      ``"seq=3/"``) so callers that write the SAME key domain once per
      micro-batch don't have batch N's done-set swallow batch N+1's
      rows; the key-column values themselves stay unprefixed

    Returns the list of PartitionRecords written this run.
    """
    import pyarrow as pa

    done = {
        pid[len(id_prefix):]
        for pid in manifest.done()
        if pid.startswith(id_prefix)
    }

    def drop_done(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if not done:
            return batch
        mask = pc.invert(
            pc.is_in(batch[key_col], value_set=pa.array(list(done)))
        )
        return batch.filter(mask)

    def write_group(group: pa.Table) -> pa.Table:
        key = str(group[key_col][0].as_py())
        safe = key.replace("/", "__").strip(".")
        path = os.path.join(out_dir, f"{key_col}={safe}", "part-0.parquet")
        nbytes = atomic_write_parquet(group, path)
        return pa.table(
            {
                "partition_id": pa.array([key], pa.string()),
                "rows": pa.array([len(group)], pa.int64()),
                "bytes": pa.array([nbytes], pa.int64()),
                "path": pa.array([path], pa.string()),
            }
        )

    pending = ds.map_batches(drop_done, batch_format="pyarrow")
    lineage = pending.groupby(key_col).map_groups(
        write_group, batch_format="pyarrow"
    )
    records = [
        PartitionRecord(
            partition_id=id_prefix + r["partition_id"],
            rows=r["rows"],
            bytes=r["bytes"],
            path=r["path"],
        )
        for r in lineage.take_all()
    ]
    if len(records) > max_keys:
        raise ValueError(
            f"{len(records)} partitions exceeds max_keys={max_keys}; "
            "use a coarser partition key"
        )
    for rec in records:
        manifest.stage(rec)
    if commit:
        manifest.commit(sequence)
    return records
