"""Child process for the SIGKILL resume tests (test_manifest.py).

Runs one replication micro-batch (pipelines/update.run_update) over the
saint_barthelemy fixtures and SIGKILLs ITSELF at the crash point
selected by ``$KILL_POINT``, leaving the on-disk store/manifest/output
state exactly as a real mid-run death would:

- ``after_write``: partition outputs + lineage are durable, the store
  mutation and the sequence-pointer commit never happen (the window
  ``pipelines/update.py`` documents between write_partitioned and
  apply_changes).
- ``after_apply``: the store mutation landed too; only the final
  sequence-pointer commit is lost (the window that relies on
  apply_changes being an idempotent last-writer-wins upsert).

Connects to the parent's Ray cluster (``$RAY_GCS``) as a second driver
so the SIGKILL orphans no local cluster — the shared GCS reaps the
dead driver's tasks.
"""

import os
import signal
import sys

RES = "/root/reference/tests/resources"


def main() -> None:
    import ray

    ray.init(
        address=os.environ["RAY_GCS"],
        include_dashboard=False,
        logging_level="ERROR",
    )
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from osm_replication_rust_ray.pipelines.update import run_update
    from osm_replication_rust_ray.sources.osmxml import parse_osm_xml
    from osm_replication_rust_ray.sources.polyfile import read_multipolygon
    from osm_replication_rust_ray.sources.store import ElementStore
    from osm_replication_rust_ray.state.manifest import CheckpointManifest

    work = os.environ["WORK_DIR"]
    point = os.environ["KILL_POINT"]

    def die(*_a, **_k):
        os.kill(os.getpid(), signal.SIGKILL)

    if point == "after_write":
        ElementStore.apply_changes = die
    elif point == "after_apply":
        orig_commit = CheckpointManifest.commit

        def commit_then_die(self, sequence=None):
            if sequence is not None:
                die()
            return orig_commit(self, sequence)

        CheckpointManifest.commit = commit_then_die
    else:  # pragma: no cover - driver error
        raise SystemExit(f"unknown KILL_POINT {point!r}")

    store = ElementStore(f"{work}/db")
    changes = parse_osm_xml(f"{RES}/saint_barthelemy.osc.gz")
    name, mp = read_multipolygon(f"{RES}/saint_barthelemy.poly")
    m = CheckpointManifest(f"{work}/ckpt")
    run_update(
        {1: changes}, store, [("./stb", name, mp)], {"./stb": None},
        f"{work}/diffs", m,
    )
    print("NOT_KILLED")  # parent asserts this never prints


if __name__ == "__main__":
    main()
