"""CLI surface tests (subprocess — the real binaries-analogue surface),
mirroring the reference's src/bin/{osmbin,osmxml,diffs,update}."""

import gzip
import json
import subprocess
import sys

RES = "/root/reference/tests/resources"
ENV_PY = sys.executable


def _run(*argv):
    return subprocess.run(
        [ENV_PY, "-m", "osm_replication_rust_ray.cli", *argv],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )


def test_cli_osmbin_import_read_check(tmp_path):
    d = str(tmp_path / "db")
    r = _run("osmbin", "--dir", d, "--init", "--import",
             f"{RES}/saint_barthelemy.osm.pbf")
    assert r.returncode == 0, r.stderr
    # known node from the reference's own osmbin tests (src/osmbin.rs:826-832)
    r = _run("osmbin", "--dir", d, "--read", "node", "266053077")
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    # exact golden coords from the reference's own test (src/osmbin.rs:834-843)
    assert out == {"lat": int(17.9031745 * 1e7), "lon": int(-62.8363074 * 1e7)}
    r = _run("osmbin", "--dir", d, "--read", "relation_full", "47796")
    assert r.returncode == 0, r.stderr
    rel = json.loads(r.stdout.strip().splitlines()[-1])
    assert rel and rel["id"] == 47796 and rel["members"]
    r = _run("osmbin", "--dir", d, "--check")
    # saint_barthelemy extract has dangling refs at its clip boundary OR
    # none; either way the command must succeed structurally
    assert r.returncode in (0, 1), r.stderr
    json.loads(r.stdout.strip().splitlines()[-1])


def test_cli_osmxml_convert_and_filter(tmp_path):
    out = str(tmp_path / "out.osc.gz")
    r = _run("osmxml", "--input", f"{RES}/saint_barthelemy.bbox.osc.gz",
             "--output", out, "--filter", f"{RES}/saint_barthelemy.poly")
    assert r.returncode == 0, r.stderr
    with gzip.open(out, "rt", encoding="utf-8") as f:
        text = f.read()
    assert text.startswith('<osm version="0.6">')  # reference writer root


def test_cli_update_loop(tmp_path):
    d = str(tmp_path / "db")
    _run("osmbin", "--dir", d, "--init", "--import",
         f"{RES}/saint_barthelemy.osm.pbf")
    # diff dir with one sequence; polygon tree from the repo fixtures
    diffs = tmp_path / "in"
    diffs.mkdir()
    import shutil

    shutil.copy(f"{RES}/saint_barthelemy.osc.gz", diffs / "000000001.osc.gz")
    r = _run(
        "update", "--store", d, "--polygons", f"{RES}/polygons",
        "--diff-dir", str(diffs), "--output-dir", str(tmp_path / "out"),
        "--ckpt", str(tmp_path / "ckpt"),
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["processed"] == [1]
    assert out["sequence"] == 1


def test_cli_osmxml_pbf_convert(tmp_path):
    """Extension dispatch: .pbf input converts to .osm.gz (S11)."""
    out = str(tmp_path / "converted.osm.gz")
    r = _run("osmxml", "--input", f"{RES}/saint_barthelemy.osm.pbf",
             "--output", out)
    assert r.returncode == 0, r.stderr
    with gzip.open(out, "rt", encoding="utf-8") as f:
        text = f.read()
    assert text.startswith('<osm version="0.6">')
    assert "<node id=" in text and "<way id=" in text and "<relation id=" in text


def test_cli_replicate_file_mirror(tmp_path):
    """S9 end-to-end through the CLI: file:// mirror -> download ->
    bbox -> filter -> store apply -> commit pointer."""
    import shutil

    from osm_replication_rust_ray.state.replication import seq_split

    d = str(tmp_path / "db")
    _run("osmbin", "--dir", d, "--init", "--import",
         f"{RES}/saint_barthelemy.osm.pbf")
    mirror = tmp_path / "mirror"
    for n in (2,):
        (mirror / seq_split(n)[:7]).mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{RES}/saint_barthelemy.osc.gz",
                    mirror / (seq_split(n) + ".osc.gz"))
        (mirror / (seq_split(n) + ".state.txt")).write_text(f"sequenceNumber={n}\n")
    (mirror / "state.txt").write_text("sequenceNumber=2\n")
    diffs = tmp_path / "diffs"
    (diffs / "planet" / "minute").mkdir(parents=True)
    (diffs / "planet" / "minute" / "state.txt").write_text("sequenceNumber=1\n")
    r = _run(
        "replicate", "--store", d, "--polygons", f"{RES}/polygons",
        "--diffs-dir", str(diffs), "--url", f"file://{mirror}/",
        "--output-dir", str(tmp_path / "out"), "--ckpt", str(tmp_path / "ckpt"),
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["processed"] == [2]
    assert out["sequence"] == 2


def test_cli_update_lock_blocks_second_writer(tmp_path):
    """Whole-run mutual exclusion (reference: fd-lock around update,
    src/bin/update.rs:30-41): a second writer against the same
    checkpoint manifest FAILS FAST with a lock error while the first
    holds the flock from another process."""
    import os
    import time

    d = str(tmp_path / "db")
    _run("osmbin", "--dir", d, "--init", "--import",
         f"{RES}/saint_barthelemy.osm.pbf")
    diffs = tmp_path / "in"
    diffs.mkdir()
    import shutil

    shutil.copy(f"{RES}/saint_barthelemy.osc.gz", diffs / "000000001.osc.gz")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    holder = subprocess.Popen(
        [ENV_PY, "-c", (
            "import fcntl, os, sys, time\n"
            f"fd = os.open({ckpt + '/update.lock'!r}, os.O_CREAT | os.O_RDWR)\n"
            "fcntl.flock(fd, fcntl.LOCK_EX)\n"
            "print('locked', flush=True)\n"
            "time.sleep(60)\n"
        )],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "locked"
        t0 = time.monotonic()
        r = _run(
            "update", "--store", d, "--polygons", f"{RES}/polygons",
            "--diff-dir", str(diffs), "--output-dir", str(tmp_path / "out"),
            "--ckpt", ckpt,
        )
        elapsed = time.monotonic() - t0
        assert r.returncode != 0  # errors, does not block
        assert "lock" in (r.stderr or "").lower()
        assert elapsed < 60  # fail-fast (LOCK_NB), not queued behind holder
    finally:
        holder.kill()
        holder.wait()


def test_headline_job_entrypoint(tmp_path):
    """`ray job submit` entrypoint (jobs/headline_job.py) runs
    standalone in local mode and emits the one-line JSON the N-vs-4N
    throughput comparison consumes."""
    r = subprocess.run(
        [ENV_PY, "jobs/headline_job.py", "--rows", "20000", "--counts-only"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": "local"},
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["rows"] == 20000 and out["rows_per_s"] > 0
