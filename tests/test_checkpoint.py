"""Checkpoint/resume: kill-after-k-partitions simulation (BASELINE.md) —
re-run skips committed partitions and final output is identical."""

import json
import os
import shutil

import duckdb
import pytest

from engine import corpus
from engine.checkpoint import plan_partitions, run_checkpointed


@pytest.fixture(scope="module")
def ckpt_dirs(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt")
    in_dir = str(base / "in")
    corpus.write_corpus(in_dir, 4000, num_blocks=8)
    return in_dir, str(base / "out")


def test_partition_plan_stable(ckpt_dirs):
    in_dir, _ = ckpt_dirs
    a = plan_partitions(in_dir, 4)
    b = plan_partitions(in_dir, 4)
    assert a == b
    assert sum(len(p) for p in a) == len(
        [f for f in os.listdir(in_dir) if f.endswith(".parquet")]
    )


def test_run_resume_and_identical_output(ckpt_dirs):
    in_dir, out_dir = ckpt_dirs
    s1 = run_checkpointed(in_dir, out_dir, n_parts=4)
    assert len(s1["computed"]) == 4 and not s1["skipped_committed"]
    assert s1["rows"] == 4000

    con = duckdb.connect()
    before = con.execute(
        f"SELECT path, keep, content_sha256 FROM read_parquet('{out_dir}/part-*/*.parquet') ORDER BY path"
    ).fetchall()

    # kill-after-k: wipe partitions 2,3 and re-run
    for pid in (2, 3):
        os.remove(f"{out_dir}/_manifest/part-{pid:05d}.json")
        shutil.rmtree(f"{out_dir}/part-{pid:05d}")
    s2 = run_checkpointed(in_dir, out_dir, n_parts=4)
    assert s2["computed"] == [2, 3]
    assert s2["skipped_committed"] == [0, 1]

    after = con.execute(
        f"SELECT path, keep, content_sha256 FROM read_parquet('{out_dir}/part-*/*.parquet') ORDER BY path"
    ).fetchall()
    assert before == after

    # idempotent third run: everything skipped
    s3 = run_checkpointed(in_dir, out_dir, n_parts=4)
    assert not s3["computed"] and len(s3["skipped_committed"]) == 4


def test_manifest_lineage(ckpt_dirs):
    in_dir, out_dir = ckpt_dirs
    with open(f"{out_dir}/_manifest/part-00000.json") as fh:
        m = json.load(fh)
    for field in ["partition", "input_files", "engine_version", "rules_hash",
                  "rows", "rows_kept", "drop_reason_counts", "wall_sec",
                  "email_redactions", "committed_at"]:
        assert field in m, field
    assert all(os.path.exists(f) for f in m["input_files"])


def test_checkpointed_matches_single_stream(ckpt_dirs):
    """The metadata-shuffle dedup path must agree with the single-stream
    full-row-shuffle path row for row."""
    import ray.data as rd

    from engine.pipelines.quality import quality_pipeline

    in_dir, out_dir = ckpt_dirs
    single = {
        r["path"]: (r["keep"], r["dup_flag"])
        for r in quality_pipeline(rd.read_parquet(in_dir))
        .select_columns(["path", "keep", "dup_flag"]).take_all()
    }
    con = duckdb.connect()
    ck = con.execute(
        f"SELECT path, keep, dup_flag FROM read_parquet('{out_dir}/part-*/*.parquet')"
    ).fetchall()
    assert len(ck) == len(single)
    for path, keep, dup in ck:
        assert single[path] == (keep, dup), path


def test_dedup_metadata_phase_resume(ray_session, tmp_path):
    """Phase-A hashing is itself resumable: wiping one pid's metadata and
    its marker recomputes only that pid; decisions stay identical."""
    import glob

    from engine import corpus
    from engine.checkpoint import dedup_decisions, plan_partitions

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 1000, num_blocks=4)
    work = str(tmp_path / "work")
    parts = plan_partitions(in_dir, 4)

    d1 = dedup_decisions(parts, work)
    before = sorted(glob.glob(f"{d1}/pid=*/**/*.parquet", recursive=True))
    assert before

    import duckdb

    con = duckdb.connect()
    snap1 = con.execute(
        f"SELECT repo, path, commit, dup_flag FROM read_parquet('{d1}/pid=*/*.parquet') ORDER BY path"
    ).fetchall()

    # wipe pid 2's metadata + marker AND the committed decisions; re-run
    shutil.rmtree(f"{work}/_dedupmeta/pid=2")
    os.remove(f"{work}/_dedupmeta/.done-2")
    shutil.rmtree(d1)
    d2 = dedup_decisions(parts, work)
    snap2 = con.execute(
        f"SELECT repo, path, commit, dup_flag FROM read_parquet('{d2}/pid=*/*.parquet') ORDER BY path"
    ).fetchall()
    assert snap1 == snap2


def test_resume_invalidated_by_rules_change(ray_session, tmp_path):
    """A committed manifest is only honored if it was produced under the
    SAME rules_hash and input files — changed thresholds must recompute
    every partition instead of silently mixing rule sets."""
    from engine.checkpoint import run_checkpointed

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 800, num_blocks=4)
    out_dir = str(tmp_path / "out")

    s1 = run_checkpointed(in_dir, out_dir, n_parts=2)
    assert len(s1["computed"]) == 2

    # same rules -> full skip
    s2 = run_checkpointed(in_dir, out_dir, n_parts=2)
    assert not s2["computed"]

    # changed thresholds -> stale manifests invalidated, all recomputed
    s3 = run_checkpointed(in_dir, out_dir, n_parts=2,
                          thresholds={"min_chars": 5})
    assert len(s3["computed"]) == 2 and not s3["skipped_committed"]
    assert s3["rules_hash"] != s1["rules_hash"]


def test_dedup_marker_invalidated_by_plan_change(ray_session, tmp_path):
    """The dedup _SUCCESS marker records the partition-plan hash; adding an
    input file (shifting the round-robin plan) must recompute decisions."""
    import pyarrow.parquet as pq

    from engine.checkpoint import dedup_decisions, plan_partitions

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 400, num_blocks=4)
    work = str(tmp_path / "work")

    parts1 = plan_partitions(in_dir, 2)
    dedup_decisions(parts1, work)

    # add one more input file -> new plan -> marker must not be trusted
    src = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(in_dir, src))
    pq.write_table(t.slice(0, 10), os.path.join(in_dir, "zz-extra.parquet"))
    parts2 = plan_partitions(in_dir, 2)
    assert parts2 != parts1

    d = dedup_decisions(parts2, work)
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/pid=*/*.parquet')"
    ).fetchone()[0]
    assert n == 410  # decisions cover the NEW plan, not the stale cached one


def test_dedup_phase_a_tmp_leftover_cleanup(ray_session, tmp_path):
    """A leftover pid=N.tmp-... dir from a killed phase-A write must be
    swept on resume (not crash the numeric pid parse, not be hive-read)."""
    from engine.checkpoint import dedup_decisions, plan_partitions

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 400, num_blocks=4)
    work = str(tmp_path / "work")
    parts = plan_partitions(in_dir, 2)
    dedup_decisions(parts, work)

    # simulate an interrupted write + wipe the committed marker
    os.makedirs(f"{work}/_dedupmeta/pid=1.tmp-deadbeef", exist_ok=True)
    with open(f"{work}/_dedupmeta/pid=1.tmp-deadbeef/junk.txt", "w") as fh:
        fh.write("partial")
    os.remove(f"{work}/_dedup/_SUCCESS")

    d = dedup_decisions(parts, work)  # must not raise
    assert not any(".tmp-" in p for p in os.listdir(f"{work}/_dedupmeta"))
    import duckdb

    con = duckdb.connect()
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{d}/pid=*/*.parquet')"
    ).fetchone()[0]
    assert n == 400


def test_resume_invalidated_by_plan_change(ray_session, tmp_path):
    """Adding an input file changes the GLOBAL partition plan; every
    committed partition must recompute (duplicate verdicts are global)."""
    import pyarrow.parquet as pq

    from engine.checkpoint import run_checkpointed

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 400, num_blocks=4)
    out_dir = str(tmp_path / "out")
    s1 = run_checkpointed(in_dir, out_dir, n_parts=2)
    assert len(s1["computed"]) == 2

    src = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(in_dir, src))
    pq.write_table(t.slice(0, 5), os.path.join(in_dir, "zz-extra.parquet"))

    s2 = run_checkpointed(in_dir, out_dir, n_parts=2)
    assert len(s2["computed"]) == 2 and not s2["skipped_committed"]
    assert s2["rows"] == 405
