"""Per-partition checkpointed, resumable pipeline runs.

The reference has NO checkpointing — a failed run is simply re-run from
scratch by cron (SURVEY.md §4.1; scripts/setup_crontab.sh:46-48). At
100 TB that is unacceptable, so the graft adds the commit protocol the
north_rule mandates:

- input Parquet files are grouped into numbered partitions;
- each partition's output is written to ``part-{pid:05d}/`` via an atomic
  temp-dir + rename, then a JSON manifest is committed to
  ``_manifest/part-{pid:05d}.json`` with lineage (input files, rules
  version, row counts per drop reason, redaction counts, wall time);
- a re-run skips every partition whose manifest is already committed and
  produces byte-identical remaining output (pytest: kill-after-k
  simulation).

Cross-partition dedup vs per-partition checkpointing: a row's duplicate
verdict depends on ALL partitions, so dedup runs as a separate **decision
pass** first — it reads content but shuffles only ``(key, tiebreak,
partition)`` metadata (~100 B/row, not the ~1 KB content), and writes
per-partition decision files. The per-partition quality pass then joins
its own partition's decisions locally. Content therefore NEVER crosses
partitions — the shuffle that dominated the single-stream pipeline
carries 10x less data here, and each partition re-run stays deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

ENGINE_VERSION = "0.1.0"


def _list_input_files(input_dir: str) -> list[str]:
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    return files


def plan_partitions(input_dir: str, n_parts: int = 16) -> list[list[str]]:
    """Stable file->partition assignment (sorted round-robin chunks)."""
    files = _list_input_files(input_dir)
    n_parts = min(n_parts, len(files))
    return [files[i::n_parts] for i in range(n_parts)]


def _blocks_hint(n_files: int) -> int:
    """~1.5 blocks per CPU (measured 2.5x faster than many small blocks),
    bounded by file count so tiny partitions aren't over-split."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(min(cpus * 3 // 2, n_files), 1)


def _rules_hash(thresholds: Optional[dict]) -> str:
    from . import corpus

    blob = json.dumps(
        {
            "min_chars": corpus.MIN_CHARS,
            "max_chars": corpus.MAX_CHARS,
            "max_line_len": corpus.MAX_LINE_LEN,
            "min_alpha_ratio": corpus.MIN_ALPHA_RATIO,
            "max_ppl": corpus.MAX_PPL,
            "overrides": thresholds or {},
        },
        sort_keys=True, default=str,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# Phase 1 — global dedup decision pass (metadata-only shuffle)
# ---------------------------------------------------------------------------

def _plan_hash(partitions: list[list[str]]) -> str:
    """Hash of the file->partition plan: any change (files added/removed,
    round-robin shifted) must invalidate cached dedup decisions."""
    return hashlib.sha256(
        json.dumps(partitions, sort_keys=True).encode()
    ).hexdigest()[:16]


def _marker_valid(path: str, expected: str) -> bool:
    """True iff a marker file exists AND records the expected plan hash.
    Round-1 markers contained 'ok' (no hash) — treated as stale."""
    try:
        with open(path) as fh:
            return fh.read().strip() == expected
    except OSError:
        return False


def dedup_decisions(partitions: list[list[str]], work_dir: str) -> str:
    """Compute cross-partition duplicate verdicts; write them partitioned
    by input partition. Returns the decisions directory.

    Shuffle key: content sha256; winner: min (repo, path, commit) —
    identical semantics to stages/dedup.py, but only ~100 B/row moves.

    Two sub-phases (a single union of per-partition datasets measured ~5x
    slower in Ray's executor, so the hand-off goes through tiny metadata
    parquet instead — which also makes hashing resumable per partition):

    A. per partition: read content -> sha256 -> write
       ``_dedupmeta/pid=N`` metadata rows (committed marker per pid);
    B. once: read all metadata (hive pid column recovered) ->
       mark_duplicates -> write ``_dedup`` partitioned by pid.

    Every skip is validated against the current partition plan: the global
    ``_SUCCESS`` marker records the full plan hash, each per-pid ``.done``
    marker records that partition's file-list hash — adding input files
    (which shifts the round-robin plan) invalidates exactly the stale parts.
    """
    import ray.data as rd

    from .stages.dedup import mark_duplicates
    from .stages.heuristics import add_metrics

    plan_hash = _plan_hash(partitions)
    out = os.path.join(work_dir, "_dedup")
    marker = os.path.join(out, "_SUCCESS")
    if _marker_valid(marker, plan_hash):
        return out

    # Phase A — per-partition hashing to metadata parquet (resumable)
    import re as _re

    meta_dir = os.path.join(work_dir, "_dedupmeta")
    os.makedirs(meta_dir, exist_ok=True)
    # drop leftover temp dirs from interrupted writes (they'd otherwise be
    # hive-read by phase B AND break the numeric parse below) and metadata
    # of partitions beyond the current plan (plan shrank)
    for stale in os.listdir(meta_dir):
        m = _re.fullmatch(r"pid=(\d+)", stale)
        if stale.startswith("pid=") and m is None:
            shutil.rmtree(os.path.join(meta_dir, stale), ignore_errors=True)
        elif m and int(m.group(1)) >= len(partitions):
            shutil.rmtree(os.path.join(meta_dir, stale), ignore_errors=True)
            try:
                os.remove(os.path.join(meta_dir, f".done-{m.group(1)}"))
            except OSError:
                pass
    for pid, files in enumerate(partitions):
        pdir = os.path.join(meta_dir, f"pid={pid}")
        done = os.path.join(meta_dir, f".done-{pid}")  # dot-file: invisible
        files_hash = _plan_hash([files])               # to the parquet reader
        if _marker_valid(done, files_hash) and os.path.isdir(pdir):
            continue
        ds = rd.read_parquet(files, columns=["repo", "path", "commit", "content"],
                             override_num_blocks=_blocks_hint(len(files)))
        meta = ds.map_batches(
            lambda b: add_metrics(b).select(
                ["repo", "path", "commit", "content_sha256_pre"]),
            batch_format="pyarrow",
        )
        tmp = pdir + ".tmp-" + uuid.uuid4().hex[:8]
        meta.write_parquet(tmp)
        shutil.rmtree(pdir, ignore_errors=True)
        os.replace(tmp, pdir)
        with open(done, "w") as fh:
            fh.write(files_hash)

    # Phase B — one global metadata-only dedup shuffle
    tmp = out + ".tmp-" + uuid.uuid4().hex[:8]
    all_meta = rd.read_parquet(meta_dir)  # hive layout recovers `pid`
    marked = mark_duplicates(all_meta)
    os.makedirs(tmp, exist_ok=True)
    marked.write_parquet(tmp, partition_cols=["pid"])
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    with open(marker, "w") as fh:
        fh.write(plan_hash)
    return out


def _joined_key(t: pa.Table) -> pa.Array:
    """(repo, path, commit) -> one string key (vectorized)."""
    k = pc.binary_join_element_wise(t["repo"], t["path"], "\x1f")
    return pc.binary_join_element_wise(k, t["commit"], "\x1f")


def _load_decisions(decisions_dir: str, pid: int):
    """Partition decisions as (sorted_keys, flags) numpy arrays — probed
    with vectorized searchsorted in the quality pass, no per-row dicts."""
    import numpy as np
    import pyarrow.dataset as pads

    path = os.path.join(decisions_dir, f"pid={pid}")
    if not os.path.isdir(path):
        return (np.array([], dtype=object), np.array([], dtype=bool))
    t = pads.dataset(path).to_table(columns=["repo", "path", "commit", "dup_flag"])
    keys = _joined_key(t).to_numpy(zero_copy_only=False)
    flags = t["dup_flag"].to_numpy(zero_copy_only=False).astype(bool)
    order = np.argsort(keys)
    return keys[order], flags[order]


# ---------------------------------------------------------------------------
# Phase 2 — per-partition quality pass with committed manifests
# ---------------------------------------------------------------------------

def _attach_decisions(decisions_ref):
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import ray

        keys, flags = ray.get(decisions_ref)
        bk = _joined_key(batch).to_numpy(zero_copy_only=False)
        if len(keys):
            pos = np.clip(np.searchsorted(keys, bk), 0, len(keys) - 1)
            hit = keys[pos] == bk
            out = np.where(hit, flags[pos], False)
        else:
            out = np.zeros(len(bk), dtype=bool)
        return batch.append_column("dup_flag", pa.array(out, pa.bool_()))

    return fn


def _partition_audit(part_dir: str) -> dict:
    """Audit counters read back from the COMMITTED parquet (also validates
    the write). Reads only the small columns — content stays on disk."""
    import pyarrow.dataset as pads

    t = pads.dataset(part_dir).to_table(
        columns=["keep", "drop_reasons", "email_redactions",
                 "key_redactions", "toxic_redactions"]
    )
    reasons: dict[str, int] = {}
    for lst in t["drop_reasons"].to_pylist():
        for r in lst or ():
            reasons[r] = reasons.get(r, 0) + 1
    return {
        "rows": t.num_rows,
        "rows_kept": int(pc.sum(pc.cast(t["keep"], pa.int64())).as_py() or 0),
        "drop_reason_counts": reasons,
        "email_redactions": int(pc.sum(t["email_redactions"]).as_py() or 0),
        "key_redactions": int(pc.sum(t["key_redactions"]).as_py() or 0),
        "toxic_redactions": int(pc.sum(t["toxic_redactions"]).as_py() or 0),
    }


def run_checkpointed(
    input_dir: str,
    out_dir: str,
    *,
    n_parts: int = 16,
    thresholds: Optional[dict] = None,
    progress=None,
) -> dict:
    """Resumable flagship run. Returns the run summary (also persisted to
    ``_manifest/summary.json``).

    Idempotent: partitions with committed manifests are skipped; a crash
    mid-partition leaves only a ``.tmp-*`` dir (ignored and replaced on
    re-run).
    """
    import ray.data as rd

    from .pipelines.quality import quality_pipeline

    t_run = time.time()
    partitions = plan_partitions(input_dir, n_parts)
    manifest_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    rules_hash = _rules_hash(thresholds)
    plan_hash = _plan_hash(partitions)

    decisions_dir = dedup_decisions(partitions, out_dir)

    done, skipped = [], []
    for pid, files in enumerate(partitions):
        mpath = os.path.join(manifest_dir, f"part-{pid:05d}.json")
        part_dir = os.path.join(out_dir, f"part-{pid:05d}")
        if os.path.exists(mpath) and os.path.isdir(part_dir):
            # a committed manifest only counts if it was computed under the
            # SAME rules and the SAME partition PLAN. The plan hash (not
            # just this partition's file list) matters because duplicate
            # verdicts are GLOBAL: adding one input file can flip which
            # copy of a cross-partition duplicate wins, changing the
            # correct output of partitions whose own files didn't move.
            try:
                with open(mpath) as fh:
                    prev = json.load(fh)
                fresh = (prev.get("rules_hash") == rules_hash
                         and prev.get("plan_hash") == plan_hash
                         and prev.get("input_files") == files)
            except (OSError, json.JSONDecodeError):
                fresh = False
            if fresh:
                skipped.append(pid)
                continue
            os.remove(mpath)
        t0 = time.time()
        import ray

        decisions = _load_decisions(decisions_dir, pid)
        dref = ray.put(decisions)

        ds = rd.read_parquet(files, override_num_blocks=_blocks_hint(len(files)))
        ds = quality_pipeline(
            ds, dedup=False, dup_flag_fn=_attach_decisions(dref),
            thresholds=thresholds,
        )

        tmp_dir = part_dir + ".tmp-" + uuid.uuid4().hex[:8]
        ds.write_parquet(tmp_dir)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.replace(tmp_dir, part_dir)

        audit = _partition_audit(part_dir)
        manifest = {
            "partition": pid,
            "input_files": files,
            "engine_version": ENGINE_VERSION,
            "rules_hash": rules_hash,
            "plan_hash": plan_hash,
            "wall_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
            **audit,
        }
        with open(mpath + ".tmp", "w") as fh:
            json.dump(manifest, fh, indent=1)
        os.replace(mpath + ".tmp", mpath)
        done.append(pid)
        if progress:
            progress(pid, manifest)

    manifests = []
    for pid in range(len(partitions)):
        with open(os.path.join(manifest_dir, f"part-{pid:05d}.json")) as fh:
            manifests.append(json.load(fh))
    summary = {
        "partitions": len(partitions),
        "computed": done,
        "skipped_committed": skipped,
        "rows": sum(m["rows"] for m in manifests),
        "rows_kept": sum(m["rows_kept"] for m in manifests),
        "email_redactions": sum(m["email_redactions"] for m in manifests),
        "key_redactions": sum(m["key_redactions"] for m in manifests),
        "toxic_redactions": sum(m["toxic_redactions"] for m in manifests),
        "rules_hash": rules_hash,
        "wall_sec": round(time.time() - t_run, 3),
    }
    with open(os.path.join(manifest_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary
