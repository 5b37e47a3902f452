"""Flagship pipeline E2E on Ray: F1 vs golden (incl. dedup), determinism
across parallelism, audit rows, entry() smoke."""

import duckdb
import numpy as np
import pytest

from engine import corpus
from engine.pipelines.quality import audit_results, quality_pipeline


@pytest.fixture(scope="module")
def verdicts(ray_session, corpus_2k):
    import ray.data as rd

    ds = rd.from_arrow(corpus_2k).repartition(8)
    out = quality_pipeline(ds, scorer_concurrency=(1, 2), num_buckets=32)
    return out.materialize()


def _golden_keep(tbl):
    con = duckdb.connect()
    con.register("c", tbl)
    rows = con.execute(
        """
        SELECT row_id,
          (violation_class NOT IN ('empty_null','empty_ws','long_line','low_alpha',
                                   'wrong_lang','gibberish','missing_lang'))
          AND NOT (content IS NOT NULL AND ROW_NUMBER() OVER
                   (PARTITION BY content ORDER BY repo, path, commit) > 1) AS keep
        FROM c
        """
    ).fetchall()
    return dict(rows)


def test_keep_f1_with_dedup(verdicts, corpus_2k):
    golden = _golden_keep(corpus_2k)
    got = {r["row_id"]: r["keep"] for r in
           verdicts.select_columns(["row_id", "keep"]).take_all()}
    ids = sorted(golden)
    g = np.array([golden[i] for i in ids])
    k = np.array([got[i] for i in ids])
    tp = (g & k).sum()
    f1 = 2 * tp / (g.sum() + k.sum())
    assert f1 >= 0.99, f1


def test_output_schema(verdicts):
    names = set(verdicts.schema().names)
    for col in ["repo", "path", "commit", "lang", "content", "n_chars",
                "lang_pred", "lang_conf", "ppl", "content_sha256_pre",
                "content_sha256", "keep", "drop_reasons", "dup_flag",
                "email_redactions", "key_redactions", "toxic_redactions"]:
        assert col in names, col


def test_audit_rows(verdicts):
    results = audit_results(verdicts)
    by_id = {r.rule_id: r for r in results}
    assert by_id["QF-EMPTY"].total_rows == 2000
    assert by_id["QF-EMPTY"].violation_count == 20
    assert by_id["QF-LANG-NULL"].violation_count == 20
    assert by_id["QF-DUP"].violation_count > 0
    # every audit row carries the 11-column CheckResult shape
    row = results[0].to_row()
    for field in ["rule_id", "check_type", "status", "total_rows",
                  "violation_count", "violation_ratio", "details", "executed_at"]:
        assert field in row


def test_pipeline_parallelism_invariant(ray_session, corpus_2k):
    """Same verdict bytes at 2 and 12 blocks (precondition of honest
    scaling numbers)."""
    import ray.data as rd

    def run(nblocks):
        ds = rd.from_arrow(corpus_2k).repartition(nblocks)
        out = quality_pipeline(ds, scorer_concurrency=(1, 2), num_buckets=16)
        rows = out.select_columns(["row_id", "keep", "content_sha256"]).take_all()
        return {r["row_id"]: (r["keep"], r["content_sha256"]) for r in rows}

    assert run(2) == run(12)


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    out = mod.entry()
    t = out.materialize()
    assert t.count() > 0
    assert "keep" in t.schema().names


def test_actor_mode_scorer_matches_tasks_mode(ray_session, corpus_2k):
    """The actor-pool scorer path (explicit concurrency) must produce the
    same verdicts as the default tasks-mode path."""
    import ray.data as rd

    ds = rd.from_arrow(corpus_2k).repartition(4)
    tasks = quality_pipeline(ds, num_buckets=16)
    actors = quality_pipeline(ds, scorer_concurrency=(1, 2), num_buckets=16)
    a = {r["row_id"]: (r["keep"], r["lang_pred"])
         for r in tasks.select_columns(["row_id", "keep", "lang_pred"]).take_all()}
    b = {r["row_id"]: (r["keep"], r["lang_pred"])
         for r in actors.select_columns(["row_id", "keep", "lang_pred"]).take_all()}
    assert a == b


def test_example_script(ray_session):
    """The runnable example detects every planted issue (reference
    examples/sample_validation.py parity)."""
    import examples.sample_validation as ex

    import tempfile

    from engine.validate import run_validation

    with tempfile.TemporaryDirectory() as td:
        ex.build_tables(td)
        results, summary = run_validation(td, ex.RULES)
    counts = {r.rule_id: r.violation_count for r in results}
    assert counts == {"CNT-001": 1, "NULL-001": 2, "DUP-001": 1,
                      "RNG-001": 1, "FK-001": 1, "MASK-001": 2, "MASK-004": 2}
    assert summary["failed"] == 7


def test_pipeline_strip_spans_stage(ray_session, corpus_2k):
    """Optional thresholds-gated repeated-span excision (round-4 verdict
    item 8): spans strip BEFORE scoring, so sha256/metrics/dedup see the
    stripped bytes. Rows that lost no span pass through byte-identical;
    stripped rows shrink by exactly n_removed; full-doc duplicates (the
    planted dup groups) are fully covered and strip to empty."""
    import ray.data as rd

    from engine.stages.spans import DEFAULT_SPAN_K

    ds = rd.from_arrow(corpus_2k).repartition(8)
    out = quality_pipeline(
        ds, scorer_concurrency=(1, 2), num_buckets=32,
        thresholds={"strip_spans": True},
    ).materialize()
    assert "n_removed" in out.schema().names
    # compare PRE-scrub: n_chars and content_sha256_pre are computed by
    # the score stage after the strip but before PII scrubbing
    import hashlib

    orig = {r["row_id"]: r["content"] for r in
            corpus_2k.select(["row_id", "content"]).to_pylist()}
    cls = {r["row_id"]: r["violation_class"] for r in
           corpus_2k.select(["row_id", "violation_class"]).to_pylist()}
    rows = out.select_columns(
        ["row_id", "n_chars", "n_removed", "content_sha256_pre"]).take_all()
    n_stripped = 0
    for r in rows:
        o = orig[r["row_id"]]
        if o is None:
            continue
        if r["n_removed"] == 0:
            # sha256 invariant holds for rows that lost no span
            assert r["content_sha256_pre"] == \
                hashlib.sha256(o.encode()).hexdigest()
        else:
            n_stripped += 1
        # n_chars and n_removed are both byte counts
        assert r["n_chars"] == len(o.encode()) - r["n_removed"]
    assert n_stripped > 0
    # every dup-group member long enough to carry a k-gram is fully
    # covered by cross-doc spans -> stripped to empty
    for r in rows:
        if cls[r["row_id"]] == "duplicate" and \
                len(orig[r["row_id"]] or "") >= DEFAULT_SPAN_K:
            assert r["n_chars"] == 0, r["row_id"]


def test_pipeline_strip_spans_default_off(ray_session, corpus_2k):
    """The default flagship plan is unchanged: no strip stage, no
    n_removed column, caller's thresholds dict not mutated."""
    import ray.data as rd

    thresholds = {"strip_spans": False}
    out = quality_pipeline(
        rd.from_arrow(corpus_2k.slice(0, 200)), scorer_concurrency=(1, 1),
        num_buckets=8, thresholds=thresholds)
    assert "n_removed" not in out.schema().names
    assert thresholds == {"strip_spans": False}
