"""The flagship pipeline: language-ID + quality-filter + PII/toxicity scrub.

Generalizes the reference's six-checker validation run
(reference: src/main.py:117-152 — Count → Null → Duplicate → Range →
Transform → Masking over MySQL tables) into one streaming Ray Data
pipeline over the source-code corpus (SURVEY.md §7.1):

    read_parquet(corpus)
      -> map_batches(metrics + sha256)          [stateless tasks]
      -> map_batches(LangIdScorer, actor pool)  [stateful]
      -> map_batches(PerplexityScorer, actors)  [stateful]
      -> dedup (local pre-dedup + bucketed groupby shuffle)
      -> map_batches(verdict rules)             [stateless]
      -> map_batches(scrubber)                  [stateless, RE2 kernels]
      -> verdict Dataset (keep/drop + scrubbed content + audit columns)

Everything streams; nothing materializes the corpus. The only all-to-all
exchange is the dedup groupby (bucketed, skew-capped — see stages/dedup.py).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ..stages import dedup as dedup_stage
from ..stages.heuristics import add_verdict
from ..stages.models import build_models
from ..stages.score import ScoreStage, scorer_task
from ..stages.scrub import scrub_batch
from ..audit import CheckResult, CheckStatus, make_result, threshold_status


def quality_pipeline(
    ds,
    *,
    scorer_concurrency: tuple[int, int] | int | None = None,
    batch_size: Optional[int] = None,
    dedup: bool = True,
    dup_flag_fn=None,
    num_buckets: int = dedup_stage.DEFAULT_NUM_BUCKETS,
    thresholds: Optional[dict] = None,
):
    """corpus Dataset -> verdict Dataset (lazy; caller consumes/writes).

    ``scorer_concurrency=None`` (default) runs the fused scorer as
    stateless tasks with object-store-cached models — elastic across the
    node, no actor-pool ramp-up (see stages/score.py). Pass an int or
    ``(min, max)`` to force an actor pool instead.
    ``thresholds`` may override the verdict-rule knobs (min_chars, ...).
    """
    import ray

    langid, lm = build_models()
    thresholds = dict(thresholds or {})

    # Optional repeated-span excision (Lee-et-al-style, stages/spans.py)
    # BEFORE scoring, so metrics / sha256 / dedup all see the stripped
    # bytes — the sha256 invariant holds pipeline-internally and is
    # relaxed vs the raw input only for rows that actually lost spans
    # (their ``n_removed`` > 0). Gated through ``thresholds`` so the
    # default flagship plan is unchanged.
    if thresholds.pop("strip_spans", False):
        from ..stages.spans import DEFAULT_SPAN_K, strip_duplicate_spans

        ds = strip_duplicate_spans(
            ds, text_col="content", key_col="path",
            k=thresholds.pop("span_k", DEFAULT_SPAN_K),
        )

    if scorer_concurrency is None:
        score_fn = scorer_task(ray.put(langid), ray.put(lm))
        ds = ds.map_batches(
            score_fn, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
    else:
        ds = ds.map_batches(
            ScoreStage,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=scorer_concurrency,
            fn_constructor_kwargs={"langid": langid, "lm": lm},
            num_cpus=1,
        )
    if dup_flag_fn is not None:
        # externally computed duplicate verdicts (checkpointed runs join
        # their partition's decision file — see engine/checkpoint.py)
        ds = ds.map_batches(dup_flag_fn, batch_format="pyarrow")
    elif dedup:
        ds = dedup_stage.mark_duplicates(ds, num_buckets=num_buckets)
    ds = ds.map_batches(
        lambda b: add_verdict(b, **thresholds), batch_format="pyarrow"
    )
    ds = ds.map_batches(scrub_batch, batch_format="pyarrow")
    return ds


def corpus_from_documents(sf_dir: str):
    """Adapt the driver ``documents`` table to the corpus input shape
    (repo, path, commit, lang, content) — used by the entry() smoke run."""
    import hashlib

    import ray.data as rd

    from ..stages.textfeat import byte_view

    # Only the four columns the corpus shape needs leave storage — at
    # 100 TB the unused document columns never hit the object store.
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "text"],
    )

    def adapt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids_str = pc.cast(batch["doc_id"], pa.string())
        # path: one vectorized concat; commit: sha1 of the decimal doc id —
        # digests loop over memoryview slices of the Arrow buffer (same
        # idiom as heuristics._sha256_column), no per-row Python objects
        path = pc.binary_join_element_wise("doc/", ids_str, ".txt", "")
        data, offsets = byte_view(ids_str)
        mv = memoryview(data)
        commit = pa.array(
            [hashlib.sha1(mv[offsets[i]: offsets[i + 1]]).hexdigest()
             for i in range(len(offsets) - 1)],
            pa.string(),
        )
        return pa.table(
            {
                "repo": batch["source"],
                "path": path,
                "commit": commit,
                "lang": batch["lang"],
                "content": pc.cast(batch["text"], pa.large_string()),
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Audit over the verdict dataset — CheckResult rows per rule, built from
# Ray Data aggregates (reference's per-check result rows, SURVEY.md §7.1).
# ---------------------------------------------------------------------------

_DEFAULT_AUDIT_RULES = [
    # (rule_id, reason / metric, description, max_ratio for tri-state)
    ("QF-EMPTY", "empty_content", "empty or whitespace-only content", 0.02),
    ("QF-LANG-NULL", "missing_lang", "missing language label", 0.02),
    ("QF-LANG-UNK", "unknown_lang", "language label outside model label set", 0.0),
    ("QF-SHORT", "too_short", "content shorter than min_chars", 0.01),
    ("QF-LONG", "too_long", "content longer than max_chars", 0.01),
    ("QF-LINELEN", "long_lines", "max line length above threshold", 0.02),
    ("QF-ALPHA", "low_alpha", "alphabetic ratio below threshold", 0.02),
    ("QF-LANGID", "lang_mismatch", "claimed lang disagrees with langid", 0.05),
    ("QF-PPL", "high_perplexity", "perplexity above threshold", 0.03),
    ("QF-DUP", "duplicate", "exact-duplicate content (non-first copy)", 0.03),
]


def _audit_rules(config_dir=None):
    """Audit bands from config/rules/audit_rules.yml when present
    (YAML-driven rule surface, ConfigLoader parity); built-ins otherwise."""
    try:
        from ..rules import load_rules

        yaml_rules = load_rules(config_dir).get("audit", [])
    except Exception:
        yaml_rules = []
    if not yaml_rules:
        return list(_DEFAULT_AUDIT_RULES)
    defaults = {rid: desc for rid, _, desc, _ in _DEFAULT_AUDIT_RULES}
    return [
        (r["rule_id"], r["reason"],
         r.get("description", defaults.get(r["rule_id"], r["reason"])),
         float(r.get("max_ratio", 0.0)))
        for r in yaml_rules
    ]


def _audit_partials(batch: pa.Table, audit_rules) -> pa.Table:
    """Per-batch partial counters (combiner side of the audit aggregate).

    Arrow-native: the per-row reason lists are counted with
    ``pc.list_flatten`` + ``pc.value_counts`` (the value_counts result is
    bounded by the number of distinct reasons, ~10 — only that tiny table
    touches Python)."""
    import pyarrow.compute as pc

    counts = {rid: 0 for rid, *_ in audit_rules}
    flat = pc.list_flatten(batch["drop_reasons"])
    if len(flat):
        reason_to_rid = {reason: rid for rid, reason, *_ in audit_rules}
        vc = pc.value_counts(flat)
        for v, c in zip(vc.field("values").to_pylist(),
                        vc.field("counts").to_pylist()):
            rid = reason_to_rid.get(v)
            if rid:
                counts[rid] += int(c)
    row = {
        "total_rows": [batch.num_rows],
        "kept_rows": [int(pc_sum(batch, "keep"))],
        "email_redactions": [int(pc_sum(batch, "email_redactions"))],
        "key_redactions": [int(pc_sum(batch, "key_redactions"))],
        "toxic_redactions": [int(pc_sum(batch, "toxic_redactions"))],
    }
    for rid, cnt in counts.items():
        row[rid] = [cnt]
    return pa.table(row)


def pc_sum(batch: pa.Table, col: str) -> int:
    import pyarrow.compute as pc

    if col not in batch.column_names:
        return 0
    v = pc.sum(batch[col]).as_py()
    return v or 0


def audit_results(verdict_ds, config_dir=None) -> list[CheckResult]:
    """One streaming pass -> CheckResult list (partial counts + global sum).

    ``config_dir`` selects the audit-band YAML at run time (never cached at
    import: a user-supplied --config-dir and live YAML edits must be honored).
    """
    from ray.data.aggregate import Sum

    audit_rules = _audit_rules(config_dir)
    partials = verdict_ds.map_batches(
        lambda b: _audit_partials(b, audit_rules), batch_format="pyarrow"
    )
    cols = (
        ["total_rows", "kept_rows", "email_redactions", "key_redactions", "toxic_redactions"]
        + [rid for rid, *_ in audit_rules]
    )
    totals = partials.aggregate(*[Sum(c, alias_name=c) for c in cols])
    total_rows = int(totals["total_rows"] or 0)

    results: list[CheckResult] = []
    for rid, reason, desc, max_ratio in audit_rules:
        viol = int(totals[rid] or 0)
        ratio = viol / total_rows if total_rows else 0.0
        status = (
            threshold_status(ratio, max_ratio)
            if total_rows
            else CheckStatus.WARNING
        )
        results.append(
            make_result(
                rule={"rule_id": rid, "description": desc, "table": "corpus"},
                check_type="quality",
                status=status,
                total_rows=total_rows,
                violation_count=viol,
                details={"reason": reason, "max_ratio": max_ratio},
            )
        )
    results.append(
        make_result(
            rule={
                "rule_id": "QF-KEEP",
                "description": "rows kept after all filters",
                "table": "corpus",
            },
            check_type="lineage",
            status=CheckStatus.PASS,
            total_rows=total_rows,
            violation_count=total_rows - int(totals["kept_rows"] or 0),
            details={
                "kept_rows": int(totals["kept_rows"] or 0),
                "email_redactions": int(totals["email_redactions"] or 0),
                "key_redactions": int(totals["key_redactions"] or 0),
                "toxic_redactions": int(totals["toxic_redactions"] or 0),
            },
        )
    )
    return results
