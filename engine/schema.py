"""Arrow schemas for the corpus and audit tables.

Reference mapping (SURVEY.md §1.4):
- the corpus table shape comes from BASELINE.json ``input_hint``:
  ``(repo, path, commit, lang, content)`` — all strings, ``content`` as
  ``large_string`` so a single block can exceed 2 GiB of text safely;
- the audit table mirrors the reference's CheckResult dataclass /
  ``dq_validation_results`` DDL (reference: src/checker/base_checker.py:26-69,
  sql/init_schema.sql:128-143): 11 columns, ``details`` as a JSON string.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Corpus (input) schema — per BASELINE.json input_hint.
# ---------------------------------------------------------------------------

CORPUS_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

#: Columns appended by the quality pipeline, in stage order.
VERDICT_FIELDS = [
    # metrics (heuristics stage)
    pa.field("n_chars", pa.int64()),
    pa.field("n_lines", pa.int64()),
    pa.field("max_line_len", pa.int64()),
    pa.field("alpha_ratio", pa.float64()),
    # scorer stages
    pa.field("lang_pred", pa.string()),
    pa.field("lang_conf", pa.float64()),
    pa.field("ppl", pa.float64()),
    # content hashing / scrub stage
    pa.field("content_sha256_pre", pa.string()),
    pa.field("content_sha256", pa.string()),
    pa.field("email_redactions", pa.int32()),
    pa.field("key_redactions", pa.int32()),
    pa.field("toxic_redactions", pa.int32()),
    # verdict
    pa.field("keep", pa.bool_()),
    pa.field("drop_reasons", pa.list_(pa.string())),
]

VERDICT_SCHEMA = pa.schema(list(CORPUS_SCHEMA) + VERDICT_FIELDS)

# ---------------------------------------------------------------------------
# Audit (check-result) schema — CheckResult parity.
# ---------------------------------------------------------------------------

AUDIT_SCHEMA = pa.schema(
    [
        pa.field("rule_id", pa.string()),
        pa.field("check_type", pa.string()),
        pa.field("description", pa.string()),
        pa.field("table_name", pa.string()),
        pa.field("column_name", pa.string()),
        pa.field("status", pa.string()),  # PASS / FAIL / WARNING / ERROR
        pa.field("total_rows", pa.int64()),
        pa.field("violation_count", pa.int64()),
        pa.field("violation_ratio", pa.float64()),
        pa.field("details", pa.string()),  # JSON-encoded dict
        pa.field("executed_at", pa.timestamp("us")),
    ]
)
