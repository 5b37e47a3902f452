"""CheckResult-shaped audit records and status semantics.

Replicates, bit-for-bit, the reference's result/judgment semantics
(required for the keep/drop + status F1 target):

- ``CheckStatus`` enum PASS/FAIL/WARNING/ERROR
  (reference: src/checker/base_checker.py:17-23);
- ``violation_ratio = violation_count / total_rows`` with a zero guard
  (base_checker.py:109-111);
- tri-state threshold banding: ratio <= max -> PASS, <= 2*max -> WARNING,
  else FAIL (src/checker/null_checker.py:97-102);
- count-compare zero-source guard: src == 0 -> ratio is 0.0 if tgt == 0
  else 1.0 (src/checker/count_checker.py:59-62);
- aggregate-compare guards: either side None -> WARNING; src == 0 ->
  PASS iff tgt == 0; else relative diff vs tolerance
  (src/checker/transform_checker.py:66-81);
- per-rule exception -> ERROR record, run continues
  (base_checker.py:127-135).

Audit rows are plain dicts matching ``schema.AUDIT_SCHEMA``; collections of
them convert to a small Arrow table / Ray Dataset for reporting.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Optional

import pyarrow as pa

from .schema import AUDIT_SCHEMA


class CheckStatus(str, Enum):
    PASS = "PASS"
    FAIL = "FAIL"
    WARNING = "WARNING"
    ERROR = "ERROR"


@dataclass
class CheckResult:
    """One audit record (reference: base_checker.py:26-69)."""

    rule_id: str
    check_type: str
    description: str
    table_name: str
    column_name: Optional[str] = None
    status: CheckStatus = CheckStatus.PASS
    total_rows: int = 0
    violation_count: int = 0
    violation_ratio: float = 0.0
    details: dict = field(default_factory=dict)
    executed_at: datetime = field(default_factory=datetime.now)

    def to_dict(self) -> dict:
        return {
            "rule_id": self.rule_id,
            "check_type": self.check_type,
            "description": self.description,
            "table_name": self.table_name,
            "column_name": self.column_name,
            "status": self.status.value,
            "total_rows": self.total_rows,
            "violation_count": self.violation_count,
            "violation_ratio": round(self.violation_ratio, 6),
            "details": self.details,
            "executed_at": self.executed_at.isoformat(),
        }

    def to_row(self) -> dict:
        """Arrow-ready row matching AUDIT_SCHEMA (details JSON-encoded)."""
        d = self.to_dict()
        d["details"] = json.dumps(d["details"], default=str, sort_keys=True)
        d["executed_at"] = self.executed_at
        return d


def make_result(
    rule: dict,
    check_type: str,
    status: CheckStatus,
    total_rows: int = 0,
    violation_count: int = 0,
    details: Optional[dict] = None,
) -> CheckResult:
    """Build a CheckResult from a rule dict (base_checker.py:99-125 parity)."""
    ratio = violation_count / total_rows if total_rows > 0 else 0.0
    return CheckResult(
        rule_id=rule.get("rule_id", "UNKNOWN"),
        check_type=check_type,
        description=rule.get("description", ""),
        table_name=rule.get("table", rule.get("source_table", "")),
        column_name=rule.get("column"),
        status=status,
        total_rows=int(total_rows),
        violation_count=int(violation_count),
        violation_ratio=ratio,
        details=details or {},
    )


def make_error_result(rule: dict, check_type: str, error: Exception) -> CheckResult:
    """ERROR record for a failed rule (base_checker.py:127-135 parity)."""
    return make_result(
        rule=rule,
        check_type=check_type,
        status=CheckStatus.ERROR,
        details={"error": str(error)},
    )


def threshold_status(ratio: float, max_ratio: float) -> CheckStatus:
    """Tri-state banding (null_checker.py:97-102 parity).

    Note: when max_ratio == 0, any violation lands in FAIL (2*0 == 0).
    """
    if ratio <= max_ratio:
        return CheckStatus.PASS
    if ratio <= max_ratio * 2:
        return CheckStatus.WARNING
    return CheckStatus.FAIL


def count_compare_status(
    source_count: int, target_count: int, threshold: float
) -> tuple[CheckStatus, float]:
    """PASS/FAIL + diff ratio with zero-source guard (count_checker.py:59-70)."""
    if source_count == 0:
        diff_ratio = 0.0 if target_count == 0 else 1.0
    else:
        diff_ratio = abs(source_count - target_count) / source_count
    status = CheckStatus.PASS if diff_ratio <= threshold else CheckStatus.FAIL
    return status, diff_ratio


def aggregate_compare_status(
    source_value: Optional[float], target_value: Optional[float], tolerance: float
) -> tuple[CheckStatus, Optional[float]]:
    """Tolerance compare with None/zero guards (transform_checker.py:66-81)."""
    if source_value is None or target_value is None:
        return CheckStatus.WARNING, None
    if source_value == 0:
        status = CheckStatus.PASS if target_value == 0 else CheckStatus.FAIL
        return status, abs(target_value)
    diff = abs(source_value - target_value)
    status = (
        CheckStatus.PASS
        if diff / abs(source_value) <= tolerance
        else CheckStatus.FAIL
    )
    return status, diff


def results_to_table(results: list[CheckResult]) -> pa.Table:
    """Audit rows -> Arrow table with AUDIT_SCHEMA."""
    rows = [r.to_row() for r in results]
    if not rows:
        return AUDIT_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=AUDIT_SCHEMA)


def write_results(results: list[CheckResult], audit_dir: str, run_id: str) -> str:
    """Append-mode audit sink (reference: the ``dq_validation_results``
    history table, sql/init_schema.sql:128-143) — one parquet file per
    run under ``audit_dir/run_id=<id>/``; reading the directory yields
    the full check history across runs."""
    import os

    import pyarrow.parquet as pq

    out = os.path.join(audit_dir, f"run_id={run_id}")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "results.parquet")
    pq.write_table(results_to_table(results), path)
    return path


def read_history(audit_dir: str):
    """All runs' audit rows as one Dataset (hive-partitioned by run_id)."""
    import ray.data as rd

    return rd.read_parquet(audit_dir)


def summarize(results: list[CheckResult]) -> dict:
    """Status-wise summary (main.py:157-171 / base_checker.py:137-152 parity)."""
    total = len(results)
    passed = sum(1 for r in results if r.status == CheckStatus.PASS)
    failed = sum(1 for r in results if r.status == CheckStatus.FAIL)
    warnings = sum(1 for r in results if r.status == CheckStatus.WARNING)
    errors = sum(1 for r in results if r.status == CheckStatus.ERROR)
    return {
        "total_checks": total,
        "passed": passed,
        "failed": failed,
        "warnings": warnings,
        "errors": errors,
        "pass_rate": round(passed / total * 100, 2) if total > 0 else 0,
    }
