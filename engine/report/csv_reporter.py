"""CSV report sink — reference parity (src/reporter/csv_reporter.py:20-97):
the 11 fixed CheckResult columns, ``details`` JSON-encoded, a blank line +
summary footer rows, utf-8-sig encoding (Excel-friendly BOM)."""

from __future__ import annotations

import csv
import json
import os
from datetime import datetime
from typing import Optional

from ..audit import CheckResult

COLUMNS = [
    "rule_id", "check_type", "description", "table_name", "column_name",
    "status", "total_rows", "violation_count", "violation_ratio",
    "details", "executed_at",
]


class CSVReporter:
    def __init__(self, output_dir: str = "reports"):
        self.output_dir = output_dir

    def generate(self, results: list[CheckResult], summary: dict,
                 filename: Optional[str] = None) -> str:
        os.makedirs(self.output_dir, exist_ok=True)
        if filename is None:
            filename = f"dq_report_{datetime.now():%Y%m%d_%H%M%S}.csv"
        path = os.path.join(self.output_dir, filename)
        with open(path, "w", newline="", encoding="utf-8-sig") as fh:
            writer = csv.writer(fh)
            writer.writerow(COLUMNS)
            for r in results:
                d = r.to_dict()
                writer.writerow([
                    d["rule_id"], d["check_type"], d["description"],
                    d["table_name"], d["column_name"] or "", d["status"],
                    d["total_rows"], d["violation_count"],
                    d["violation_ratio"],
                    json.dumps(d["details"], ensure_ascii=False, default=str),
                    d["executed_at"],
                ])
            writer.writerow([])
            writer.writerow(["summary"])
            for k, v in summary.items():
                writer.writerow([k, v])
        return path
