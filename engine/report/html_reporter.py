"""HTML dashboard sink — reference-shaped (src/reporter/html_reporter.py:
202-372): template substitution, summary cards, pass-rate bar, per-check-
type sections with status-colored rows, details truncated for display."""

from __future__ import annotations

import html
import json
import os
from datetime import datetime
from typing import Optional

from ..audit import CheckResult

_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Data Quality Report</title>
<style>
 body {{ font-family: -apple-system, 'Segoe UI', sans-serif; margin: 2rem;
        background: #f5f6fa; color: #222; }}
 h1 {{ font-size: 1.4rem; }}
 .cards {{ display: flex; gap: 1rem; margin: 1rem 0; flex-wrap: wrap; }}
 .card {{ background: #fff; border-radius: 8px; padding: 1rem 1.5rem;
         box-shadow: 0 1px 3px rgba(0,0,0,.08); min-width: 7rem; }}
 .card .num {{ font-size: 1.6rem; font-weight: 700; }}
 .PASS {{ color: #1a7f37; }} .FAIL {{ color: #c62828; }}
 .WARNING {{ color: #b26a00; }} .ERROR {{ color: #6a1b9a; }}
 .bar {{ background: #e0e0e0; border-radius: 6px; height: 14px; width: 100%;
        max-width: 480px; overflow: hidden; }}
 .bar > div {{ background: #1a7f37; height: 100%; }}
 table {{ border-collapse: collapse; width: 100%; background: #fff;
         margin: .75rem 0 2rem; font-size: .85rem; }}
 th, td {{ border: 1px solid #e3e3e3; padding: .4rem .6rem; text-align: left; }}
 th {{ background: #fafafa; }}
 td.details {{ max-width: 28rem; overflow: hidden; text-overflow: ellipsis;
              white-space: nowrap; font-family: monospace; font-size: .75rem; }}
</style>
</head>
<body>
<h1>Data Quality Report <small>({generated_at})</small></h1>
<div class="cards">
 <div class="card"><div class="num">{total_checks}</div>total</div>
 <div class="card"><div class="num PASS">{passed}</div>pass</div>
 <div class="card"><div class="num FAIL">{failed}</div>fail</div>
 <div class="card"><div class="num WARNING">{warnings}</div>warning</div>
 <div class="card"><div class="num ERROR">{errors}</div>error</div>
 <div class="card" style="flex:1"><div class="num">{pass_rate}%</div>
   <div class="bar"><div style="width:{pass_rate}%"></div></div>pass rate</div>
</div>
{sections}
</body>
</html>
"""

_SECTION = """<h2>{check_type} ({n})</h2>
<table>
<tr><th>rule</th><th>description</th><th>table</th><th>column</th>
<th>status</th><th>rows</th><th>violations</th><th>ratio</th><th>details</th></tr>
{rows}
</table>
"""

_ROW = ("<tr><td>{rule_id}</td><td>{description}</td><td>{table_name}</td>"
        "<td>{column_name}</td><td class=\"{status}\">{status}</td>"
        "<td>{total_rows}</td><td>{violation_count}</td>"
        "<td>{violation_ratio}</td><td class=\"details\">{details}</td></tr>")


class HTMLReporter:
    def __init__(self, output_dir: str = "reports"):
        self.output_dir = output_dir

    def generate(self, results: list[CheckResult], summary: dict,
                 filename: Optional[str] = None) -> str:
        os.makedirs(self.output_dir, exist_ok=True)
        if filename is None:
            filename = f"dq_report_{datetime.now():%Y%m%d_%H%M%S}.html"
        path = os.path.join(self.output_dir, filename)

        by_type: dict[str, list[CheckResult]] = {}
        for r in results:
            by_type.setdefault(r.check_type, []).append(r)

        sections = []
        for ctype in sorted(by_type):
            rows = []
            for r in by_type[ctype]:
                d = r.to_dict()
                details = json.dumps(d["details"], ensure_ascii=False, default=str)
                if len(details) > 300:  # truncation parity (html_reporter.py:331-333)
                    details = details[:300] + "…"
                rows.append(_ROW.format(
                    rule_id=html.escape(d["rule_id"]),
                    description=html.escape(d["description"]),
                    table_name=html.escape(d["table_name"] or ""),
                    column_name=html.escape(d["column_name"] or ""),
                    status=d["status"],
                    total_rows=d["total_rows"],
                    violation_count=d["violation_count"],
                    violation_ratio=d["violation_ratio"],
                    details=html.escape(details),
                ))
            sections.append(_SECTION.format(
                check_type=html.escape(ctype), n=len(by_type[ctype]),
                rows="\n".join(rows)))

        doc = _TEMPLATE.format(
            generated_at=datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            sections="\n".join(sections),
            **{k: summary.get(k, 0) for k in
               ["total_checks", "passed", "failed", "warnings", "errors",
                "pass_rate"]},
        )
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(doc)
        return path
