"""Rows-only determinism recertification (round-4 verdict item 2).

The 28 registry queries without an oracle-SQL entry (ANN family, model
evals, multimodal, sketches, pipeline summary, ...) cannot be certified
by the driver's DuckDB compare. Their correctness contract is
DETERMINISM ACROSS PARALLELISM: the same bytes out of a fresh 8-CPU
session and a fresh 32-CPU session over the same input. This script
runs every rows-only query in two fresh subprocesses (one per CPU
level), canonicalizes each result (sort columns by name, sort rows by
every column, binary-serialize), hashes it, and prints ONE JSON line
with per-query hashes and match verdicts. The BASELINE.md table is
generated from this artifact.

Usage:  python scripts/recert_rows_only.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

_CHILD = r"""
import hashlib, json, sys
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False, logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, %(repo)r)
import pyarrow as pa
import __ray_entry__ as m

def canon_hash(res) -> str:
    if hasattr(res, "to_arrow_refs") or hasattr(res, "take_all"):  # Dataset
        t = pa.concat_tables(ray.get(res.materialize().to_arrow_refs()))
    elif isinstance(res, pa.Table):
        t = res
    else:  # pandas
        t = pa.Table.from_pandas(res, preserve_index=False)
    t = t.select(sorted(t.column_names)).combine_chunks()
    if t.num_rows:
        t = t.sort_by([(c, "ascending") for c in t.column_names])
    h = hashlib.sha256()
    h.update(str(t.schema).encode())
    for col in t.columns:
        for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
            h.update(repr(chunk.to_pylist()).encode())
    return h.hexdigest()

qs, osql = m.queries(), m.oracle_sql()
out = {}
for name, fn in qs.items():
    if name in osql:
        continue
    try:
        out[name] = canon_hash(fn(%(sf)r))
    except Exception as e:  # noqa: BLE001 — recorded, not raised
        out[name] = "ERR:" + repr(e)[:200]
print("RESULT" + json.dumps(out))
ray.shutdown()
"""


def run_level(ncpu: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD % {"repo": repo, "sf": SF_DIR}
    p = subprocess.run([sys.executable, "-c", code, str(ncpu)],
                       capture_output=True, text=True, check=True)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(f"no RESULT line from {ncpu}-cpu child:\n{p.stderr[-2000:]}")


def main() -> None:
    a, b = run_level(8), run_level(32)
    rows = {}
    for name in sorted(set(a) | set(b)):
        ha, hb = a.get(name), b.get(name)
        rows[name] = {
            "hash_8cpu": ha, "hash_32cpu": hb,
            "match": ha == hb and ha is not None
            and not str(ha).startswith("ERR"),
        }
    print(json.dumps({
        "metric": "rows_only_determinism_recert",
        "sf_dir": SF_DIR,
        "n_queries": len(rows),
        "n_match": sum(1 for r in rows.values() if r["match"]),
        "queries": rows,
    }))


if __name__ == "__main__":
    main()
