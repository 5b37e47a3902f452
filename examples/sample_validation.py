"""Runnable example — reference parity with examples/sample_validation.py.

Builds small in-memory tables with planted issues (a NULL phone, an empty
string, a duplicate, an FK orphan, a negative amount, unmasked SSNs, a
missing target row), writes them as parquet, runs the rule-driven
validation chain, and prints per-check results + summary. Owns its Ray
session (the engine library never does).

    python examples/sample_validation.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tables(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    customers = pa.table({
        "customer_id": [1, 2, 3, 4, 5],
        "customer_name": ["Kim", "Lee", "Park", "Choi", "Jung"],
        "phone_number": ["010-1111-2222", None, "", "010-4444-5555", "010-5555-6666"],
    })
    merchants = pa.table({
        "merchant_id": [10, 20, 30],
        "merchant_code": ["M010", "M020", "M030"],
    })
    transactions = pa.table({
        "transaction_id": [100, 101, 102, 103, 104, 105],
        "customer_id": [1, 2, 3, 4, 5, 1],
        "merchant_id": [10, 20, 999, 10, 30, 10],        # 999 = FK orphan
        "transaction_amount": [1000.0, 2000.0, None, -50.0, 3000.0, 1000.0],
    })
    tgt_customers = pa.table({
        "customer_id": [1, 2, 3, 4],
        "resident_number": ["123456-*******", "654321-1234567",
                            "111111-2222222", "222222-*******"],
    })
    tgt_transactions = pa.table({"transaction_id": [100, 101, 102, 103, 104]})
    for name, tbl in [("customers", customers), ("merchants", merchants),
                      ("transactions", transactions),
                      ("tgt_customers", tgt_customers),
                      ("tgt_transactions", tgt_transactions)]:
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


RULES = {
    "count": [
        {"rule_id": "CNT-001", "description": "transactions source vs target",
         "source_table": "transactions", "target_table": "tgt_transactions",
         "threshold": 0.0},
    ],
    "null": [
        {"rule_id": "NULL-001", "description": "phone null-or-blank (TS-2)",
         "table": "customers", "column": "phone_number",
         "max_null_ratio": 0.0, "include_empty_string": True},
    ],
    "duplicate": [
        {"rule_id": "DUP-001", "description": "amount+customer dup",
         "table": "transactions",
         "columns": ["customer_id", "transaction_amount"]},
    ],
    "range": [
        {"rule_id": "RNG-001", "description": "amount positive",
         "table": "transactions", "column": "transaction_amount",
         "check_type": "positive", "min_value": 0},
        {"rule_id": "FK-001", "description": "transactions -> merchants",
         "table": "transactions", "column": "merchant_id",
         "check_type": "foreign_key", "parent_table": "merchants",
         "parent_column": "merchant_id"},
    ],
    "masking": [
        {"rule_id": "MASK-001", "description": "ssn tail masked",
         "table": "tgt_customers", "column": "resident_number",
         "masking_type": "ssn"},
        {"rule_id": "MASK-004", "description": "plain ssn leak",
         "table": "tgt_customers", "column": "resident_number",
         "masking_type": "leak_check"},
    ],
}


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from engine.validate import run_validation

    with tempfile.TemporaryDirectory() as td:
        build_tables(td)
        results, summary = run_validation(td, RULES)

    width = max(len(r.description) for r in results)
    for r in results:
        print(f"[{r.rule_id:9s}] {r.description:{width}s} "
              f"{r.status.value:7s} violations={r.violation_count}/{r.total_rows}")
    print("\nsummary:", summary)
    ray.shutdown()
    return 0 if summary["failed"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
