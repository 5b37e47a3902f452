"""Reference-YAML round-trip parity: the reference's OWN rule files
(/root/reference/config/rules/*.yml — count/null/masking/transform) run
unchanged through load_rules -> run_validation against parquet mirrors of
the reference tables, planted with the violation patterns of the
reference's own test fixtures (reference tests/test_checkers.py:44-137 —
empty-string phone, NULL amount, unmasked resident numbers, missing
target rows) extended to the production schema (sql/init_schema.sql)."""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.audit import CheckStatus
from engine.rules import load_rules
from engine.validate import run_validation

REF_CONFIG = "/root/reference/config"


@pytest.fixture(scope="module")
def mirror_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("refmirror")
    ts = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731

    pq.write_table(pa.table({
        "customer_id": [1, 2, 3, 4, 5],
        "customer_name": ["김민준", "이서윤", "박도윤", "최서연", "정시우"],
        # row 3: empty string, row 4: NULL (TS-2 planting)
        "phone_number": ["010-1234-5678", "010-2345-6789", "", None,
                         "010-5678-9012"],
        "resident_number": ["901010-1234567", "920520-2345678",
                            "850315-1111111", "780101-2222222",
                            "001225-3333333"],
    }), d / "src_customers.parquet")

    pq.write_table(pa.table({
        "transaction_id": [1, 2, 3, 4, 5, 6],
        "customer_id": [1, 2, 1, 3, 4, 5],
        "merchant_id": [1, 2, 1, 999, 3, 2],  # 999: FK violation planting
        "transaction_date": [ts("2024-06-01 10:00:00"), ts("2024-06-01 11:00:00"),
                             ts("2024-06-01 10:00:00"), ts("2024-06-02 09:00:00"),
                             ts("2024-06-03 14:00:00"), ts("2024-06-04 16:00:00")],
        "transaction_amount": [50000.0, 120000.0, 50000.0, 30000.0, None,
                               -5000.0],  # NULL + negative planting
        "approval_status": ["approved", "approved", "approved", "approved",
                            "rejected", "approved"],
    }), d / "src_card_transactions.parquet")

    pq.write_table(pa.table({
        "customer_id": [1, 2, 3, 4],  # customer 5 missing from target
        "customer_name_hash": ["a" * 64, "b" * 64, "c" * 64, "최서연"],
        "phone_number": ["010-****-5678", "010-****-6789", "010-****-0000",
                         "010-1111-2222"],  # row 4: mask missing
        "resident_number": ["901010-*******", "920520-*******",
                            "850315-1111111", "780101-2222222"],  # rows 3,4 leak
    }), d / "tgt_customers.parquet")

    pq.write_table(pa.table({
        "transaction_id": [1, 2, 3, 4, 5],  # tx 6 missing -> count mismatch
        "customer_id": [1, 2, 1, 3, 4],
        "transaction_date": [ts("2024-06-01 10:00:00"), ts("2024-06-01 11:00:00"),
                             ts("2024-06-01 10:00:00"), ts("2024-06-02 09:00:00"),
                             ts("2024-06-03 14:00:00")],
        "transaction_amount": [50000.0, 120000.0, 50000.0, 30000.0, None],
        "approval_status": ["approved", "approved", "approved", "approved",
                            "rejected"],
    }), d / "tgt_card_transactions.parquet")

    pq.write_table(pa.table({
        "summary_date": pa.array([dt.date(2024, 6, 1), dt.date(2024, 6, 2),
                                  dt.date(2024, 6, 3), dt.date(2024, 6, 4)],
                                 pa.date32()),
        "transaction_count": [3, 1, 1, 1],
        "total_amount": [220000.0, 30000.0, 0.0, -5000.0],
    }), d / "tgt_daily_summary.parquet")

    return str(d)


@pytest.fixture(scope="module")
def ref_results(ray_session, mirror_dir):
    rules = load_rules(REF_CONFIG)
    assert set(rules) >= {"count", "null", "masking", "transform"}
    results, summary = run_validation(mirror_dir, rules)
    return {r.rule_id: r for r in results}, summary, rules


EXPECTED = {
    # rule_id: (status, violation_count or None to skip the count assert)
    "CNT-001": (CheckStatus.FAIL, 1),    # 5 src vs 4 tgt customers
    "CNT-002": (CheckStatus.FAIL, 1),    # 6 vs 5 tx, 16.7% > 1%
    "CNT-003": (CheckStatus.PASS, 0),    # 4 distinct dates vs 4 summary rows
    "CNT-004": (CheckStatus.FAIL, 1),    # approved: 5 vs 4
    "NULL-001": (CheckStatus.PASS, 0),   # names all present
    "NULL-002": (CheckStatus.FAIL, 2),   # phone: 1 NULL + 1 empty (TS-2)
    "NULL-003": (CheckStatus.FAIL, 1),   # amount: 1 NULL
    "NULL-004": (CheckStatus.PASS, 0),
    "NULL-005": (CheckStatus.PASS, 0),
    "NULL-006": (CheckStatus.PASS, 0),
    "MASK-001": (CheckStatus.FAIL, 2),   # resident numbers 3,4 unmasked
    "MASK-002": (CheckStatus.FAIL, 1),   # phone row 4 unmasked
    "MASK-003": (CheckStatus.FAIL, 1),   # name hash row 4 is a raw name
    "MASK-004": (CheckStatus.FAIL, 2),   # 2 plain SSNs survive in target
    "TRF-001": (CheckStatus.FAIL, None), # sums 245000 vs 250000 > 1% tol
    "TRF-002": (CheckStatus.FAIL, 1),    # 06-03 daily total missing in source
    "TRF-003": (CheckStatus.PASS, 0),    # per-day counts all match
    "TRF-004": (CheckStatus.FAIL, 1),    # customer 5 unmapped in target
}


def test_reference_yaml_statuses(ref_results):
    by_id, _, _ = ref_results
    assert set(by_id) == set(EXPECTED)
    for rid, (status, viol) in EXPECTED.items():
        assert by_id[rid].status == status, (rid, by_id[rid])
        if viol is not None:
            assert by_id[rid].violation_count == viol, (rid, by_id[rid])


def test_reference_yaml_summary(ref_results):
    _, summary, _ = ref_results
    assert summary["total_checks"] == len(EXPECTED)
    assert summary["errors"] == 0  # every reference rule executes cleanly
    want_fail = sum(1 for s, _ in EXPECTED.values() if s == CheckStatus.FAIL)
    assert summary["failed"] == want_fail


def test_reference_yaml_fused_equals_per_rule(ray_session, mirror_dir,
                                              ref_results):
    """The fused one-scan compiler must agree with the per-rule path on the
    reference's own rules."""
    _, _, rules = ref_results
    per_rule, _ = run_validation(mirror_dir, rules, fuse=False)
    fused, _ = run_validation(mirror_dir, rules, fuse=True)
    assert [(r.rule_id, r.status, r.violation_count) for r in per_rule] == \
           [(r.rule_id, r.status, r.violation_count) for r in fused]
