"""sqlmini rule-SQL subset interpreter: parser coverage + rejection
behavior (anything outside the reference's rule-query shape must raise,
so run_validation turns it into an ERROR row, never a wrong answer)."""

import pytest

from engine.sqlmini import parse_query, parse_where


def test_parse_reference_shapes():
    q = parse_query("""SELECT DATE(transaction_date) AS tx_date,
                       SUM(transaction_amount) AS daily_total
                       FROM src_card_transactions
                       WHERE transaction_amount IS NOT NULL
                       GROUP BY DATE(transaction_date)""")
    assert q["table"] == "src_card_transactions"
    assert q["group"] == {"kind": "date", "col": "transaction_date"}
    assert [i["alias"] for i in q["items"]] == ["tx_date", "daily_total"]
    assert q["preds"] == [("transaction_amount", "isnotnull", None)]

    q2 = parse_query(
        "SELECT COUNT(DISTINCT DATE(transaction_date)) AS cnt FROM t")
    assert q2["items"][0]["kind"] == "count_distinct_date"

    q3 = parse_query("SELECT customer_id FROM src_customers")
    assert q3["items"][0] == {"kind": "col", "col": "customer_id",
                              "alias": "customer_id"}


def test_parse_where_predicates():
    preds = parse_where("a = 'approved' AND b >= 10 AND c IS NULL AND d <> 2.5")
    assert preds == [("a", "=", "approved"), ("b", ">=", 10),
                     ("c", "isnull", None), ("d", "!=", 2.5)]


@pytest.mark.parametrize("bad", [
    "DELETE FROM t",
    "SELECT * FROM t",
    "SELECT a FROM t JOIN u ON t.x = u.x",
    "SELECT MAX(a) FROM t",
    "SELECT a FROM t WHERE a LIKE 'x%'",
    "SELECT a FROM (SELECT a FROM t)",
])
def test_unsupported_shapes_raise(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


def test_bad_rule_query_becomes_error_row(ray_session, tmp_path):
    """End to end: a transform rule with out-of-shape SQL ERRORs that one
    rule only (per-rule isolation), like the reference with a bad query."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.audit import CheckStatus
    from engine.validate import run_validation

    pq.write_table(pa.table({"x": [1, 2, 3]}), tmp_path / "t.parquet")
    rules = {"transform": [
        {"rule_id": "BAD-SQL", "source_query": "SELECT MEDIAN(x) FROM t",
         "target_query": "SELECT MEDIAN(x) FROM t", "compare_column": "m"},
        {"rule_id": "GOOD-SQL", "source_query": "SELECT SUM(x) AS s FROM t",
         "target_query": "SELECT SUM(x) AS s FROM t", "compare_column": "s"},
    ]}
    results, summary = run_validation(str(tmp_path), rules)
    by_id = {r.rule_id: r for r in results}
    assert by_id["BAD-SQL"].status == CheckStatus.ERROR
    assert by_id["GOOD-SQL"].status == CheckStatus.PASS
    assert summary["errors"] == 1


def test_group_by_expr_must_be_selected(ray_session, tmp_path):
    """GROUP BY over an expression absent from the select list must raise
    (never silently mislabel the group key column)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.sqlmini import run_rule_query
    from engine.validate import TableCatalog

    pq.write_table(pa.table({"a": ["x", "y"], "b": [1, 2],
                             "ts": [1, 2]}), tmp_path / "t.parquet")
    cat = TableCatalog(str(tmp_path))
    with pytest.raises(ValueError, match="GROUP BY"):
        run_rule_query(cat, "SELECT a, COUNT(*) AS cnt FROM t GROUP BY b")


def test_count_distinct_excludes_nulls(ray_session, tmp_path):
    """SQL COUNT(DISTINCT col) excludes NULLs; Dataset.unique counts None
    as a distinct value — the interpreter must filter it out."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.sqlmini import run_rule_query
    from engine.validate import TableCatalog

    pq.write_table(
        pa.table({"a": ["x", "y", None, "x", None],
                  "d": pa.array([1000, 2000, None, 1000, 3000],
                                pa.timestamp("s"))}),
        tmp_path / "t.parquet")
    cat = TableCatalog(str(tmp_path))
    out = run_rule_query(cat, "SELECT COUNT(DISTINCT a) AS cnt FROM t")
    assert out.take_all() == [{"cnt": 2}]
    out2 = run_rule_query(cat, "SELECT COUNT(DISTINCT DATE(d)) AS cnt FROM t")
    assert out2.take_all() == [{"cnt": 1}]
