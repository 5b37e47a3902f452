"""Planted-fixture tests for the session-10 reconciliation / profile
queries: per-order total reconciliation, day-over-day user Jaccard,
chi-squared type x weekday contributions, and per-user Simpson
diversity.

The shipped testdata is referentially clean and null-free, so only
these fixtures exercise: planted o_totalprice mismatches, headers with
no lineitems, lineitem orphans, calendar gaps (days with no successor
emit no Jaccard row), fully-overlapping and disjoint day pairs, NULL
users / NULL event types as their own GROUP BY groups, and the
single-event-user exclusion.
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]

NEW_QUERIES = ["order_total_reconciliation", "dayover_user_jaccard_events",
               "chi2_type_weekday_events",
               "simpson_diversity_events_per_user"]


def _write_dir(tmp_path, name, **tables) -> str:
    d = tmp_path / name
    d.mkdir()
    for t in ALL_TABLES:
        if t in tables:
            pq.write_table(tables[t], d / f"{t}.parquet", row_group_size=40)
        else:
            shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def _events(rows) -> pa.Table:
    """rows: list of (user_id|None, day:int, event_type|None)."""
    day_us = 86_400_000_000
    base = 1_700_000_000_000_000
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + d * day_us + i for i, (_, d, _t) in
                        enumerate(rows)], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _t in rows], pa.int64()),
        "event_type": pa.array([t for _, _, t in rows], pa.string()),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })


def test_order_reconciliation_planted_defects(ray_session, tmp_path):
    """3 consistent orders, 1 mismatched total, 1 header without
    lineitems, 1 orphan lineitem order key — exact verdict counts, and
    the oracle agrees on the same fixture."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    # lineitems: order k gets two lines of net 10.00 each (disc/tax 0)
    li_keys = [1, 1, 2, 2, 3, 3, 4, 4, 99, 99]  # 99 = orphan
    lineitem = pa.table({
        "l_orderkey": pa.array(li_keys, pa.int64()),
        "l_partkey": pa.array([1] * 10, pa.int64()),
        "l_suppkey": pa.array([1] * 10, pa.int64()),
        "l_linenumber": pa.array([1] * 10, pa.int32()),
        "l_quantity": pa.array([1.0] * 10),
        "l_extendedprice": pa.array([10.0] * 10),
        "l_discount": pa.array([0.0] * 10),
        "l_tax": pa.array([0.0] * 10),
        "l_returnflag": pa.array(["N"] * 10),
        "l_linestatus": pa.array(["O"] * 10),
        "l_shipdate": pa.array([1_700_000_000_000_000] * 10,
                               pa.timestamp("us")),
    })
    ok = [20.0, 20.0, 20.0]  # orders 1-3 consistent
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([1] * 5, pa.int64()),
        "o_orderstatus": pa.array(["O"] * 5),
        # order 4 planted mismatch (+5.00), order 5 has no lineitems
        "o_totalprice": pa.array(ok + [25.0, 30.0]),
        "o_orderdate": pa.array([1_700_000_000_000_000] * 5,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 5),
    })
    d = _write_dir(tmp_path, "sfrecon", orders=orders, lineitem=lineitem)
    q = "order_total_reconciliation"
    out = QUERIES[q](d)
    assert out.to_pylist() == [{
        "n_orders": 5, "n_with_lines": 4, "n_mismatch": 1,
        "n_orders_no_lineitems": 1, "n_lineitem_orphan_orders": 1}]
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_jaccard_gaps_disjoint_identical(ray_session, tmp_path):
    """Day 0->1 identical sets (10000), day 1->2 disjoint (0), day 2
    has no successor (day 3 absent -> no row for day 2); NULL users
    and NULL ts are excluded on both sides."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rows = ([(u, 0, "view") for u in (1, 2, 3)]
            + [(u, 1, "view") for u in (1, 2, 3)]
            + [(u, 2, "view") for u in (7, 8)]
            + [(1, 4, "view"), (None, 0, "view"), (None, 1, "view")])
    ev = _events(rows)
    # one NULL ts row (excluded)
    ev = pa.concat_tables([ev, pa.table({
        "event_id": pa.array([900], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"]),
        "value": pa.array([1.0]),
        "props": pa.array(["{}"]),
    })])
    d = _write_dir(tmp_path, "sfjac", events=ev)
    q = "dayover_user_jaccard_events"
    out = QUERIES[q](d)
    got = {r["day"] - out["day"][0].as_py(): r["jaccard_x10k"]
           for r in out.to_pylist()}
    assert got == {0: 10000, 1: 0}  # day2 and day4 have no successor
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_chi2_and_simpson_null_groups_vs_oracle(ray_session, tmp_path):
    """NULL users (own Simpson group), NULL event types (own category,
    excluded from chi2 on both sides), single-event users excluded; a
    perfectly type-pure user scores Simpson 0, a user with all-distinct
    types scores 10000."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rng = np.random.default_rng(11)
    types = ["view", "click", "purchase", None]
    rows = []
    # user 1: pure (all "view", 4 events) -> simpson 0
    rows += [(1, int(rng.integers(0, 7)), "view") for _ in range(4)]
    # user 2: all distinct types (3 events) -> simpson 10000
    rows += [(2, 0, "view"), (2, 1, "click"), (2, 2, "purchase")]
    # user 3: single event -> excluded
    rows += [(3, 0, "view")]
    # NULL user with 3 events incl. NULL type
    rows += [(None, 0, "view"), (None, 1, None), (None, 2, "click")]
    # bulk random users
    rows += [(int(rng.integers(10, 20)), int(rng.integers(0, 7)),
              types[int(rng.integers(0, 4))]) for _ in range(120)]
    d = _write_dir(tmp_path, "sfdiv", events=_events(rows))
    con = duckdb_con(d)
    for q in ("chi2_type_weekday_events",
              "simpson_diversity_events_per_user"):
        out = QUERIES[q](d)
        assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf()), q
    simp = {r["user_id"]: r["simpson_x10k"] for r in
            QUERIES["simpson_diversity_events_per_user"](d).to_pylist()
            if r["user_id"] in (1, 2, 3)}
    assert simp == {1: 0, 2: 10000}


def test_duplicate_rate_by_source_planted(ray_session, tmp_path):
    """Source A: 3 rows, 2 distinct texts; source B: all unique; NULL
    text counts toward rows but never toward distinct; NULL source is
    its own group."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    texts = [("A", "x"), ("A", "x"), ("A", "y"),
             ("B", "p"), ("B", "q"),
             ("A", None), ("A", None),
             (None, "z"), (None, "z")]
    documents = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array([t for _, t in texts], pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array([s for s, _ in texts], pa.string()),
        "n_chars": pa.array([len(t) if t else 0 for _, t in texts],
                            pa.int64()),
    })
    d = _write_dir(tmp_path, "sfdup", documents=documents)
    q = "duplicate_rate_by_source"
    out = QUERIES[q](d)
    got = {r["source"]: (r["n_rows"], r["n_distinct"])
           for r in out.to_pylist()}
    assert got == {"A": (5, 2), "B": (2, 2), None: (2, 1)}
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_cross_source_overlap_planted(ray_session, tmp_path):
    """Text 'x' in sources A,B,C -> 3 pairs; 'y' in A,B; 'z' only in
    C; duplicate sightings of the same (source, text) collapse; the
    empty shipped-testdata result also hash-matches its oracle."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rows = [("A", "x"), ("B", "x"), ("C", "x"), ("A", "x"),
            ("A", "y"), ("B", "y"),
            ("C", "z"), (None, "x"), ("A", None)]
    documents = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([t for _, t in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([s for s, _ in rows], pa.string()),
        "n_chars": pa.array([1] * len(rows), pa.int64()),
    })
    d = _write_dir(tmp_path, "sfxsrc", documents=documents)
    q = "cross_source_overlap_documents"
    out = QUERIES[q](d)
    got = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in out.to_pylist()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())
    # shipped testdata: empty on both sides
    out0 = QUERIES[q](SF)
    con0 = duckdb_con(SF)
    assert not compare(out0, con0.execute(ORACLE_SQL[q]).fetchdf())
    assert out0.num_rows == 0


def test_degenerate_inputs_typed_empty_paths(ray_session, tmp_path):
    """All-null events: jaccard and stickiness return typed empties,
    repeat-purchase raises — the all-buckets-empty schema-less-block
    hazard must not KeyError."""
    import engine.queries_ext  # noqa: F401
    import pytest as _pytest
    from engine.queries import QUERIES

    n = 8
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([None] * n, pa.timestamp("us")),
        "user_id": pa.array([None] * n, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    orders = pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"]),
        "o_totalprice": pa.array([1.0, 2.0]),
        "o_orderdate": pa.array([None, None], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2),
    })
    d = _write_dir(tmp_path, "sfdegen", events=events, orders=orders)
    assert QUERIES["dayover_user_jaccard_events"](d).num_rows == 0
    assert QUERIES["stickiness_dau_mau_events"](d).num_rows == 0
    with _pytest.raises(ValueError, match="repeat"):
        QUERIES["repeat_purchase_interval_orders"](d)
