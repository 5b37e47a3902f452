"""Planted NULL-key / NULL-ts / empty-result regression tests.

The shipped testdata has no NULL partition keys, no NULL timestamps and
always contains violations, so only these fixtures exercise:

- NULL partition keys in the window kernels (rolling / range / lag /
  session / mode / sequence-signature): SQL PARTITION BY and GROUP BY
  treat NULL as its own group — plain ``pc.not_equal`` adjacency yields
  null at null boundaries, which ``astype(bool)`` would silently turn
  into "same segment" (null rows inheriting a neighbor's frame);
- int64 keys >= 2^53 (a numpy float64 round-trip would round them);
- NULL timestamps (float64 NaN garbage frames / raises without the
  explicit drop);
- zero-violation / zero-gap empty results (``_collect`` returns a
  zero-column table; ``sort_by`` on it raises KeyError);
- NULL join keys in asof_join (SQL equality never matches NULL).
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents", "embeddings"]


def _events_with_null_users(n=600, null_every=9, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    day = 86_400_000_000
    user = rng.integers(0, 30, n)
    uid = pa.array(
        [None if i % null_every == 0 else int(user[i]) for i in range(n)],
        pa.int64())
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000
                        + int(rng.integers(0, 5)) * day + i * 1_000_000
                        for i in range(n)], pa.timestamp("us")),
        "user_id": uid,
        "event_type": pa.array(
            [["view", "click", "purchase", "signup"][i % 4]
             for i in range(n)]),
        "value": pa.array(rng.uniform(0, 100, n)),
        "props": pa.array(['{"k": 1}'] * n),
    })


def _write_dir(tmp_path, events: pa.Table, name="sfnull"):
    d = tmp_path / name
    d.mkdir()
    for t in OTHER_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(events, d / "events.parquet", row_group_size=100)
    return str(d)


def test_window_queries_null_partition_keys(ray_session, tmp_path):
    """Every user-partitioned window/group query matches its DuckDB
    oracle when ~11% of user_ids are NULL (nulls spread over every day):
    NULL is ONE partition of its own, never merged into a neighbor."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = _write_dir(tmp_path, _events_with_null_users())
    con = duckdb_con(d)
    for q in ["rolling_sum_events", "range_window_sum_events",
              "max_gap_events_per_user", "session_window_events",
              "mode_event_type_per_user",
              "event_sequence_signature_events",
              "first_last_event_per_user",
              "lead_lag_events_value",
              "cohort_retention_events",
              "event_transition_counts_events"]:
        problems = compare(QUERIES[q](d),
                           con.execute(ORACLE_SQL[q]).fetchdf())
        assert not problems, (q, problems)


def test_winsorize_by_event_type_null_groups(ray_session, tmp_path):
    """winsorize_by_event_type vs oracle with NULL event_types (their
    rows form ONE group of their own) and NULL values (excluded from
    quantiles and tail counts on both sides)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    ev = _events_with_null_users()
    et = ev["event_type"].to_pylist()
    val = ev["value"].to_pylist()
    for i in range(0, len(et), 7):
        et[i] = None
    for i in range(0, len(val), 13):
        val[i] = None
    ev = ev.set_column(ev.schema.get_field_index("event_type"),
                       "event_type", pa.array(et, pa.string()))
    ev = ev.set_column(ev.schema.get_field_index("value"),
                       "value", pa.array(val, pa.float64()))
    d = _write_dir(tmp_path, ev)
    con = duckdb_con(d)
    q = "winsorize_by_event_type"
    problems = compare(QUERIES[q](d), con.execute(ORACLE_SQL[q]).fetchdf())
    assert not problems, problems


def test_sequence_signature_large_ids(ray_session, tmp_path):
    """user_ids >= 2^53 survive exactly (keys stay in Arrow — a float64
    round-trip would round 2^53+1 and 2^53+2 to the same id)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    big = 2**53
    n = 12
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array([big + (i % 3) for i in range(n)], pa.int64()),
        "event_type": pa.array(["view", "click"] * (n // 2)),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    d = _write_dir(tmp_path, events, "sfbig")
    out = QUERIES["event_sequence_signature_events"](d)
    assert sorted(out["user_id"].to_pylist()) == [big, big + 1, big + 2]
    con = duckdb_con(d)
    problems = compare(
        out, con.execute(ORACLE_SQL["event_sequence_signature_events"])
        .fetchdf())
    assert not problems, problems


def test_window_kernels_null_ts_dropped(ray_session):
    """NULL timestamps are excluded up front (the asof NULL-ts contract):
    kernels neither raise nor emit garbage frames for them, and valid
    rows are unaffected."""
    import ray.data as rd

    from engine.stages.windows import (hopping_window_agg,
                                       rolling_window_sum)

    rows = [{"k": 1, "ts": None if i % 4 == 3 else
             pa.scalar(1_700_000_000_000_000 + i * 1_000_000,
                       pa.timestamp("us")).as_py(),
             "id": i, "v": 1} for i in range(16)]
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r["k"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "v": pa.array([r["v"] for r in rows], pa.int64()),
    })).repartition(3)
    out = rolling_window_sum(ds, "k", "ts", "id", "v", window=3,
                             num_buckets=2).take_all()
    assert len(out) == 12  # 4 null-ts rows dropped
    assert all(r["roll_sum"] <= 3 for r in out)

    hop = hopping_window_agg(ds, "ts", "v", window_sec=4, hop_sec=2)
    got = {r["window_idx"]: r["n_events"] for r in hop.take_all()}
    assert sum(got.values()) == 12 * 2  # each valid event in k=2 windows


def test_fd_check_zero_violations(ray_session, tmp_path):
    """Zero FD violations (consistent data — the EXPECTED outcome of a
    consistency check) returns a typed empty table, not a KeyError."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    li = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_returnflag": pa.array(["A", "A", "R", "R", "N"]),
    })
    d = tmp_path / "sffd"
    d.mkdir()
    pq.write_table(li, d / "lineitem.parquet")
    out = QUERIES["fd_check_lineitem_returnflag"](str(d))
    assert out.num_rows == 0
    assert out.column_names == ["det", "n_dep"]
    assert out.schema.field("det").type == pa.int64()


def test_max_gap_all_single_event_users(ray_session, tmp_path):
    """Every user has ONE event -> zero gap rows -> typed empty result
    (WHERE gap IS NOT NULL filters everything in the oracle too)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    n = 8
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    d = tmp_path / "sfgap"
    d.mkdir()
    pq.write_table(events, d / "events.parquet")
    out = QUERIES["max_gap_events_per_user"](str(d))
    assert out.num_rows == 0
    assert out.column_names == ["user_id", "n_gaps", "max_gap_us",
                                "sum_gap_us"]


def test_asof_join_null_keys(ray_session):
    """NULL join keys: SQL equality matches nothing — null-key left rows
    come out unmatched (LEFT-join row preserved), null-key right rows
    never match anything (including null-key left rows)."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, None, 2], pa.int64()),
        "ts": pa.array([T("2024-01-05"), T("2024-01-05"),
                        T("2024-01-06"), T("2024-01-05")],
                       pa.timestamp("us")),
        "lid": pa.array([100, 101, 102, 103], pa.int64()),
    })).repartition(2)
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2], pa.int64()),
        "ts": pa.array([T("2024-01-02"), T("2024-01-01"),
                        T("2024-01-10")], pa.timestamp("us")),
        "val": pa.array([10, 99, 22], pa.int64()),
    })).repartition(2)
    out = asof_join(left, right, key_col="k", left_ts_col="ts",
                    right_ts_col="ts", left_id_col="lid",
                    right_value_col="val", num_buckets=4)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}
    # 100: k=1 matches val 10; 101/102: NULL key -> unmatched (NOT 99);
    # 103: k=2 but right ts later -> unmatched
    assert got == {100: 10, 101: None, 102: None, 103: None}


def test_first_k_per_group_null_run_is_one_group(ray_session):
    """A run of NULL group keys is ONE group (SQL GROUP BY), not one
    group per row: cap k=1 keeps exactly one null-key row."""
    from engine.stages.aggregates import _first_k_per_group

    t = pa.table({
        "g": pa.array([None, None, None, "a", "a"], pa.string()),
        "id": pa.array([3, 1, 2, 5, 4], pa.int64()),
    })
    out = _first_k_per_group(t, ["g"], [("g", "ascending"),
                                        ("id", "ascending")], 1)
    assert sorted(out["id"].to_pylist()) == [1, 4]


def test_winsorize_all_null_values_empty(ray_session, tmp_path):
    """Every value NULL -> quantiles undefined for every group -> the
    oracle yields 0 rows; the Ray side must return a typed empty table
    (zero-column _collect hazard)."""
    import engine.queries_ext as qe

    ev = _events_with_null_users()
    ev = ev.set_column(ev.schema.get_field_index("value"), "value",
                       pa.array([None] * ev.num_rows, pa.float64()))
    d = _write_dir(tmp_path, ev)
    out = qe.winsorize_by_event_type(d)
    assert out.num_rows == 0
    assert out.column_names == [
        "event_type", "n_below", "n_above", "lo_cents", "hi_cents"]


def test_winsorize_sentinel_like_group_value(ray_session, tmp_path):
    """A REAL event_type equal to a would-be null sentinel must stay a
    distinct group from the NULL group (is_null-mask coding, no
    sentinel collision)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    ev = _events_with_null_users()
    et = ev["event_type"].to_pylist()
    for i in range(0, len(et), 5):
        et[i] = "\x00<null>"
    for i in range(1, len(et), 11):
        et[i] = None
    ev = ev.set_column(ev.schema.get_field_index("event_type"),
                       "event_type", pa.array(et, pa.string()))
    d = _write_dir(tmp_path, ev)
    con = duckdb_con(d)
    q = "winsorize_by_event_type"
    problems = compare(QUERIES[q](d), con.execute(ORACLE_SQL[q]).fetchdf())
    assert not problems, problems


def test_running_spend_all_null_dates_empty(ray_session, tmp_path):
    """All o_orderdate NULL -> the oracle's WHERE keeps 0 rows; the Ray
    side must return a typed empty table, not KeyError on sort_by."""
    import shutil as _sh

    import pyarrow.parquet as _pq

    import engine.queries_ext as qe

    d = tmp_path / "sfnullorders"
    d.mkdir()
    for t in OTHER_TABLES + ["events"]:
        if t != "orders":
            _sh.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    orders = _pq.read_table(f"{SF}/orders.parquet")
    orders = orders.set_column(
        orders.schema.get_field_index("o_orderdate"), "o_orderdate",
        pa.array([None] * orders.num_rows, pa.timestamp("us")))
    _pq.write_table(orders, d / "orders.parquet")
    out = qe.running_customer_spend_orders(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["o_orderkey", "o_custkey", "run_cents"]


def test_value_ranks_null_users_values_and_ties(ray_session, tmp_path):
    """RANK/DENSE_RANK vs oracle with NULL users (own partition), NULL
    values (sort last, mutual peers) and planted value ties (peers
    share rank; rank gaps, dense_rank none)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    ev = _events_with_null_users()
    val = ev["value"].to_pylist()
    for i in range(0, len(val), 6):
        val[i] = None
    for i in range(1, len(val), 4):
        val[i] = round(val[i])  # force peer ties
    ev = ev.set_column(ev.schema.get_field_index("value"), "value",
                       pa.array(val, pa.float64()))
    d = _write_dir(tmp_path, ev)
    con = duckdb_con(d)
    q = "value_ranks_events_per_user"
    problems = compare(QUERIES[q](d), con.execute(ORACLE_SQL[q]).fetchdf())
    assert not problems, problems


def test_string_group_keys_null_everywhere(ray_session, tmp_path):
    """Every query that groups on a parquet-sourced STRING key matches
    its oracle when that key carries NULLs: SQL GROUP BY keeps NULL as
    a real group, while a null-bearing string lead key would crash
    Ray's range partitioner without the null-key companion."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = tmp_path / "sfnullstr"
    d.mkdir()
    for t in OTHER_TABLES + ["events"]:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")

    def plant(table, col, every, val=None):
        t = pq.read_table(d / f"{table}.parquet")
        v = t[col].to_pylist()
        for i in range(0, len(v), every):
            v[i] = val
        t = t.set_column(t.schema.get_field_index(col), col,
                         pa.array(v, t.schema.field(col).type))
        pq.write_table(t, d / f"{table}.parquet", row_group_size=200)

    plant("events", "event_type", 7)
    plant("documents", "lang", 5)
    plant("documents", "source", 6)
    plant("customer", "c_mktsegment", 9)
    plant("lineitem", "l_returnflag", 11)
    plant("lineitem", "l_linestatus", 13)
    plant("embeddings", "label", 8)

    con = duckdb_con(str(d))
    for q in ["lang_rollup_documents", "top_sources_documents",
              "json_props_rollup_events", "users_per_event_type",
              "share_of_total_events_by_type", "balance_langs_documents",
              "pricing_summary_lineitem", "rollup_events_grouping_sets",
              "topk_dup_customer_segment", "doc_embedding_label_stats"]:
        problems = compare(QUERIES[q](str(d)),
                           con.execute(ORACLE_SQL[q]).fetchdf())
        assert not problems, (q, problems)


def test_balance_langs_all_null_empty(ray_session, tmp_path):
    """Every lang NULL -> the USING join keeps zero docs -> typed empty
    (not a KeyError on the zero-column _collect table)."""
    import engine.queries_ext as qe

    d = tmp_path / "sfalllang"
    d.mkdir()
    for t in OTHER_TABLES + ["events"]:
        if t != "documents":
            shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(f"{SF}/documents.parquet")
    docs = docs.set_column(docs.schema.get_field_index("lang"), "lang",
                           pa.array([None] * docs.num_rows, pa.string()))
    pq.write_table(docs, d / "documents.parquet")
    out = qe.balance_langs_documents(str(d))
    assert out.num_rows == 0
    assert out.column_names == ["lang", "n_kept"]
