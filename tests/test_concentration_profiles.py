"""Planted-fixture tests for the session-10b concentration/seasonality
queries: revenue Pareto, lag-1 autocorrelation, normalized-name dups,
and DAU/MAU stickiness.

Fixtures exercise what the shipped testdata can't: boundary TIES in the
Pareto rank selection (the tie-invariant top-k sum must match the
oracle's arbitrary row_number pick), tiny populations where k = n//100
is zero, constant daily counts (autocorrelation undefined -> raises),
case/whitespace name variants with NULLs, and multi-month user overlap
(MAU < sum of DAUs).
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def _write_dir(tmp_path, name, **tables) -> str:
    d = tmp_path / name
    d.mkdir()
    for t in ALL_TABLES:
        if t in tables:
            pq.write_table(tables[t], d / f"{t}.parquet", row_group_size=40)
        else:
            shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def _orders(totals_by_cust) -> pa.Table:
    rows = [(c, v) for c, vals in totals_by_cust.items() for v in vals]
    return pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([v for _, v in rows], pa.float64()),
        "o_orderdate": pa.array([1_700_000_000_000_000] * len(rows),
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    })


def test_pareto_boundary_ties_and_small_n(ray_session, tmp_path):
    """20 customers: 2 whales (1000), 10 tied mid customers (100) that
    straddle the k=2 top-10% boundary, 8 tail (1). k1 = 20//100 = 0 so
    top1 is 0 on both sides. The tied boundary makes row_number's pick
    arbitrary — the tie-invariant sum must still match."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    totals = {c: [1000.0] for c in (1, 2)}
    totals.update({c: [50.0, 50.0] for c in range(3, 13)})  # tied at 100
    totals.update({c: [1.0] for c in range(13, 21)})
    d = _write_dir(tmp_path, "sfpar", orders=_orders(totals))
    q = "revenue_pareto_orders"
    out = QUERIES[q](d)
    r = out.to_pylist()[0]
    assert r["n_customers"] == 20
    assert r["top10_cents"] == 200_000  # the two whales (k=2)
    assert r["top1_cents"] == 0
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_pareto_tie_inside_boundary(ray_session, tmp_path):
    """30 customers all tied at the same total: k=3 of 30 — top10 sum
    is exactly 3 x the tied value no matter which three 'win'."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    totals = {c: [42.0] for c in range(1, 31)}
    d = _write_dir(tmp_path, "sfpar2", orders=_orders(totals))
    q = "revenue_pareto_orders"
    out = QUERIES[q](d)
    assert out.to_pylist()[0]["top10_cents"] == 3 * 4200
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def _events(rows) -> pa.Table:
    """rows: (user_id|None, day:int)."""
    day_us = 86_400_000_000
    base = 1_500_000_000_000_000
    return pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([None if d is None else base + d * day_us + i
                        for i, (_, d) in enumerate(rows)],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })


def test_autocorr_constant_counts_raises(ray_session, tmp_path):
    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    rows = [(1, d) for d in range(6)]  # one event per day: zero variance
    d = _write_dir(tmp_path, "sfac0", events=_events(rows))
    with pytest.raises(ValueError, match="constant"):
        QUERIES["lag1_autocorr_daily_events"](d)


def test_autocorr_alternating_series_vs_oracle(ray_session, tmp_path):
    """Alternating 1/5 daily counts -> strong negative lag-1 autocorr;
    null-ts rows excluded on both sides; a calendar gap pairs the two
    OBSERVED neighbours (SQL LAG semantics, no zero-fill)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rows = []
    for day in range(10):
        if day == 4:
            continue  # calendar gap
        n = 1 if day % 2 == 0 else 5
        rows += [(u, day) for u in range(n)]
    rows.append((1, None))  # null ts
    d = _write_dir(tmp_path, "sfac1", events=_events(rows))
    q = "lag1_autocorr_daily_events"
    out = QUERIES[q](d)
    assert out["acf1_x10k"][0].as_py() < -5000
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_normalized_name_dups_planted_variants(ray_session, tmp_path):
    """'  Acme Corp ', 'acme  corp', 'ACME CORP' collide on one key;
    'acmecorp' does not; NULL names excluded on both sides."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    names = ["  Acme Corp ", "acme  corp", "ACME\tCORP", "acmecorp",
             "Widget Inc", "widget inc", None, "solo"]
    customer = pa.table({
        "c_custkey": pa.array(range(1, len(names) + 1), pa.int64()),
        "c_name": pa.array(names, pa.string()),
        "c_nationkey": pa.array([1] * len(names), pa.int64()),
        "c_acctbal": pa.array([0.0] * len(names)),
        "c_mktsegment": pa.array(["BUILDING"] * len(names)),
    })
    d = _write_dir(tmp_path, "sfnorm", customer=customer)
    q = "normalized_name_dups_customer"
    out = QUERIES[q](d)
    assert out.to_pylist() == [{
        "n_rows": 7, "n_keys": 4, "n_dup_keys": 2,
        "n_rows_in_dup_keys": 5}]
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_stickiness_cross_month_vs_oracle(ray_session, tmp_path):
    """Users active across two months; duplicate (user, day) events
    collapse; NULL users/ts excluded; perfect-daily user drives
    stickiness toward 10000 in a month they're alone in."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rng = np.random.default_rng(3)
    rows = []
    # month 1 (~days 0-27 from base 1.5e15 which is 2017-07-14): user 1
    # every day, users 2-6 random days
    for day in range(0, 28):
        rows.append((1, day))
        rows.append((1, day))  # dup (user, day)
    for u in range(2, 7):
        for day in rng.choice(28, size=9, replace=False):
            rows.append((u, int(day)))
    # month 2: sparse
    for u in (1, 7):
        for day in (40, 43, 46):
            rows.append((u, day))
    rows += [(None, 5), (3, None)]
    d = _write_dir(tmp_path, "sfstick", events=_events(rows))
    q = "stickiness_dau_mau_events"
    out = QUERIES[q](d)
    assert out.num_rows >= 2
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_repeat_purchase_gaps_hand_checked(ray_session, tmp_path):
    """Customer 1: days [0,0,0,4] -> gaps (0,0,4) with the same-day
    duplicates collapsing to count partials; customer 2 single order ->
    no gap; NULL date excluded. median=0, p90=4."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    day_us = 86_400_000_000
    base = 1_600_000_000_000_000
    rows = [(1, 0), (1, 0), (1, 0), (1, 4), (2, 2), (1, None)]
    orders = pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows)),
        "o_totalprice": pa.array([10.0] * len(rows)),
        "o_orderdate": pa.array(
            [None if d is None else base + d * day_us for _, d in rows],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
    })
    d = _write_dir(tmp_path, "sfgap", orders=orders)
    q = "repeat_purchase_interval_orders"
    out = QUERIES[q](d)
    assert out.to_pylist() == [{
        "n_gaps": 3, "min_gap_days": 0, "median_gap_days": 0,
        "p90_gap_days": 4, "max_gap_days": 4}]
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_hourly_profile_null_ts_vs_oracle(ray_session, tmp_path):
    """Null timestamps excluded on both sides; shares sum to ~10000."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    hr_us = 3_600_000_000
    base = 1_600_000_000_000_000
    hours = [0, 0, 0, 5, 5, 13, 23, None]
    events = pa.table({
        "event_id": pa.array(range(len(hours)), pa.int64()),
        "ts": pa.array([None if h is None else base + h * hr_us
                        for h in hours], pa.timestamp("us")),
        "user_id": pa.array([1] * len(hours), pa.int64()),
        "event_type": pa.array(["view"] * len(hours)),
        "value": pa.array([1.0] * len(hours)),
        "props": pa.array(["{}"] * len(hours)),
    })
    d = _write_dir(tmp_path, "sfhr", events=events)
    q = "hourly_profile_events"
    out = QUERIES[q](d)
    assert out.num_rows == 4 and sum(out["n"].to_pylist()) == 7
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_anomalous_days_planted_spike(ray_session, tmp_path):
    """19 quiet days (~5 events) + one 60-event spike: exactly the
    spike day crosses |z| > 2, matching the oracle's exact-integer
    filter; a borderline day must not flip in/out."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rows = []
    for day in range(19):
        rows += [(u, day) for u in range(5 + (day % 2))]
    rows += [(u, 19) for u in range(60)]  # spike
    d = _write_dir(tmp_path, "sfanom", events=_events(rows))
    q = "anomalous_days_events"
    out = QUERIES[q](d)
    assert out.num_rows == 1 and out["n"][0].as_py() == 60
    assert out["z_x10k"][0].as_py() > 20000
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_lifespan_and_weekend_vs_oracle(ray_session, tmp_path):
    """Lifespans: single-day users (span 0), a 10-day user, a 40-day
    user; weekend lift on a fixture with known weekend placement
    (base 1.5e15 us = 2017-07-14, a Friday: day+1 and day+2 are
    weekend); NULL users/ts excluded."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rows = [(1, 0), (2, 0), (3, 0), (3, 10), (4, 2), (4, 42),
            (None, 1), (5, None)]
    # add weekend/weekday volume: days 1,2 are Sat/Sun
    rows += [(u, 1) for u in range(10, 16)] + [(u, 2) for u in range(10, 14)]
    rows += [(u, 3) for u in range(10, 13)] + [(u, 4) for u in range(10, 12)]
    d = _write_dir(tmp_path, "sfspan", events=_events(rows))
    con = duckdb_con(d)
    for q in ("user_lifespan_stats_events", "weekend_lift_events"):
        out = QUERIES[q](d)
        assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf()), q
    ls = QUERIES["user_lifespan_stats_events"](d).to_pylist()[0]
    assert ls["min_span_days"] == 0 and ls["max_span_days"] == 40


def test_value_trend_planted_slope(ray_session, tmp_path):
    """Type 'up' gains exactly 2 cents/day, type 'flat' is constant
    (slope 0), type 'oneday' is degenerate (excluded by both sides);
    NULL value/ts/type rows excluded."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    day_us = 86_400_000_000
    base = 1_600_000_000_000_000
    ids, ts, et, val = [], [], [], []

    def add(day, typ, v):
        ids.append(len(ids))
        ts.append(None if day is None else base + day * day_us)
        et.append(typ)
        val.append(v)

    for day in range(10):
        add(day, "up", 1.00 + 0.02 * day)
        add(day, "flat", 5.0)
    for _ in range(4):
        add(3, "oneday", 2.0)
    add(2, None, 1.0)
    add(None, "up", 9.0)
    add(2, "up", None)
    events = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * len(ids), pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(["{}"] * len(ids)),
    })
    d = _write_dir(tmp_path, "sftrend", events=events)
    q = "value_trend_by_event_type"
    out = QUERIES[q](d)
    got = {r["event_type"]: r["slope_cents_per_day_x10k"]
           for r in out.to_pylist()}
    assert got == {"up": 20000, "flat": 0}  # 2 cents/day x10k; no 'oneday'
    con = duckdb_con(d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_segment_median_both_join_tiers(ray_session, tmp_path):
    """Broadcast tier and distributed-join tier return identical
    per-segment quantiles (max_broadcast=0 forces the join path, run
    ISOLATED — conftest: Ray 2.49 join-teardown guard)."""
    from conftest import run_query_isolated

    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = SF
    q = "median_order_value_by_mktsegment"
    base = QUERIES[q](d)
    joined = run_query_isolated(q, d, tmp_path / "j.parquet",
                                kwargs={"max_broadcast": 0})
    assert base.equals(joined)
    con = duckdb_con(d)
    assert not compare(base, con.execute(ORACLE_SQL[q]).fetchdf())
