"""Planted-fixture tests for the distribution-statistics queries added in
round 4 session 9: PERCENT_RANK/CUME_DIST, Gini, KS A/B drift, and the
gaps-and-islands daily streak.

The shipped testdata has no NULL users / values / timestamps and no
degenerate distributions, so only these fixtures exercise: NULL
partition keys (one partition of their own), NULL values (NULLS LAST
mutual peers; excluded from the value histograms), NULL timestamps
(dropped on both sides), hand-checkable streak islands, and the
zero-mass Gini guard.
"""

from __future__ import annotations

import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "documents", "embeddings"]

NEW_QUERIES = ["percentile_position_events_per_user", "gini_value_events",
               "ks_ab_drift_events", "longest_daily_streak_events"]


def _events(n=600, seed=23) -> pa.Table:
    """Events with ~11% NULL users, ~8% NULL values, ~7% NULL ts, value
    ties (quantized to 0.5 steps), and multi-day activity islands."""
    rng = np.random.default_rng(seed)
    day = 86_400_000_000
    user = rng.integers(0, 25, n)
    uid = pa.array([None if i % 9 == 0 else int(user[i]) for i in range(n)],
                   pa.int64())
    # day pattern: consecutive runs with deliberate gaps
    days = rng.integers(0, 14, n)
    ts = pa.array([None if i % 13 == 5 else
                   1_700_000_000_000_000 + int(days[i]) * day
                   + (i % 7) * 3_600_000_000
                   for i in range(n)], pa.timestamp("us"))
    raw = np.round(rng.uniform(0, 40, n) * 2) / 2  # heavy ties
    val = pa.array([None if i % 12 == 3 else float(raw[i])
                    for i in range(n)], pa.float64())
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": ts,
        "user_id": uid,
        "event_type": pa.array(
            [["view", "click", "purchase", "signup"][i % 4]
             for i in range(n)]),
        "value": val,
        "props": pa.array(['{"k": 1}'] * n),
    })


def _write_dir(tmp_path, events: pa.Table, name="sfdist"):
    d = tmp_path / name
    d.mkdir()
    for t in OTHER_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(events, d / "events.parquet", row_group_size=75)
    return str(d)


def test_dist_stats_planted_nulls_vs_oracle(ray_session, tmp_path):
    """All four new queries match DuckDB on a fixture with NULL users,
    NULL values, NULL timestamps and heavy value ties."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = _write_dir(tmp_path, _events())
    con = duckdb_con(d)
    for q in NEW_QUERIES:
        problems = compare(QUERIES[q](d),
                           con.execute(ORACLE_SQL[q]).fetchdf())
        assert not problems, (q, problems)


def test_longest_streak_hand_checked(ray_session, tmp_path):
    """Known islands: user 1 has days {0,1,2, 5,6}, user 2 has {3},
    user 3 has {0,2,4} (all gaps), duplicate (user, day) rows collapse."""
    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = [(1, 0), (1, 1), (1, 2), (1, 5), (1, 6), (1, 1),  # dup day
            (2, 3),
            (3, 0), (3, 2), (3, 4)]
    n = len(rows)
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base + d_ * day for _, d_ in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    d = _write_dir(tmp_path, events, "sfstreak")
    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    out = QUERIES["longest_daily_streak_events"](d)
    assert out.to_pylist() == [
        {"user_id": 1, "max_streak": 3},
        {"user_id": 2, "max_streak": 1},
        {"user_id": 3, "max_streak": 1},
    ]


def test_gini_zero_mass_raises(ray_session, tmp_path):
    """All-zero value mass: Gini undefined -> loud ValueError, never a
    silent NaN row (house rule: degenerate stats raise, like corr)."""
    n = 10
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([0.0] * n),
        "props": pa.array(["{}"] * n),
    })
    d = _write_dir(tmp_path, events, "sfzero")
    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    with pytest.raises(ValueError, match="zero"):
        QUERIES["gini_value_events"](d)


def test_ks_detects_planted_drift(ray_session, tmp_path):
    """Even event_ids drawn from value+20 shift: KS must be large; and
    the engine matches the oracle on the same shifted fixture."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rng = np.random.default_rng(7)
    n = 400
    vals = rng.uniform(0, 10, n)
    vals[::2] += 20.0  # even ids shifted far right
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array([i % 5 for i in range(n)], pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    d = _write_dir(tmp_path, events, "sfdrift")
    con = duckdb_con(d)
    q = "ks_ab_drift_events"
    out = QUERIES[q](d)
    problems = compare(out, con.execute(ORACLE_SQL[q]).fetchdf())
    assert not problems, problems
    assert out["ks_x10k"][0].as_py() == 10000  # fully separated halves


def test_new_vs_returning_and_sessions_planted(ray_session, tmp_path):
    """New-vs-returning: user 1 active days 0,1,2 (new on 0 only),
    user 2 only day 1 (new), NULL user/ts excluded; descending user
    insertion order stresses the position-based first-day gather.
    Session stats: user 3's two events 45 min apart split into two
    single-event sessions (bounces, dur 0); user 1's three same-minute
    events are one session."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = [  # (user, offset_us) — users deliberately in reverse order
        (3, 0), (3, 45 * 60_000_000),
        (2, day + 5), (1, 0), (1, 30_000_000), (1, 60_000_000),
        (1, day), (1, 2 * day),
    ]
    events = pa.table({
        "event_id": pa.array(range(len(rows) + 2), pa.int64()),
        "ts": pa.array([base + off for _, off in rows] + [None, base],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows] + [1, None], pa.int64()),
        "event_type": pa.array(["view"] * (len(rows) + 2)),
        "value": pa.array([1.0] * (len(rows) + 2)),
        "props": pa.array(["{}"] * (len(rows) + 2)),
    })
    d = _write_dir(tmp_path, events, "sfnvr")
    con = duckdb_con(d)
    q = "new_vs_returning_users_daily"
    out = QUERIES[q](d)
    got = {r["day"] - out["day"][0].as_py():
           (r["dau"], r["new_users"], r["returning_users"])
           for r in out.to_pylist()}
    assert got == {0: (2, 2, 0), 1: (2, 1, 1), 2: (1, 0, 1)}
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())


def test_reactivation_and_activity_gini_planted(ray_session, tmp_path):
    """User 1: days 0, 10, 12, 40 -> reactivations on day 10 (gap 10)
    and day 40 (gap 28), attributed to their months; duplicate same-day
    events collapse; NULL user/ts excluded. Activity gini: planted
    one-whale distribution scores high and matches its oracle."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    day = 86_400_000_000
    base = 1_700_000_000_000_000  # 2023-11-14
    rows = [(1, 0), (1, 10), (1, 10), (1, 12), (1, 40),
            (2, 0), (2, 3), (None, 0)]
    n = len(rows) + 1
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base + d * day for _, d in rows] + [None],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows] + [2], pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    # whale: user 9 with 60 events in one burst
    whale = pa.table({
        "event_id": pa.array(range(n, n + 60), pa.int64()),
        "ts": pa.array([base + i for i in range(60)], pa.timestamp("us")),
        "user_id": pa.array([9] * 60, pa.int64()),
        "event_type": pa.array(["view"] * 60),
        "value": pa.array([1.0] * 60),
        "props": pa.array(["{}"] * 60),
    })
    d = _write_dir(tmp_path, pa.concat_tables([events, whale]), "sfreact")
    con = duckdb_con(d)
    q = "reactivated_users_monthly"
    out = QUERIES[q](d)
    assert sum(out["reactivations"].to_pylist()) == 2
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())
    q2 = "activity_gini_events_per_user"
    out2 = QUERIES[q2](d)
    assert out2["gini_x10k"][0].as_py() > 5000  # whale-dominated
    assert not compare(out2, con.execute(ORACLE_SQL[q2]).fetchdf())


def test_langid_confusion_rows_only(ray_session):
    """Confusion counts sum to the corpus size, diagonal dominates
    (model F1 per class >= 0.90 on its own synthetic domain), and the
    summary rows carry per-class F1 x10k; deterministic re-run."""
    import engine.queries_ext as qe

    sf = "/root/testdata/sf0.001"
    out = qe.langid_confusion_corpus(sf)
    cells = [r for r in out.to_pylist() if r["pred"] != "__f1__"]
    f1s = {r["actual"]: r["n"] for r in out.to_pylist()
           if r["pred"] == "__f1__"}
    import pyarrow.parquet as pq_mod
    n = pq_mod.read_metadata(f"{sf}/documents.parquet").num_rows
    assert sum(r["n"] for r in cells) == n
    assert set(f1s) == {"c", "javascript", "markdown", "python", "text"}
    assert all(v >= 9000 for v in f1s.values()), f1s
    assert out.equals(qe.langid_confusion_corpus(sf))


def test_perplexity_profile_rows_only(ray_session):
    """Per-lang doc counts sum to the corpus size, every ppl percentile
    is positive with p90 >= median, and the run is deterministic."""
    import engine.queries_ext as qe

    sf = "/root/testdata/sf0.001"
    out = qe.perplexity_profile_corpus(sf)
    import pyarrow.parquet as pq_mod
    n = pq_mod.read_metadata(f"{sf}/documents.parquet").num_rows
    assert sum(out["n_docs"].to_pylist()) == n
    for r in out.to_pylist():
        assert 0 < r["median_ppl_x100"] <= r["p90_ppl_x100"], r
    assert out.equals(qe.perplexity_profile_corpus(sf))


def test_rolling_7day_wau_gap_boundaries(ray_session, tmp_path):
    """Coverage-interval runs: user 1 active days 0 and 7 (gap == 7,
    contiguous coverage — must merge, never double-count), user 2 days
    0 and 8 (gap 8, separate runs), user 3 day 3 only; matches the SQL
    BETWEEN window oracle exactly."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    day = 86_400_000_000
    base = 1_700_000_000_000_000
    rows = [(1, 0), (1, 7), (2, 0), (2, 8), (3, 3)]
    events = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([base + d * day for _, d in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    d = _write_dir(tmp_path, events, "sfwau")
    con = duckdb_con(d)
    q = "rolling_7day_users_events"
    out = QUERIES[q](d)
    assert not compare(out, con.execute(ORACLE_SQL[q]).fetchdf())
    base_day = out["event_date"][0].as_py()
    got = {(r["event_date"] - base_day).days: r["wau"]
           for r in out.to_pylist()}
    # observed days 0,3,7,8: day 0 {1,2}; day 3 {1,2,3}; day 7 {1,3}
    # (user 1 present across the ==7 gap; user 2's days 0/8 both
    # OUTSIDE [1,7]); day 8 {1,2,3}
    assert got == {0: 2, 3: 3, 7: 2, 8: 3}
