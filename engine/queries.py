"""Named queries over the driver testdata + their DuckDB oracle SQL.

One entry per implemented operator family from SURVEY.md §2; the driver
runs each Ray callable AND the oracle SQL side-by-side and compares
row-count + schema + order-insensitive value-hash.

Output-type policy (hash stability): columns are int64, string, date or
*raw* min/max doubles (comparisons only — bit-identical across engines).
Derived floats (ratios, means, money sums) are emitted as integers —
cents (``*_cents``) or parts-per-million (``*_ppm``) — because float
summation order differs between engines and a value-hash would flip on
last-ulp noise. The SQL mirrors the same transformation.

Status strings replicate the reference's judgment semantics exactly
(see engine/audit.py for file:line citations).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

QUERIES: dict[str, Callable] = {}
ORACLE_SQL: dict[str, str] = {}

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def _iround(x: float) -> int:
    """Half-up integer rounding — matches SQL floor(x + 0.5) exactly
    (numpy/Arrow round is half-to-even; DuckDB ROUND is half-up, so every
    derived integer uses explicit floor(x+0.5) on BOTH sides)."""
    import math

    return int(math.floor(x + 0.5))


def _cents(arr, scale: float = 100.0) -> pa.Array:
    """Vectorized half-up integer scaling: floor(x*scale + 0.5)."""
    return pc.cast(pc.floor(pc.add(pc.multiply(arr, scale), 0.5)), pa.int64())


def _vc_partial(col, value_name: str, count_name: str) -> pa.Table:
    """Per-batch ``value_counts`` partial as a (value, int64 count)
    table — the additive combiner behind histogram / calendar / stratum
    rollups (merge with one groupby Sum)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vc = pc.value_counts(col)
    return pa.table({value_name: vc.field("values"),
                     count_name: pc.cast(vc.field("counts"), pa.int64())})

TOKEN_RE = r"[A-Za-z0-9_]+"


def query(name: str, sql: Optional[str] = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _row(**cols) -> pa.Table:
    arrays = {}
    for k, v in cols.items():
        if isinstance(v, bool):
            arrays[k] = pa.array([v], pa.bool_())
        elif isinstance(v, (int, np.integer)):
            arrays[k] = pa.array([int(v)], pa.int64())
        elif isinstance(v, float):
            arrays[k] = pa.array([v], pa.float64())
        else:
            arrays[k] = pa.array([v])
    return pa.table(arrays)


def _pf_status(viol: int) -> str:
    return "PASS" if viol == 0 else "FAIL"


# ===========================================================================
# NULL checks — M1/M2/M3 (null_checker.py; TS-2)
# ===========================================================================

@query(
    "null_blank_documents_text",
    """
    SELECT count(*) AS total_rows,
           count(*) FILTER (WHERE text IS NULL OR trim(text) = '') AS violation_count,
           count(*) FILTER (WHERE text IS NULL) AS pure_null_count,
           count(*) FILTER (WHERE text IS NOT NULL AND trim(text) = '') AS empty_string_count,
           CASE WHEN count(*) FILTER (WHERE text IS NULL OR trim(text) = '') = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM documents
    """,
)
def null_blank_documents_text(sf_dir: str) -> pa.Table:
    """TS-2 NULL-or-blank completeness check (null_checker.py:58-94)."""
    from .checks import null_check

    r = null_check(_t(sf_dir, "documents", ["text"]), "text", 0.0, include_empty_string=True)
    return _row(
        total_rows=r.total_rows,
        violation_count=r.violation_count,
        pure_null_count=r.details.get("pure_null_count", 0),
        empty_string_count=r.details.get("empty_string_count", 0),
        status=r.status.value,
    )


@query(
    "null_check_orders_totalprice",
    """
    SELECT count(*) AS total_rows,
           count(*) FILTER (WHERE o_totalprice IS NULL) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE o_totalprice IS NULL) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM orders
    """,
)
def null_check_orders_totalprice(sf_dir: str) -> pa.Table:
    from .checks import null_check

    r = null_check(_t(sf_dir, "orders", ["o_totalprice"]), "o_totalprice", 0.0)
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


# ===========================================================================
# Count compare — S4/A1/A12 zero-guard (count_checker.py:39-116)
# ===========================================================================

@query(
    "count_compare_orders_lineitem",
    """
    WITH s AS (SELECT count(*) AS c FROM orders),
         t AS (SELECT count(DISTINCT l_orderkey) AS c FROM lineitem)
    SELECT s.c AS source_count, t.c AS target_count,
           abs(s.c - t.c) AS violation_count,
           CAST(floor(abs(s.c - t.c) * 1000000.0 / s.c + 0.5) AS BIGINT) AS diff_ratio_ppm,
           CASE WHEN abs(s.c - t.c) * 1.0 / s.c <= 0.0 THEN 'PASS' ELSE 'FAIL' END AS status
    FROM s, t
    """,
)
def count_compare_orders_lineitem(sf_dir: str) -> pa.Table:
    """CNT rule: orders count vs distinct order keys in lineitem."""
    from .audit import count_compare_status

    sc = _t(sf_dir, "orders", ["o_orderkey"]).count()
    tc = len(_t(sf_dir, "lineitem", ["l_orderkey"]).unique("l_orderkey"))
    status, ratio = count_compare_status(sc, tc, 0.0)
    return _row(source_count=sc, target_count=tc, violation_count=abs(sc - tc),
                diff_ratio_ppm=_iround(ratio * 1e6), status=status.value)


# ===========================================================================
# Range checks — M4-M9 (range_checker.py:120-244)
# ===========================================================================

@query(
    "range_check_quantity",
    """
    SELECT count(*) FILTER (WHERE l_quantity IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS violation_count,
           min(l_quantity) AS actual_min, max(l_quantity) AS actual_max,
           CASE WHEN count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM lineitem
    """,
)
def range_check_quantity(sf_dir: str) -> pa.Table:
    from .checks import numeric_range_check

    r = numeric_range_check(_t(sf_dir, "lineitem", ["l_quantity"]), "l_quantity", 1, 50)
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                actual_min=float(r.details["actual_min"]),
                actual_max=float(r.details["actual_max"]), status=r.status.value)


@query(
    "range_positive_events_value",
    """
    SELECT count(*) FILTER (WHERE value IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE value < 0) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE value < 0) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM events
    """,
)
def range_positive_events_value(sf_dir: str) -> pa.Table:
    """Positive-value rule (RNG-001 analogue, min=0 no max)."""
    from .checks import numeric_range_check

    r = numeric_range_check(_t(sf_dir, "events", ["value"]), "value", 0, None)
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "date_range_events",
    """
    SELECT count(*) FILTER (WHERE ts IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE ts IS NOT NULL AND
                 (ts < TIMESTAMP '2024-01-05' OR ts > TIMESTAMP '2024-01-25')) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE ts IS NOT NULL AND
                 (ts < TIMESTAMP '2024-01-05' OR ts > TIMESTAMP '2024-01-25')) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM events
    """,
)
def date_range_events(sf_dir: str) -> pa.Table:
    from .checks import date_range_check

    r = date_range_check(_t(sf_dir, "events", ["ts"]), "ts", "2024-01-05", "2024-01-25")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "no_future_events",
    """
    SELECT count(*) FILTER (WHERE ts IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE ts > TIMESTAMP '2024-01-15') AS violation_count,
           CASE WHEN count(*) FILTER (WHERE ts > TIMESTAMP '2024-01-15') = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM events
    """,
)
def no_future_events(sf_dir: str) -> pa.Table:
    """M7 with a fixed cutoff standing in for NOW() (determinism —
    the reference calls NOW() in SQL, range_checker.py:228)."""
    from .checks import no_future_check

    r = no_future_check(_t(sf_dir, "events", ["ts"]), "ts", "2024-01-15")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "enum_check_orderstatus",
    """
    SELECT count(*) FILTER (WHERE o_orderstatus IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F')) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('O', 'F')) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM orders
    """,
)
def enum_check_orderstatus(sf_dir: str) -> pa.Table:
    """M9 allowed-values predicate (checks/check_range.sql:98-111)."""
    from .checks.base import reduce_batches

    ds = _t(sf_dir, "orders", ["o_orderstatus"])
    allowed = pa.array(["O", "F"])

    def partial(batch: pa.Table) -> dict:
        col = batch["o_orderstatus"]
        valid = pc.is_valid(col)
        bad = pc.and_(valid, pc.invert(pc.is_in(col, value_set=allowed)))
        return {"total": len(col) - col.null_count,
                "viol": int(pc.sum(bad.cast(pa.int64())).as_py() or 0)}

    agg = reduce_batches(ds, partial, {"total": "sum", "viol": "sum"})
    viol = int(agg["viol"] or 0)
    return _row(total_rows=int(agg["total"] or 0), violation_count=viol,
                status=_pf_status(viol))


# ===========================================================================
# Duplicates — A7/A8/A10/O1 (duplicate_checker.py:79-160)
# ===========================================================================

@query(
    "dup_groups_documents_text",
    """
    WITH g AS (SELECT text, count(*) AS cnt FROM documents
               WHERE text IS NOT NULL GROUP BY text HAVING count(*) > 1)
    SELECT (SELECT count(*) FROM documents) AS total_rows,
           (SELECT count(*) FROM g) AS duplicate_groups,
           CAST(COALESCE((SELECT sum(cnt - 1) FROM g), 0) AS BIGINT) AS duplicate_rows,
           CASE WHEN COALESCE((SELECT sum(cnt - 1) FROM g), 0) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    """,
)
def dup_groups_documents_text(sf_dir: str) -> pa.Table:
    """Content-keyed dup profile; the groupby shuffles sha256(text) —
    64 B/key — never the full text (scale note, VERDICT r1 pipeline audit)."""
    from .checks import duplicate_check

    r = duplicate_check(_t(sf_dir, "documents", ["text"]), ["text"],
                        hash_keys=["text"])
    return _row(total_rows=r.total_rows,
                duplicate_groups=r.details["duplicate_groups"],
                duplicate_rows=r.details["duplicate_rows"], status=r.status.value)


@query(
    "dup_customer_segment",
    """
    WITH g AS (SELECT c_mktsegment, count(*) AS cnt FROM customer
               WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment HAVING count(*) > 1)
    SELECT (SELECT count(*) FROM customer) AS total_rows,
           (SELECT count(*) FROM g) AS duplicate_groups,
           CAST(COALESCE((SELECT sum(cnt - 1) FROM g), 0) AS BIGINT) AS duplicate_rows,
           CASE WHEN COALESCE((SELECT sum(cnt - 1) FROM g), 0) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    """,
)
def dup_customer_segment(sf_dir: str) -> pa.Table:
    from .checks import duplicate_check

    r = duplicate_check(_t(sf_dir, "customer", ["c_mktsegment"]), ["c_mktsegment"])
    return _row(total_rows=r.total_rows,
                duplicate_groups=r.details["duplicate_groups"],
                duplicate_rows=r.details["duplicate_rows"], status=r.status.value)


@query(
    "pk_unique_orders",
    """
    SELECT count(*) AS total_rows,
           count(DISTINCT o_orderkey) AS distinct_keys,
           count(*) - count(DISTINCT o_orderkey) AS violation_count,
           CASE WHEN count(*) = count(DISTINCT o_orderkey)
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM orders
    """,
)
def pk_unique_orders(sf_dir: str) -> pa.Table:
    """A10 PK-uniqueness (checks/check_duplicates.sql:64-74)."""
    from ray.data.aggregate import Count

    ds = _t(sf_dir, "orders", ["o_orderkey"])
    total = ds.count()
    distinct = ds.groupby("o_orderkey").aggregate(Count(alias_name="cnt")).count()
    viol = total - distinct
    return _row(total_rows=total, distinct_keys=distinct, violation_count=viol,
                status=_pf_status(viol))


@query(
    "topk_dup_customer_segment",
    """
    SELECT c_mktsegment, count(*) AS cnt FROM customer
    WHERE c_mktsegment IS NOT NULL
    GROUP BY c_mktsegment HAVING count(*) > 1
    ORDER BY cnt DESC, c_mktsegment LIMIT 3
    """,
)
def topk_dup_customer_segment(sf_dir: str) -> pa.Table:
    """O1 top-k dup groups, deterministic tiebreak on the key."""
    from ray.data.aggregate import Count

    grouped = (
        _t(sf_dir, "customer", ["c_mktsegment"])
        # the SQL excludes NULL segments up front — and a null-bearing
        # string group key would crash Ray's sort shuffle anyway
        .map_batches(lambda b: b.filter(pc.is_valid(b["c_mktsegment"])),
                     batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="cnt"))
        .filter(expr="cnt > 1")
        .sort(["cnt", "c_mktsegment"], descending=[True, False])
        .limit(3)
    )
    t = _collect(grouped)
    return t.select(["c_mktsegment", "cnt"])


# ===========================================================================
# FK / joins — J1/J3/J8 (range_checker.py:246-288, check_foreign_key.sql)
# ===========================================================================

@query(
    "fk_orphans_lineitem_orders",
    """
    SELECT count(*) FILTER (WHERE l_orderkey IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
               (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM lineitem l
    """,
)
def fk_orphans_lineitem_orders(sf_dir: str) -> pa.Table:
    from .checks import fk_check

    r = fk_check(_t(sf_dir, "lineitem", ["l_orderkey"]), "l_orderkey",
                 _t(sf_dir, "orders", ["o_orderkey"]), "o_orderkey")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "fk_orphans_events_customer",
    """
    SELECT count(*) FILTER (WHERE user_id IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE user_id IS NOT NULL AND NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE user_id IS NOT NULL AND NOT EXISTS
               (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM events e
    """,
)
def fk_orphans_events_customer(sf_dir: str) -> pa.Table:
    from .checks import fk_check

    r = fk_check(_t(sf_dir, "events", ["user_id"]), "user_id",
                 _t(sf_dir, "customer", ["c_custkey"]), "c_custkey")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "fk_coverage_orders_customer",
    """
    SELECT count(o_custkey) AS total_fk_rows,
           count(DISTINCT o_custkey) AS distinct_fk,
           (SELECT count(DISTINCT c_custkey) FROM customer) AS parent_keys,
           CAST(floor(count(DISTINCT o_custkey) * 1000000.0 /
                (SELECT count(DISTINCT c_custkey) FROM customer) + 0.5) AS BIGINT) AS coverage_ppm
    FROM orders
    """,
)
def fk_coverage_orders_customer(sf_dir: str) -> pa.Table:
    """J8 FK distribution/coverage profile (check_foreign_key.sql:133-148)."""
    orders = _t(sf_dir, "orders", ["o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey"])
    total_fk = orders.map_batches(
        lambda b: pa.table({"n": [len(b["o_custkey"]) - b["o_custkey"].null_count]}),
        batch_format="pyarrow",
    ).sum("n")
    distinct_fk = len(orders.unique("o_custkey"))
    parent_keys = len(cust.unique("c_custkey"))
    return _row(total_fk_rows=int(total_fk), distinct_fk=distinct_fk,
                parent_keys=parent_keys,
                coverage_ppm=_iround(distinct_fk * 1e6 / parent_keys))


@query(
    "bidirectional_customer_orders",
    """
    SELECT
      (SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphan_children,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS unused_parents
    """,
)
def bidirectional_customer_orders(sf_dir: str) -> pa.Table:
    """J3 bidirectional reference check (check_foreign_key.sql:58-83):
    orphans in the child + parents never referenced (broadcast both ways)."""
    import ray

    orders = _t(sf_dir, "orders", ["o_custkey"])
    cust = _t(sf_dir, "customer", ["c_custkey"])
    parent_keys = ray.put(pa.array(cust.unique("c_custkey")))
    child_keys = ray.put(pa.array(orders.unique("o_custkey")))

    def orphan_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(parent_keys)
        col = batch["o_custkey"]
        bad = pc.and_(pc.is_valid(col), pc.invert(pc.is_in(col, value_set=keys)))
        return pa.table({"n": [int(pc.sum(bad.cast(pa.int64())).as_py() or 0)]})

    def unused_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(child_keys)
        col = batch["c_custkey"]
        bad = pc.invert(pc.is_in(col, value_set=keys))
        return pa.table({"n": [int(pc.sum(bad.cast(pa.int64())).as_py() or 0)]})

    orphans = int(orders.map_batches(orphan_partial, batch_format="pyarrow").sum("n") or 0)
    unused = int(cust.map_batches(unused_partial, batch_format="pyarrow").sum("n") or 0)
    return _row(orphan_children=orphans, unused_parents=unused)


# ===========================================================================
# Grouped aggregates — A5/A6 (sql/init_target.sql:90-106, TRF-002/003)
# ===========================================================================

@query(
    "daily_rollup_events",
    """
    SELECT CAST(ts AS DATE) AS event_date,
           count(*) AS event_count,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_cents,
           max(value) AS max_value,
           min(value) AS min_value,
           count(DISTINCT user_id) AS unique_users
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY event_date
    """,
)
def daily_rollup_events(sf_dir: str) -> pa.Table:
    """A5 daily rollup: multi-aggregate incl. within-group distinct.

    Count/sum/max/min partials are calendar-sized per block and merge
    on the driver — NO shuffle for them (money in integer cents, max/min
    on raw doubles: comparisons only, hash-stable). Distinct users per
    day is the one genuinely shuffled piece ((day, user) IS
    high-cardinality -> bucketed_groupby), but its day-level counts
    also come back as driver-merged ``_vc_partial``s, so the query runs
    ONE shuffle total and the final day-level join is driver-local.
    Both scans run concurrently (driver threads)."""
    from concurrent.futures import ThreadPoolExecutor

    ds = _t(sf_dir, "events", ["ts", "value", "user_id"])

    def stats_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"event_date": pc.cast(batch["ts"], pa.date32()),
                      "value": batch["value"],
                      "value_cents": _cents(batch["value"])})
        g = t.group_by(["event_date"]).aggregate(
            [([], "count_all"), ("value_cents", "sum"),
             ("value", "max"), ("value", "min")])
        return g.rename_columns(["event_date", "n", "cents", "vmax", "vmin"])

    def stats_side():
        parts = _collect(
            ds.map_batches(stats_partial, batch_format="pyarrow"))
        g = parts.group_by(["event_date"]).aggregate(
            [("n", "sum"), ("cents", "sum"),
             ("vmax", "max"), ("vmin", "min")])
        return g.rename_columns(
            ["event_date", "event_count", "total_value_cents",
             "max_value", "min_value"])

    def users_side():
        from .stages.aggregates import bucketed_groupby

        # own pruned read: the stats side needs value, this side doesn't
        uds = _t(sf_dir, "events", ["ts", "user_id"])
        proj = uds.map_batches(
            # count(DISTINCT user_id) excludes NULLs
            lambda b: pa.table({"event_date": pc.cast(b["ts"], pa.date32()),
                                "user_id": b["user_id"]}).filter(
                pc.is_valid(b["user_id"])),
            batch_format="pyarrow")
        pairs = bucketed_groupby(proj, ["event_date", "user_id"],
                                 [("", "count", "c")])
        parts = _collect(pairs.map_batches(
            lambda b: _vc_partial(b["event_date"], "event_date", "u"),
            batch_format="pyarrow"))
        g = parts.group_by(["event_date"]).aggregate([("u", "sum")])
        return g.rename_columns(["event_date", "unique_users"])

    with ThreadPoolExecutor(2) as ex:
        fs, fu = ex.submit(stats_side), ex.submit(users_side)
        stats, users = fs.result(), fu.result()
    j = stats.join(users, keys="event_date", join_type="inner")
    return j.sort_by("event_date").select(
        ["event_date", "event_count", "total_value_cents",
         "max_value", "min_value", "unique_users"])


@query(
    "distinct_dates_events",
    "SELECT count(DISTINCT CAST(ts AS DATE)) AS distinct_dates FROM events",
)
def distinct_dates_events(sf_dir: str) -> pa.Table:
    """A6 COUNT(DISTINCT expr) (config/rules/count_rules.yml:28).
    The distinct set is calendar-bounded, so per-block ``_vc_partial``s
    merge on the driver — no ``unique`` shuffle."""
    ds = _t(sf_dir, "events", ["ts"])
    parts = _collect(ds.map_batches(
        lambda b: _vc_partial(pc.cast(b["ts"], pa.date32()), "d", "n"),
        batch_format="pyarrow",
    ))
    return _row(distinct_dates=pc.count_distinct(parts["d"]).as_py())


# ===========================================================================
# Transform compare — J4/J6/A12 (transform_checker.py)
# ===========================================================================

@query(
    "agg_compare_revenue",
    """
    WITH s AS (SELECT sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS v
               FROM lineitem WHERE l_extendedprice IS NOT NULL),
         t AS (SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS v FROM orders)
    SELECT CAST(s.v AS BIGINT) AS source_value_cents,
           CAST(t.v AS BIGINT) AS target_value_cents,
           CAST(abs(s.v - t.v) AS BIGINT) AS difference_cents,
           CASE WHEN abs(s.v - t.v) * 1.0 / abs(s.v) <= 0.05 THEN 'PASS' ELSE 'FAIL' END AS status
    FROM s, t
    """,
)
def agg_compare_revenue(sf_dir: str) -> pa.Table:
    """TRF-001-style aggregate compare with tolerance + zero guards
    (transform_checker.py:42-101) over integer-cent sums."""
    from .audit import aggregate_compare_status

    li = _t(sf_dir, "lineitem", ["l_extendedprice", "l_discount"])
    orders = _t(sf_dir, "orders", ["o_totalprice"])

    def li_cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        return pa.table({"c": _cents(rev)})

    def o_cents(batch: pa.Table) -> pa.Table:
        return pa.table({"c": _cents(batch["o_totalprice"])})

    sv = int(li.map_batches(li_cents, batch_format="pyarrow").sum("c"))
    tv = int(orders.map_batches(o_cents, batch_format="pyarrow").sum("c"))
    status, diff = aggregate_compare_status(float(sv), float(tv), 0.05)
    return _row(source_value_cents=sv, target_value_cents=tv,
                difference_cents=int(diff), status=status.value)


@query(
    "daily_count_compare_orders_lineitem",
    """
    WITH s AS (SELECT CAST(o_orderdate AS DATE) AS tx_date, count(*) AS c
               FROM orders GROUP BY 1),
         t AS (SELECT CAST(l_shipdate AS DATE) AS tx_date, count(*) AS c
               FROM lineitem GROUP BY 1)
    SELECT COALESCE(s.tx_date, t.tx_date) AS tx_date,
           COALESCE(s.c, 0) AS source_count,
           COALESCE(t.c, 0) AS target_count,
           CASE WHEN COALESCE(s.c, 0) = COALESCE(t.c, 0) THEN 'PASS' ELSE 'FAIL' END AS day_status
    FROM s FULL OUTER JOIN t ON s.tx_date = t.tx_date
    ORDER BY tx_date
    """,
)
def daily_count_compare_orders_lineitem(sf_dir: str) -> pa.Table:
    """J6 per-day-partition count compare (checks/check_count.sql:51-70).
    Day counts are pre-reduced per batch (``_vc_partial`` combiner — the
    shuffle carries dates x blocks rows, not corpus rows) into one
    driver-merged calendar-sized result per side — NO shuffle barrier
    and no distributed join anywhere: day cardinality is bounded by the
    CALENDAR, not the data, so partial volume is dates x blocks at any
    corpus size and the full-outer day compare is a driver-local Arrow
    join. The two sides scan concurrently (driver threads). Replaced a
    groupby+distributed-join plan that spent ~4 of its ~6 bench seconds
    on pure shuffle/join fixed overhead (now ~0.9 s)."""
    from concurrent.futures import ThreadPoolExecutor

    def day_counts(ds, ts_col, out_name):
        def part(b, c=ts_col):
            return _vc_partial(pc.cast(b[c], pa.date32()), "tx_date", "n")

        # calendar-sized per-block partials merged on the driver — no
        # shuffle barrier at all (the sketches.py merge shape; partial
        # volume is dates x blocks regardless of corpus size)
        parts = _collect(ds.map_batches(part, batch_format="pyarrow"))
        g = parts.group_by(["tx_date"]).aggregate([("n", "sum")])
        return g.rename_columns(["tx_date", out_name])

    # both sides execute CONCURRENTLY (driver threads each consuming
    # their own Dataset) — sequential _collect would serialize the two
    # shuffles, and Union in Ray 2.49 materializes its branches
    with ThreadPoolExecutor(2) as ex:
        fs = ex.submit(day_counts, _t(sf_dir, "orders", ["o_orderdate"]),
                       "o_orderdate", "sc")
        ft = ex.submit(day_counts, _t(sf_dir, "lineitem", ["l_shipdate"]),
                       "l_shipdate", "tc")
        st, tt = fs.result(), ft.result()
    j = st.join(tt, keys="tx_date", join_type="full outer")
    sc = pc.fill_null(j["sc"], 0)
    tc = pc.fill_null(j["tc"], 0)
    return pa.table({
        "tx_date": j["tx_date"],
        "source_count": sc,
        "target_count": tc,
        "day_status": pc.if_else(pc.equal(sc, tc), "PASS", "FAIL"),
    }).sort_by("tx_date")


@query(
    "existence_customer_orders",
    """
    WITH s AS (SELECT DISTINCT c_custkey AS k FROM customer),
         t AS (SELECT DISTINCT o_custkey AS k FROM orders)
    SELECT (SELECT count(*) FROM s) AS source_count,
           (SELECT count(*) FROM t) AS target_count,
           (SELECT count(*) FROM s WHERE k NOT IN (SELECT k FROM t)) AS missing_in_target,
           (SELECT count(*) FROM t WHERE k NOT IN (SELECT k FROM s)) AS missing_in_source,
           CASE WHEN (SELECT count(*) FROM s WHERE k NOT IN (SELECT k FROM t)) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    """,
)
def existence_customer_orders(sf_dir: str) -> pa.Table:
    """J5 existence / key-set difference (transform_checker.py:187-229)."""
    from .checks import existence_check

    cust = _t(sf_dir, "customer", ["c_custkey"]).rename_columns({"c_custkey": "k"})
    orders = _t(sf_dir, "orders", ["o_custkey"]).rename_columns({"o_custkey": "k"})
    r = existence_check(cust, orders, "k")
    return _row(source_count=r.details["source_count"],
                target_count=r.details["target_count"],
                missing_in_target=r.details["missing_in_target"],
                missing_in_source=r.details["missing_in_source"],
                status=r.status.value)


# ===========================================================================
# Masking / hashing — M11-M15 (masking_checker.py, init_target.sql)
# ===========================================================================

@query(
    "masking_prefix_customer_name",
    """
    SELECT count(*) FILTER (WHERE c_name IS NOT NULL) AS total_rows,
           count(*) FILTER (WHERE c_name IS NOT NULL AND
                            substring(c_name, 1, 9) != 'Customer#') AS violation_count,
           CASE WHEN count(*) FILTER (WHERE c_name IS NOT NULL AND
                            substring(c_name, 1, 9) != 'Customer#') = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM customer
    """,
)
def masking_prefix_customer_name(sf_dir: str) -> pa.Table:
    """M12-shape fixed-position format check (TS-3 substring semantics)."""
    from .checks import mask_format_check

    r = mask_format_check(_t(sf_dir, "customer", ["c_name"]), "c_name", 1, "Customer#")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "sha256_documents",
    "SELECT doc_id, sha256(text) AS content_sha256 FROM documents ORDER BY doc_id",
)
def sha256_documents(sf_dir: str) -> pa.Table:
    """M15 hash transform (SHA2(x,256) analogue, init_target.sql:21)."""
    from .stages.heuristics import add_metrics

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: add_metrics(b, content_col="text").select(["doc_id", "content_sha256_pre"]),
        batch_format="pyarrow",
    ).sort("doc_id")
    # ^ CERTIFICATION ONLY: canonical order for the driver's hash
    # compare. Production callers consume the unsorted Dataset — the
    # stage itself is order-free. Same for every sort below marked
    # "certification-only sort".
    t = _collect(out)
    return t.rename_columns(["doc_id", "content_sha256"])


@query(
    "hash_format_sha256_documents",
    """
    WITH h AS (SELECT sha256(text) AS hv FROM documents WHERE text IS NOT NULL)
    SELECT count(*) AS total_rows,
           count(*) FILTER (WHERE length(hv) != 64 OR regexp_matches(hv, '[^0-9a-fA-F]')) AS violation_count,
           CASE WHEN count(*) FILTER (WHERE length(hv) != 64 OR regexp_matches(hv, '[^0-9a-fA-F]')) = 0
                THEN 'PASS' ELSE 'FAIL' END AS status
    FROM h
    """,
)
def hash_format_sha256_documents(sf_dir: str) -> pa.Table:
    """M13 hash-shape check over a derived sha256 column."""
    from .checks import hash_format_check
    from .stages.heuristics import add_metrics

    ds = _t(sf_dir, "documents", ["text"])
    hashed = ds.map_batches(
        lambda b: add_metrics(b, content_col="text").select(["content_sha256_pre"]),
        batch_format="pyarrow",
    )
    r = hash_format_check(hashed, "content_sha256_pre")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


@query(
    "scrub_emails_documents",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS email_redactions,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS text_scrubbed
    FROM documents ORDER BY doc_id
    """,
)
def scrub_emails_documents(sf_dir: str) -> pa.Table:
    """M14/M15 regex scrub over documents (RE2 kernels, TS-3 style)."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        cnt = pc.count_substring_regex(batch["text"], EMAIL_RE).cast(pa.int64())
        repl = pc.replace_substring_regex(batch["text"], EMAIL_RE, "<EMAIL>")
        return pa.table({"doc_id": batch["doc_id"], "email_redactions": cnt,
                         "text_scrubbed": repl})

    out = ds.map_batches(scrub, batch_format="pyarrow").sort("doc_id")  # certification-only sort (see note above)
    return _collect(out).select(
        ["doc_id", "email_redactions", "text_scrubbed"])


# ===========================================================================
# Text analysis over documents (training-data ops; SQL-expressible subset)
# ===========================================================================

@query(
    "token_count_documents",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS token_count
    FROM documents ORDER BY doc_id
    """,
)
def token_count_documents(sf_dir: str) -> pa.Table:
    """Token counting via one vectorized regex-count kernel per batch."""
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "token_count": pc.count_substring_regex(b["text"], TOKEN_RE).cast(pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("doc_id")  # certification-only sort (see note above)
    return _collect(out).select(["doc_id", "token_count"])


@query(
    "quality_stats_documents",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(text) - length(replace(text, chr(10), '')) + 1 AS BIGINT) AS n_lines,
           CAST(list_max(list_transform(string_split(text, chr(10)), x -> length(x))) AS BIGINT) AS max_line_len,
           CAST(floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000000.0 /
                      greatest(length(text), 1) + 0.5) AS BIGINT) AS alpha_ratio_ppm
    FROM documents ORDER BY doc_id
    """,
)
def quality_stats_documents(sf_dir: str) -> pa.Table:
    """Quality metrics (byte==char here: ASCII corpus) as one batch pass."""
    from .stages.heuristics import add_metrics

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        m = add_metrics(batch, content_col="text")
        ppm = _cents(m["alpha_ratio"], 1e6)
        return pa.table({"doc_id": m["doc_id"], "n_chars": m["n_chars"],
                         "n_lines": m["n_lines"], "max_line_len": m["max_line_len"],
                         "alpha_ratio_ppm": ppm})

    out = ds.map_batches(stats, batch_format="pyarrow").sort("doc_id")  # certification-only sort (see note above)
    return _collect(out).select(
        ["doc_id", "n_chars", "n_lines", "max_line_len", "alpha_ratio_ppm"])


@query(
    "quality_filter_documents",
    """
    SELECT doc_id,
           (length(text) >= 10 AND length(text) <= 100000
            AND list_max(list_transform(string_split(text, chr(10)), x -> length(x))) <= 400
            AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 /
                greatest(length(text), 1) >= 0.25) AS keep
    FROM documents ORDER BY doc_id
    """,
)
def quality_filter_documents(sf_dir: str) -> pa.Table:
    """Heuristic-rules-only keep/drop verdict over documents (the
    SQL-expressible core of the quality filter)."""
    from .stages.heuristics import add_metrics

    ds = _t(sf_dir, "documents", ["doc_id", "text"])

    def verdict(batch: pa.Table) -> pa.Table:
        m = add_metrics(batch, content_col="text")
        n = m["n_chars"].to_numpy()
        ml = m["max_line_len"].to_numpy()
        ar = m["alpha_ratio"].to_numpy()
        keep = (n >= 10) & (n <= 100000) & (ml <= 400) & (ar >= 0.25)
        return pa.table({"doc_id": m["doc_id"], "keep": pa.array(keep)})

    out = ds.map_batches(verdict, batch_format="pyarrow").sort("doc_id")  # certification-only sort (see note above)
    return _collect(out).select(["doc_id", "keep"])


@query(
    "exact_dedup_documents",
    """
    SELECT doc_id FROM (
      SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents WHERE text IS NOT NULL
    ) WHERE rn = 1 ORDER BY doc_id
    """,
)
def exact_dedup_documents(sf_dir: str) -> pa.Table:
    """Exact dedup keep-first (min doc_id per content) via the salted
    two-stage dedup shuffle (engine/stages/dedup.py)."""
    from .stages.dedup import mark_duplicates
    from .stages.heuristics import add_metrics

    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    hashed = ds.map_batches(
        lambda b: add_metrics(b, content_col="text").select(
            ["doc_id", "content_sha256_pre"]),
        batch_format="pyarrow",
    ).map_batches(
        # dedup tiebreak/spread columns: doc_id stands in for (repo,path,commit)
        lambda b: b.append_column("commit", pc.cast(b["doc_id"], pa.string())),
        batch_format="pyarrow",
    )
    marked = mark_duplicates(hashed, key="content_sha256_pre", tiebreak=("doc_id",))
    kept = marked.filter(expr="dup_flag == False").select_columns(["doc_id"]).sort("doc_id")  # certification-only sort (see note above)
    return _collect(kept).select(["doc_id"])


# ===========================================================================
# Statistical outliers — A11 (checks/check_range.sql:113-131)
# ===========================================================================

@query(
    "outlier_3sigma_events",
    """
    WITH s AS (SELECT avg(value) AS mu, stddev_pop(value) AS sigma,
                      count(value) AS n FROM events)
    SELECT n AS total_rows,
           (SELECT count(*) FROM events, s
            WHERE value < mu - 3 * sigma OR value > mu + 3 * sigma) AS violation_count,
           CASE WHEN (SELECT count(*) FROM events, s
                 WHERE value < mu - 3 * sigma OR value > mu + 3 * sigma) = 0
                THEN 'PASS' ELSE 'WARNING' END AS status
    FROM s
    """,
)
def outlier_3sigma_events(sf_dir: str) -> pa.Table:
    from .checks import outlier_check

    r = outlier_check(_t(sf_dir, "events", ["value"]), "value")
    return _row(total_rows=r.total_rows, violation_count=r.violation_count,
                status=r.status.value)


def _collect(ds) -> pa.Table:
    """Materialize a (result-sized) Dataset to one Arrow table WITHOUT
    the per-row ``take_all()``/``from_pylist`` round-trip through Python
    dicts — blocks come back zero-copy via ``to_arrow_refs`` in block
    order (sorted datasets stay sorted). Driver-side only; callers keep
    results result-sized, never corpus-sized."""
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables).combine_chunks()
