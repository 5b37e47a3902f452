"""Distributed-fallback parity for the TPC-H-shape join/agg queries.

The DuckDB-oracle sweep (test_queries_oracle.py) certifies the default
broadcast paths; these force ``max_broadcast=0`` so every query runs its
distributed hash-join tier and must produce the identical result.
"""

import pytest

from oracle_utils import compare, duckdb_con

SF_DIR = "/root/testdata/sf0.001"

FALLBACK_QUERIES = [
    "promo_revenue_lineitem_part",
    "returned_items_top_customers",
    "large_volume_customers",
    "late_shipment_priority_orders",
    "small_quantity_revenue_part",
    "top_supplier_revenue",
    "linestatus_priority_counts",
    "order_count_distribution",
    "disjunctive_revenue_part",
    "idle_high_balance_customers",
    "local_supplier_volume",
    "volume_shipping_nations",
    "market_share_nation",
    "widget_revenue_nations",
    "waiting_suppliers",
    "part_supplier_counts",
    "excess_share_suppliers",
    "min_acctbal_supplier_per_part",
]


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.fixture(scope="module")
def fallback_results(tmp_path_factory):
    """All forced-join-tier results in ONE isolated subprocess session
    (conftest.run_queries_isolated — Ray 2.49 join-teardown RAY_CHECK
    guard)."""
    from conftest import run_queries_isolated

    out = tmp_path_factory.mktemp("fallback_iso")
    return run_queries_isolated(FALLBACK_QUERIES, SF_DIR, out,
                                kwargs={"max_broadcast": 0})


@pytest.mark.parametrize("name", FALLBACK_QUERIES)
def test_fallback_matches_oracle(fallback_results, con, name):
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL

    problems = compare(fallback_results[name],
                       con.execute(ORACLE_SQL[name]).fetchdf())
    assert not problems, problems


def test_large_volume_empty_threshold(ray_session):
    """No order crosses an impossible threshold -> typed empty table
    (the zero-column _collect hazard must not surface)."""
    import engine.queries_ext as qe

    out = qe.large_volume_customers(SF_DIR, threshold=10**12)
    assert out.num_rows == 0
    assert out.column_names == [
        "c_custkey", "o_orderkey", "o_orderdate", "total_qty"]


def _plant_nulls_and_orphans(tmp_path):
    """sf0.001 copy with NULL l_partkey / l_orderkey, orphan partkeys
    and orderkeys, a NULL o_orderkey order and a NULL o_orderpriority:
    SQL inner joins drop NULL keys and orphans; index_in's
    null-matches-null must not resurrect them."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sfnulljoin"
    d.mkdir()
    for t in ["region", "nation", "supplier", "part",
              "documents", "embeddings", "events"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")

    cust = pq.read_table(f"{SF_DIR}/customer.parquet")
    ck = cust["c_custkey"].to_pylist()
    cb = cust["c_acctbal"].to_pylist()
    cm = cust["c_mktsegment"].to_pylist()
    for i in range(8, len(ck), 37):
        ck[i] = None  # NULL PK: joins nothing, NOT EXISTS keeps it
    for i in range(9, len(cb), 41):
        cb[i] = None  # NULL balance fails every comparison
    for i in range(10, len(cm), 43):
        cm[i] = None  # NULL segment fails IN (...)
    cust = cust.set_column(cust.schema.get_field_index("c_custkey"),
                           "c_custkey", pa.array(ck, pa.int64()))
    cust = cust.set_column(cust.schema.get_field_index("c_acctbal"),
                           "c_acctbal", pa.array(cb, pa.float64()))
    cust = cust.set_column(cust.schema.get_field_index("c_mktsegment"),
                           "c_mktsegment", pa.array(cm, pa.string()))
    pq.write_table(cust, d / "customer.parquet", row_group_size=500)

    li = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    pk = li["l_partkey"].to_pylist()
    ok = li["l_orderkey"].to_pylist()
    sk = li["l_suppkey"].to_pylist()
    ls = li["l_linestatus"].to_pylist()
    for i in range(6, len(ls), 11):
        ls[i] = None  # NULL group key: GROUP BY must keep it
    for i in range(0, len(pk), 17):
        pk[i] = None
    for i in range(1, len(pk), 23):
        pk[i] = 10**9 + i  # orphan: no part row
    for i in range(2, len(ok), 19):
        ok[i] = None
    for i in range(3, len(ok), 29):
        ok[i] = 10**9 + i  # orphan: no orders row
    for i in range(4, len(sk), 13):
        sk[i] = None
    for i in range(5, len(sk), 31):
        sk[i] = 10**9 + i  # orphan: no supplier row
    li = li.set_column(li.schema.get_field_index("l_partkey"),
                       "l_partkey", pa.array(pk, pa.int64()))
    li = li.set_column(li.schema.get_field_index("l_orderkey"),
                       "l_orderkey", pa.array(ok, pa.int64()))
    li = li.set_column(li.schema.get_field_index("l_suppkey"),
                       "l_suppkey", pa.array(sk, pa.int64()))
    li = li.set_column(li.schema.get_field_index("l_linestatus"),
                       "l_linestatus", pa.array(ls, pa.string()))
    pq.write_table(li, d / "lineitem.parquet", row_group_size=500)

    orders = pq.read_table(f"{SF_DIR}/orders.parquet")
    okeys = orders["o_orderkey"].to_pylist()
    prios = orders["o_orderpriority"].to_pylist()
    ocust = orders["o_custkey"].to_pylist()
    okeys[7] = None
    for i in range(0, len(prios), 13):
        prios[i] = None
    for i in range(1, len(ocust), 21):
        ocust[i] = None  # NULL FK: joins no customer, probes nothing
    for i in range(2, len(ocust), 33):
        ocust[i] = 10**9 + i  # orphan: no customer row
    orders = orders.set_column(
        orders.schema.get_field_index("o_custkey"), "o_custkey",
        pa.array(ocust, pa.int64()))
    orders = orders.set_column(
        orders.schema.get_field_index("o_orderkey"), "o_orderkey",
        pa.array(okeys, pa.int64()))
    orders = orders.set_column(
        orders.schema.get_field_index("o_orderpriority"),
        "o_orderpriority", pa.array(prios, pa.string()))
    pq.write_table(orders, d / "orders.parquet", row_group_size=500)
    return str(d)


@pytest.fixture(scope="module")
def norphan_dir(tmp_path_factory):
    return _plant_nulls_and_orphans(tmp_path_factory.mktemp("norphan"))


@pytest.fixture(scope="module")
def norphan_join_results(tmp_path_factory, norphan_dir):
    """Forced-join-tier results over the planted dir, one isolated
    subprocess session (Ray 2.49 join-teardown RAY_CHECK guard)."""
    from conftest import run_queries_isolated

    out = tmp_path_factory.mktemp("norphan_iso")
    return run_queries_isolated(FALLBACK_QUERIES, norphan_dir, out,
                                kwargs={"max_broadcast": 0})


@pytest.mark.parametrize("name", FALLBACK_QUERIES)
@pytest.mark.parametrize("mb", [None, 0])
def test_null_and_orphan_join_keys(ray_session, norphan_dir,
                                   norphan_join_results, name, mb):
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES

    con = duckdb_con(norphan_dir)
    out = (QUERIES[name](norphan_dir) if mb is None
           else norphan_join_results[name])
    problems = compare(out, con.execute(ORACLE_SQL[name]).fetchdf())
    assert not problems, problems


def test_important_parts_value_planted_nulls(ray_session, tmp_path):
    """Single-tier Q11 shape: NULL l_partkey rows must be excluded on
    both engines; the share threshold must survive planted keys."""
    import engine.queries_ext as qe
    from engine.queries import ORACLE_SQL

    d = _plant_nulls_and_orphans(tmp_path)
    con = duckdb_con(d)
    problems = compare(qe.important_parts_value(d),
                       con.execute(
                           ORACLE_SQL["important_parts_value"]).fetchdf())
    assert not problems, problems


NULLNAME_QUERIES = ["waiting_suppliers", "excess_share_suppliers",
                    "part_supplier_counts", "min_acctbal_supplier_per_part"]


@pytest.fixture(scope="module")
def nullname_dir(tmp_path_factory):
    """sf0.001 copy with a third of supplier names NULLed."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("sfnullname")
    for t in ["region", "nation", "customer", "part", "orders",
              "lineitem", "documents", "embeddings", "events"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    sup = pq.read_table(f"{SF_DIR}/supplier.parquet")
    names = sup["s_name"].to_pylist()
    for i in range(0, len(names), 3):
        names[i] = None
    sup = sup.set_column(sup.schema.get_field_index("s_name"),
                         "s_name", pa.array(names, pa.string()))
    pq.write_table(sup, d / "supplier.parquet", row_group_size=100)
    return str(d)


@pytest.fixture(scope="module")
def nullname_join_results(tmp_path_factory, nullname_dir):
    from conftest import run_queries_isolated

    out = tmp_path_factory.mktemp("nullname_iso")
    return run_queries_isolated(NULLNAME_QUERIES, nullname_dir, out,
                                kwargs={"max_broadcast": 0})


@pytest.mark.parametrize("name", NULLNAME_QUERIES)
@pytest.mark.parametrize("mb", [None, 0])
def test_null_supplier_names(ray_session, nullname_dir,
                             nullname_join_results, name, mb):
    """Planted NULL s_name rows: the NULL-name group must survive the
    Ray groupby (null_key_companion), LIKE-based blacklists must drop
    NULL names on both engines, and DISTINCT must keep one NULL row.
    The forced-join tier runs in the module's isolated subprocess
    session (Ray 2.49 join-teardown RAY_CHECK guard)."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES

    con = duckdb_con(nullname_dir)
    out = (QUERIES[name](nullname_dir) if mb is None
           else nullname_join_results[name])
    problems = compare(out, con.execute(ORACLE_SQL[name]).fetchdf())
    assert not problems, problems
