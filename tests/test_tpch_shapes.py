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
]


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", FALLBACK_QUERIES)
def test_fallback_matches_oracle(ray_session, con, name):
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES

    problems = compare(QUERIES[name](SF_DIR, max_broadcast=0),
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
