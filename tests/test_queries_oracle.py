"""Driver-mirror: every SQL-expressible query must match its DuckDB oracle
on sf0.001 (the driver repeats this at sf0.01 -> CORRECTNESS_r{N}.json)."""

import pytest

from oracle_utils import compare, duckdb_con

SF_DIR = "/root/testdata/sf0.001"


def _pairs():
    import engine.queries_ext  # noqa: F401  (registers the extended set)
    from engine.queries import ORACLE_SQL, QUERIES

    return sorted(ORACLE_SQL), QUERIES, ORACLE_SQL


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


def test_every_query_has_callable():
    names, queries, oracle = _pairs()
    for name in names:
        assert name in queries


@pytest.mark.parametrize("name", _pairs()[0])
def test_query_matches_oracle(ray_session, con, name):
    _, queries, oracle = _pairs()
    problems = compare(queries[name](SF_DIR), con.execute(oracle[name]).fetchdf())
    assert not problems, problems
