"""grouped_exact_quantiles_disc: scale-safe per-group quantiles.

Replaces the groupby(lang).map_groups(full per-group sort) plan — which
assumed one group fits one worker — with per-(group, bin) histogram
partials + driver boundary selection. These tests hold it to DuckDB
``quantile_disc`` on a planted 90%-one-group skew fixture, force the
heavy-cell recursion path with a tiny collect_cap, and cover NULL
groups/values.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa


def _oracle(t: pa.Table, qs) -> dict:
    con = duckdb.connect()
    con.register("t", t)
    sel = ", ".join(f"quantile_disc(v, {q}) AS q{i}"
                    for i, q in enumerate(qs))
    rows = con.execute(
        f"SELECT g, count(*) AS n, {sel} FROM t GROUP BY g").fetchall()
    return {r[0]: (r[1], list(r[2:])) for r in rows}


def test_grouped_quantiles_skewed_group(ray_session):
    """90% of rows in ONE group (the dominant-language shape at corpus
    scale): exact DuckDB quantile_disc parity for every group, computed
    without ever shipping the big group to one worker."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    rng = np.random.default_rng(5)
    n = 20_000
    g = np.where(rng.random(n) < 0.9, "en",
                 rng.choice(["de", "fr", "zh"], n))
    v = rng.integers(0, 100_000, n)
    t = pa.table({"g": pa.array(g.tolist()), "v": pa.array(v, pa.int64())})
    ds = rd.from_arrow(t).repartition(8)
    qs = [0.25, 0.5, 0.75, 0.99]
    got = grouped_exact_quantiles_disc(ds, "g", "v", qs, num_bins=64)
    assert got == _oracle(t, qs)


def test_grouped_quantiles_heavy_cell_recursion(ray_session):
    """A collect_cap smaller than every bin count forces the heavy-cell
    path (per-(group, bin) recursion through _exact_ranks) — results
    stay exact."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    rng = np.random.default_rng(9)
    n = 4_000
    t = pa.table({
        "g": pa.array((["a"] * (n // 2)) + (["b"] * (n // 2))),
        "v": pa.array(rng.integers(0, 1_000_000, n), pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    qs = [0.5]
    got = grouped_exact_quantiles_disc(ds, "g", "v", qs, num_bins=4,
                                       collect_cap=50)
    assert got == _oracle(t, qs)


def test_grouped_quantiles_null_group_and_values(ray_session):
    """NULL group keys form their own group; NULL values are excluded
    from the quantile but counted in n_rows; an all-null-value group
    yields None quantiles; a constant group short-circuits."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    t = pa.table({
        "g": pa.array(["a", "a", "a", None, None, "c", "c", "d"]),
        "v": pa.array([5, 1, None, 9, 3, 7, 7, None], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(3)
    got = grouped_exact_quantiles_disc(ds, "g", "v", [0.5])
    assert got["a"] == (3, [1])     # nulls excluded: sorted [1,5], ceil(.5*2)=1
    assert got[None] == (2, [3])    # null group: sorted [3,9]
    assert got["c"] == (2, [7])     # constant group short-circuit
    assert got["d"] == (1, [None])  # all-null values


def test_grouped_quantiles_parallelism_invariant(ray_session):
    """Identical output at different partitionings (integer partials are
    associative)."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    rng = np.random.default_rng(2)
    t = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], 3000).tolist()),
        "v": pa.array(rng.integers(0, 10_000, 3000), pa.int64()),
    })
    qs = [0.1, 0.5, 0.9]
    a = grouped_exact_quantiles_disc(rd.from_arrow(t).repartition(2),
                                     "g", "v", qs, num_bins=32)
    b = grouped_exact_quantiles_disc(rd.from_arrow(t).repartition(13),
                                     "g", "v", qs, num_bins=32)
    assert a == b == _oracle(t, qs)


def test_grouped_quantiles_inactive_group_not_folded_into_null(ray_session):
    """index_in yields null BOTH for null keys and for keys absent from
    the active set (constant groups never get a histogram slot) — a
    fill_null would fold the constant group's rows into the NULL group's
    histogram. Planted shape: NULL group [1, 100] + constant group 'c'
    [50, 50]; p90 of the NULL group must be 100, never 50."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    t = pa.table({
        "g": pa.array([None, None, "b", "b", "c", "c"]),
        "v": pa.array([1, 100, 1, 2, 50, 50], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(2)
    got = grouped_exact_quantiles_disc(ds, "g", "v", [0.9], num_bins=8)
    assert got == _oracle(t, [0.9])
    assert got[None] == (2, [100])


def test_grouped_quantiles_null_only_active_group(ray_session):
    """When the NULL group is the ONLY non-constant group, the value_set
    for index_in must be typed from the column (an all-None Python list
    infers Arrow null type and crashes every histogram batch)."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    t = pa.table({
        "g": pa.array([None, None, "c", "c"]),
        "v": pa.array([1, 100, 50, 50], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(2)
    got = grouped_exact_quantiles_disc(ds, "g", "v", [0.5, 0.9], num_bins=4)
    assert got == _oracle(t, [0.5, 0.9])


def _oracle_cont(t: pa.Table, qs) -> dict:
    """Hand-rolled PERCENTILE_CONT oracle with the engine's exact FP
    expression (DuckDB's native quantile_cont assembles the same value
    with a different operation order — off in the final ulp)."""
    con = duckdb.connect()
    con.register("t", t)
    out = {}
    for g, n in con.execute(
            "SELECT g, count(*) FROM t GROUP BY g").fetchall():
        pred = "g IS NULL" if g is None else "g = ?"
        args = [] if g is None else [g]
        vals = [r[0] for r in con.execute(
            f"SELECT v FROM t WHERE {pred} AND v IS NOT NULL ORDER BY v",
            args).fetchall()]
        if not vals:
            out[g] = (n, [None] * len(qs))
            continue
        nv = len(vals)
        res = []
        for q in qs:
            i = min(max((nv - 1) * q, 0.0), float(nv - 1))
            k = int(np.floor(i))
            lo, hi = float(vals[k]), float(vals[min(k + 1, nv - 1)])
            res.append(lo + (hi - lo) * (i - k))
        out[g] = (n, res)
    return out


def test_grouped_quantiles_cont_skewed(ray_session):
    """cont=True: interpolated per-group percentiles, bit-identical to
    the sorted-oracle interpolation, on the 90%-one-group skew shape
    with float values and planted NULLs in both columns."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    rng = np.random.default_rng(13)
    n = 20_000
    g = np.where(rng.random(n) < 0.9, "en",
                 rng.choice(["de", "fr", "zh"], n)).astype(object)
    v = rng.random(n) * 1000.0
    gl, vl = g.tolist(), v.tolist()
    for i in range(0, n, 17):
        gl[i] = None
    for i in range(3, n, 23):
        vl[i] = None
    t = pa.table({"g": pa.array(gl, pa.string()),
                  "v": pa.array(vl, pa.float64())})
    ds = rd.from_arrow(t).repartition(8)
    qs = [0.25, 0.5, 0.9]
    got = grouped_exact_quantiles_disc(ds, "g", "v", qs, num_bins=64,
                                       cont=True)
    assert got == _oracle_cont(t, qs)


def test_grouped_quantiles_cont_single_value_and_recursion(ray_session):
    """cont=True edge paths: a one-value group (lo == hi short-circuit),
    an all-null group, and a collect_cap forcing heavy-cell recursion."""
    import ray.data as rd

    from engine.stages.selection import grouped_exact_quantiles_disc

    rng = np.random.default_rng(21)
    n = 4_000
    t = pa.table({
        "g": pa.array((["a"] * (n - 2)) + ["one", "nul"]),
        "v": pa.array(rng.random(n - 2).tolist() + [7.5, None],
                      pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    qs = [0.25, 0.5, 0.9]
    got = grouped_exact_quantiles_disc(ds, "g", "v", qs, num_bins=16,
                                       collect_cap=10, cont=True)
    assert got == _oracle_cont(t, qs)


def test_grouped_mad_outliers_planted_nulls(ray_session, tmp_path):
    """grouped_mad_outliers_events on a fixture with NULL event_type
    rows (their own group), NULL values, an all-NULL-value group and a
    constant group (MAD = 0 -> every deviation > 0 is an outlier)."""
    import shutil

    import pyarrow.parquet as pq

    import engine.queries_ext as qe
    from engine.queries import ORACLE_SQL
    from oracle_utils import compare, duckdb_con

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sfmad"
    d.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", d / f"{t}.parquet")
    ev = pq.read_table(f"{src}/events.parquet")
    et = ev["event_type"].to_pylist()
    vals = ev["value"].to_pylist()
    for i in range(0, len(et), 7):
        et[i] = None  # NULL group key
    for i in range(3, len(vals), 11):
        vals[i] = None  # NULL values
    for i in range(5, len(et), 13):
        et[i] = "allnull"
        vals[i] = None  # a group with zero non-null values
    for i in range(6, len(et), 17):
        et[i] = "const"
        vals[i] = 42.0  # MAD = 0
    ev = ev.set_column(ev.schema.get_field_index("event_type"),
                       "event_type", pa.array(et, pa.string()))
    ev = ev.set_column(ev.schema.get_field_index("value"),
                       "value", pa.array(vals, pa.float64()))
    pq.write_table(ev, d / "events.parquet", row_group_size=500)

    con = duckdb_con(str(d))
    problems = compare(
        qe.grouped_mad_outliers_events(str(d)),
        con.execute(ORACLE_SQL["grouped_mad_outliers_events"]).fetchdf())
    assert not problems, problems
