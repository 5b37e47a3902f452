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
