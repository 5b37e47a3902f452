"""Dedup: deterministic keep-first vs a DuckDB window-function golden,
at two parallelism layouts (SURVEY.md §7.4.4 — "first" must be the min
(repo,path,commit) tiebreak, never arrival order)."""

import duckdb
import pyarrow as pa

from engine import corpus
from engine.stages.dedup import mark_duplicates
from engine.stages.heuristics import add_metrics


def _golden_dup(tbl: pa.Table) -> dict[int, bool]:
    con = duckdb.connect()
    con.register("c", tbl)
    rows = con.execute(
        """
        SELECT row_id,
               CASE WHEN content IS NULL THEN FALSE
                    WHEN ROW_NUMBER() OVER (PARTITION BY content
                         ORDER BY repo, path, commit) > 1 THEN TRUE
                    ELSE FALSE END AS dup
        FROM c
        """
    ).fetchall()
    return dict(rows)


def _run(tbl, ray_session, num_blocks):
    import ray.data as rd

    ds = rd.from_arrow(add_metrics(tbl)).repartition(num_blocks)
    out = mark_duplicates(ds, num_buckets=32)
    return {r["row_id"]: r["dup_flag"] for r in
            out.select_columns(["row_id", "dup_flag"]).take_all()}


def test_dedup_matches_golden(ray_session, corpus_2k):
    golden = _golden_dup(corpus_2k)
    got = _run(corpus_2k, ray_session, 8)
    assert got == golden


def test_dedup_parallelism_invariant(ray_session, corpus_2k):
    """Identical verdicts at 2 blocks and 16 blocks (scaling criterion
    precondition: results must not depend on partitioning)."""
    a = _run(corpus_2k, ray_session, 2)
    b = _run(corpus_2k, ray_session, 16)
    assert a == b


def test_dedup_null_content_never_duplicate(ray_session, corpus_2k):
    got = _run(corpus_2k, ray_session, 4)
    cls = {r: c for r, c in zip(corpus_2k["row_id"].to_pylist(),
                                corpus_2k["violation_class"].to_pylist())}
    for row_id, dup in got.items():
        if cls[row_id] == "empty_null":
            assert not dup


def test_dedup_keeps_exactly_one_per_group(ray_session, corpus_2k):
    got = _run(corpus_2k, ray_session, 8)
    t = corpus_2k.to_pandas()
    t["dup"] = t.row_id.map(got)
    groups = t[t.content.notna()].groupby("content")
    for _, g in groups:
        assert (~g.dup).sum() == 1  # exactly one keeper per content group


def test_dedup_pathological_skew(ray_session):
    """50% of all rows share ONE content hash (monster group). The
    in-batch pre-dedup caps shuffle-side group size at <= n_blocks and
    exactly one global winner survives — the giant-repo/skew claim of
    docs/SCALE.md made concrete."""
    import time

    import pyarrow as pa
    import ray.data as rd

    n = 40000
    texts = ["THE ONE HOT CONTENT\n" * 20 if i % 2 == 0
             else f"unique content {i}\n" * 5 for i in range(n)]
    tbl = pa.table({
        "repo": [f"r{i % 7}" for i in range(n)],
        "path": [f"p{i:06d}" for i in range(n)],
        "commit": [f"c{i:06d}" for i in range(n)],
        "lang": ["text"] * n,
        "content": pa.array(texts, pa.large_string()),
    })
    ds = rd.from_arrow(add_metrics(tbl)).repartition(16)
    t0 = time.time()
    out = mark_duplicates(ds, num_buckets=32)
    rows = out.select_columns(["path", "dup_flag"]).take_all()
    dt = time.time() - t0
    flags = {r["path"]: r["dup_flag"] for r in rows}
    hot_keepers = [p for p, f in flags.items()
                   if not f and int(p[1:]) % 2 == 0]
    assert hot_keepers == ["p000000"]  # min (repo,path,commit) = r0/p000000
    assert sum(not f for f in flags.values()) == 1 + n // 2  # 1 hot + uniques
    assert dt < 60, dt  # no blowup on the monster group
