"""Cross-document repeated-span detection (stages/spans.py): planted
fixtures vs a brute-force Python reference, the DuckDB char-level
oracle, parallelism invariance, the distributed (non-broadcast)
fallback, and the strip (span-removal) transform."""

import numpy as np
import pyarrow as pa
import pytest

from engine.stages.spans import (duplicate_spans, duplicate_gram_set,
                                 strip_duplicate_spans)


def _ref(docs: dict[int, str | None], k: int) -> dict[int, tuple[int, int]]:
    """Brute-force reference: per doc (hit_positions, union_coverage)."""
    owner: dict[str, set[int]] = {}
    for d, t in docs.items():
        if t is None:
            continue
        for i in range(len(t) - k + 1):
            owner.setdefault(t[i:i + k], set()).add(d)
    dup = {g for g, s in owner.items() if len(s) >= 2}
    out = {}
    for d, t in docs.items():
        if t is None:
            continue
        pos = [i for i in range(len(t) - k + 1) if t[i:i + k] in dup]
        if not pos:
            continue
        cov = sum(min(k, pos[j + 1] - pos[j]) for j in range(len(pos) - 1))
        out[d] = (len(pos), cov + k)
    return out


def _as_dict(t: pa.Table) -> dict[int, tuple[int, int]]:
    return {r["doc_id"]: (r["dup_grams"], r["covered_chars"])
            for r in t.to_pylist()}


def _docs_table(docs: dict[int, str | None]) -> pa.Table:
    return pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                     "text": pa.array(list(docs.values()), pa.string())})


PLANT = {
    # 0 and 1 share a 43-char span (differing flanks bound it exactly)
    0: "A" * 5 + "the quick brown fox jumps over the lazy dog" + "B" * 5,
    1: "C" * 20 + "the quick brown fox jumps over the lazy dog" + "D" * 9,
    # 2 repeats the span INSIDE itself only -> same doc, not cross-doc
    2: ("same-doc repetition same-doc repetition! " * 2) + "unique tail x",
    3: None,
    4: "too short",
    5: "an entirely unique document with no shared windows anywhere....",
    # 6 == 5 exactly (full-doc duplicate: every window hits)
    6: "an entirely unique document with no shared windows anywhere....",
}


def test_duplicate_spans_planted(ray_session):
    import ray.data as rd

    k = 32
    got = _as_dict(duplicate_spans(
        rd.from_arrow(_docs_table(PLANT)).repartition(3),
        "text", "doc_id", k=k))
    assert got == _ref(PLANT, k)
    # the shared 43-char span yields 43-31=12 windows covering 43 chars
    assert got[0] == (12, 43)
    # full-doc duplicates: every window hits, coverage = whole doc
    n5 = len(PLANT[5])
    assert got[5] == (n5 - k + 1, n5)
    assert 2 not in got and 3 not in got and 4 not in got


def test_duplicate_spans_parallelism_invariant(ray_session):
    import ray.data as rd

    t = _docs_table(PLANT)
    a = _as_dict(duplicate_spans(rd.from_arrow(t).repartition(1),
                                 "text", "doc_id", k=16))
    b = _as_dict(duplicate_spans(rd.from_arrow(t).repartition(7),
                                 "text", "doc_id", k=16))
    assert a == b == _ref(PLANT, 16)


def test_duplicate_spans_distributed_fallback(ray_session):
    """Shrinking the broadcast guard to 1 forces the tagged in-bucket
    membership join; results must be identical to the broadcast path."""
    import ray.data as rd

    t = _docs_table(PLANT)
    ds = rd.from_arrow(t).repartition(3)
    bc = duplicate_spans(ds, "text", "doc_id", k=32)
    dist = duplicate_spans(rd.from_arrow(t).repartition(3),
                           "text", "doc_id", k=32, max_broadcast_grams=1)
    assert _as_dict(bc) == _as_dict(dist) == _ref(PLANT, 32)


def test_duplicate_spans_oracle_sf0001(ray_session):
    import duckdb

    from engine.queries_ext import duplicate_spans_documents
    from engine.queries import ORACLE_SQL

    sf = "/root/testdata/sf0.001"
    got = duplicate_spans_documents(sf)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    exp = con.execute(ORACLE_SQL["duplicate_spans_documents"]).fetch_arrow_table()
    assert got.num_rows == exp.num_rows > 0
    assert got.to_pylist() == exp.cast(got.schema).to_pylist()


def test_duplicate_gram_set_min_max_semantics(ray_session):
    """min != max <=> >= 2 distinct docs: a gram occurring 100x in ONE
    doc is not a duplicate; the same gram in two docs is."""
    import ray
    import ray.data as rd

    k = 8
    docs = {7: "zzzzzzzz" * 50, 8: "unique-8", 9: "unique-9"}
    ds = rd.from_arrow(_docs_table(docs)).repartition(2)
    dup = pa.concat_tables(ray.get(
        duplicate_gram_set(ds, "text", "doc_id", k).materialize()
        .to_arrow_refs()))
    assert dup.num_rows == 0
    docs[9] = "zzzzzzzz!"
    ds = rd.from_arrow(_docs_table(docs)).repartition(2)
    dup = pa.concat_tables(ray.get(
        duplicate_gram_set(ds, "text", "doc_id", k).materialize()
        .to_arrow_refs()))
    assert dup["gram"].to_pylist() == [b"zzzzzzzz"]


def test_strip_duplicate_spans(ray_session):
    import ray.data as rd

    k = 32
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(rd.from_arrow(_docs_table(PLANT))
                                 .repartition(3),
                                 "text", "doc_id", k=k).take_all()}
    ref = _ref(PLANT, k)
    spans = _as_dict(duplicate_spans(rd.from_arrow(_docs_table(PLANT)),
                                     "text", "doc_id", k=k))
    for d, t in PLANT.items():
        r = out[d]
        if t is None:
            assert r["text"] is None and r["n_removed"] == 0
            continue
        if d not in ref:
            assert r["text"] == t and r["n_removed"] == 0
            continue
        # bytes removed == union coverage reported by duplicate_spans
        assert r["n_removed"] == spans[d][1]
        assert len(r["text"]) == len(t) - r["n_removed"]
    # the planted shared span is gone from both docs, flanks survive
    assert out[0]["text"] == "A" * 5 + "B" * 5
    assert out[1]["text"] == "C" * 20 + "D" * 9
    # full-doc duplicates strip to empty
    assert out[5]["text"] == "" and out[6]["text"] == ""


def test_strip_no_duplicates_is_identity(ray_session):
    import ray.data as rd

    docs = {1: "first unique doc " + "x" * 40, 2: "second " + "y" * 50}
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(rd.from_arrow(_docs_table(docs)),
                                 "text", "doc_id", k=32).take_all()}
    assert out[1]["text"] == docs[1] and out[2]["text"] == docs[2]
    assert out[1]["n_removed"] == out[2]["n_removed"] == 0


def test_strip_broadcast_gram_guard(ray_session):
    """The strip path refuses (loudly) when the duplicated-gram set
    exceeds the driver-broadcast budget — template-heavy corpora must
    flag-and-drop, not byte-excise (round-5 scale guard)."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(PLANT))
    with pytest.raises(ValueError, match="max_broadcast_grams"):
        strip_duplicate_spans(ds, "text", "doc_id", k=32,
                              max_broadcast_grams=3)
    # at the default budget the same corpus strips fine
    out = {r["doc_id"]: r for r in
           strip_duplicate_spans(ds, "text", "doc_id", k=32).take_all()}
    assert out[0]["text"] == "A" * 5 + "B" * 5
