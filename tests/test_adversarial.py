"""Adversarial-input suite (round-4 verdict item 10): degenerate corpora
that break naive dedup/span implementations — a single huge document, a
flood of one-byte documents, an all-identical corpus, an all-unique
corpus. The guards under test (coarse buckets, star edges,
pair_limit_per_bucket, salted exact-dedup buckets, the spans min!=max
distinct-doc test) all exist; these tests prove the paths complete
end-to-end within memory bounds and return the degenerate-case-correct
answers. Sizes are scaled to keep the suite fast while still being far
past any per-batch fast path (>=100k rows / multi-MB docs)."""

import numpy as np
import pyarrow as pa
import pytest

from engine.stages.dedup import mark_duplicates
from engine.stages.neardup import mark_near_duplicates, minhash_lsh_labels
from engine.stages.spans import duplicate_spans, strip_duplicate_spans


def _corpus(contents: list[str | None]) -> pa.Table:
    n = len(contents)
    return pa.table({
        "repo": pa.array([f"r{i % 7}" for i in range(n)]),
        "path": pa.array([f"p/{i}.txt" for i in range(n)]),
        "commit": pa.array([f"c{i:08d}" for i in range(n)]),
        "content": pa.array(contents, pa.large_string()),
    })


def _rows(x) -> list[dict]:
    """duplicate_spans returns a pa.Table on the broadcast path and a
    Dataset on the distributed path — accept both."""
    return x.to_pylist() if isinstance(x, pa.Table) else x.take_all()


def _flags(ds) -> list[bool]:
    return [r["near_dup_flag"] for r in
            ds.select_columns(["path", "near_dup_flag"]).take_all()]


def test_single_huge_document(ray_session):
    """One 8 MB doc among normal docs: signatures, LSH, spans and exact
    dedup all complete; the huge doc is unique so nothing flags it."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    huge = "".join(chr(97 + b) for b in rng.integers(0, 26, 8 << 20))
    docs = [huge] + [f"normal document number {i} " * 8 for i in range(50)]
    ds = rd.from_arrow(_corpus(docs)).repartition(4)
    flags = _flags(mark_near_duplicates(ds))
    assert sum(flags) == 0
    dup = mark_duplicates(
        ds.map_batches(lambda b: b.append_column(
            "key", b["content"]), batch_format="pyarrow"),
        key="key", tiebreak=("path",))
    assert sum(r["dup_flag"] for r in
               dup.select_columns(["path", "dup_flag"]).take_all()) == 0
    spans = duplicate_spans(ds, text_col="content", key_col="path")
    # the random huge doc shares no 32-gram with the short docs
    assert all(r["key"] != "p/0.txt" for r in _rows(spans))


def test_flood_of_one_byte_documents(ray_session):
    """200k one-byte docs: shorter than both the shingle and span gram
    sizes. Zero-shingle docs all carry the all-MAX signature and are
    mutual near-dups by the documented empty-set Jaccard = 1.0 — so
    they form ONE 200k-member cluster whose hot bucket must survive via
    the star-edge + pair-cap guards. Spans emit zero grams; exact dedup
    survives the single giant 'a' group via its salted buckets."""
    import ray.data as rd

    n = 200_000
    ds = rd.from_arrow(_corpus(["a"] * n)).repartition(16)
    labels = minhash_lsh_labels(ds, text_col="content", key_col="path")
    got = labels.take_all()
    assert len(got) == n  # one all-of-corpus cluster...
    assert len({r["label"] for r in got}) == 1  # ...with a single label
    assert len(_rows(duplicate_spans(ds, text_col="content",
                                     key_col="path"))) == 0
    dup = mark_duplicates(
        ds.map_batches(lambda b: b.append_column(
            "key", b["content"]), batch_format="pyarrow"),
        key="key", tiebreak=("path",))
    n_dup = sum(r["dup_flag"] for r in
                dup.select_columns(["path", "dup_flag"]).take_all())
    assert n_dup == n - 1  # exactly one representative survives


def test_all_identical_corpus(ray_session):
    """100k byte-identical 200-char docs: ONE near-dup cluster whose
    hot bucket must go through the star-edge + pair-cap path, one
    exact-dup group, and spans where EVERY gram is duplicated."""
    import ray.data as rd

    doc = "identical content block " * 8  # 192 chars
    n = 100_000
    ds = rd.from_arrow(_corpus([doc] * n)).repartition(16)
    flags = _flags(mark_near_duplicates(ds))
    assert sum(flags) == n - 1  # one representative kept
    stripped = strip_duplicate_spans(ds, text_col="content",
                                     key_col="path")
    rows = stripped.select_columns(["content", "n_removed"]).take(5)
    for r in rows:
        assert r["content"] == "" and r["n_removed"] == len(doc)


def test_all_unique_corpus(ray_session):
    """150k unique docs: zero flags everywhere, and the span path's
    distinct-doc (min != max) test keeps the dup-gram set empty."""
    import ray.data as rd

    # genuinely unrelated content: random bytes per doc (a templated
    # corpus legitimately near-dups itself at threshold 0.8)
    rng = np.random.default_rng(11)
    raw = rng.integers(97, 123, size=(150_000, 80), dtype=np.uint8)
    docs = [bytes(row).decode() for row in raw]
    ds = rd.from_arrow(_corpus(docs)).repartition(16)
    flags = _flags(mark_near_duplicates(ds))
    assert sum(flags) == 0
    assert len(_rows(duplicate_spans(ds, text_col="content",
                                     key_col="path"))) == 0


def test_null_and_empty_only_corpus(ray_session):
    """NULL text never participates in near-dup (flag False always);
    empty-but-non-NULL docs are mutual near-dups (empty-set Jaccard =
    1.0): of 400 "" docs and 600 NULL docs, exactly 399 flag."""
    import ray.data as rd

    ds = rd.from_arrow(_corpus([None, "", None, "", None] * 200))
    assert sum(_flags(mark_near_duplicates(ds))) == 399
    assert len(_rows(duplicate_spans(ds, text_col="content",
                                     key_col="path"))) == 0
    out = strip_duplicate_spans(ds, text_col="content", key_col="path")
    got = out.select_columns(["content", "n_removed"]).take(4)
    assert all(r["n_removed"] == 0 for r in got)
