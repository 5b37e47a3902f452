"""Corpus generator: determinism + planted-violation classes
(mirrors the reference's planted-issue strategy, sql/init_data.sql)."""

import collections

import numpy as np
import pyarrow as pa

from engine import corpus


def test_deterministic_regeneration(corpus_2k):
    again = corpus.generate_table(2000)
    assert corpus_2k.equals(again)


def test_batch_boundary_independence():
    """Row i is a pure function of i — batching cannot change bytes."""
    full = corpus.generate_batch(np.arange(100, 200))
    parts = pa.concat_tables(
        [corpus.generate_batch(np.arange(100, 137)), corpus.generate_batch(np.arange(137, 200))]
    )
    assert full.equals(parts)


def test_planted_classes_present(corpus_2k):
    counts = collections.Counter(corpus_2k["violation_class"].to_pylist())
    # every class planted in nonzero quantity at 2k rows (FIXTURES.md F1)
    for cls in ["empty_null", "empty_ws", "duplicate", "long_line", "low_alpha",
                "wrong_lang", "email", "secret", "toxic", "gibberish",
                "missing_lang", "clean"]:
        assert counts[cls] > 0, cls
    assert counts["clean"] > 1500


def test_skew_giant_repo(corpus_2k):
    repos = collections.Counter(corpus_2k["repo"].to_pylist())
    # ~20% of rows in one repo (the dedup-skew fixture)
    assert 0.15 < repos["bigcorp/monorepo"] / 2000 < 0.25


def test_corpus_schema(corpus_2k):
    cols = corpus_2k.select(["repo", "path", "commit", "lang", "content"])
    assert cols["content"].type == pa.large_string()
    assert cols["repo"].type == pa.string()
    # commit is 40-hex
    c = cols["commit"][0].as_py()
    assert len(c) == 40 and all(ch in "0123456789abcdef" for ch in c)


def test_duplicate_rows_share_content(corpus_2k):
    t = corpus_2k.to_pandas()
    dups = t[t.violation_class == "duplicate"]
    # duplicate rows land in shared content groups (group size >= 2 mostly)
    sizes = dups.groupby("content").size()
    assert (sizes >= 2).mean() > 0.7
