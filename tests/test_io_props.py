"""Sources/sinks + property-based tests (hypothesis) for the byte-level
text kernels and dedup tiebreak invariants."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.stages.textfeat import byte_view, doc_line_stats, segment_sums

texts_strategy = st.lists(
    st.one_of(st.none(), st.text(max_size=200)), min_size=1, max_size=30
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_doc_line_stats_matches_python(texts):
    arr = pa.array(texts, pa.large_string())
    data, offsets = byte_view(arr)
    n_lines, max_line = doc_line_stats(data, offsets)
    for i, t in enumerate(texts):
        s = (t or "").encode()
        lines = s.split(b"\n")
        assert n_lines[i] == len(lines)
        assert max_line[i] == max((len(l) for l in lines), default=0)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_byte_view_roundtrip(texts):
    arr = pa.array(texts, pa.large_string())
    data, offsets = byte_view(arr)
    for i, t in enumerate(texts):
        assert bytes(data[offsets[i]:offsets[i + 1]]) == (t or "").encode()


@settings(max_examples=40, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=28))
def test_byte_view_slice_consistency(texts, split):
    """Sliced arrays (zero-copy views) must yield the same per-doc bytes."""
    arr = pa.array(texts, pa.large_string())
    split = min(split, len(texts))
    tail = arr.slice(split)
    data, offsets = byte_view(tail)
    for j in range(len(tail)):
        t = texts[split + j]
        assert bytes(data[offsets[j]:offsets[j + 1]]) == (t or "").encode()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.binary(max_size=50), min_size=1, max_size=20))
def test_segment_sums_property(blobs):
    arr = pa.array([b.decode("latin-1") for b in blobs], pa.large_string())
    data, offsets = byte_view(arr)
    mask = (data == 0x61).astype(np.uint8)  # count of 'a' bytes
    sums = segment_sums(mask, offsets)
    for i, b in enumerate(blobs):
        assert sums[i] == b.decode("latin-1").encode().count(b"a")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.sampled_from(["aaa", "bbb", "ccc", "ddd"]), min_size=2,
                max_size=40))
def test_local_prededup_winner_is_min_tiebreak(contents):
    """Within any batch, exactly one candidate per key survives and it is
    the minimum (repo, path, commit) row — regardless of row order."""
    import hashlib

    from engine.stages.dedup import local_prededup

    n = len(contents)
    tbl = pa.table({
        "repo": [f"r{i % 3}" for i in range(n)],
        "path": [f"p{i}" for i in range(n)],
        "commit": [f"c{i}" for i in range(n)],
        "content_sha256_pre": [hashlib.sha256(c.encode()).hexdigest()
                               for c in contents],
    })
    out = local_prededup(tbl)
    df = out.to_pandas()
    for key, g in df.groupby("content_sha256_pre"):
        cands = g[~g._dup_local]
        assert len(cands) == 1
        expected = g.sort_values(["repo", "path", "commit"]).iloc[0]
        assert cands.iloc[0]["path"] == expected["path"]


def test_read_corpus_formats(ray_session, tmp_path):
    from engine import corpus
    from engine.io import from_arrow, read_corpus, write_corpus_parquet

    tbl = corpus.generate_table(200, with_golden=False)
    pq_dir = str(tmp_path / "pq")
    write_corpus_parquet(from_arrow(tbl), pq_dir)
    ds = read_corpus(pq_dir)
    assert ds.count() == 200
    assert ds.schema().names == ["repo", "path", "commit", "lang", "content"]

    # csv roundtrip (csv cannot hold embedded newlines reliably -> strip)
    import pyarrow.csv as pacsv

    flat = tbl.set_column(
        tbl.column_names.index("content"), "content",
        pa.compute.replace_substring(
            pa.compute.fill_null(tbl["content"], ""), "\n", " "),
    )
    csv_path = str(tmp_path / "c.csv")
    pacsv.write_csv(flat, csv_path)
    ds_csv = read_corpus(csv_path, fmt="csv")
    assert ds_csv.count() == 200
    assert dict(zip(ds_csv.schema().names, ds_csv.schema().types))["content"] == pa.large_string()


def test_read_corpus_missing_column_errors(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest

    bad = pa.table({"repo": ["a"], "path": ["b"]})
    p = str(tmp_path / "bad.parquet")
    pq.write_table(bad, p)
    from engine.io import read_corpus

    with pytest.raises(Exception):
        read_corpus(p).materialize()


def test_read_corpus_from_files(ray_session, tmp_path):
    """Raw source-tree ingestion: one corpus row per file, lang from
    extension, content-addressed commit."""
    src = tmp_path / "myrepo" / "src"
    src.mkdir(parents=True)
    (src / "a.py").write_text("def f():\n    return 1\n")
    (src / "b.js").write_text("const x = 1;\n")
    (src / "notes.txt").write_text("plain words here\n")
    (src / "mystery.xyz").write_text("???\n")

    from engine.io import read_corpus_from_files

    ds = read_corpus_from_files(str(tmp_path / "myrepo"))
    rows = {r["path"]: r for r in ds.take_all()}
    assert len(rows) == 4
    assert rows["src/a.py"]["lang"] == "python"
    assert rows["src/b.js"]["lang"] == "javascript"
    assert rows["src/mystery.xyz"]["lang"] is None
    assert rows["src/a.py"]["content"].startswith("def f()")
    import hashlib

    assert rows["src/a.py"]["commit"] == hashlib.sha1(
        (src / "a.py").read_bytes()).hexdigest()
    # flows straight into the flagship pipeline
    from engine.pipelines.quality import quality_pipeline

    out = quality_pipeline(ds, num_buckets=4).materialize()
    assert out.count() == 4


def test_register_custom_check_type(ray_session):
    """§2.10 extension surface: a new check type via register_check_type."""
    from engine.audit import CheckStatus, make_result
    from engine.validate import run_validation, register_check_type

    def rowcount_parity(cat, rule):
        n = cat.load(rule["table"]).count()
        status = CheckStatus.PASS if n % 2 == rule.get("parity", 0) else CheckStatus.FAIL
        return make_result(rule, "rowparity", status, total_rows=n)

    register_check_type("rowparity", rowcount_parity)
    rules = {"rowparity": [
        {"rule_id": "RP-1", "description": "even rows", "table": "orders",
         "parity": 0},
    ]}
    results, summary = run_validation("/root/testdata/sf0.001", rules,
                                      checks=["rowparity"])
    assert results[0].check_type == "rowparity"
    assert results[0].status in (CheckStatus.PASS, CheckStatus.FAIL)
    assert summary["total_checks"] == 1
