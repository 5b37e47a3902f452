"""Planted multi-line fixture for the C4-style line filter.

The shipped documents table is single-line word-soup with no
punctuation, so every page legitimately fails the >= 3-kept-lines rule
there; only this fixture exercises the line-level semantics: terminal
punctuation (incl. quote endings), the 5-word minimum, the javascript
line drop, the lorem-ipsum / ``{`` page drops, empty and NULL text,
and non-ASCII lines (char-based word counts on both engines).
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "embeddings"]

GOOD = "A perfectly fine sentence with words."


def _docs_fixture() -> pa.Table:
    texts = [
        # 3 kept of 5: short line, no-punct line dropped
        f"{GOOD}\nAnother decent sentence sits right here!\n"
        f"Is this a question with enough words?\nshort.\n"
        "no terminal punctuation on this line at all",
        "",                                     # empty text -> 1 line, 0 kept
        None,                                   # NULL text -> no output row
        f"{GOOD}\n{GOOD}",                      # only 2 kept -> page dropped
        # javascript line dropped but 3 others keep the page
        f"{GOOD}\nPlease enable JavaScript to view this page.\n"
        f"{GOOD}\n{GOOD}",
        f"Lorem Ipsum dolor sit amet friend.\n{GOOD}\n{GOOD}\n{GOOD}",
        f"{GOOD}\nvar x = {{ a: 1 }};\n{GOOD}\n{GOOD}\n{GOOD}",
        # quote / apostrophe terminal endings count
        'He said "hello there my good friend"\n'
        "That was the neighbours' shared garden plot'\n"
        f"{GOOD}",
        # non-ASCII: words counted per whitespace token, not bytes
        "überraschend gute Sätze füllen diese Zeile aus.\n"
        "die zweite Zeile hat auch fünf Wörter!\n"
        "la tercera línea también tiene bastantes palabras.",
        # exactly 5 words is kept; 4 words is not
        "one two three four five.\none two three four.\n"
        "alpha beta gamma delta epsilon?\nuno dos tres cuatro cinco!",
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
    })


def _write_dir(tmp_path, docs: pa.Table):
    d = tmp_path / "sfc4"
    d.mkdir()
    for t in OTHER_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    # several row groups so the batch kernel sees offset-sliced chunks
    pq.write_table(docs, d / "documents.parquet", row_group_size=3)
    return str(d)


def test_c4_line_filter_planted(ray_session, tmp_path):
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = _write_dir(tmp_path, _docs_fixture())
    con = duckdb_con(d)
    res = QUERIES["c4_line_filter_documents"](d)
    problems = compare(
        res, con.execute(ORACLE_SQL["c4_line_filter_documents"]).fetchdf())
    assert not problems, problems
    # semantic spot checks on the engine result itself
    rows = {r["doc_id"]: r for r in res.to_pylist()}
    assert 2 not in rows                       # NULL text emits no row
    assert rows[0]["kept"] == 1 and rows[0]["n_kept_lines"] == 3
    assert rows[0]["clean_text"].count("\n") == 2
    assert rows[1] == {"doc_id": 1, "n_lines": 1, "n_kept_lines": 0,
                       "kept": 0, "clean_text": None}
    assert rows[3]["kept"] == 0                # 2 kept lines < 3
    assert rows[4]["kept"] == 1                # js line dropped, page kept
    assert "JavaScript" not in rows[4]["clean_text"]
    assert rows[5]["kept"] == 0                # lorem ipsum page drop
    assert rows[6]["kept"] == 0                # '{' page drop
    assert rows[7]["kept"] == 1                # quote/apostrophe endings
    assert rows[8]["kept"] == 1                # non-ASCII lines count words
    assert rows[9]["n_kept_lines"] == 3        # 4-word line dropped


def test_c4_line_filter_testdata(ray_session):
    """Degenerate real-testdata shape (single-line, no punctuation)
    still matches the oracle: every page has n_lines == 1, 0 kept."""
    import engine.queries_ext  # noqa: F401
    import pyarrow.compute as pc
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    con = duckdb_con(SF)
    res = QUERIES["c4_line_filter_documents"](SF)
    problems = compare(
        res, con.execute(ORACLE_SQL["c4_line_filter_documents"]).fetchdf())
    assert not problems, problems
    assert pc.max(res["n_lines"]).as_py() == 1
    assert pc.sum(res["kept"]).as_py() == 0


def _cc_docs_fixture() -> pa.Table:
    texts = [
        "call me at 4539578763621486 ok",       # 1 valid (classic test CC)
        "two cards 4539578763621486 and 4539578763621487 here",  # 1 of 2
        "no digits at all",
        None,                                   # NULL text -> no output row
        # 12- and 20-digit runs are not candidates on either engine
        "short 123456789012 and long 45395787636214860001 runs",
        "edge4111111111111111",                 # valid visa glued to a word
        "13digit 7624810430311 maybe",          # 13-digit candidate
        "19digit 4539578763621486009 x",        # 19-digit candidate
        "",                                     # empty text
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array([len(t) if t else 0 for t in texts], pa.int64()),
    })


def test_cc_luhn_planted(ray_session, tmp_path):
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    d = tmp_path / "sfcc"
    d.mkdir()
    for t in OTHER_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(_cc_docs_fixture(), d / "documents.parquet",
                   row_group_size=3)
    d = str(d)
    con = duckdb_con(d)
    res = QUERIES["cc_luhn_pii_documents"](d)
    problems = compare(
        res, con.execute(ORACLE_SQL["cc_luhn_pii_documents"]).fetchdf())
    assert not problems, problems
    rows = {r["doc_id"]: r for r in res.to_pylist()}
    assert 3 not in rows                        # NULL text emits no row
    assert rows[0] == {"doc_id": 0, "n_candidates": 1, "n_luhn_valid": 1,
                       "has_cc_pii": 1}
    assert (rows[1]["n_candidates"], rows[1]["n_luhn_valid"]) == (2, 1)
    assert rows[4]["n_candidates"] == 0         # 12/20-digit runs excluded
    assert rows[5]["has_cc_pii"] == 1           # word-glued run still found
    assert rows[8] == {"doc_id": 8, "n_candidates": 0, "n_luhn_valid": 0,
                       "has_cc_pii": 0}
    # pure-python Luhn cross-check of every candidate verdict
    import re

    def luhn(s):
        tot = 0
        for i, ch in enumerate(reversed(s), 1):
            v = int(ch)
            if i % 2 == 0:
                v *= 2
                if v > 9:
                    v -= 9
            tot += v
        return tot % 10 == 0

    for r in _cc_docs_fixture().to_pylist():
        if r["text"] is None:
            continue
        cands = [c for c in re.findall(r"\d+", r["text"])
                 if 13 <= len(c) <= 19]
        assert rows[r["doc_id"]]["n_candidates"] == len(cands)
        assert rows[r["doc_id"]]["n_luhn_valid"] == sum(
            luhn(c) for c in cands)


def test_cc_luhn_testdata(ray_session):
    """Digit-free real corpus still matches: all-zero counts."""
    import engine.queries_ext  # noqa: F401
    import pyarrow.compute as pc
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    con = duckdb_con(SF)
    res = QUERIES["cc_luhn_pii_documents"](SF)
    problems = compare(
        res, con.execute(ORACLE_SQL["cc_luhn_pii_documents"]).fetchdf())
    assert not problems, problems
    assert pc.sum(res["n_candidates"]).as_py() == 0


def test_term_cooccurrence_planted(ray_session, tmp_path):
    """Planted co-occurrence edges: docs with 0/1 vocab terms emit no
    pairs, repeated tokens count once per doc (DISTINCT semantics),
    NULL text drops, and pair order is lexicographic a < b."""
    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    texts = [
        "alpha beta alpha beta alpha",   # repeats: one (alpha,beta) doc
        "beta alpha",                    # order within doc irrelevant
        "alpha",                         # single term -> no pairs
        None,                            # NULL text drops
        "gamma delta epsilon",
        "delta gamma",
        "alpha gamma",
        "zeta",                          # df-1 tail term
    ]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["src0"] * len(texts)),
        "n_chars": pa.array([len(t) if t else 0 for t in texts],
                            pa.int64()),
    })
    d = tmp_path / "sfcooc"
    d.mkdir()
    for t in OTHER_TABLES:
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    pq.write_table(docs, d / "documents.parquet", row_group_size=2)
    d = str(d)
    con = duckdb_con(d)
    res = QUERIES["term_cooccurrence_documents"](d)
    problems = compare(
        res, con.execute(ORACLE_SQL["term_cooccurrence_documents"]).fetchdf())
    assert not problems, problems
    got = {(r["term_a"], r["term_b"]): r["n_docs"] for r in res.to_pylist()}
    assert got[("alpha", "beta")] == 2       # repeats counted once per doc
    assert got[("delta", "gamma")] == 2
    assert ("alpha", "alpha") not in got     # no self-pairs
    assert all(a < b for a, b in got)        # lexicographic pair order
    assert not any("zeta" in p for p in got)  # df-1 term pairs with nothing
