"""Stage-level tests: metrics, scorers, scrub — exact planted counts and
invariants (reference test philosophy: tests/test_checkers.py:259-455
asserts exact statuses + violation counts on planted fixtures)."""

import numpy as np
import pyarrow as pa

from engine import corpus
from engine.stages.heuristics import add_metrics, add_verdict
from engine.stages.langid import LangIdScorer
from engine.stages.perplexity import PerplexityScorer
from engine.stages.scrub import scrub_batch


def _run_chain(tbl, models):
    langid, lm = models
    b = add_metrics(tbl)
    b = LangIdScorer(langid)(b)
    b = PerplexityScorer(lm)(b)
    b = add_verdict(b)
    return scrub_batch(b)


def test_metrics_vectorized_values(corpus_2k):
    b = add_metrics(corpus_2k)
    content = corpus_2k["content"].to_pylist()
    n_chars = b["n_chars"].to_pylist()
    max_line = b["max_line_len"].to_pylist()
    n_lines = b["n_lines"].to_pylist()
    alpha = b["alpha_ratio"].to_pylist()
    for i in [0, 1, 17, 123, 999, 1999]:
        c = content[i] or ""
        assert n_chars[i] == len(c.encode())
        lines = c.split("\n")
        assert n_lines[i] == len(lines)
        assert max_line[i] == max((len(l.encode()) for l in lines), default=0)
        exp_alpha = sum(ch.isascii() and ch.isalpha() for ch in c) / max(len(c), 1)
        assert abs(alpha[i] - exp_alpha) < 1e-12


def test_sha256_matches_hashlib(corpus_2k):
    import hashlib

    b = add_metrics(corpus_2k)
    content = corpus_2k["content"].to_pylist()
    hashes = b["content_sha256_pre"].to_pylist()
    for i in [0, 5, 77, 1500]:
        if content[i] is None:
            assert hashes[i] is None
        else:
            assert hashes[i] == hashlib.sha256(content[i].encode()).hexdigest()


def test_keep_agreement_f1(corpus_2k, models):
    """Keep/drop F1 vs golden labels >= 0.99 (BASELINE.md target) —
    dedup excluded here (covered in test_dedup / test_pipeline)."""
    b = _run_chain(corpus_2k, models)
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    keep = b["keep"].to_numpy(zero_copy_only=False)
    exp = ~np.isin(cls, list(corpus.DROP_CLASSES))
    tp = (keep & exp).sum()
    prec = tp / max(keep.sum(), 1)
    rec = tp / max(exp.sum(), 1)
    f1 = 2 * prec * rec / (prec + rec)
    assert f1 >= 0.99, f1


def test_planted_drop_reasons_detected(corpus_2k, models):
    b = _run_chain(corpus_2k, models)
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    reasons = b["drop_reasons"].to_pylist()
    for klass, reason in corpus.DROP_REASON_FOR_CLASS.items():
        mask = cls == klass
        hit = np.array([reason in (r or []) for r in reasons])
        assert hit[mask].mean() == 1.0, (klass, reason, hit[mask].mean())


def test_scrub_counts_exact(corpus_2k, models):
    b = _run_chain(corpus_2k, models)
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    email = b["email_redactions"].to_numpy()
    key = b["key_redactions"].to_numpy()
    toxic = b["toxic_redactions"].to_numpy()
    assert (email[cls == "email"] == 1).all()
    assert (key[cls == "secret"] == 1).all()
    assert (toxic[cls == "toxic"] == 1).all()
    clean = ~np.isin(cls, ["email", "secret", "toxic"])
    assert email[clean].sum() == 0 and key[clean].sum() == 0 and toxic[clean].sum() == 0


def test_sha256_invariant_untouched_rows(corpus_2k, models):
    """input_hint invariant: rows with no redactions keep identical bytes."""
    b = _run_chain(corpus_2k, models)
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    pre = np.array(b["content_sha256_pre"].to_pylist(), dtype=object)
    post = np.array(b["content_sha256"].to_pylist(), dtype=object)
    touched = np.isin(cls, ["email", "secret", "toxic"])
    for p, q in zip(pre[~touched], post[~touched]):
        assert p == q
    for p, q in zip(pre[touched], post[touched]):
        assert p != q


def test_scrub_idempotent(corpus_2k):
    """Scrubbing an already-scrubbed batch changes nothing (SURVEY §7.4.3)."""
    once = scrub_batch(corpus_2k)
    twice = scrub_batch(once.select(["repo", "path", "commit", "lang", "content"]))
    assert once["content"].to_pylist() == twice["content"].to_pylist()
    assert pa.compute.sum(twice["email_redactions"]).as_py() == 0


def test_scorer_determinism_across_batches(corpus_2k, models):
    langid, lm = models
    full = PerplexityScorer(lm)(LangIdScorer(langid)(corpus_2k))
    a = corpus_2k.slice(0, 633)
    bt = corpus_2k.slice(633)
    parts = pa.concat_tables(
        [PerplexityScorer(lm)(LangIdScorer(langid)(a)),
         PerplexityScorer(lm)(LangIdScorer(langid)(bt))]
    )
    assert full["lang_pred"].to_pylist() == parts["lang_pred"].to_pylist()
    assert full["ppl"].to_pylist() == parts["ppl"].to_pylist()
    assert full["lang_conf"].to_pylist() == parts["lang_conf"].to_pylist()


def test_langid_accuracy_on_clean(corpus_2k, models):
    langid, _ = models
    b = LangIdScorer(langid)(corpus_2k)
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    pred = np.array(b["lang_pred"].to_pylist(), dtype=object)
    actual = np.array(b["actual_lang"].to_pylist(), dtype=object)
    clean = np.isin(cls, ["clean", "wrong_lang", "email", "secret", "toxic", "duplicate"])
    assert (pred[clean] == actual[clean]).mean() >= 0.995


def test_perplexity_separation(corpus_2k, models):
    _, lm = models
    b = PerplexityScorer(lm)(add_metrics(corpus_2k))
    cls = np.array(b["violation_class"].to_pylist(), dtype=object)
    ppl = b["ppl"].to_numpy()
    assert ppl[cls == "clean"].max() < corpus.MAX_PPL
    assert ppl[cls == "gibberish"].min() > corpus.MAX_PPL


def test_unicode_content_robustness(models):
    """Non-ASCII content flows through every stage without crashing and
    with byte-consistent metrics (documented byte-level semantics)."""
    import pyarrow as pa

    texts = [
        "def func():\n    return 'héllo wörld'\n",
        "中文注释 # comment\nprint('日本語')\n" * 3,
        "émoji 🎉 line\n" * 10,
        "plain ascii line\n" * 5,
    ]
    tbl = pa.table({
        "repo": ["r"] * 4, "path": [f"p{i}" for i in range(4)],
        "commit": [f"c{i}" for i in range(4)],
        "lang": ["python"] * 4,
        "content": pa.array(texts, pa.large_string()),
    })
    b = _run_chain(tbl, models)
    n_chars = b["n_chars"].to_pylist()
    for i, t in enumerate(texts):
        assert n_chars[i] == len(t.encode())  # byte-based by design
    assert all(isinstance(p, str) for p in b["lang_pred"].to_pylist())
    assert all(x >= 0 for x in b["ppl"].to_pylist())
    # scrub must not corrupt multibyte sequences
    for orig, scrubbed in zip(texts, b["content"].to_pylist()):
        assert scrubbed == orig  # nothing to redact -> byte-identical


def test_scrub_redacts_in_unicode_context():
    import pyarrow as pa

    from engine.stages.scrub import scrub_batch

    t = pa.table({"content": pa.array(
        ["日本語テキスト contact a@b.co おわり\n"], pa.large_string())})
    out = scrub_batch(t)
    assert out["content"][0].as_py() == "日本語テキスト contact <EMAIL> おわり\n"
    assert out["email_redactions"][0].as_py() == 1


def test_unknown_lang_rule(models):
    """A lang label outside the model's label set -> unknown_lang drop
    (the FK/allowed-values referential rule, SURVEY §7.1)."""
    import pyarrow as pa

    tbl = pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["c"],
        "lang": ["cobol"],
        "content": pa.array(["some perfectly fine text content here\n"],
                            pa.large_string()),
    })
    b = _run_chain(tbl, models)
    assert b["keep"][0].as_py() is False
    assert "unknown_lang" in b["drop_reasons"][0].as_py()


def test_approx_quantiles_within_bin_width(ray_session):
    import numpy as np
    import ray.data as rd

    from engine.stages.sketches import approx_quantiles

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["value"])
    vals = np.array([r["value"] for r in ds.take_all()], dtype=np.float64)
    lo, hi = vals.min(), vals.max()
    bin_w = (hi - lo) / 4096
    approx = approx_quantiles(ds, "value", [0.25, 0.5, 0.75, 0.95])
    exact = np.quantile(vals, [0.25, 0.5, 0.75, 0.95])
    for a, e in zip(approx, exact):
        assert abs(a - e) <= bin_w * 3, (a, e, bin_w)


def test_bloom_fk_prefilter_bounds(ray_session):
    """Bloom probe: no false negatives (definite_orphans <= true orphans)
    and a usable FP rate (definite catches most planted orphans)."""
    import ray.data as rd

    from engine.stages.sketches import bloom_build, bloom_probe_orphans

    parent = rd.from_items([{"k": i} for i in range(10_000)])
    # children: 5k valid refs + 500 planted orphans
    child = rd.from_items(
        [{"k": i % 10_000} for i in range(5_000)]
        + [{"k": 1_000_000 + i} for i in range(500)]
    ).repartition(4)
    bits = bloom_build(parent, "k", m_bits=1 << 20)
    total, definite = bloom_probe_orphans(child, "k", bits)
    assert total == 5_500
    assert definite <= 500          # no false negatives ever
    assert definite >= 450          # FP rate small at this fill factor


def test_asof_join_semantics(ray_session):
    """Planted as-of cases: before-any-right -> null, inclusive same-ts
    match, latest-preceding wins, keys never leak into each other."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = rd.from_items([
        {"k": 1, "ts": T("2024-01-05"), "lid": 100},  # after r-ts 01-03 -> 11
        {"k": 1, "ts": T("2024-01-01"), "lid": 101},  # before any right -> null
        {"k": 1, "ts": T("2024-01-03"), "lid": 102},  # same-ts inclusive -> 11
        {"k": 2, "ts": T("2024-01-10"), "lid": 103},  # other key -> 22
        {"k": 3, "ts": T("2024-01-10"), "lid": 104},  # key with no rights -> null
    ]).repartition(3)
    right = rd.from_items([
        {"k": 1, "ts": T("2024-01-02"), "val": 10},
        {"k": 1, "ts": T("2024-01-03"), "val": 11},
        {"k": 2, "ts": T("2024-01-01"), "val": 22},
    ]).repartition(2)
    out = asof_join(left, right, key_col="k", left_ts_col="ts",
                    right_ts_col="ts", left_id_col="lid",
                    right_value_col="val", num_buckets=4)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}
    assert got == {100: 11, 101: None, 102: 11, 103: 22, 104: None}


def test_asof_join_generic_types(ray_session):
    """Non-int64 ids/values (string ids, string + float values) flow
    through asof_join unchanged — types derive from the input schemas."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = rd.from_items([
        {"k": 1, "ts": T("2024-01-05"), "lid": "a"},
        {"k": 1, "ts": T("2024-01-01"), "lid": "b"},
        {"k": 2, "ts": T("2024-01-10"), "lid": "c"},
    ]).repartition(2)
    right = rd.from_items([
        {"k": 1, "ts": T("2024-01-02"), "val": "v-10"},
        {"k": 2, "ts": T("2024-01-01"), "val": "v-22"},
    ]).repartition(2)
    out = asof_join(left, right, key_col="k", left_ts_col="ts",
                    right_ts_col="ts", left_id_col="lid",
                    right_value_col="val", num_buckets=4)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}
    assert got == {"a": "v-10", "b": None, "c": "v-22"}

    rightf = rd.from_items([
        {"k": 1, "ts": T("2024-01-02"), "val": 1.5},
        {"k": 2, "ts": T("2024-01-01"), "val": 2.25},
    ]).repartition(2)
    outf = asof_join(left, rightf, key_col="k", left_ts_col="ts",
                     right_ts_col="ts", left_id_col="lid",
                     right_value_col="val", num_buckets=4)
    gotf = {r["left_id"]: r["matched_value"] for r in outf.take_all()}
    assert gotf == {"a": 1.5, "b": None, "c": 2.25}


# ---------------------------------------------------------------------------
# property-based: vectorized bucket kernels vs brute-force references
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_events_strategy = st.lists(
    st.tuples(st.integers(0, 4),          # key
              st.integers(0, 20_000),     # ts seconds
              st.integers(0, 10**6)),     # id
    min_size=1, max_size=60, unique_by=lambda t: t[2])


@settings(max_examples=25, deadline=None)
@given(_events_strategy)
def test_session_windows_match_reference(ray_session, rows):
    """session_window_agg (hash-bucketed vectorized splits) == per-key
    brute-force sessionization on arbitrary inputs."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.windows import session_window_agg

    GAP = 600
    base = dt.datetime(2024, 1, 1)
    items = [{"k": k, "ts": base + dt.timedelta(seconds=s), "id": i}
             for k, s, i in rows]
    ds = rd.from_items(items).repartition(3)
    out = session_window_agg(ds, "k", "ts", "id", gap_sec=GAP, num_buckets=4)
    got = sorted((r["k"], r["session_id"], r["n_events"],
                  r["session_start"], r["session_end"])
                 for r in out.take_all())

    want = []
    bykey: dict = {}
    for it in items:
        bykey.setdefault(it["k"], []).append(it)
    for k, evs in bykey.items():
        evs.sort(key=lambda e: (e["ts"], e["id"]))
        sid, start, prev, n = 0, evs[0]["ts"], evs[0]["ts"], 0
        for e in evs:
            if (e["ts"] - prev).total_seconds() > GAP:
                want.append((k, sid, n, start, prev))
                sid, start, n = sid + 1, e["ts"], 0
            n += 1
            prev = e["ts"]
        want.append((k, sid, n, start, prev))
    assert got == sorted(want)


_asof_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
             min_size=1, max_size=40),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)),
             min_size=0, max_size=40,
             unique_by=lambda t: (t[0], t[1])),
)


@settings(max_examples=25, deadline=None)
@given(_asof_strategy)
def test_asof_join_matches_reference(ray_session, data):
    """asof_join (bucketed forward-fill) == brute-force latest-at-or-
    before lookup on arbitrary inputs (right side unique per (key, ts))."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.asof import asof_join

    lrows, rrows = data
    base = dt.datetime(2024, 1, 1)
    T = lambda s: base + dt.timedelta(seconds=s)  # noqa: E731
    left = rd.from_items([
        {"k": k, "ts": T(s), "lid": i}
        for i, (k, s) in enumerate(lrows)]).repartition(2)
    right_items = [{"k": k, "ts": T(s), "val": 10_000 + k * 1000 + s}
                   for k, s in rrows]
    right = rd.from_items(right_items).repartition(2) if right_items else \
        rd.from_items([{"k": -1, "ts": T(0), "val": 0}]).filter(
            expr="k >= 0")
    out = asof_join(left, right, key_col="k", left_ts_col="ts",
                    right_ts_col="ts", left_id_col="lid",
                    right_value_col="val", num_buckets=3)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}

    for i, (k, s) in enumerate(lrows):
        cands = [r for r in right_items
                 if r["k"] == k and r["ts"] <= T(s)]
        want = max(cands, key=lambda r: r["ts"])["val"] if cands else None
        assert got.get(i) == want, (i, k, s, got.get(i), want)


def test_hopping_window_planted(ray_session):
    """Each event lands in exactly window/hop hopping windows; counts and
    sums match a brute-force expansion."""
    import datetime as dt

    import ray.data as rd

    from engine.stages.windows import hopping_window_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"ts": base + dt.timedelta(hours=h), "value": float(h)}
        for h in (0, 1, 3, 5, 6, 11)
    ]
    out = hopping_window_agg(
        rd.from_items(rows).repartition(3), "ts", "value",
        window_sec=21600, hop_sec=10800)
    got = {r["window_idx"]: (r["n_events"], r["total_value_cents"])
           for r in out.take_all()}
    # brute force: event at t in windows floor(t/hop)-i for i in (0, 1)
    expect = {}
    for r in rows:
        b = int(r["ts"].timestamp()) // 10800
        for i in (0, 1):
            n, s = expect.get(b - i, (0, 0))
            expect[b - i] = (n + 1, s + int(r["value"] * 100))
    assert got == expect
    import pytest

    with pytest.raises(ValueError, match="divide"):
        hopping_window_agg(rd.from_items(rows), "ts", "value",
                           window_sec=21600, hop_sec=10000)


def test_contamination_planted(ray_session):
    """Planted contamination: a verbatim benchmark excerpt is flagged;
    disjoint text is not; the ratio threshold separates heavy from
    incidental overlap; short docs are never contaminated."""
    import ray.data as rd

    from engine.stages.decontam import (
        benchmark_shingle_set, contamination_flags)

    bench = rd.from_items([
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 1, "text": "pack my box with five dozen liquor jugs"},
    ])
    corpus = rd.from_items([
        {"doc_id": 10, "text": "quick brown fox jumps over"},   # verbatim
        {"doc_id": 11, "text": "zzzz qqqq wwww eeee rrrr tttt"},  # disjoint
        {"doc_id": 12, "text": "the quick brown cat naps quietly at home"},
        {"doc_id": 13, "text": "short"},                         # < 8 chars
    ]).repartition(2)
    bset = benchmark_shingle_set(bench)
    flags = {r["doc_id"]: r for r in contamination_flags(
        corpus, bset).take_all()}
    assert flags[10]["contaminated"] and \
        flags[10]["overlap_positions"] == flags[10]["total_positions"]
    assert not flags[11]["contaminated"]
    assert flags[12]["contaminated"]  # shares "e quick " etc.
    assert not flags[13]["contaminated"] and \
        flags[13]["total_positions"] == 0

    strict = {r["doc_id"]: r["contaminated"] for r in contamination_flags(
        corpus, bset, min_overlap_permille=900).take_all()}
    assert strict[10] and not strict[12]  # ratio threshold separates them


def test_shingle_values_bijective():
    """Packed 8-byte shingles are the exact windows (no hash collisions)."""
    import numpy as np

    from engine.stages.decontam import _shingle_values
    from engine.stages.textfeat import byte_view
    import pyarrow as pa

    texts = pa.array(["abcdefgh", "abcdefgi", "xabcdefgh"])
    data, offsets = byte_view(texts)
    vals, starts, counts = _shingle_values(data, offsets)
    assert counts.tolist() == [1, 1, 2]
    # same window -> same value; different window -> different value
    assert vals[0] == vals[3]          # "abcdefgh" appears in docs 0 and 2
    assert vals[0] != vals[1]
    assert int(vals[0]) == int.from_bytes(b"abcdefgh", "big")


def test_bucketed_groupby_equals_ray_aggregate(ray_session):
    """bucketed_groupby (local combine + coarse shuffle + in-bucket merge)
    returns exactly the rows of groupby().aggregate() for count/sum(int)/
    min/max — int, string, and date keys."""
    import datetime as dt

    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from engine.stages.aggregates import bucketed_groupby

    rng = np.random.Generator(np.random.PCG64(5))
    rows = [{
        "k": int(rng.integers(0, 50)),
        "s": f"g{int(rng.integers(0, 7))}",
        "d": dt.date(2024, 1, 1 + int(rng.integers(0, 20))),
        "v": int(rng.integers(-100, 100)),
        "f": float(rng.normal()),
    } for _ in range(2000)]
    ds = rd.from_items(rows).repartition(5)

    got = bucketed_groupby(ds, ["k", "s"], [
        ("", "count", "n"), ("v", "sum", "v_sum"),
        ("f", "max", "f_max"), ("f", "min", "f_min")])
    ref = ds.groupby(["k", "s"]).aggregate(
        Count(alias_name="n"), Sum("v", alias_name="v_sum"),
        Max("f", alias_name="f_max"), Min("f", alias_name="f_min"))
    key = lambda r: (r["k"], r["s"])  # noqa: E731
    g = sorted(got.take_all(), key=key)
    r = sorted(ref.take_all(), key=key)
    assert g == r

    # date keys
    got_d = sorted(bucketed_groupby(ds, ["d"], [("", "count", "n")])
                   .take_all(), key=lambda x: x["d"])
    ref_d = sorted(ds.groupby("d").aggregate(Count(alias_name="n"))
                   .take_all(), key=lambda x: x["d"])
    assert got_d == ref_d

    # float sums are refused (order-dependent)
    import pytest

    with pytest.raises(Exception, match="float sum"):
        bucketed_groupby(ds, ["k"], [("f", "sum", "bad")]).take_all()


def test_key_bucket_null_and_large_int_stability():
    """key_bucket gives the same bucket for the same key regardless of
    whether the batch carries nulls (the null-batch float64 conversion
    hazard), and is exact above 2^53."""
    import numpy as np
    import pyarrow as pa

    from engine.dsutil import key_bucket

    big = (1 << 53) + 1
    clean = pa.table({"k": pa.array([big, 7], pa.int64())})
    dirty = pa.table({"k": pa.array([big, None, 7], pa.int64())})
    b_clean = key_bucket(clean, ["k"], 256)
    b_dirty = key_bucket(dirty, ["k"], 256)
    assert b_clean[0] == b_dirty[0] and b_clean[1] == b_dirty[2]
    # adjacent large ints must not collapse to one bucket via float round
    near = pa.table({"k": pa.array([big, big + 1, big - 1], pa.int64())})
    assert len(set(key_bucket(near, ["k"], 1 << 16).tolist())) > 1

    sdirty = pa.table({"s": pa.array(["x", None, "y"])})
    sclean = pa.table({"s": pa.array(["x", "y"])})
    bs_d = key_bucket(sdirty, ["s"], 256)
    bs_c = key_bucket(sclean, ["s"], 256)
    assert bs_c[0] == bs_d[0] and bs_c[1] == bs_d[2]


def test_wav_edge_payloads():
    """Zero-length data chunk decodes to empty samples and yields zero
    (not NaN) features; truncated fmt chunk raises ValueError."""
    import struct

    import numpy as np
    import pytest

    from engine.stages.multimodal import AudioDecoder, decode_wav, encode_wav

    empty = encode_wav(np.zeros(0, np.int16), 8000)
    samples, rate = decode_wav(empty)
    assert rate == 8000 and samples.size == 0

    import pyarrow as pa

    from engine.stages.multimodal import MEDIA_SCHEMA

    batch = pa.Table.from_pydict({
        "media_id": [0], "media_type": ["audio"], "payload": [empty],
        "width": [0], "height": [0], "sample_rate": [8000],
        "duration_ms": [0]}, schema=MEDIA_SCHEMA)
    out = AudioDecoder()(batch)
    feats = out["features"][0].as_py()
    assert not any(np.isnan(f) for f in feats)
    assert feats[0] == 0.0 and feats[12] == 0.0  # mean, rms

    ok = encode_wav(np.ones(4, np.int16), 8000)
    truncated = ok[: ok.index(b"fmt ") + 10]
    truncated = truncated[:4] + struct.pack(
        "<I", len(truncated) - 8) + truncated[8:]
    with pytest.raises(ValueError):
        decode_wav(truncated)


def test_repetition_stats_planted():
    """Token and distinct-token counts on planted docs, incl. repeated
    separators (empty tokens count, matching SQL string_split) and nulls."""
    import pyarrow as pa

    from engine.stages.textstats import add_repetition_stats

    batch = pa.table({"text": pa.array([
        "a b a b a b",      # 6 tokens, 2 distinct
        "x",                # 1 token, 1 distinct
        "a  b",             # "a","","b" -> 3 tokens, 3 distinct
        "",                 # [""] -> 1 token, 1 distinct
        None,               # fill_null("") -> 1 token ("")
    ])})
    out = add_repetition_stats(batch)
    assert out["n_words"].to_pylist() == [6, 1, 3, 1, 1]
    assert out["n_distinct_words"].to_pylist() == [2, 1, 3, 1, 1]


def test_cap_per_group_deterministic_across_parallelism(ray_session):
    """cap_per_group returns the exact global first-k per group under a
    total order, identical at different partitionings, including groups
    smaller than k."""
    import numpy as np
    import ray.data as rd

    from engine.stages.aggregates import cap_per_group

    rng = np.random.Generator(np.random.PCG64(9))
    rows = [{"g": f"g{int(rng.integers(0, 6))}", "id": i,
             "v": int(rng.integers(0, 1000))} for i in range(300)]
    rows.append({"g": "tiny", "id": 9999, "v": 1})  # group smaller than k

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = cap_per_group(ds, ["g"], [("g", "ascending"),
                                        ("v", "ascending"),
                                        ("id", "ascending")], 4)
        return sorted((r["g"], r["id"]) for r in out.take_all())

    a, b = run(2), run(7)
    assert a == b
    # brute force reference
    import collections

    by_g = collections.defaultdict(list)
    for r in rows:
        by_g[r["g"]].append(r)
    expect = sorted(
        (g, r["id"])
        for g, rs in by_g.items()
        for r in sorted(rs, key=lambda x: (x["v"], x["id"]))[:4])
    assert a == expect


def test_ngram_doc_frequency_planted(ray_session):
    """Cross-doc 5-gram document frequency: planted boilerplate phrase in
    3 of 5 docs (one doc repeats it twice — must still count ONCE), a
    short doc (<5 tokens -> no grams), brute-force cross-check, and
    partition invariance (per-batch partials must stay exact)."""
    import ray.data as rd

    from engine.stages.textstats import ngram_doc_frequency

    boiler = "subscribe to our newsletter today"
    docs = [
        f"alpha beta {boiler} gamma",
        f"{boiler} delta epsilon {boiler}",   # repeated within one doc
        f"zeta {boiler}",
        "eta theta iota kappa lam mu",
        "one two",                            # too short for any 5-gram
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]

    # brute-force reference
    import collections
    ref = collections.Counter()
    for r in rows:
        toks = r["text"].split(" ")
        grams = {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}
        for g in grams:
            ref[g] += 1

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = ngram_doc_frequency(ds, n=5)
        return {r["gram"]: r["doc_freq"] for r in out.take_all()}

    got = run(1)
    assert got == dict(ref)
    assert got["subscribe to our newsletter today"] == 3
    assert run(3) == got
    # min_doc_freq filter keeps only the shared phrase-grams
    filt = {r["gram"]: r["doc_freq"]
            for r in ngram_doc_frequency(
                rd.from_items(rows).repartition(2),
                n=5, min_doc_freq=2).take_all()}
    assert filt == {g: c for g, c in ref.items() if c >= 2}


def test_fd_violations_planted(ray_session):
    """FD check: determinants mapping to >1 distinct dependent are
    reported with exact distinct counts; consistent keys and cross-batch
    duplicate pairs must not leak in."""
    import ray.data as rd

    from engine.checks.extra import fd_violations

    rows = (
        [{"k": 1, "v": "a"}] * 4                      # consistent
        + [{"k": 2, "v": "a"}, {"k": 2, "v": "b"}]    # 2 deps
        + [{"k": 3, "v": "x"}, {"k": 3, "v": "y"},
           {"k": 3, "v": "z"}, {"k": 3, "v": "x"}]    # 3 deps
        + [{"k": 4, "v": "q"}]                        # consistent
        + [{"k": 5, "v": None}, {"k": 5, "v": "a"}]   # NULL dep ignored
        + [{"k": 6, "v": None}, {"k": 6, "v": "a"},
           {"k": 6, "v": "b"}]                        # 2 deps + NULL
    )

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = fd_violations(ds, "k", "v", num_buckets=8)
        return sorted((r["det"], r["n_dep"]) for r in out.take_all())

    # count(DISTINCT dep) excludes NULLs: k=5 stays consistent, k=6 is 2
    expect = [(2, 2), (3, 3), (6, 2)]
    assert run(1) == expect
    # cross-batch: the same (det, dep) pair lands in several batches —
    # per-bucket re-distinct must collapse them
    assert run(5) == expect


def test_asof_join_right_ties_max_value(ray_session):
    """right_ties="max_value" must equal pre-deduping the right side to
    max(value) per (key, ts) — planted ties at and before the probe ts."""
    import ray.data as rd

    from engine.stages.asof import asof_join

    import pyarrow as pa

    left = rd.from_items([
        {"k": 1, "ts": 100, "id": 10},
        {"k": 1, "ts": 50, "id": 11},
        {"k": 2, "ts": 100, "id": 20},
        {"k": 3, "ts": 10, "id": 30},   # no right row at/below -> null
        {"k": 4, "ts": 100, "id": 40},
        {"k": 5, "ts": 100, "id": 50},
    ]).map_batches(lambda b: pa.table({
        "k": b["k"], "ts": pa.array(b["ts"].to_numpy(False),
                                    pa.timestamp("us")).cast(pa.timestamp("us")),
        "id": b["id"]}), batch_format="pyarrow")
    right_rows = [
        {"k": 1, "ts": 100, "v": 7}, {"k": 1, "ts": 100, "v": 9},  # tie at ts
        {"k": 1, "ts": 40, "v": 3}, {"k": 1, "ts": 40, "v": 1},    # earlier tie
        {"k": 2, "ts": 90, "v": 5}, {"k": 2, "ts": 90, "v": 6},
        {"k": 3, "ts": 500, "v": 8},                               # after left
        # null among the tied values: max() ignores it (must not shadow 4)
        {"k": 4, "ts": 100, "v": 4}, {"k": 4, "ts": 100, "v": None},
        # ALL tied values null: max() of nulls is null
        {"k": 5, "ts": 100, "v": None}, {"k": 5, "ts": 100, "v": None},
    ]
    right = rd.from_items(right_rows).map_batches(lambda b: pa.table({
        "k": b["k"], "ts": pa.array(b["ts"].to_numpy(False),
                                    pa.timestamp("us")),
        "v": b["v"]}), batch_format="pyarrow")
    out = asof_join(left, right, key_col="k", left_ts_col="ts",
                    right_ts_col="ts", left_id_col="id",
                    right_value_col="v",
                    left_id_type=pa.int64(), right_value_type=pa.int64(),
                    right_ties="max_value", num_buckets=4)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}
    assert got == {10: 9, 11: 3, 20: 6, 30: None, 40: 4, 50: None}


def test_rolling_window_sum_planted(ray_session):
    """Trailing-4-row per-key running sum: window shorter at key starts,
    (ts, id) tie ordering, brute-force cross-check, partition invariance."""
    import ray.data as rd

    from engine.stages.windows import rolling_window_sum

    rng = __import__("numpy").random.default_rng(7)
    rows = [{"id": i, "k": int(rng.integers(0, 5)),
             "ts": int(rng.integers(0, 40)), "v": int(rng.integers(-9, 50))}
            for i in range(200)]

    # brute-force reference
    ref = {}
    byk = {}
    for r in rows:
        byk.setdefault(r["k"], []).append(r)
    for k, rs in byk.items():
        rs = sorted(rs, key=lambda r: (r["ts"], r["id"]))
        for i, r in enumerate(rs):
            ref[r["id"]] = sum(x["v"] for x in rs[max(0, i - 3):i + 1])

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = rolling_window_sum(ds, key_col="k", ts_col="ts", id_col="id",
                                 value_col="v", window=4, num_buckets=8)
        return {r["id"]: r["roll_sum"] for r in out.take_all()}

    got = run(1)
    assert got == ref
    assert run(7) == ref


def test_exact_quantiles_disc(ray_session):
    """Histogram-guided exact selection == sorted-array indexing at
    ceil(q*n)-1, with duplicates, nulls, negative values, partition
    invariance, and a forced-recursion heavy bin."""
    import numpy as np
    import ray.data as rd

    from engine.stages.selection import exact_quantiles_disc

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.normal(0, 100, 3000).round(3),
        np.full(500, 42.125),            # heavy duplicate mass
        [-1e6, 1e6],                     # extreme range
    ])
    rows = [{"v": float(x)} for x in vals] + [{"v": None}] * 25
    qs = [0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0]
    s = np.sort(vals)
    n = len(s)
    expect = [float(s[min(max(int(np.ceil(q * n)), 1), n) - 1]) for q in qs]

    ds = rd.from_items(rows).repartition(6)
    assert exact_quantiles_disc(ds, "v", qs) == expect
    # forced recursion: collect_cap far below the duplicate mass and a
    # bin count so coarse every bin is heavy
    assert exact_quantiles_disc(ds, "v", qs, num_bins=4,
                                collect_cap=100) == expect
    # all-equal column short-circuits
    same = rd.from_items([{"v": 3.5}] * 50).repartition(3)
    assert exact_quantiles_disc(same, "v", [0.1, 0.9]) == [3.5, 3.5]


def _kmeans_reference(vecs, k, iters):
    """Independent numpy Lloyd with the engine's exact determinism rules
    (k-smallest-id seeding, int64-scaled centroid sums)."""
    import numpy as np
    SCALE = float(2 ** 20)
    x = np.asarray(vecs, dtype=np.float64)
    cents = x[:k].copy()

    def assign(c):
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return a, d2[np.arange(len(a)), a]

    for _ in range(iters):
        a, _ = assign(cents)
        xi = np.floor(x * SCALE + 0.5).astype(np.int64)
        sums = np.zeros((k, x.shape[1]), dtype=np.int64)
        np.add.at(sums, a, xi)
        cnt = np.bincount(a, minlength=k)
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / (SCALE * cnt[nz, None])
    a, dist = assign(cents)
    cnt = np.bincount(a, minlength=k)
    inertia = np.zeros(k, dtype=np.int64)
    np.add.at(inertia, a, np.floor(dist * 1e6 + 0.5).astype(np.int64))
    return cents, cnt, inertia


def test_kmeans_fit_blobs(ray_session):
    """3 well-separated blobs: recovered sizes, bit-identical centroids
    vs an independent local Lloyd, and partition invariance."""
    import numpy as np
    import ray.data as rd

    from engine.stages.clustering import kmeans_fit

    rng = np.random.default_rng(3)
    blobs = [rng.normal(c, 0.05, (40 + 10 * i, 4))
             for i, c in enumerate([(0, 0, 0, 0), (5, 5, 5, 5),
                                    (-5, 5, -5, 5)])]
    # ids 0..2 (the seeds) get one point from EACH blob, so Lloyd can
    # recover the three blobs instead of splitting the seed blob
    vecs = np.concatenate([b[:1] for b in blobs] + [b[1:] for b in blobs])
    rows = [{"vec_id": i, "embedding": list(map(float, v))}
            for i, v in enumerate(vecs)]

    ref_c, ref_cnt, ref_inertia = _kmeans_reference(vecs, 3, 4)

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        return kmeans_fit(ds, "embedding", "vec_id", k=3, iters=4)

    r1 = run(1)
    assert np.array_equal(r1["centroids"], ref_c)          # bit-identical
    assert np.array_equal(r1["counts"], ref_cnt)
    assert np.array_equal(r1["inertia_scaled"], ref_inertia)
    assert sorted(r1["counts"]) == [40, 50, 60]            # blobs recovered
    r5 = run(5)
    assert np.array_equal(r5["centroids"], r1["centroids"])
    assert np.array_equal(r5["inertia_scaled"], r1["inertia_scaled"])


def test_semdedup_pairs_planted(ray_session):
    """Planted exact + near duplicates inside one blob are found; the
    cross-cluster pair (by design) is not compared."""
    import numpy as np
    import ray.data as rd

    from engine.stages.clustering import kmeans_fit, semdedup_pairs

    rng = np.random.default_rng(9)
    a = rng.normal((0, 0, 0, 0), 0.3, (30, 4))
    b = rng.normal((8, 8, 8, 8), 0.3, (30, 4))
    a[7] = a[3]                        # exact dup inside blob A
    a[11] = a[5] * 1.0001              # near dup (same direction)
    vecs = np.concatenate([a, b])
    rows = [{"vec_id": i, "embedding": list(map(float, v))}
            for i, v in enumerate(vecs)]
    ds = rd.from_items(rows).repartition(4)
    fit = kmeans_fit(ds, "embedding", "vec_id", k=2, iters=4)
    got = {(r["id_a"], r["id_b"])
           for r in semdedup_pairs(ds, "embedding", "vec_id",
                                   fit["centroids"],
                                   tau=0.9999).take_all()}
    assert (3, 7) in got and (5, 11) in got
    assert all(x < 30 and y < 30 or (x >= 30 and y >= 30) for x, y in got)


def test_tfidf_top_terms(ray_session):
    """Integer TF-IDF top term per doc: brute-force cross-check, tie
    determinism (lexicographic), partition invariance, and broadcast-vs-
    distributed-join path parity (max_broadcast=0 forces the join)."""
    import collections

    import ray.data as rd

    from engine.stages.textstats import tfidf_top_terms

    docs = [
        "apple banana apple cherry",      # apple tf=2
        "banana banana banana kiwi",
        "cherry kiwi  cherry",            # double space -> empty token
        "unique",                         # df=1 singleton
        "apple banana",                   # tie on score -> 'apple' wins? check brute
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]

    df = collections.Counter()
    for t in docs:
        for term in {x for x in t.split(" ") if x}:
            df[term] += 1
    expect = {}
    for i, t in enumerate(docs):
        tf = collections.Counter(x for x in t.split(" ") if x)
        scored = sorted(((tf[w] * 1_000_000) // df[w], w) for w in tf)
        best = max(scored, key=lambda s: (s[0], [-ord(c) for c in s[1]]))
        # max score, ties -> lexicographically smallest term
        top_score = max(s for s, _ in scored)
        top_term = min(w for s, w in scored if s == top_score)
        expect[i] = (top_term, top_score)

    def run(nparts, **kw):
        ds = rd.from_items(rows).repartition(nparts)
        out = tfidf_top_terms(ds, **kw)
        return {r["doc_id"]: (r["top_term"], r["score"])
                for r in out.take_all()}

    got = run(1)
    assert got == expect
    assert run(4) == expect
    assert run(3, max_broadcast=0) == expect   # distributed-join fallback


def test_chunk_documents_planted(ray_session):
    """Fixed-token chunking: exact boundary (64 tokens -> 2 chunks),
    remainder chunk, single-token doc, empty text (one ''-token chunk),
    null text (no chunks), brute-force texts, partition invariance."""
    import ray.data as rd

    from engine.stages.textstats import chunk_documents

    def words(n, tag):
        return " ".join(f"{tag}{i}" for i in range(n))

    rows = [
        {"doc_id": 0, "text": words(65, "a")},   # 32 + 32 + 1
        {"doc_id": 1, "text": words(64, "b")},   # exactly 2 chunks
        {"doc_id": 2, "text": "solo"},
        {"doc_id": 3, "text": ""},               # [''] -> one 1-token chunk
        {"doc_id": 4, "text": None},             # dropped
    ]

    expect = []
    for r in rows:
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        for ci in range(-(-len(toks) // 32)):
            seg = toks[ci * 32:(ci + 1) * 32]
            expect.append((r["doc_id"], ci, len(seg), " ".join(seg)))

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = chunk_documents(ds, chunk_tokens=32)
        return sorted((r["doc_id"], r["chunk_idx"], r["n_tokens"],
                       r["chunk_text"]) for r in out.take_all())

    assert run(1) == sorted(expect)
    assert run(4) == sorted(expect)


def test_lag_gap_stats_planted(ray_session):
    """Per-key LAG gap stats: brute-force cross-check, (ts, id) tie
    ordering, single-event keys emit nothing, partition invariance."""
    import ray.data as rd

    from engine.stages.windows import lag_gap_stats

    rng = __import__("numpy").random.default_rng(11)
    rows = [{"id": i, "k": int(rng.integers(0, 6)),
             "ts": int(rng.integers(0, 10_000_000))} for i in range(300)]
    rows.append({"id": 300, "k": 99, "ts": 5})  # single-event key

    byk = {}
    for r in rows:
        byk.setdefault(r["k"], []).append(r)
    ref = {}
    for k, rs in byk.items():
        rs = sorted(rs, key=lambda r: (r["ts"], r["id"]))
        gaps = [b["ts"] - a["ts"] for a, b in zip(rs, rs[1:])]
        if gaps:
            ref[k] = (len(gaps), max(gaps), sum(gaps))

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = lag_gap_stats(ds, key_col="k", ts_col="ts", id_col="id",
                            num_buckets=4)
        return {r["k"]: (r["n_gaps"], r["max_gap_us"], r["sum_gap_us"])
                for r in out.take_all()}

    assert run(1) == ref
    assert run(9) == ref
    assert 99 not in ref  # no gap row for the single-event key


def test_df_stopword_scrub_planted(ray_session, tmp_path):
    """Corpus-DF boilerplate scrub: tokens in >80% of docs are removed
    everywhere (duplicates included); an all-boilerplate doc becomes the
    empty string; word order inside each doc is preserved."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import engine.queries_ext  # noqa: F401  (registers the extended set)
    from engine.queries import QUERIES

    docs = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        # "the" in all 10 docs (df=10 > 8); "rare{i}" in one each;
        # "mid" in 5 docs (df=5 <= 8, kept)
        "text": pa.array(
            [f"the rare{i} the mid" if i < 5 else f"the rare{i} the"
             for i in range(10)]),
    })
    d = tmp_path / "sfX"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    out = QUERIES["df_stopword_scrub_documents"](str(d))
    got = dict(zip(out["doc_id"].to_pylist(), out["clean_text"].to_pylist()))
    for i in range(5):
        assert got[i] == f"rare{i} mid"
    for i in range(5, 10):
        assert got[i] == f"rare{i}"

    # all-boilerplate doc -> empty string
    docs2 = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["the the", "the a", "the b"]),
    })
    d2 = tmp_path / "sfY"
    d2.mkdir()
    pq.write_table(docs2, d2 / "documents.parquet")
    out2 = QUERIES["df_stopword_scrub_documents"](str(d2))
    got2 = dict(zip(out2["doc_id"].to_pylist(),
                    out2["clean_text"].to_pylist()))
    assert got2 == {0: "", 1: "a", 2: "b"}


def test_revenue_by_nation_paths(ray_session, tmp_path):
    """All three scale paths of the star rollup agree: full broadcast
    (orders fit), orders-join + customer broadcast, and double
    distributed join (nothing fits)."""
    import engine.queries_ext as qx

    sf = "/root/testdata/sf0.001"
    full = qx.revenue_by_nation(sf)                     # broadcast path
    # join tiers run ISOLATED (conftest: Ray 2.49 join-teardown guard)
    from conftest import run_query_isolated

    mid = run_query_isolated("revenue_by_nation", sf,
                             tmp_path / "mid.parquet",
                             kwargs={"max_broadcast": 500})
    none = run_query_isolated("revenue_by_nation", sf,
                              tmp_path / "none.parquet",
                              kwargs={"max_broadcast": 0})
    assert full.equals(mid)
    assert full.equals(none)


def test_shipping_priority_paths(ray_session, tmp_path):
    """Q3-shape top-10: all three scale tiers return identical rows —
    full broadcast, distributed order-map attach (guard below the 147
    filtered orders at sf0.001), and distributed customer semi-join
    (guard below the 34 BUILDING customers)."""
    import engine.queries_ext as qx

    sf = "/root/testdata/sf0.001"
    bc = qx.shipping_priority_orders(sf)
    # join tiers run ISOLATED (conftest: Ray 2.49 join-teardown guard)
    from conftest import run_query_isolated

    dist_attach = run_query_isolated("shipping_priority_orders", sf,
                                     tmp_path / "att.parquet",
                                     kwargs={"max_broadcast": 100})
    dist_cust = run_query_isolated("shipping_priority_orders", sf,
                                   tmp_path / "cust.parquet",
                                   kwargs={"max_broadcast": 20})
    assert bc.equals(dist_attach)
    assert bc.equals(dist_cust)
    assert bc.num_rows <= 10


def test_range_window_sum_planted(ray_session):
    """Trailing-range per-key sum: peer-inclusive frames (equal ts rows
    include each other), brute-force cross-check, partition invariance."""
    import ray.data as rd

    from engine.stages.windows import range_window_sum

    rng = __import__("numpy").random.default_rng(13)
    rows = [{"id": i, "k": int(rng.integers(0, 5)),
             "ts": int(rng.integers(0, 50)) * 1_000_000,
             "v": int(rng.integers(-9, 50))} for i in range(250)]
    W = 10 * 1_000_000  # 10-second range

    ref = {}
    byk = {}
    for r in rows:
        byk.setdefault(r["k"], []).append(r)
    for k, rs in byk.items():
        for r in rs:
            ref[r["id"]] = sum(
                x["v"] for x in rs
                if r["ts"] - W <= x["ts"] <= r["ts"])  # peer-inclusive

    def run(nparts):
        ds = rd.from_items(rows).repartition(nparts)
        out = range_window_sum(ds, key_col="k", ts_col="ts", id_col="id",
                               value_col="v", range_us=W, num_buckets=8)
        return {r["id"]: r["range_sum"] for r in out.take_all()}

    assert run(1) == ref
    assert run(6) == ref


def test_mode_and_signature_parallelism_invariance(ray_session, tmp_path):
    """Bucket-then-vectorize argmax and ordered group-concat return
    identical tables regardless of input partitioning (ties included)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    rng = __import__("numpy").random.default_rng(17)
    n = 400
    types = ["a", "b", "c"]
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000
                        + int(rng.integers(0, 4)) * 86_400_000_000
                        + int(rng.integers(0, 50)) * 1_000_000
                        for _ in range(n)], pa.timestamp("us")),
        "user_id": pa.array([int(rng.integers(0, 12)) for _ in range(n)],
                            pa.int64()),
        "event_type": pa.array([types[int(rng.integers(0, 3))]
                                for _ in range(n)]),
        "value": pa.array([float(rng.integers(0, 1000)) / 10
                           for _ in range(n)]),
        "props": pa.array(['{"k": 1}'] * n),
    })
    d = tmp_path / "sfZ"
    d.mkdir()
    # two parquet layouts of the same rows -> different block boundaries
    pq.write_table(events, d / "events.parquet", row_group_size=37)
    d2 = tmp_path / "sfZ2"
    d2.mkdir()
    pq.write_table(events, d2 / "events.parquet", row_group_size=400)

    for q in ["mode_event_type_per_user", "event_sequence_signature_events",
              "daily_active_users_events", "retention_next_day_events"]:
        a = QUERIES[q](str(d))
        b = QUERIES[q](str(d2))
        assert a.equals(b), q


def test_retention_empty_result_schema(ray_session, tmp_path):
    """All activity on one calendar day -> zero retained pairs; the
    query must still return the typed empty (event_date, n_retained)
    schema instead of tripping over schema-less empty blocks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    events = pa.table({
        "event_id": pa.array(range(20), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(20)], pa.timestamp("us")),
        "user_id": pa.array([i % 4 for i in range(20)], pa.int64()),
        "event_type": pa.array(["view"] * 20),
        "value": pa.array([1.0] * 20),
        "props": pa.array(['{"k": 1}'] * 20),
    })
    d = tmp_path / "sfE"
    d.mkdir()
    pq.write_table(events, d / "events.parquet")
    out = QUERIES["retention_next_day_events"](str(d))
    assert out.num_rows == 0
    assert out.schema.names == ["event_date", "n_retained"]


def test_heavy_hitters_guarantee(ray_session):
    """Misra-Gries pruning path: on planted skew the heavy key survives
    any batching, with true-err_bound <= est <= true."""
    import ray.data as rd

    from engine.stages.sketches import heavy_hitters

    rng = __import__("numpy").random.default_rng(23)
    # one key with ~30% mass over a 200-key uniform tail
    vals = ["HH" if rng.random() < 0.3 else f"k{int(rng.integers(0, 200))}"
            for _ in range(5000)]
    true_hh = vals.count("HH")
    for nparts in (1, 7, 32):
        ds = rd.from_items([{"v": v} for v in vals]).repartition(nparts)
        out = heavy_hitters(ds, "v", k=4)
        rows = {r["key"]: (r["est"], r["err_bound"])
                for r in out.to_pylist()}
        assert "HH" in rows, (nparts, rows)
        est, err = rows["HH"]
        assert est <= true_hh <= est + err, (nparts, est, err, true_hh)


def test_doc_embedding_join_paths(ray_session, tmp_path):
    """Broadcast and distributed-join paths of the cross-modal join
    agree."""
    import engine.queries_ext as qx

    sf = "/root/testdata/sf0.001"
    a = qx.doc_embedding_label_stats(sf)
    # join tier runs ISOLATED (conftest: Ray 2.49 join-teardown guard)
    from conftest import run_query_isolated

    b = run_query_isolated("doc_embedding_label_stats", sf,
                           tmp_path / "b.parquet",
                           kwargs={"max_broadcast": 0})
    assert a.equals(b)


def test_heavy_hitters_null_keys(ray_session):
    """NULL is a real group (SQL GROUP BY semantics): a heavy null key
    must survive the merge with a correct estimate, and carrier rows
    must not leak phantom null rows into null-free results."""
    import ray.data as rd

    from engine.stages.sketches import heavy_hitters

    vals = (["x"] * 5 + [None] * 40 + [f"t{i}" for i in range(30)])
    ds = rd.from_items([{"v": v} for v in vals]).repartition(3)
    out = heavy_hitters(ds, "v", k=4)
    rows = {r["key"]: (r["est"], r["err_bound"]) for r in out.to_pylist()}
    assert None in rows
    est, err = rows[None]
    assert est <= 40 <= est + err

    # null-free input -> no null row in the output
    ds2 = rd.from_items([{"v": f"k{i % 3}"} for i in range(60)])
    out2 = heavy_hitters(ds2, "v", k=8)
    assert None not in [r["key"] for r in out2.to_pylist()]


def test_customers_without_orders_planted(ray_session, tmp_path):
    """Row-emitting anti-join: planted orphan customers come back in
    key order, capped at 20, with their payload columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import engine.queries_ext  # noqa: F401
    from engine.queries import QUERIES

    cust = pa.table({
        "c_custkey": pa.array(range(100), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(100)]),
        "c_nationkey": pa.array([0] * 100, pa.int64()),
        "c_acctbal": pa.array([0.0] * 100),
        "c_mktsegment": pa.array([f"seg{i % 3}" for i in range(100)]),
    })
    # orders reference only even custkeys -> 50 orphans, first 20 emitted
    orders = pa.table({
        "o_orderkey": pa.array(range(50), pa.int64()),
        "o_custkey": pa.array([2 * i for i in range(50)], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 50),
        "o_totalprice": pa.array([1.0] * 50),
        "o_orderdate": pa.array([1_700_000_000_000_000] * 50,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 50),
    })
    d = tmp_path / "sfA"
    d.mkdir()
    pq.write_table(cust, d / "customer.parquet")
    pq.write_table(orders, d / "orders.parquet")
    out = QUERIES["customers_without_orders"](str(d))
    assert out["c_custkey"].to_pylist() == [2 * i + 1 for i in range(20)]
    assert out["c_mktsegment"].to_pylist() == [
        f"seg{(2 * i + 1) % 3}" for i in range(20)]


def test_distinct_user_queries_null_users(ray_session, tmp_path):
    """SQL COUNT(DISTINCT user_id) excludes NULLs and `=` never matches
    NULL: plant null users across days and hold every user-distinct
    query to its DuckDB oracle (the shipped testdata has no nulls, so
    only this test exercises the divergence)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    import engine.queries_ext  # noqa: F401
    from engine.queries import ORACLE_SQL, QUERIES
    from oracle_utils import compare, duckdb_con

    rng = np.random.default_rng(7)
    n = 600
    day = 86_400_000_000
    user = rng.integers(0, 40, n)
    uid = pa.array([None if i % 9 == 0 else int(user[i]) for i in range(n)],
                   pa.int64())  # ~11% null users, nulls on every day
    events = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + int(rng.integers(0, 5)) * day
                        + i * 1_000_000 for i in range(n)],
                       pa.timestamp("us")),
        "user_id": uid,
        "event_type": pa.array([["view", "click", "purchase", "signup"][i % 4]
                                for i in range(n)]),
        "value": pa.array(rng.uniform(0, 100, n)),
        "props": pa.array(['{"k": 1}'] * n),
    })
    d = tmp_path / "sfN"
    d.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet",
                    d / f"{t}.parquet")
    pq.write_table(events, d / "events.parquet", row_group_size=100)

    con = duckdb_con(str(d))
    for q in ["users_per_event_type", "daily_active_users_events",
              "retention_next_day_events", "daily_rollup_events",
              "cumulative_new_users_events"]:
        problems = compare(QUERIES[q](str(d)),
                           con.execute(ORACLE_SQL[q]).fetchdf())
        assert not problems, (q, problems)


def test_exact_quantiles_cont(ray_session):
    """Interpolated quantiles == numpy linear interpolation on the
    sorted array, at any partitioning (exact neighbours + one float
    expression)."""
    import ray.data as rd

    from engine.stages.selection import exact_quantiles_cont

    rng = np.random.default_rng(29)
    vals = np.round(rng.uniform(0, 500, size=3001), 2)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    expect = [float(np.quantile(vals, q, method="linear")) for q in qs]
    for nparts in (1, 8):
        ds = rd.from_items([{"v": float(x)} for x in vals]).repartition(
            nparts)
        got = exact_quantiles_cont(ds, "v", qs)
        for g, e in zip(got, expect):
            assert abs(g - e) < 1e-9, (g, e)


def test_fuzzy_join_dist1_brute_force(ray_session):
    """Deletion-neighborhood join == brute-force Levenshtein==1 on
    random short strings with planted insert/delete/substitute
    mutations, identical at any partitioning."""
    import ray.data as rd

    from engine.stages.fuzzy import fuzzy_join_dist1

    rng = np.random.default_rng(31)
    alpha = "abc"
    base = ["".join(rng.choice(list(alpha), size=rng.integers(2, 7)))
            for _ in range(60)]
    strs = list(base) + ["", "a", "b", "ab"]  # empty/1-char edge cases
    for s in base[:20]:  # planted distance-1 mutations
        i = int(rng.integers(0, len(s)))
        strs.append(s[:i] + s[i + 1:])                       # deletion
        strs.append(s[:i] + rng.choice(list(alpha)) + s[i:])  # insertion
        strs.append(s[:i] + rng.choice(list(alpha)) + s[i + 1:])  # subst
    rows = [{"id": i, "s": s} for i, s in enumerate(strs)]

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expect = {(i, j) for i in range(len(strs)) for j in range(i + 1, len(strs))
              if lev(strs[i], strs[j]) == 1}
    assert expect, "planted mutations must produce pairs"

    for nparts in (1, 6):
        ds = rd.from_items(rows).repartition(nparts)
        out = fuzzy_join_dist1(ds, "id", "s", num_buckets=16)
        got = {(r["id_a"], r["id_b"]) for r in out.take_all()}
        assert got == expect, (nparts, got ^ expect)


def test_ntile_assign_brute_force(ray_session):
    """NTILE via boundary selection == positional bucketing of the
    sorted (value, id) order — heavy duplicate ties across boundaries,
    nulls excluded, n not divisible by n_tiles, partition-invariant."""
    import ray.data as rd

    from engine.stages.selection import ntile_assign

    rng = np.random.default_rng(11)
    n = 437
    vals = np.round(rng.uniform(0, 10, n), 0)  # ~44 rows per distinct value
    rows = [{"id": int(i), "v": (None if i % 13 == 0 else float(vals[i]))}
            for i in range(n)]
    live = [(r["v"], r["id"]) for r in rows if r["v"] is not None]
    live.sort()
    m, tiles = len(live), 10
    q, r = divmod(m, tiles)
    expect = {}
    pos = 0
    for t in range(tiles):
        size = q + (1 if t < r else 0)
        for _, i in live[pos:pos + size]:
            expect[i] = t + 1
        pos += size

    for nparts in (1, 7, 32):
        ds = rd.from_items(rows).repartition(nparts)
        out = ntile_assign(ds, "v", "id", tiles)
        got = {rec["id"]: rec["tile"] for rec in out.take_all()}
        assert got == expect, nparts

    # int64 beyond 2^53: a float64 boundary would collapse 2^53 and
    # 2^53+1 into one "tie group" and mis-bucket — boundaries must keep
    # the column's own dtype
    big = 2 ** 53
    rows_b = [{"id": i, "v": big + (i % 2)} for i in range(40)]
    out = ntile_assign(rd.from_items(rows_b).repartition(5), "v", "id", 2)
    got = {r["id"]: r["tile"] for r in out.take_all()}
    assert got == {i: (1 if i % 2 == 0 else 2) for i in range(40)}


def test_pq_topk_recall_and_parity(ray_session):
    """Product-quantization ANN: (a) identical output at any
    parallelism, (b) searching pre-encoded codes == fit-and-search over
    raw vectors, (c) recall@10 vs exact cosine top-k is sane for
    8x16 codebooks, (d) rank 0 finds the query vector itself."""
    import ray.data as rd

    from engine.stages.pq import (pq_encode, pq_fit_sample, pq_topk,
                                  pq_topk_codes)
    from engine.stages.similarity import knn_brute_force

    rng = np.random.default_rng(5)
    n, d = 400, 32
    base = rng.normal(size=(12, d))
    vecs = (base[rng.integers(0, 12, n)] + 0.15 * rng.normal(size=(n, d)))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    q = vecs[:3]

    outs = []
    for nparts in (1, 6, 24):
        ds = rd.from_items(rows).repartition(nparts)
        outs.append(pq_topk(ds, q, k=10, m=8, ks=16))
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    ds = rd.from_items(rows).repartition(6)
    cb = pq_fit_sample(ds, m=8, ks=16)
    codes = pq_encode(ds, cb)
    via_codes = pq_topk_codes(codes, q, cb, k=10)
    assert via_codes.equals(pq_topk(ds, q, k=10, codebooks=cb))

    exact = knn_brute_force(ds, q, k=10)

    def recall(got):
        hit = tot = 0
        for qi in range(3):
            e = {r["key"] for r in exact.filter(
                pa.compute.equal(exact["query_idx"], qi)).to_pylist()}
            g = {r["key"] for r in got.filter(
                pa.compute.equal(got["query_idx"], qi)).to_pylist()}
            hit += len(e & g)
            tot += len(e)
        return hit / tot

    fine = pq_topk(ds, q, k=10, m=16, ks=64)
    for qi in range(3):
        # the query IS row qi of the dataset: PQ must rank it first
        assert fine.filter(pa.compute.and_(
            pa.compute.equal(fine["query_idx"], qi),
            pa.compute.equal(fine["rank"], 0)))["key"][0].as_py() == qi
    # coarse codebooks trade recall for 4x compression; finer ones
    # recover it (tight clusters = the hard case for PQ fine ranking)
    assert recall(fine) >= 0.75, recall(fine)
    assert recall(outs[0]) <= recall(fine)


def test_asof_join_forward(ray_session):
    """direction="forward": earliest right row at-or-after each left ts,
    brute-force cross-check with ties, nulls and missing keys."""
    import ray.data as rd

    from engine.stages.asof import asof_join

    rng = np.random.default_rng(3)
    right_rows = [{"k": int(rng.integers(0, 5)), "ts": int(rng.integers(0, 80)),
                   "v": int(rng.integers(0, 50))} for _ in range(60)]
    left_rows = [{"k": int(rng.integers(0, 6)), "ts": int(rng.integers(0, 99)),
                  "id": i} for i in range(80)]
    # NULL timestamps: SQL's inequality never holds — a null-ts left row
    # must come out unmatched, a null-ts right row must match nobody
    left_rows += [{"k": 1, "ts": None, "id": 80},
                  {"k": 2, "ts": None, "id": 81}]
    right_rows += [{"k": 1, "ts": None, "v": 999},
                   {"k": 5, "ts": None, "v": 999}]

    def to_us(rows, cols):
        def conv(b):
            d = {c: b[c] for c in b.column_names}
            d["ts"] = pa.array(
                [None if v is None else int(v)
                 for v in b["ts"].to_pylist()], pa.timestamp("us"))
            return pa.table(d)
        return rd.from_items(rows).map_batches(conv, batch_format="pyarrow")

    out = asof_join(to_us(left_rows, None), to_us(right_rows, None),
                    key_col="k", left_ts_col="ts", right_ts_col="ts",
                    left_id_col="id", right_value_col="v",
                    left_id_type=pa.int64(), right_value_type=pa.int64(),
                    right_ties="max_value", direction="forward",
                    num_buckets=4)
    got = {r["left_id"]: r["matched_value"] for r in out.take_all()}

    for lr in left_rows:
        cand = [r for r in right_rows if r["k"] == lr["k"]
                and lr["ts"] is not None and r["ts"] is not None
                and r["ts"] >= lr["ts"]]
        if not cand:
            expect = None
        else:
            ts_min = min(r["ts"] for r in cand)
            expect = max(r["v"] for r in cand if r["ts"] == ts_min)
        assert got[lr["id"]] == expect, (lr, got[lr["id"]], expect)

    # backward on the same null-bearing data: null-ts rows unmatched too
    back = asof_join(to_us(left_rows, None), to_us(right_rows, None),
                     key_col="k", left_ts_col="ts", right_ts_col="ts",
                     left_id_col="id", right_value_col="v",
                     left_id_type=pa.int64(), right_value_type=pa.int64(),
                     right_ties="max_value", num_buckets=4)
    gotb = {r["left_id"]: r["matched_value"] for r in back.take_all()}
    for lr in left_rows:
        cand = [r for r in right_rows if r["k"] == lr["k"]
                and lr["ts"] is not None and r["ts"] is not None
                and r["ts"] <= lr["ts"]]
        if not cand:
            expect = None
        else:
            ts_max = max(r["ts"] for r in cand)
            expect = max(r["v"] for r in cand if r["ts"] == ts_max)
        assert gotb[lr["id"]] == expect, (lr, gotb[lr["id"]], expect)


def test_fuzzy_join_dist2_brute_force(ray_session):
    """Distance-<=2 deletion-neighborhood join == quadratic Levenshtein
    scan: planted 1- and 2-edit mutations, duplicates, empties,
    partition invariance."""
    import ray.data as rd

    from engine.stages.fuzzy import fuzzy_join_dist2

    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[lb]

    rng = np.random.default_rng(9)
    alpha = "abc"
    base = ["".join(rng.choice(list(alpha), size=rng.integers(2, 8)))
            for _ in range(50)]
    strs = list(base) + ["", "a", "ab", base[0]]  # dup + tiny strings
    for s in base[:25]:  # planted 1- and 2-edit mutations
        i = int(rng.integers(0, len(s)))
        one = s[:i] + s[i + 1:]
        strs.append(one)                                  # deletion
        strs.append(s[:i] + "x" + s[i:])                  # insertion
        if len(one) > 1:
            k = int(rng.integers(0, len(one)))
            strs.append(one[:k] + "y" + one[k + 1:])      # del+sub = 2

    expect = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if 1 <= lev(strs[i], strs[j]) <= 2:
                expect.add((i, j, lev(strs[i], strs[j])))

    rows = [{"id": i, "name": s} for i, s in enumerate(strs)]
    for nparts in (1, 8):
        ds = rd.from_items(rows).repartition(nparts)
        out = fuzzy_join_dist2(ds, "id", "name", num_buckets=16)
        got = {(r["id_a"], r["id_b"], r["dist"]) for r in out.take_all()}
        assert got == expect, (nparts, len(got), len(expect))


def test_ntile_by_group_brute_force(ray_session):
    """Grouped NTILE == positional bucketing of each group's sorted
    (value, id) order — uneven sizes, ties, groups smaller than n_tiles,
    null order values excluded, partition invariance."""
    import ray.data as rd

    from engine.stages.windows import ntile_by_group

    rng = np.random.default_rng(17)
    # grp None: SQL PARTITION BY makes NULL its own partition
    rows = [{"grp": (None if i % 11 == 0 else f"g{int(rng.integers(0, 7))}"),
             "v": (None if i % 17 == 0 else float(rng.integers(0, 6))),
             "id": i} for i in range(300)]
    expect = {}
    for gname in {r["grp"] for r in rows}:
        live = sorted((r["v"], r["id"]) for r in rows
                      if r["grp"] == gname and r["v"] is not None)
        m, tiles = len(live), 4
        q, rr = divmod(m, tiles)
        pos = 0
        for t in range(tiles):
            size = q + (1 if t < rr else 0)
            for _, i in live[pos:pos + size]:
                expect[i] = t + 1
            pos += size

    for nparts in (1, 9):
        ds = rd.from_items(rows).repartition(nparts)
        out = ntile_by_group(ds, "grp", "v", "id", 4, num_buckets=8)
        got = {r["id"]: r["tile"] for r in out.take_all()}
        assert got == expect, nparts


def test_ivfpq_topk_composition(ray_session):
    """Composed IVF+PQ: (a) with nprobe == n_lists the candidate set is
    every row, so output is IDENTICAL to plain pq_topk with the same
    codebooks; (b) parallelism-invariant; (c) recall@10 vs exact cosine
    stays sane at nprobe=4."""
    import ray.data as rd

    from engine.stages.pq import ivfpq_topk, pq_fit_sample, pq_topk
    from engine.stages.similarity import (fit_centroids_sample,
                                          knn_brute_force)

    rng = np.random.default_rng(7)
    n, d = 400, 32
    base = rng.normal(size=(8, d))
    vecs = (base[rng.integers(0, 8, n)] + 0.1 * rng.normal(size=(n, d)))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    q = vecs[:3]

    ds = rd.from_items(rows).repartition(6)
    cb = pq_fit_sample(ds, m=16, ks=64)
    cent = fit_centroids_sample(ds, n_lists=8)

    full = ivfpq_topk(ds, q, k=10, nprobe=8, n_lists=8,
                      codebooks=cb, centroids=cent)
    assert full.equals(pq_topk(ds, q, k=10, codebooks=cb))

    outs = []
    for nparts in (1, 6, 24):
        dsp = rd.from_items(rows).repartition(nparts)
        outs.append(ivfpq_topk(dsp, q, k=10, nprobe=3, n_lists=8,
                               codebooks=cb, centroids=cent))
    assert outs[0].equals(outs[1]) and outs[0].equals(outs[2])

    exact = knn_brute_force(ds, q, k=10)
    pruned = outs[0]
    hit = tot = 0
    for qi in range(3):
        e = {r["key"] for r in exact.filter(
            pa.compute.equal(exact["query_idx"], qi)).to_pylist()}
        g = {r["key"] for r in pruned.filter(
            pa.compute.equal(pruned["query_idx"], qi)).to_pylist()}
        hit += len(e & g)
        tot += len(e)
    assert hit / tot >= 0.6, hit / tot
