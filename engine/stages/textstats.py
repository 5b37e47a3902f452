"""Text-analysis operators for training-data pipelines.

- token counting: whitespace tokens + a BPE-ish regex token count, both
  as single vectorized RE2 kernels per batch;
- quality scoring: length / punctuation / stopword-ratio composite;
- document fingerprinting: winnowing over rolling-hash shingles
  (Schleimer et al., the classic local fingerprinting algorithm) — the
  deterministic fingerprint set that makes partial-overlap detection
  cheap downstream;
- language-ID heuristic: stopword + character-class n-gram scoring for
  natural-language text (the from-scratch model in stages/langid.py is
  the trained path; this is the zero-training fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view
from .neardup import _shingles

#: BPE-ish token pattern: runs of letters, runs of digits, or single
#: non-space symbols — approximates subword pre-tokenization.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
WS_TOKEN_RE = r"[^\s]+"

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "que", "en", "por"},
}


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ws_token_count and bpe_token_count (vectorized RE2)."""
    col = batch[text_col]
    ws = pc.count_substring_regex(pc.fill_null(col, ""), WS_TOKEN_RE)
    bpe = pc.count_substring_regex(pc.fill_null(col, ""), BPE_TOKEN_RE)
    return batch.append_column(
        "ws_token_count", ws.cast(pa.int64())
    ).append_column("bpe_token_count", bpe.cast(pa.int64()))


def add_quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite 0..1 quality score: length band + punctuation ratio +
    stopword ratio (English stopword set), vectorized."""
    col = pc.fill_null(batch[text_col], "")
    n = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    punct = pc.count_substring_regex(col, r"[.,;:!?]").to_numpy(zero_copy_only=False)
    words = pc.count_substring_regex(col, WS_TOKEN_RE).to_numpy(zero_copy_only=False)
    stop_pat = r"(?i)\b(?:" + "|".join(sorted(_STOPWORDS["en"])) + r")\b"
    stops = pc.count_substring_regex(col, stop_pat).to_numpy(zero_copy_only=False)

    len_score = np.clip(n / 200.0, 0, 1) * np.clip((20000 - n) / 20000.0, 0, 1)
    wo = np.maximum(words, 1)
    punct_ratio = punct / wo
    punct_score = 1.0 - np.clip(np.abs(punct_ratio - 0.1) * 2, 0, 1)
    stop_score = np.clip(stops / wo / 0.3, 0, 1)
    score = 0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score
    return batch.append_column("quality_score", pa.array(score, pa.float64()))


def _winnow_pairs(texts: pa.Array | pa.ChunkedArray, k: int,
                  window: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized winnowing core: ONE sliding-window minimum over the
    packed hash array of the whole batch (cross-doc windows masked via
    the doc-index array — the same masking rule the n-gram kernels use),
    plus a ``minimum.reduceat`` segment-min for docs shorter than the
    window. Returns (list_offsets int64[n_docs+1], fingerprints uint64)
    — per-doc sorted unique fingerprints, no per-doc Python anywhere."""
    data, offsets = byte_view(texts)
    hashes, starts, counts = _shingles(data, offsets, k)
    n_docs = len(counts)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(n_docs + 1, dtype=np.int64), np.array([], np.uint64)
    counts_cum = np.concatenate([[0], np.cumsum(counts)])
    within = np.arange(total, dtype=np.int64) - np.repeat(
        counts_cum[:-1], counts)
    gather = np.repeat(starts, counts) + within  # starts need not be packed
    h = hashes[gather]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    part_doc, part_fp = [], []
    m = total - window + 1
    if m > 0:
        sw_min = np.lib.stride_tricks.sliding_window_view(
            h, window).min(axis=1)
        valid = doc_of[:m] == doc_of[window - 1:]
        part_doc.append(doc_of[:m][valid])
        part_fp.append(sw_min[valid])
    nonzero = np.flatnonzero(counts > 0)
    short = counts[nonzero] < window  # docs with no full window: global min
    if short.any():
        seg_min = np.minimum.reduceat(h, counts_cum[:-1][nonzero])
        part_doc.append(nonzero[short])
        part_fp.append(seg_min[short])
    d = np.concatenate(part_doc)
    f = np.concatenate(part_fp)
    order = np.lexsort((f, d))
    d, f = d[order], f[order]
    uniq = np.concatenate([[True], (d[1:] != d[:-1]) | (f[1:] != f[:-1])])
    d, f = d[uniq], f[uniq]
    per_doc = np.bincount(d, minlength=n_docs)
    return np.concatenate([[0], np.cumsum(per_doc)]), f.astype(np.uint64)


def winnowing_fingerprints(
    texts: pa.Array | pa.ChunkedArray, k: int = 8, window: int = 16
) -> list[list[int]]:
    """Winnowing fingerprint set per doc: in every ``window`` consecutive
    k-gram hashes keep the minimum — guarantees any shared substring of
    length >= window+k-1 yields a shared fingerprint (Schleimer et al.).
    Deterministic; returns sorted unique fingerprints per doc. (List-of-
    lists convenience wrapper; the stage path ``add_fingerprints`` stays
    Arrow-native via ``_winnow_pairs``.)"""
    offs, fps = _winnow_pairs(texts, k, window)
    return [fps[offs[i]:offs[i + 1]].tolist() for i in range(len(offs) - 1)]


def add_fingerprints(batch: pa.Table, text_col: str = "text",
                     k: int = 8, window: int = 16) -> pa.Table:
    offs, fps = _winnow_pairs(batch[text_col], k, window)
    col = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                   pa.array(fps, pa.uint64()))
    return batch.append_column("fingerprints", col)


def heuristic_langid(texts: pa.Array | pa.ChunkedArray) -> list[str]:
    """Zero-training language guess: CJK character presence -> zh;
    otherwise argmax stopword-hit count (en/de/fr/es), ties -> en."""
    vals = texts.to_pylist() if not isinstance(texts, list) else texts
    out = []
    for t in vals:
        t = (t or "").lower()
        if any("一" <= ch <= "鿿" for ch in t):
            out.append("zh")
            continue
        words = set(t.split())
        best, best_n = "en", -1
        for lang in ("en", "de", "es", "fr"):  # fixed order = deterministic ties
            n = len(words & _STOPWORDS[lang])
            if n > best_n:
                best, best_n = lang, n
        out.append(best)
    return out


def term_frequencies(ds, text_col: str = "text"):
    """Corpus-wide term frequencies (the classic skewed word count).

    Per-batch combiner first: ``pc.split_pattern_regex`` -> flatten ->
    ``pc.value_counts`` collapses each batch to its DISTINCT tokens
    before the shuffle (the push-aggregation-partial pattern — hot terms
    like stopwords appear once per batch instead of once per instance),
    then ONE groupby Sum over (term, partial count). Returns a Dataset
    (term, freq), token-cardinality-sized."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch[text_col], r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        empty = pa.table({"term": pa.array([], pa.string()),
                          "freq_part": pa.array([], pa.int64())})
        if not len(toks):
            return empty
        vc = pc.value_counts(toks)
        return pa.table({"term": vc.field("values"),
                         "freq_part": pc.cast(vc.field("counts"), pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("freq_part", alias_name="freq"))
    )


def add_repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signal: per-doc whitespace-token counts vs
    DISTINCT token counts (a doc dominated by repeated tokens is template
    boilerplate). Exact and fully Arrow-vectorized: tokens explode via
    split_pattern, distinct-per-doc via one pyarrow group_by over
    (doc_index, token) — no hashing, so counts match a SQL
    list_distinct(string_split(...)) oracle byte-for-byte."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    n_words = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), n_words)
    pairs = pa.table({"d": pa.array(doc_idx), "tok": flat})
    per_pair = pairs.group_by(["d", "tok"]).aggregate([([], "count_all")])
    per_doc = (per_pair.select(["d"]).group_by(["d"])
               .aggregate([([], "count_all")]))
    distinct = np.zeros(len(col), dtype=np.int64)
    d_ids = per_doc["d"].to_numpy(zero_copy_only=False)
    distinct[d_ids] = per_doc["count_all"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "n_words", pa.array(n_words.astype(np.int64))
    ).append_column("n_distinct_words", pa.array(distinct))

def ngram_doc_frequency(ds, n: int = 5, text_col: str = "text",
                        min_doc_freq: int = 1, drop_empty: bool = False):
    """Cross-document n-gram document frequency — boilerplate MINING
    (which exact phrases recur across many documents), the corpus-wide
    complement of ``add_repetition_stats``' within-doc signal. CCNet /
    C4 drop lines shared by many pages; these docs are single-line, so
    the unit is the token n-gram.

    Scale shape: per-batch combiner + ONE groupby.

    1. Per batch (each doc wholly inside one batch): tokenize with
       ``split_pattern``, build every n-gram STRING vectorized — n
       shifted slices of the flattened token array joined with
       ``binary_join_element_wise`` (no per-doc Python), cross-document
       window positions masked via the doc-index array; dedupe to
       distinct (gram, doc) with one pyarrow ``group_by``, then
       ``value_counts`` over grams. Because a doc never spans batches,
       these per-batch distinct-doc counts are EXACT partials.
    2. ONE coarse-bucket shuffle merges partials (dsutil.
       bucketed_key_merge — the repo-standard rewrite after Ray's
       sort-based Aggregate measured ~85k rows/s on key-cardinality
       inputs) over (gram, int) rows already collapsed to
       batch-distinct grams.

    Returns a Dataset (gram, doc_freq), gram-cardinality-sized. Matches
    the DuckDB oracle ``array_to_string(ts[i:i+n-1], ' ')`` +
    ``count(DISTINCT doc_id)`` byte-for-byte (same single-space split,
    empties kept).
    """
    empty = pa.table({"gram": pa.array([], pa.string()),
                      "df_part": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(col, ""), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat) - n + 1
        if m <= 0:
            return empty
        doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), lens)
        # a window starting at i stays in one doc iff tokens i and
        # i+n-1 belong to the same doc (doc_idx is non-decreasing)
        valid = doc_idx[:m] == doc_idx[n - 1:]
        if not valid.any():
            return empty
        grams = pc.binary_join_element_wise(
            *[flat.slice(k, m) for k in range(n)], " ")
        if drop_empty:  # "" tokens from repeated separators (n=1 path)
            valid &= pc.not_equal(grams, "").to_numpy(
                zero_copy_only=False).astype(bool)
            if not valid.any():
                return empty
        keep = pa.array(valid)
        pairs = pa.table({"gram": grams.filter(keep),
                          "d": pa.array(doc_idx[:m][valid])})
        distinct = pairs.group_by(["gram", "d"]).aggregate([])
        vc = pc.value_counts(distinct["gram"].combine_chunks())
        return pa.table({"gram": vc.field("values"),
                         "df_part": pc.cast(vc.field("counts"), pa.int64())})

    from ..dsutil import bucketed_key_merge

    merged = bucketed_key_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        "gram", ["df_part"])
    out = merged.map_batches(
        lambda t: t.rename_columns(["gram", "doc_freq"]),
        batch_format="pyarrow")
    if min_doc_freq > 1:
        out = out.filter(expr=f"doc_freq >= {min_doc_freq}")
    return out


def _tf_partial(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Per-document term frequencies — EXACT partials (a doc never spans
    batches): tokenize, drop empties, one pyarrow group_by."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(col, ""), " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(len(col), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "")
    pairs = pa.table({
        id_col: ids.take(pa.array(doc_idx, pa.int64())).filter(keep),
        "term": flat.filter(keep),
    })
    out = pairs.group_by([id_col, "term"]).aggregate([([], "count_all")])
    return out.rename_columns([id_col, "term", "tf"]).set_column(
        2, "tf", pc.cast(out.column(2), pa.int64()))


def _top1_per_doc(t: pa.Table, id_col: str) -> pa.Table:
    """First row per doc under (score desc, term asc) — vectorized."""
    idx = pc.sort_indices(t, sort_keys=[
        (id_col, "ascending"), ("score", "descending"),
        ("term", "ascending")])
    t = t.take(idx)
    docs = t[id_col]
    if isinstance(docs, pa.ChunkedArray):
        docs = docs.combine_chunks()
    d = docs.to_numpy(zero_copy_only=False)
    first = np.concatenate([[True], d[1:] != d[:-1]])
    return t.filter(pa.array(first))


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
                    max_broadcast: int = 2_000_000):
    """Most-distinctive term per document by TF-IDF (linear-idf variant:
    ``score = tf * 1_000_000 // doc_freq`` — integer arithmetic on both
    engine and oracle sides, so ranking ties are bit-reproducible; the
    keyword-extraction signal corpus curation uses for topic balancing).

    Scale shape — the broadcast-vs-shuffle fork the build spec calls for:

    - **document frequency** reuses ``ngram_doc_frequency(n=1)``
      (per-batch distinct combiner + ONE vocab-cardinality groupby),
      materialized once (vocab-sized, bounded by the token vocabulary);
    - **vocab <= max_broadcast** (the normal case — natural-language
      vocabularies plateau in the millions): the (term, df) table is
      ``ray.put`` ONCE and every batch does a LOCAL Acero hash join +
      vectorized top-1 — per-doc results never shuffle at all;
    - **vocab > max_broadcast**: distributed fallback — Dataset.join of
      the exact per-batch tf partials against the df table on ``term``
      (the join scatters a doc's terms across blocks), then doc ids are
      hash-bucketed and each bucket takes a vectorized top-1 — never
      one Python call per doc; parity-tested against the broadcast
      path.

    Returns a Dataset (id_col, top_term, score), one row per document
    with at least one non-empty token.
    """
    import ray

    from ..dsutil import compact, join_partitions

    df_ds = ngram_doc_frequency(ds, n=1, text_col=text_col,
                                drop_empty=True).materialize()
    n_vocab = df_ds.count()

    if n_vocab <= max_broadcast:
        vocab = pa.concat_tables(
            [t for t in ray.get(df_ds.to_arrow_refs()) if t.num_rows]
        ).combine_chunks().rename_columns(["term", "df"])
        ref = ray.put(vocab)

        def score_top(batch: pa.Table) -> pa.Table:
            # tf + join + top-1 fused in ONE UDF over raw document
            # batches: a doc's tf rows never cross a stage boundary,
            # so Ray's re-batching/block-slicing between map stages
            # can't split a doc and emit two half-doc "top" rows
            tfb = _tf_partial(batch, text_col, id_col)
            v = ray.get(ref)  # zero-copy from the local object store
            j = tfb.join(v, keys="term")
            score = pc.divide(pc.multiply(j["tf"], 1_000_000), j["df"])
            j = j.append_column("score", pc.cast(score, pa.int64()))
            top = _top1_per_doc(j, id_col)
            return pa.table({id_col: top[id_col], "top_term": top["term"],
                             "score": top["score"]})

        return ds.map_batches(score_top, batch_format="pyarrow")

    tf = ds.map_batches(
        lambda b: _tf_partial(b, text_col, id_col), batch_format="pyarrow")

    nparts = join_partitions()
    j = compact(tf, nparts).join(
        compact(df_ds.map_batches(
            lambda b: b.rename_columns(["term", "df"]),
            batch_format="pyarrow"), nparts),
        "inner", num_partitions=nparts, on=("term",))

    from .windows import _bucket_of

    def add_score_bucket(batch: pa.Table) -> pa.Table:
        score = pc.divide(pc.multiply(batch["tf"], 1_000_000), batch["df"])
        return batch.append_column(
            "score", pc.cast(score, pa.int64())
        ).append_column("_bucket",
                        pa.array(_bucket_of(batch[id_col], 256)))

    def bucket_top(group: pa.Table) -> pa.Table:
        top = _top1_per_doc(group.drop_columns(["_bucket"]), id_col)
        return pa.table({id_col: top[id_col], "top_term": top["term"],
                         "score": top["score"]})

    return (j.map_batches(add_score_bucket, batch_format="pyarrow")
             .groupby("_bucket")
             .map_groups(bucket_top, batch_format="pyarrow"))


def chunk_documents(ds, chunk_tokens: int = 32, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Split every document into fixed-size token chunks (the context-
    window shaping transform — the complement of sequence PACKING in
    queries_ext.pack_documents_token_budget: packing merges short docs,
    chunking splits long ones). Purely per-batch (a doc never spans
    batches), zero shuffle, and fully vectorized: chunk boundaries tile
    the flattened token array exactly, so the chunk texts come from ONE
    ``pa.ListArray.from_arrays(offsets, tokens)`` + ``pc.binary_join``
    — no per-doc Python.

    Emits (id_col, chunk_idx, n_tokens, chunk_text); every doc with
    non-null text yields >= 1 chunk (single-space split semantics,
    empties kept — matches the string_split oracle).
    """
    C = int(chunk_tokens)
    if C <= 0:
        raise ValueError("chunk_tokens must be positive")

    def chunks(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keep = pc.is_valid(col)
        col = col.filter(keep)
        ids = ids.filter(keep)
        toks = pc.split_pattern(col, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_chunks = -(-lens // C)                       # >= 1 (len >= 1)
        doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table({
                id_col: pa.array([], ids.type),
                "chunk_idx": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
            })
        # chunk_idx restarts per doc: global position minus the doc's
        # first chunk position
        first = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        chunk_idx = np.arange(total, dtype=np.int64) - first[doc_rep]
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
        starts = doc_start[doc_rep] + chunk_idx * C
        doc_end = doc_start[doc_rep] + lens[doc_rep]
        n_tok = np.minimum(doc_end - starts, C)
        # consecutive chunks tile each doc, docs tile the flat array ->
        # [starts..., len(flat)] is a valid monotone offsets vector
        offsets = np.append(starts, len(flat)).astype(np.int32)
        chunk_lists = pa.ListArray.from_arrays(pa.array(offsets), flat)
        texts = pc.binary_join(chunk_lists, " ")
        return pa.table({
            id_col: ids.take(pa.array(doc_rep, pa.int64())),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(n_tok.astype(np.int64), pa.int64()),
            "chunk_text": texts,
        })

    return ds.map_batches(chunks, batch_format="pyarrow")
