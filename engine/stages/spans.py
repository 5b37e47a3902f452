"""Cross-document repeated-span detection (exact k-gram granularity).

The exact-substring deduplication family (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", which
removes duplicated spans found via suffix arrays): the distributed
formulation here detects every byte position covered by a ``k``-byte
window that also appears in ANOTHER document and reports per-doc
duplicated-span coverage (the union length of the hit windows).
Detection is EXACT — the shuffle key is the raw ``k``-byte gram
(``fixed_size_binary(k)``), never a hash, so there are no collisions at
any scale and the result matches a character-level SQL oracle exactly
on ASCII text (UTF-8 byte windows == char windows there; the same
ASCII-equivalence contract stages/decontam.py documents).

Physical plan (ONE corpus-sized shuffle):

1. ``map_batches``: materialize each doc's overlapping ``k``-byte grams
   as a zero-copy sliding-window view over the concatenated batch
   bytes, then pre-aggregate with an in-batch Arrow ``group_by`` to
   ``(gram, min_key, max_key)`` partials — only per-batch DISTINCT
   grams ride the shuffle;
2. one coarse-bucket groupby (``hash(gram) % num_buckets``): in-bucket
   Arrow ``group_by`` merges partials; a gram with global
   ``min_key != max_key`` occurs in >= 2 distinct docs (min != max is
   exactly ">= 2 distinct" — no COUNT DISTINCT machinery needed).
   The survivors are the dup-gram set;
3. flag-back: broadcast the dup-gram set (size-guarded ``ray.put``) and
   stream the corpus once more — ``pc.is_in`` marks hit positions,
   per-doc coverage is the interval-union length
   ``sum(min(k, next_hit - hit))`` vectorized over doc segments. Past
   the guard, a distributed fallback tags dup grams and corpus grams
   into the SAME bucket shuffle and resolves membership in-bucket
   (no driver materialization anywhere).

Scale notes: exact span detection is inherently O(corpus_bytes x ~50)
through the pass-1 shuffle on low-redundancy text (Lee et al. pay the
same via suffix arrays, sharded); repetitive corpora pre-aggregate
well. The cheap screening alternative at 100 TB is the winnowing
fingerprint path (stages/textfeat.py), which samples ~2/(w+1) of
positions content-defined; this module is the exact-verifier shape.
The broadcast side is the dup-gram set — bounded by the volume of
actually-duplicated text, not corpus size.

No counterpart in the reference repo (it has exact row-level dup checks
only, src/checker/duplicate_checker.py); this is a training-data op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS
from .textfeat import byte_view, segment_keep_index

DEFAULT_SPAN_K = 32


def _gram_view(texts, k: int):
    """(grams fixed_size_binary(k), doc_starts, doc_counts) of every
    in-doc overlapping k-byte window. NULL texts contribute zero grams
    (SQL: a NULL doc has no substrings)."""
    data, offsets = byte_view(texts)
    lengths = offsets[1:] - offsets[:-1]
    counts = np.maximum(lengths - k + 1, 0).astype(np.int64)
    keep_idx, starts, total = segment_keep_index(offsets, counts)
    if total == 0:
        return pa.array([], pa.binary(k)), starts, counts
    win = np.lib.stride_tricks.sliding_window_view(data, k)[keep_idx]
    grams = pa.Array.from_buffers(
        pa.binary(k), total,
        [None, pa.py_buffer(np.ascontiguousarray(win).tobytes())])
    return grams, starts, counts


def _key64(keys) -> pa.Array:
    """Document key column -> int64 identity for the distinct-doc
    (min != max) test. Integer keys cast exactly; string/binary keys
    are hashed with the vectorized 64-bit mix (sketches._hash64_strings)
    — a collision between two distinct docs only suppresses grams shared
    EXCLUSIVELY by that pair (~n^2/2^64 of pairs), acceptable for the
    span-dedup use."""
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if pa.types.is_integer(keys.type):
        return keys.cast(pa.int64())
    from .sketches import _hash64_strings

    return pa.array(_hash64_strings(keys).view(np.int64))


def _gram_bucket(grams: pa.Array, k: int, num_buckets: int) -> np.ndarray:
    """Deterministic coarse bucket per gram: FNV-style uint64 poly hash
    over the k bytes, vectorized column-at-a-time over the (n, k) view
    (batch-boundary independent — it reads only the gram bytes)."""
    n = len(grams)
    if n == 0:
        return np.zeros(0, np.int64)
    buf = np.frombuffer(grams.buffers()[1], dtype=np.uint8,
                        count=n * k, offset=grams.offset * k).reshape(n, k)
    h = np.full(n, 1469598103934665603, dtype=np.uint64)
    base = np.uint64(1099511628211)
    for j in range(k):  # in-place: no per-iteration temporaries
        np.bitwise_xor(h, buf[:, j], out=h, casting="unsafe")
        np.multiply(h, base, out=h)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _typed_empty() -> pa.Table:
    return pa.table({"key": pa.array([], pa.int64()),
                     "dup_grams": pa.array([], pa.int64()),
                     "covered_chars": pa.array([], pa.int64())})


def duplicate_gram_set(ds, text_col: str = "text", key_col: str = "doc_id",
                       k: int = DEFAULT_SPAN_K, num_buckets: int = 256):
    """Dataset -> Dataset of ``gram`` rows occurring in >= 2 distinct
    docs. One bucket shuffle over per-batch-distinct (gram, min, max)
    partials; lazily consumable (the caller decides collect vs join)."""

    def partial(batch: pa.Table) -> pa.Table:
        grams, _, counts = _gram_view(batch[text_col], k)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.binary(k)),
                             "kmin": pa.array([], pa.int64()),
                             "kmax": pa.array([], pa.int64()),
                             "_b": pa.array([], pa.int64())})
        key_of = _key64(batch[key_col]).take(
            pa.array(np.repeat(np.arange(len(counts)), counts)))
        t = pa.table({"gram": grams, "kmin": key_of, "kmax": key_of})
        g = t.group_by("gram").aggregate([("kmin", "min"), ("kmax", "max")])
        g = g.rename_columns(["gram", "kmin", "kmax"])
        return g.append_column(
            "_b", pa.array(_gram_bucket(g["gram"].combine_chunks(), k,
                                        num_buckets)))

    def merge(group: pa.Table) -> pa.Table:
        g = (group.select(["gram", "kmin", "kmax"])
                  .group_by("gram")
                  .aggregate([("kmin", "min"), ("kmax", "max")]))
        dup = g.filter(pc.not_equal(g["kmin_min"], g["kmax_max"]))
        return dup.select(["gram"])

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("_b")
              .map_groups(merge, batch_format="pyarrow"))


def _coverage_rows(grams, starts, counts, keys, hit: np.ndarray,
                   k: int) -> pa.Table:
    """Per-doc (key, dup_grams, covered_chars) from a hit mask over the
    batch's gram stream. Coverage = union length of the length-k hit
    intervals: hits are position-sorted within each doc by construction,
    so each hit contributes min(k, next_hit - hit) and the last hit of a
    doc contributes k."""
    idx = np.flatnonzero(hit)
    if len(idx) == 0:
        return _typed_empty()
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    doc_hit = doc_of[idx]
    contrib = np.full(len(idx), k, dtype=np.int64)
    if len(idx) > 1:
        same = doc_hit[1:] == doc_hit[:-1]
        d = idx[1:] - idx[:-1]  # in-doc position deltas (same doc)
        contrib[:-1][same] = np.minimum(k, d[same])
    seg = np.flatnonzero(np.r_[True, doc_hit[1:] != doc_hit[:-1]])
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    return pa.table({
        "key": keys.cast(pa.int64()).take(pa.array(doc_hit[seg])),
        "dup_grams": pa.array(np.diff(np.append(seg, len(idx))), pa.int64()),
        "covered_chars": pa.array(np.add.reduceat(contrib, seg), pa.int64()),
    })


def duplicate_spans(ds, text_col: str = "text", key_col: str = "doc_id",
                    k: int = DEFAULT_SPAN_K, num_buckets: int = 256,
                    max_broadcast_grams: int | None = None) -> pa.Table:
    """Per-doc duplicated-span report: (key, dup_grams, covered_chars)
    for every doc containing at least one k-byte window that also occurs
    in another doc. ``dup_grams`` counts hit window positions,
    ``covered_chars`` is the union length of the hit windows (the bytes
    Lee-et-al-style span removal would drop).

    Flag-back is broadcast when the dup-gram set fits
    ``max_broadcast_grams`` (byte-budgeted default), else the
    distributed in-bucket membership join. Result is doc-count-sized
    at most; sorted by key.
    """
    import ray

    if max_broadcast_grams is None:
        # same driver-budget style as neardup's broadcast verify: the
        # dup-gram table is k B/gram x2 (collect + put)
        max_broadcast_grams = min(DEFAULT_MAX_BROADCAST_KEYS,
                                  (2 << 30) // (2 * k))
    dup = duplicate_gram_set(ds, text_col, key_col, k, num_buckets)
    dup = dup.materialize()
    n_dup = dup.count()
    if n_dup == 0:
        out = _typed_empty()
    elif n_dup <= max_broadcast_grams:
        dup_t = pa.concat_tables(ray.get(dup.to_arrow_refs()))
        ref = ray.put(dup_t["gram"].combine_chunks())

        def cover(batch: pa.Table) -> pa.Table:
            dup_grams = ray.get(ref)
            grams, starts, counts = _gram_view(batch[text_col], k)
            if len(grams) == 0:
                return _typed_empty()
            hit = pc.is_in(grams, value_set=dup_grams).to_numpy(
                zero_copy_only=False)
            return _coverage_rows(grams, starts, counts, batch[key_col],
                                  hit, k)

        out = _collect_sorted(ds.map_batches(cover, batch_format="pyarrow"))
    else:
        out = _collect_sorted(
            _coverage_distributed(ds, dup, text_col, key_col, k,
                                  num_buckets))
    return out.rename_columns(["doc_id", "dup_grams", "covered_chars"])


def _collect_sorted(out_ds) -> pa.Table:
    import ray

    tables = [tb for tb in ray.get(out_ds.to_arrow_refs()) if tb.num_rows]
    if not tables:
        return _typed_empty()
    return pa.concat_tables(tables).sort_by("key")


def _coverage_distributed(ds, dup_ds, text_col: str, key_col: str,
                          k: int, num_buckets: int):
    """Fallback when the dup-gram set exceeds the broadcast budget: tag
    dup grams (marker rows) and corpus gram occurrences (key, pos rows)
    into the SAME gram-hash bucket shuffle, resolve membership in-bucket
    with ``pc.is_in``, then one doc-bucket shuffle turns hit positions
    into per-doc coverage. Nothing is ever driver-resident."""
    from .windows import _bucket_of

    def corpus_rows(batch: pa.Table) -> pa.Table:
        grams, starts, counts = _gram_view(batch[text_col], k)
        n = len(grams)
        if n == 0:
            return pa.table({"gram": pa.array([], pa.binary(k)),
                             "key": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "_m": pa.array([], pa.int8()),
                             "_b": pa.array([], pa.int64())})
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table({
            "gram": grams,
            "key": keys.cast(pa.int64()).take(pa.array(doc_of)),
            "pos": pa.array(pos, pa.int64()),
            "_m": pa.array(np.zeros(n, np.int8)),
            "_b": pa.array(_gram_bucket(grams, k, num_buckets)),
        })

    def dup_rows(batch: pa.Table) -> pa.Table:
        g = batch["gram"].combine_chunks() if isinstance(
            batch["gram"], pa.ChunkedArray) else batch["gram"]
        n = len(g)
        return pa.table({
            "gram": g,
            "key": pa.array(np.zeros(n, np.int64)),
            "pos": pa.array(np.zeros(n, np.int64)),
            "_m": pa.array(np.ones(n, np.int8)),
            "_b": pa.array(_gram_bucket(g, k, num_buckets)),
        })

    tagged = (ds.map_batches(corpus_rows, batch_format="pyarrow")
                .union(dup_ds.map_batches(dup_rows, batch_format="pyarrow")))

    def in_bucket(group: pa.Table) -> pa.Table:
        m = group["_m"]
        dup_side = group.filter(pc.equal(m, pa.scalar(1, pa.int8())))
        corpus = group.filter(pc.equal(m, pa.scalar(0, pa.int8())))
        if dup_side.num_rows == 0 or corpus.num_rows == 0:
            return pa.table({"key": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        hit = pc.is_in(corpus["gram"].combine_chunks(),
                       value_set=dup_side["gram"].combine_chunks())
        h = corpus.filter(hit)
        return pa.table({"key": h["key"], "pos": h["pos"]})

    hits = (tagged.groupby("_b").map_groups(in_bucket,
                                            batch_format="pyarrow"))

    def add_doc_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_db", pa.array(_bucket_of(batch["key"], num_buckets)))

    def per_doc(group: pa.Table) -> pa.Table:
        g = group.sort_by([("key", "ascending"), ("pos", "ascending")])
        key = g["key"].combine_chunks()
        pos = g["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(pos)
        kk = key.to_numpy(zero_copy_only=False)
        contrib = np.full(n, k, dtype=np.int64)
        if n > 1:
            same = kk[1:] == kk[:-1]
            d = pos[1:] - pos[:-1]
            contrib[:-1][same] = np.minimum(k, d[same])
        seg = np.flatnonzero(np.r_[True, kk[1:] != kk[:-1]])
        return pa.table({
            "key": key.take(pa.array(seg)),
            "dup_grams": pa.array(np.diff(np.append(seg, n)), pa.int64()),
            "covered_chars": pa.array(np.add.reduceat(contrib, seg),
                                      pa.int64()),
        })

    return (hits.map_batches(add_doc_bucket, batch_format="pyarrow")
                .groupby("_db")
                .map_groups(per_doc, batch_format="pyarrow"))


#: Driver-memory guard for the strip path's dup-gram broadcast:
#: 50M grams x (k=32 B payload + Arrow overhead) ~= 2 GB on the driver
#: plus one object-store copy. Template-heavy corpora (e.g. generated
#: code, boilerplate-dominated crawls) can push the duplicated-gram set
#: toward the corpus gram count — byte-level excision is the wrong tool
#: there; flag-and-drop whole docs via duplicate_spans + a coverage
#: threshold instead.
DEFAULT_MAX_BROADCAST_GRAMS = 50_000_000


def strip_duplicate_spans(ds, text_col: str = "text",
                          key_col: str = "doc_id",
                          k: int = DEFAULT_SPAN_K,
                          num_buckets: int = 256,
                          max_broadcast_grams: int = DEFAULT_MAX_BROADCAST_GRAMS):
    """Dataset -> Dataset with ``text`` rewritten to exclude every byte
    covered by a cross-doc duplicated k-gram (the removal half of Lee et
    al.; detection identical to :func:`duplicate_spans`, broadcast path
    only — span REMOVAL needs the mask per doc, so callers beyond the
    broadcast budget should flag-and-drop whole docs instead). Adds
    ``n_removed`` (bytes removed). Deterministic; docs with no hits pass
    through byte-identical."""
    import ray

    dup = duplicate_gram_set(ds, text_col, key_col, k, num_buckets)
    tabs = [t for t in ray.get(dup.materialize().to_arrow_refs())
            if t.num_rows]  # a no-dup corpus yields schema-less blocks
    n_grams = sum(t.num_rows for t in tabs)
    if n_grams > max_broadcast_grams:
        raise ValueError(
            f"strip_duplicate_spans: duplicated-gram set has {n_grams:,} "
            f"grams (> max_broadcast_grams={max_broadcast_grams:,}); the "
            "driver broadcast would not fit. Byte-level excision is the "
            "wrong tool for a corpus this template-heavy — flag and drop "
            "whole documents instead (duplicate_spans + a covered_chars/"
            "doc-length threshold), or raise max_broadcast_grams if the "
            "driver genuinely has the memory.")
    dup_t = (pa.concat_tables(tabs) if tabs
             else pa.table({"gram": pa.array([], pa.binary(k))}))
    ref = ray.put(dup_t["gram"].combine_chunks())

    def strip(batch: pa.Table) -> pa.Table:
        dup_grams = ray.get(ref)
        grams, starts, counts = _gram_view(batch[text_col], k)
        data, offsets = byte_view(batch[text_col])
        if len(grams) == 0 or len(dup_grams) == 0:
            return batch.append_column(
                "n_removed", pa.array(np.zeros(batch.num_rows, np.int64)))
        hit = pc.is_in(grams, value_set=dup_grams).to_numpy(
            zero_copy_only=False)
        # byte-level removal mask via interval diff counters: +1 at each
        # hit window's first byte, -1 one past its last
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        idx = np.flatnonzero(hit)
        delta = np.zeros(len(data) + 1, np.int64)
        if len(idx):
            byte_start = offsets[doc_of[idx]] + (
                idx - starts[doc_of[idx]])
            np.add.at(delta, byte_start, 1)
            np.add.at(delta, byte_start + k, -1)
        covered = np.cumsum(delta[:-1]) > 0
        keep = ~covered
        kept = data[keep]
        # kept bytes per doc via cumsum gather (reduceat misreads
        # zero-length docs, whose offsets coincide with the next doc's)
        cs = np.r_[0, np.cumsum(keep.astype(np.int64))]
        kept_per_doc = cs[offsets[1:]] - cs[offsets[:-1]]
        new_off = np.r_[0, np.cumsum(kept_per_doc)].astype(np.int32)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        validity = texts.is_valid()
        new_text = pa.StringArray.from_buffers(
            batch.num_rows, pa.py_buffer(new_off.tobytes()),
            pa.py_buffer(kept.tobytes()))
        if texts.null_count:
            new_text = pc.if_else(validity, new_text,
                                  pa.scalar(None, pa.string()))
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, new_text)
        removed = (offsets[1:] - offsets[:-1]) - kept_per_doc
        return out.append_column("n_removed",
                                 pa.array(removed, pa.int64()))

    return ds.map_batches(strip, batch_format="pyarrow")
