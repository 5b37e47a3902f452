"""Zero-copy byte-level feature extraction over Arrow string columns.

The reference's TS-3 lesson — fixed-position/vectorized checks beat per-row
regex engines by ~40x (reference: docs/troubleshooting.md:93-133,
src/checker/masking_checker.py:71-80) — generalized: every hot-path text
metric here works on the raw UTF-8 data buffer of a (large_)string Arrow
array as one NumPy view, with per-document boundaries carried as offsets.
No Python loop ever runs per row.

Counts are byte-based (ASCII == char for the synthetic corpora used here;
documented wherever an oracle compares char-based SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def byte_view(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return ``(data, offsets)`` for a string/large_string array.

    ``data`` is the concatenated UTF-8 bytes of all rows (uint8 view),
    ``offsets`` is int64 of length ``len(arr)+1``; row i's bytes are
    ``data[offsets[i]:offsets[i+1]]``. Nulls are normalized to "" first
    (guarantees monotone offsets).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    buffers = arr.buffers()
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(buffers[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    offs = offs.astype(np.int64, copy=False)
    data = np.frombuffer(buffers[2], dtype=np.uint8)
    # Normalize to a 0-based window (np slicing is a view — still zero-copy)
    # so gram/segment code never sees bytes outside this array's rows.
    if len(offs) and (offs[0] != 0 or offs[-1] != len(data)):
        data = data[offs[0] : offs[-1]]
        offs = offs - offs[0]
    return data, offs


def segment_sums(values_cumsumable: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-document sums of a per-byte array via one cumsum (empty-safe)."""
    csum = np.concatenate([[0], np.cumsum(values_cumsumable, dtype=np.int64)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


def doc_line_stats(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc (n_lines, max_line_len) in one vectorized pass.

    Lines are newline-separated; a doc with k newlines has k+1 lines
    (an empty doc has 1 empty line).
    """
    n_docs = len(offsets) - 1
    nl = np.flatnonzero(data == 0x0A)
    # restrict to newlines within [offsets[0], offsets[-1]) (sliced arrays)
    nl = nl[(nl >= offsets[0]) & (nl < offsets[-1])]
    nl_before = np.searchsorted(nl, offsets)  # newlines before each boundary
    n_lines = (nl_before[1:] - nl_before[:-1]) + 1

    # Global sorted line boundaries: starts = doc starts + (nl+1);
    # ends = nl + doc ends. Elementwise pairing is valid because boundaries
    # are monotone and interleave start<=end<next start within each doc.
    starts = np.sort(np.concatenate([offsets[:-1], nl + 1]), kind="stable")
    ends = np.sort(np.concatenate([nl, offsets[1:]]), kind="stable")
    lengths = ends - starts

    line_starts = np.concatenate([[0], np.cumsum(n_lines)[:-1]])
    max_line = np.maximum.reduceat(lengths, line_starts) if len(lengths) else np.zeros(n_docs, np.int64)
    return n_lines.astype(np.int64), max_line.astype(np.int64)


ASCII_ALPHA_MASK = np.zeros(256, dtype=np.uint8)
ASCII_ALPHA_MASK[ord("a") : ord("z") + 1] = 1
ASCII_ALPHA_MASK[ord("A") : ord("Z") + 1] = 1


def doc_alpha_counts(data: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-doc count of ASCII letters."""
    return segment_sums(ASCII_ALPHA_MASK[data], offsets)


def gram_ids_bigram(data: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Byte-bigram ids over all docs + validity mask (no cross-doc grams).

    Returns ``(ids, valid)`` both of length ``len(data)-1`` (empty-safe).
    Determinism note: masking cross-doc grams makes per-doc scores independent
    of batch boundaries — required for identical output at any parallelism.
    """
    if len(data) < 2:
        return np.zeros(0, np.int32), np.zeros(0, bool)
    ids = data[:-1].astype(np.int32) * 256 + data[1:]
    valid = np.ones(len(ids), dtype=bool)
    # a bigram starting at the last byte of any doc crosses a boundary
    interior_ends = offsets[1:-1]
    last_pos = interior_ends - 1
    last_pos = last_pos[(last_pos >= 0) & (last_pos < len(ids))]
    valid[last_pos] = False
    # zero-length docs contribute nothing (no positions of their own)
    return ids, valid


def per_doc_gram_scores(
    weights: np.ndarray,
    gram_ids: np.ndarray,
    valid: np.ndarray,
    offsets: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Sum ``weights[gram]`` per doc (vectorized lookup + cumsum segments).

    ``weights``: (n_grams,) or (n_grams, C). Returns ``(sums, n_valid)``
    where sums is (n_docs,) or (n_docs, C) and n_valid is grams per doc.
    """
    n_docs = len(offsets) - 1
    out_shape = (n_docs,) if weights.ndim == 1 else (n_docs, weights.shape[1])
    # gram starting at byte p belongs to the doc containing p; doc d owns
    # gram positions [offsets[d], offsets[d+1]) clipped to len(gram_ids)
    bounds = np.clip(offsets, 0, len(gram_ids))
    vcsum = np.concatenate([[0], np.cumsum(valid, dtype=np.int64)])
    n_valid = vcsum[bounds[1:]] - vcsum[bounds[:-1]]
    if len(gram_ids) == 0:
        return np.zeros(out_shape), n_valid

    # Invalid (cross-doc) grams are redirected to an appended all-zero
    # weight row — one tiny scatter instead of a full masked copy of the
    # gathered matrix (hot-path optimization; memory traffic dominates).
    wext = _zero_row_extended(weights)
    bad = np.flatnonzero(~valid)
    ids = gram_ids
    if len(bad):
        ids = gram_ids.copy()
        ids[bad] = len(weights)
    w = wext[ids]  # float32 gather — no float64 up-cast on the hot path
    # Per-doc sums via reduceat over nonempty segments only. Summation is
    # strictly within-doc and left-to-right — a doc's score never depends on
    # its batch neighbours (determinism across batch boundaries), unlike a
    # global-cumsum difference which leaks float rounding between docs.
    starts, ends = bounds[:-1], bounds[1:]
    nonempty = ends > starts
    sums = np.zeros(out_shape)
    if nonempty.any():
        seg = np.add.reduceat(w, starts[nonempty], axis=0)
        sums[nonempty] = seg.astype(np.float64)
    return sums, n_valid


_EXT_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _zero_row_extended(weights: np.ndarray) -> np.ndarray:
    """weights with one extra all-zero row appended (cached per array)."""
    key = id(weights)
    hit = _EXT_CACHE.get(key)
    if hit is not None and hit[0] is weights:
        return hit[1]
    w32 = weights.astype(np.float32, copy=False)
    pad = np.zeros((1,) + w32.shape[1:], dtype=np.float32)
    ext = np.concatenate([w32, pad], axis=0)
    if len(_EXT_CACHE) >= 4:
        _EXT_CACHE.clear()
    _EXT_CACHE[key] = (weights, ext)
    return ext


def segment_keep_index(offsets: np.ndarray, counts: np.ndarray):
    """Gather index for per-doc sliding-window kernels: doc ``d`` owns
    positions ``offsets[d] + [0, counts[d])`` of a window array computed
    over the concatenated byte stream. Returns ``(keep_idx, doc_starts,
    total)`` — shared by the shingle kernels (neardup._shingles,
    decontam._shingle_values) so the interval arithmetic lives once."""
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), starts, 0
    keep = (np.repeat(offsets[:-1].astype(np.int64) - starts, counts)
            + np.arange(total, dtype=np.int64))
    return keep, starts, total
