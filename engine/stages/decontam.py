"""Benchmark decontamination: flag training docs that share n-gram
shingles with a (small) held-out benchmark/test set — the standard
"test-set contamination" sweep a training-data pipeline runs before a
model ever sees the corpus.

Shape: the benchmark side is tiny (test sets are thousands of docs), so
its distinct shingle set is built once and broadcast (``ray.put``); the
corpus side is one streaming ``map_batches`` pass — membership via
``np.searchsorted`` against the sorted benchmark set. No shuffle at all
(the broadcast-small-side pattern, SURVEY.md §2.4 J1).

Exactness: shingles are the actual ``k``-byte windows packed big-endian
into uint64 (``k <= 8``) — a BIJECTION, not a hash, so there are zero
false positives and the result matches a character-level SQL oracle
exactly on ASCII text (UTF-8 byte windows == char windows there).

Scale notes: the benchmark shingle set is size-guarded
(``max_bench_shingles``, default 50M = 400 MB broadcast — a real test
suite is far below this); the corpus pass is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view

DEFAULT_SHINGLE_K = 8
DEFAULT_MAX_BENCH_SHINGLES = 50_000_000


def _shingle_values(data: np.ndarray, offsets: np.ndarray,
                    k: int = DEFAULT_SHINGLE_K):
    """Pack every in-doc k-byte window into a big-endian uint64
    (bijective for k <= 8). Returns (values, doc_starts, doc_counts) with
    the same segment layout as neardup._shingles."""
    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8] (one uint64 per shingle)")
    n_docs = len(offsets) - 1
    lengths = offsets[1:] - offsets[:-1]
    counts = np.maximum(lengths - k + 1, 0)
    from .textfeat import segment_keep_index

    keep_idx, starts, total = segment_keep_index(offsets, counts)
    if len(data) < k or total == 0:
        return np.zeros(0, np.uint64), starts, counts.astype(np.int64)
    n = len(data) - k + 1
    du = data.astype(np.uint64)  # one widening pass, sliced per offset
    v = np.zeros(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    for j in range(k):  # in-place ufuncs: no per-iteration temporaries
        np.left_shift(du[j: n + j], np.uint64(8 * (k - 1 - j)), out=tmp)
        np.bitwise_or(v, tmp, out=v)
    return v[keep_idx], starts, counts.astype(np.int64)


def benchmark_shingle_set(
    bench_ds,
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    max_bench_shingles: int = DEFAULT_MAX_BENCH_SHINGLES,
) -> np.ndarray:
    """Sorted unique shingle values of the benchmark set (broadcast side).

    Streams the benchmark in batches, deduping per batch before the
    final union, and raises past ``max_bench_shingles`` — the guard that
    keeps this the broadcast-small-side regime (a benchmark bigger than
    that needs the shuffle-join formulation instead)."""
    parts: list[np.ndarray] = []
    total = 0
    for b in bench_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        data, offsets = byte_view(b[text_col])
        sh, _, _ = _shingle_values(data, offsets, k)
        u = np.unique(sh)
        total += len(u)
        if total > max_bench_shingles:
            raise ValueError(
                f"benchmark shingle set exceeds {max_bench_shingles}: too "
                "large to broadcast — use a distributed shingle join")
        parts.append(u)
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def contamination_flags(
    corpus_ds,
    bench_shingles: np.ndarray,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = DEFAULT_SHINGLE_K,
    min_overlap_permille: int | None = None,
):
    """Corpus Dataset -> Dataset (key, overlap_positions,
    total_positions, contaminated).

    ``overlap_positions`` counts shingle POSITIONS in the doc that occur
    in the benchmark set. ``contaminated`` is ``overlap > 0`` by default
    (any shared shingle), or — with ``min_overlap_permille`` — an
    integer-exact ratio test ``overlap * 1000 >= permille * total``
    (docs too short to have a shingle are never contaminated, matching a
    SQL position-join oracle). One streaming pass, benchmark set read
    from the object store once per worker."""
    import ray

    ref = ray.put(np.ascontiguousarray(bench_shingles))

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        data, offsets = byte_view(batch[text_col])
        sh, starts, counts = _shingle_values(data, offsets, k)
        n_docs = len(offsets) - 1
        overlap = np.zeros(n_docs, dtype=np.int64)
        if len(sh) and len(bench):
            pos = np.searchsorted(bench, sh)
            hit = np.zeros(len(sh), dtype=np.int64)
            inb = pos < len(bench)
            hit[inb] = (bench[pos[inb]] == sh[inb]).astype(np.int64)
            nz = np.flatnonzero(counts > 0)
            overlap[nz] = np.add.reduceat(hit, starts[nz])
        if min_overlap_permille is None:
            contaminated = overlap > 0
        else:
            contaminated = (counts > 0) & (
                overlap * 1000 >= min_overlap_permille * counts)
        return pa.table({
            key_col: batch[key_col],
            "overlap_positions": pa.array(overlap, pa.int64()),
            "total_positions": pa.array(counts, pa.int64()),
            "contaminated": pa.array(contaminated),
        })

    return corpus_ds.map_batches(flag, batch_format="pyarrow")
