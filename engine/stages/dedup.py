"""Exact cross-partition deduplication (the pipeline's mandatory shuffle).

Reference semantics: GROUP BY key HAVING COUNT(*) > 1 detection with
``dup_rows = SUM(cnt - 1)`` (reference: src/checker/duplicate_checker.py:
91-112) — generalized to actually *drop* duplicates, keeping one row per
content key. "First" is defined by a deterministic tiebreak — the minimum
``(repo, path, commit)`` triple — never by arrival order, so results are
identical at any parallelism (SURVEY.md §7.4 risk 4).

Physical plan (explicit shuffle + skew handling, per the north_rule):

1. **Local pre-dedup** (stateless ``map_batches``): within each Arrow
   batch, group by key and mark every non-minimum row as a final duplicate
   (``_dup_local``). A content duplicated millions of times is reduced to
   at most one *candidate* row per block before anything moves — this is
   the salting/combiner step that caps shuffle-side group size at
   ``n_blocks`` regardless of key skew (giant-repo fixture).
2. **Bucketed resolve** (one ``groupby`` shuffle): candidates get
   ``_bucket = stable_hash(key) % B`` so all candidates of a key co-locate;
   already-resolved local losers get a uniformly spread bucket (they carry
   no skew into any one bucket). Each bucket is resolved with one
   vectorized sort + adjacent-compare — ~B Python calls total, not one per
   group.

Output: input columns + ``dup_flag: bool`` (True = drop as duplicate).
Null keys (null content) never participate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import _hash64_strings

DEFAULT_NUM_BUCKETS = 256

KEY_COL = "content_sha256_pre"
TIEBREAK = ("repo", "path", "commit")


def _stable_bucket_ids(arr: pa.Array, num_buckets: int) -> np.ndarray:
    """Process-stable bucket id per string, no per-row Python on the hot
    path. Fast path: keys whose first 8 chars are lowercase hex (the
    sha256/sha1 keys this stage actually buckets) parse those chars as a
    32-bit value — 8 vectorized gathers instead of the general hash's
    length-many passes; anything else falls back to the vectorized
    FNV/fmix64 hash (sketches.py). The path choice is a pure function of
    the key string, so a key always lands in the same bucket. Nulls hash
    as "" (their bucket is irrelevant: null-key rows are never dedup
    candidates and get the spread bucket)."""
    from .textfeat import byte_view

    data, offsets = byte_view(arr)
    n = len(offsets) - 1
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    lengths = offsets[1:] - offsets[:-1]
    out = np.empty(n, dtype=np.int64)
    long_enough = lengths >= 8
    rows8 = np.flatnonzero(long_enough)
    is_hex = np.zeros(n, dtype=bool)
    if len(rows8):
        idx = offsets[:-1][rows8, None] + np.arange(8)[None, :]
        c = data[idx]
        digit = (c >= 48) & (c <= 57)
        lower = (c >= 97) & (c <= 102)
        rowhex = (digit | lower).all(axis=1)
        is_hex[rows8] = rowhex
        v = np.where(lower, c - 87, c - 48).astype(np.uint64)
        weights = np.uint64(16) ** np.arange(7, -1, -1, dtype=np.uint64)
        hv = (v * weights).sum(axis=1)
        out[rows8[rowhex]] = (hv[rowhex] % np.uint64(num_buckets)).astype(np.int64)
    rest = ~is_hex
    if rest.any():
        sub = arr.take(pa.array(np.flatnonzero(rest), pa.int64()))
        out[rest] = (_hash64_strings(sub) % np.uint64(num_buckets)).astype(np.int64)
    return out


def _first_of_key_mask(sorted_keys: pa.Array) -> np.ndarray:
    """Boolean mask: first occurrence of each key in an already-sorted array."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(0, dtype=bool)
    neq = pc.fill_null(
        pc.not_equal(sorted_keys.slice(1, n - 1), sorted_keys.slice(0, n - 1)),
        True,  # a null key never equals anything (nulls don't dedup)
    ).to_numpy(zero_copy_only=False)
    return np.concatenate([[True], neq.astype(bool)])


def local_prededup(
    batch: pa.Table,
    key: str = KEY_COL,
    tiebreak: tuple[str, ...] = TIEBREAK,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> pa.Table:
    """Stage 1: mark within-batch duplicate losers; assign shuffle buckets."""
    n = batch.num_rows
    key_arr = batch[key]
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()

    sort_keys = [(key, "ascending")] + [(t, "ascending") for t in tiebreak]
    idx = pc.sort_indices(batch, sort_keys=sort_keys)
    sorted_keys = key_arr.take(idx)
    first_sorted = _first_of_key_mask(sorted_keys)
    is_first = np.empty(n, dtype=bool)
    is_first[idx.to_numpy()] = first_sorted
    is_null = pc.is_null(key_arr).to_numpy(zero_copy_only=False)
    dup_local = (~is_first) & (~is_null)

    buckets = _stable_bucket_ids(key_arr, num_buckets)
    # spread resolved losers + null-key rows uniformly (no skewed buckets);
    # commit is unique per row in the corpus
    spread = _stable_bucket_ids(batch["commit"], num_buckets) if "commit" in batch.column_names else np.zeros(n, np.int64)
    noncand = dup_local | is_null
    buckets = np.where(noncand, spread, buckets)

    return batch.append_column("_dup_local", pa.array(dup_local)).append_column(
        "_bucket", pa.array(buckets, pa.int64())
    )


def resolve_bucket(
    group: pa.Table,
    key: str = KEY_COL,
    tiebreak: tuple[str, ...] = TIEBREAK,
) -> pa.Table:
    """Stage 2 (per bucket): keep min-tiebreak candidate per key.

    Vectorized: one multi-column sort of the bucket's candidate rows, then
    an adjacent-key compare; no per-group Python.
    """
    n = group.num_rows
    dup_local = group["_dup_local"].to_numpy(zero_copy_only=False)
    key_arr = group[key]
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    is_null = pc.is_null(key_arr).to_numpy(zero_copy_only=False)
    cand = (~dup_local) & (~is_null)

    dup_flag = dup_local.copy()
    cand_idx = np.flatnonzero(cand)
    if len(cand_idx):
        sub = group.take(pa.array(cand_idx))
        sort_keys = [(key, "ascending")] + [(t, "ascending") for t in tiebreak]
        order = pc.sort_indices(sub, sort_keys=sort_keys)
        sorted_keys = sub[key].combine_chunks() if isinstance(sub[key], pa.ChunkedArray) else sub[key]
        sorted_keys = sorted_keys.take(order)
        first_sorted = _first_of_key_mask(sorted_keys)
        loser_in_sub = np.empty(len(cand_idx), dtype=bool)
        loser_in_sub[order.to_numpy()] = ~first_sorted
        dup_flag[cand_idx[loser_in_sub]] = True

    out = group.append_column("dup_flag", pa.array(dup_flag))
    return out.drop_columns(["_dup_local", "_bucket"])


def mark_duplicates(
    ds,
    key: str = KEY_COL,
    tiebreak: tuple[str, ...] = TIEBREAK,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
):
    """Dataset -> Dataset with ``dup_flag`` appended (one groupby shuffle)."""
    staged = ds.map_batches(
        lambda b: local_prededup(b, key, tiebreak, num_buckets),
        batch_format="pyarrow",
    )
    return staged.groupby("_bucket").map_groups(
        lambda g: resolve_bucket(g, key, tiebreak), batch_format="pyarrow"
    )
