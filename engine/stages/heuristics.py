"""Heuristic quality metrics + verdict rules (stateless map_batches stages).

Generalizes the reference's NULL / range checks into per-file quality rules
(SURVEY.md §7.1):

- empty/whitespace-only content  <- TS-2 NULL-or-blank predicate
  (reference: src/checker/null_checker.py:58-94, COALESCE(NULLIF(TRIM..)))
- char-count bounds, max-line-length band, alpha-ratio  <- numeric range
  predicates (reference: src/checker/range_checker.py:122-173)
- claimed ``lang`` must be in the model's label set  <- FK/allowed-values
  check (reference: range_checker.py:246-288, checks/check_range.sql:98-111)

All metrics are byte-level vectorized (see textfeat.py); no per-row Python.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..corpus import LANGS, MAX_CHARS, MAX_PPL, MAX_LINE_LEN, MIN_ALPHA_RATIO, MIN_CHARS
from .textfeat import byte_view, doc_alpha_counts, doc_line_stats


def add_metrics(batch: pa.Table, content_col: str = "content") -> pa.Table:
    """Append n_chars, n_lines, max_line_len, alpha_ratio (+ sha256 pre)."""
    col = batch[content_col]
    data, offsets = byte_view(col)
    n_bytes = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n_lines, max_line = doc_line_stats(data, offsets)
    alpha = doc_alpha_counts(data, offsets)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(n_bytes > 0, alpha / np.maximum(n_bytes, 1), 0.0)

    # content sha256 (pre-scrub) — dedup key + integrity invariant
    hashes = _sha256_column(data, offsets, col)

    return (
        batch.append_column("n_chars", pa.array(n_bytes))
        .append_column("n_lines", pa.array(n_lines))
        .append_column("max_line_len", pa.array(max_line))
        .append_column("alpha_ratio", pa.array(ratio, pa.float64()))
        .append_column("content_sha256_pre", hashes)
    )


def _sha256_column(data: np.ndarray, offsets: np.ndarray, col) -> pa.Array:
    """sha256 hex per row; null content -> null hash."""
    mv = memoryview(data)
    hashes = [
        hashlib.sha256(mv[offsets[i] : offsets[i + 1]]).hexdigest()
        for i in range(len(offsets) - 1)
    ]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        hashes = [None if n else h for h, n in zip(hashes, nulls)]
    return pa.array(hashes, pa.string())


# Ordered drop reasons (canonical order for the drop_reasons list).
REASONS = [
    "empty_content",
    "missing_lang",
    "unknown_lang",
    "too_short",
    "too_long",
    "long_lines",
    "low_alpha",
    "lang_mismatch",
    "high_perplexity",
    "duplicate",
]


def add_verdict(
    batch: pa.Table,
    *,
    min_chars: int = MIN_CHARS,
    max_chars: int = MAX_CHARS,
    max_line_len: int = MAX_LINE_LEN,
    min_alpha_ratio: float = MIN_ALPHA_RATIO,
    max_ppl: float = MAX_PPL,
    min_mismatch_conf: float = 0.8,
    known_langs: tuple[str, ...] = tuple(LANGS),
) -> pa.Table:
    """Apply quality rules -> ``drop_reasons: list<string>``, ``keep: bool``.

    Rules are independent (reference runs every rule and records each
    violation separately, src/main.py:117-152); a row may collect several
    reasons. ``empty_content`` short-circuits the content-shape rules (they
    are meaningless on empty text). The ``duplicate`` reason is added later
    by the dedup stage.
    """
    n = batch.num_rows
    content = batch["content"]
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()

    is_null = pc.is_null(content).to_numpy(zero_copy_only=False)
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(content, ""))
    is_blank = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    empty = is_null | is_blank

    lang = batch["lang"]
    lang_missing = pc.is_null(lang).to_numpy(zero_copy_only=False)
    lang_known = pc.is_in(
        pc.fill_null(lang, ""), value_set=pa.array(known_langs)
    ).to_numpy(zero_copy_only=False)

    n_chars = batch["n_chars"].to_numpy()
    max_line = batch["max_line_len"].to_numpy()
    alpha = batch["alpha_ratio"].to_numpy()

    flags = {
        "empty_content": empty,
        "missing_lang": lang_missing,
        "unknown_lang": (~lang_missing) & (~lang_known),
        "too_short": (~empty) & (n_chars < min_chars),
        "too_long": (~empty) & (n_chars > max_chars),
        "long_lines": (~empty) & (max_line > max_line_len),
        "low_alpha": (~empty) & (alpha < min_alpha_ratio),
    }
    if "lang_pred" in batch.column_names:
        pred = batch["lang_pred"].to_numpy(zero_copy_only=False)
        claimed = lang.to_numpy(zero_copy_only=False)
        # conf gate: only a confident disagreement drops the row (borderline
        # predictions on in-distribution text must not cause false drops)
        conf = (
            batch["lang_conf"].to_numpy(zero_copy_only=False)
            if "lang_conf" in batch.column_names
            else np.ones(n)
        )
        mismatch = (claimed != pred) & ~lang_missing & lang_known
        flags["lang_mismatch"] = (~empty) & mismatch & (conf >= min_mismatch_conf)
    if "ppl" in batch.column_names:
        ppl = batch["ppl"].to_numpy(zero_copy_only=False)
        flags["high_perplexity"] = (~empty) & (np.nan_to_num(ppl, nan=0.0) > max_ppl)
    if "dup_flag" in batch.column_names:
        flags["duplicate"] = batch["dup_flag"].to_numpy(zero_copy_only=False).astype(bool)

    # assemble list<string> column in canonical reason order
    active = [(r, flags[r]) for r in REASONS if r in flags]
    reason_lists: list[list[str]] = [[] for _ in range(n)]
    for reason, mask in active:
        for i in np.flatnonzero(mask):
            reason_lists[i].append(reason)
    keep = ~np.logical_or.reduce([m for _, m in active]) if active else np.ones(n, bool)

    return batch.append_column(
        "drop_reasons", pa.array(reason_lists, pa.list_(pa.string()))
    ).append_column("keep", pa.array(keep, pa.bool_()))
