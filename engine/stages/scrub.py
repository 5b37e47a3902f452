"""PII / secret / toxic-string scrubber — compiled-pattern batch stage.

Generalizes the reference's masking transform + leak check
(reference: sql/init_target.sql:16-38 — the masking ETL;
src/checker/masking_checker.py:210-256 — plain-PII leak detection) into a
regex redaction stage over ``content``, per the north_star.

TS-3 parity: the reference learned that per-row regex engines are the
bottleneck and moved to precompiled/fixed-position checks
(docs/troubleshooting.md:103-131). Here every pattern is applied once per
Arrow batch through pyarrow.compute's RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``) — compiled once,
vectorized in C++, no per-row Python.

Invariant (BASELINE.json input_hint): a row with zero redactions keeps
byte-identical content — verified via sha256 pre/post equality.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view

#: (name, RE2 pattern, replacement). Patterns are RE2-safe and also valid
#: in Python `re` and DuckDB `regexp_*` (used by tests/oracles).
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "key",
        r"AKIA[0-9A-Z]{16}",
        "<SECRET_KEY>",
    ),
    (
        "key",
        r"-----BEGIN [A-Z ]*PRIVATE KEY-----[A-Za-z0-9+/=\s]*-----END [A-Z ]*PRIVATE KEY-----",
        "<PRIVATE_KEY>",
    ),
    (
        "toxic",
        r"TOXICWORD_[A-Z]+",
        "<TOXIC>",
    ),
]


def scrub_batch(
    batch: pa.Table,
    content_col: str = "content",
    patterns: list[tuple[str, str, str]] = DEFAULT_PATTERNS,
) -> pa.Table:
    """Redact all patterns; append redaction counts + post-scrub sha256.

    Appends ``email_redactions``, ``key_redactions``, ``toxic_redactions``
    (int32) and ``content_sha256`` (post-scrub; equals ``content_sha256_pre``
    for untouched rows), and replaces ``content`` with the scrubbed text.
    """
    col = batch[content_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    counts: dict[str, pa.Array] = {}
    scrubbed = col
    for name, pattern, repl in patterns:
        c = pc.count_substring_regex(scrubbed, pattern)
        counts[name] = pc.add(counts[name], c) if name in counts else c
        scrubbed = pc.replace_substring_regex(scrubbed, pattern, repl)
    if scrubbed.type != col.type:
        scrubbed = scrubbed.cast(col.type)

    data, offsets = byte_view(scrubbed)
    mv = memoryview(data)
    hashes = [
        hashlib.sha256(mv[offsets[i] : offsets[i + 1]]).hexdigest()
        for i in range(len(offsets) - 1)
    ]
    if scrubbed.null_count:
        nulls = pc.is_null(scrubbed).to_numpy(zero_copy_only=False)
        hashes = [None if nl else h for h, nl in zip(hashes, nulls)]

    idx = batch.column_names.index(content_col)
    out = batch.set_column(idx, content_col, scrubbed)
    for name in ("email", "key", "toxic"):
        c = counts.get(name)
        if c is None:
            c = pa.nulls(batch.num_rows, pa.int32())
        out = out.append_column(
            f"{name}_redactions", pc.fill_null(c, 0).cast(pa.int32())
        )
    return out.append_column("content_sha256", pa.array(hashes, pa.string()))
