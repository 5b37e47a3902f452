"""Sources and sinks for the corpus shape.

The reference's only source is pooled MySQL (src/db_connector.py:23-117);
here the primary source is partitioned Parquet (column pruning + row-group
pushdown at the read), with CSV / JSON(L) / in-memory Arrow accepted for
interchange. All readers normalize to CORPUS_SCHEMA (content as
large_string) and validate the column set at ingest — the explicit-schema
stance of the reference's DDL (sql/init_schema.sql), enforced in Arrow.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from .schema import CORPUS_SCHEMA

_CORPUS_COLS = [f.name for f in CORPUS_SCHEMA]


def _normalize(batch: pa.Table) -> pa.Table:
    missing = [c for c in _CORPUS_COLS if c not in batch.column_names]
    if missing:
        raise ValueError(f"corpus input missing columns: {missing}")
    cols = {}
    for field in CORPUS_SCHEMA:
        col = batch[field.name]
        if col.type != field.type:
            col = pc.cast(col, field.type)
        cols[field.name] = col
    return pa.table(cols)


def read_corpus(path: str, fmt: str = "parquet", *, columns: Optional[list[str]] = None):
    """Corpus Dataset from parquet (default) / csv / json, schema-normalized.

    ``columns`` prunes at the read for parquet (only requested columns
    leave storage); for csv/json pruning happens post-parse.
    """
    import ray.data as rd

    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=columns or _CORPUS_COLS)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt in ("json", "jsonl"):
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unknown corpus format {fmt!r}")
    if fmt == "parquet" and columns:
        return ds  # pruned projection; schema validation is caller's choice
    return ds.map_batches(_normalize, batch_format="pyarrow", zero_copy_batch=True)


def from_arrow(table: pa.Table):
    import ray.data as rd

    return rd.from_arrow(_normalize(table))


def write_corpus_parquet(ds, out_dir: str, *, min_rows_per_file: Optional[int] = None):
    """Partitioned parquet sink (a directory of part files — resumable
    layout; never one giant file)."""
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, **kwargs)
    return out_dir


_EXT_LANG = {"py": "python", "js": "javascript", "c": "c", "h": "c",
             "md": "markdown", "txt": "text"}


def read_corpus_from_files(root_dir: str, repo: str | None = None):
    """Ingest a raw source tree as corpus rows: one row per file,
    ``lang`` inferred from the extension, ``commit`` = sha1 of the file
    bytes (content-addressed identity — no VCS required).

    Uses ``read_binary_files(include_paths=True)`` so ingestion is
    file-parallel; decode + shaping happens vectorized per batch.
    """
    import hashlib
    import os

    import ray.data as rd

    repo_name = repo or os.path.basename(os.path.abspath(root_dir))
    ds = rd.read_binary_files(root_dir, include_paths=True)
    prefix = os.path.abspath(root_dir) + os.sep

    def shape(batch: pa.Table) -> pa.Table:
        paths, langs, commits, contents = [], [], [], []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            rel = path[len(prefix):] if path.startswith(prefix) else path
            ext = rel.rsplit(".", 1)[-1].lower() if "." in rel else ""
            paths.append(rel)
            langs.append(_EXT_LANG.get(ext))
            commits.append(hashlib.sha1(data).hexdigest())
            contents.append(data.decode("utf-8", errors="replace"))
        return pa.table({
            "repo": pa.array([repo_name] * batch.num_rows, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        })

    return ds.map_batches(shape, batch_format="pyarrow")
