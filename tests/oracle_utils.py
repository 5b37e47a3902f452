"""Driver-mirror comparison: run a Ray query and its DuckDB oracle SQL on
the same parquet tables; compare row-count + schema + order-insensitive
values (exact for ints/strings/dates, tolerant for raw-double columns)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(ray_result, sql_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems = []
    rdf = normalize(to_pandas(ray_result))
    sdf = normalize(sql_df)
    if list(rdf.columns) != list(sdf.columns):
        return [f"columns differ: ray={list(rdf.columns)} sql={list(sdf.columns)}"]
    if len(rdf) != len(sdf):
        return [f"row count differs: ray={len(rdf)} sql={len(sdf)}"]
    for c in rdf.columns:
        a, b = rdf[c].to_numpy(), sdf[c].to_numpy()
        if np.issubdtype(rdf[c].dtype, np.floating):
            ok = np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
        if not ok:
            bad = np.flatnonzero(pd.Series(a).astype(str).to_numpy() != pd.Series(b).astype(str).to_numpy())[:3]
            problems.append(f"column {c} differs at rows {bad.tolist()}: "
                            f"ray={a[bad].tolist()} sql={b[bad].tolist()}")
    return problems
