"""Windowed aggregates over stream-shaped tables (events log).

Ray Data is a batch engine with no event-time watermarks (the reference
is strictly batch too, SURVEY.md §2.9); stream-shaped semantics are
expressed over the log as data:

- **tumbling windows**: window id = floor(epoch / size) is just a derived
  grouping column -> one vectorized projection + groupby aggregate (the
  same shape as the reference's daily rollup, sql/init_target.sql:90-106);
- **session windows** (gap-based): ``groupby(key).map_groups`` where each
  group is sorted by (ts, id) and split where the gap exceeds the
  threshold. Partitioning assumption (documented per the build spec): one
  key's full history fits in one worker — keys are users/devices, so
  group size is bounded by per-entity activity, not corpus size. Ordering
  within a group is made deterministic by the (ts, id) sort — never
  arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def add_tumbling_window(batch: pa.Table, ts_col: str = "ts",
                        window_sec: int = 21600) -> pa.Table:
    """Append ``window_id = floor(epoch_seconds / window_sec)`` (int64)."""
    ts = batch[ts_col]
    if not (pa.types.is_timestamp(ts.type) and ts.type.unit == "us"):
        ts = ts.cast(pa.timestamp("us"))  # normalize unit before epoch math
    micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
    window = micros // (window_sec * 1_000_000)
    return batch.append_column("window_id", pa.array(window, pa.int64()))


def tumbling_window_agg(ds, key_col: str, ts_col: str, value_col: str,
                        window_sec: int = 21600):
    """groupby (key, window) -> count + integer-cent value sum."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def project(batch: pa.Table) -> pa.Table:
        b = add_tumbling_window(batch, ts_col, window_sec)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b[value_col], 100.0), 0.5)), pa.int64())
        return pa.table({key_col: b[key_col], "window_id": b["window_id"],
                         "value_cents": cents})

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_cents", alias_name="total_value_cents"))
    )


def session_window_agg(ds, key_col: str, ts_col: str, id_col: str,
                       gap_sec: int = 1800):
    """Gap-based session windows per key.

    Output rows: (key, session_id starting at 0 per key, n_events,
    session_start, session_end). Deterministic: events sorted by
    (ts, id) within each key; a new session starts when the gap from the
    previous event exceeds ``gap_sec``.
    """
    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([ts_col, id_col], kind="mergesort")
        gaps = g[ts_col].diff().dt.total_seconds().fillna(0.0)
        sess = (gaps > gap_sec).cumsum()
        out = g.groupby(sess).agg(
            n_events=(id_col, "count"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
        ).reset_index(drop=True)
        out.insert(0, "session_id", np.arange(len(out), dtype=np.int64))
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")
