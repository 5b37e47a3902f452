"""Windowed aggregates over stream-shaped tables (events log).

Ray Data is a batch engine with no event-time watermarks (the reference
is strictly batch too, SURVEY.md §2.9); stream-shaped semantics are
expressed over the log as data:

- **tumbling windows**: window id = floor(epoch / size) is just a derived
  grouping column -> one vectorized projection + groupby aggregate (the
  same shape as the reference's daily rollup, sql/init_target.sql:90-106);
- **session windows** (gap-based): keys are hash-bucketed and every
  bucket is sessionized with ONE vectorized sort + adjacent-gap compare
  (the bucket-then-vectorize shape of stages/dedup.py resolve_bucket) —
  ~num_buckets Python calls total, never one per key. Partitioning
  assumption (documented per the build spec): one bucket's rows fit in
  one worker — keys are users/devices, so bucket size is corpus_size /
  num_buckets with per-entity bounded groups. Ordering within a key is
  made deterministic by the (key, ts, id) sort — never arrival order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import new_segment_mask


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

    from .aggregates import bucketed_groupby

    def project(batch: pa.Table) -> pa.Table:
        b = add_tumbling_window(_drop_null_ts(batch, ts_col), ts_col,
                                window_sec)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b[value_col], 100.0), 0.5)), pa.int64())
        return pa.table({key_col: b[key_col], "window_id": b["window_id"],
                         "value_cents": cents})

    return bucketed_groupby(
        ds.map_batches(project, batch_format="pyarrow"),
        [key_col, "window_id"],
        [("", "count", "n_events"),
         ("value_cents", "sum", "total_value_cents")],
    )


def _bucket_of(col, num_buckets: int) -> np.ndarray:
    """Deterministic hash bucket per key (vectorized; int or string keys).

    NULL keys are filled with a sentinel (0 / "") BEFORE hashing: buckets
    only need equal keys co-located, so colliding with the sentinel's
    bucket is harmless — but letting nulls flow into ``to_numpy`` would
    round-trip through float64 NaN, giving the null rows a
    platform-dependent bucket (the dsutil.key_bucket hazard)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from .sketches import _hash64_strings

        h = _hash64_strings(pc.fill_null(col, ""))
    else:
        from .sketches import _hash64_ints

        h = _hash64_ints(pc.fill_null(col.cast(pa.int64()), 0)
                         .to_numpy(zero_copy_only=False))
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _drop_null_ts(batch: pa.Table, ts_col: str) -> pa.Table:
    """Window kernels order by epoch microseconds via numpy; a null ts
    would round-trip through float64 NaN (garbage frames, or a raise in
    the int64 re-cast). NULL timestamps satisfy no window predicate in
    the SQL oracles, so they are excluded up front — the same contract
    as asof_join's NULL-ts sentinel."""
    ts = batch[ts_col]
    if isinstance(ts, pa.ChunkedArray):
        ts = ts.combine_chunks()
    if ts.null_count:
        batch = batch.filter(pc.is_valid(ts))
    return batch


def session_window_agg(ds, key_col: str, ts_col: str, id_col: str,
                       gap_sec: int = 1800, num_buckets: int = 64):
    """Gap-based session windows per key — Arrow-native, no per-key Python.

    Output rows: (key, session_id starting at 0 per key, n_events,
    session_start, session_end). Deterministic: one (key, ts, id) sort per
    hash bucket, then vectorized adjacent-gap session splits; a new session
    starts when the gap from the previous event exceeds ``gap_sec``.
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch[key_col], num_buckets)))

    def bucket_sessions(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ts = g[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if not (pa.types.is_timestamp(ts.type) and ts.type.unit == "us"):
            ts = ts.cast(pa.timestamp("us"))
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_key = new_segment_mask(keys, n)
        gaps = np.diff(micros, prepend=micros[:1])
        new_sess = new_key | (gaps > gap_sec * 1_000_000)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n)
        # session_id = per-key running index: distance to the key's first
        # session (maximum.accumulate of new-key reset positions)
        sidx = np.arange(len(starts))
        session_id = sidx - np.maximum.accumulate(
            np.where(new_key[starts], sidx, 0))
        return pa.table({
            key_col: keys.take(pa.array(starts, pa.int64())),
            "session_id": pa.array(session_id, pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64), pa.int64()),
            "session_start": pa.array(micros[starts]).cast(pa.timestamp("us")),
            "session_end": pa.array(micros[ends - 1]).cast(pa.timestamp("us")),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_sessions, batch_format="pyarrow")
    )


def rolling_window_sum(ds, key_col: str, ts_col: str, id_col: str,
                       value_col: str, window: int = 4,
                       num_buckets: int = 64):
    """Per-key ROWS-window running sum (SQL ``SUM(v) OVER (PARTITION BY
    key ORDER BY ts, id ROWS BETWEEN window-1 PRECEDING AND CURRENT
    ROW)``) — the row-window complement of the time-window aggregates
    above, and an operator Ray Data has no primitive for.

    ``value_col`` must be int64 (callers project doubles to integer
    cents first — the oracle float policy: integer running sums are
    associative and exact, float prefix sums are not). Same shape and
    partitioning assumption as ``session_window_agg``: keys are
    hash-bucketed (a key's rows land wholly in one bucket), each bucket
    gets ONE vectorized (key, ts, id) sort, then the rolling sum is
    cumsum differences with per-key segment restarts — no per-key
    Python, ~num_buckets calls total.

    Output rows: (id_col, key_col, roll_sum), one per input row.
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch[key_col], num_buckets)))

    def bucket_roll(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = g[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_key = new_segment_mask(keys, n)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, pos, 0))
        cs0 = np.concatenate([[0], np.cumsum(v)])  # int64: exact prefix
        lo = np.maximum(pos + 1 - window, seg_start)
        roll = cs0[pos + 1] - cs0[lo]
        return pa.table({
            id_col: g[id_col],
            key_col: keys,
            "roll_sum": pa.array(roll, pa.int64()),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_roll, batch_format="pyarrow")
    )


def hopping_window_agg(ds, ts_col: str, value_col: str,
                       window_sec: int = 21600, hop_sec: int = 10800):
    """Hopping (overlapping/sliding) windows: every event lands in
    ``window_sec / hop_sec`` windows, emitted as a vectorized row
    expansion (np.repeat) + one groupby aggregate — the batch-engine
    formulation of a sliding-window stream aggregate (same regime note as
    the module docstring: no watermarks, the log IS the data).

    ``window_idx`` identifies the window starting at
    ``window_idx * hop_sec`` seconds epoch and spanning ``window_sec``.
    Requires ``hop_sec`` to divide ``window_sec``.
    """
    if window_sec % hop_sec:
        raise ValueError("hop_sec must divide window_sec")
    k = window_sec // hop_sec
    from ray.data.aggregate import Count, Sum

    def project(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        ts = batch[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if not (pa.types.is_timestamp(ts.type) and ts.type.unit == "us"):
            ts = ts.cast(pa.timestamp("us"))
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = micros // (hop_sec * 1_000_000)
        n = len(base)
        # event at t belongs to windows (base - i) for i in [0, k): each
        # starts <= t (i >= 0) and ends > t (i <= k-1) by construction
        widx = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch[value_col], 100.0), 0.5)),
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "window_idx": pa.array(widx, pa.int64()),
            "value_cents": pa.array(np.repeat(cents, k), pa.int64()),
        })

    # window-cardinality groups (hundreds): Ray's native aggregate wins
    # (see the low-vs-high-cardinality note in stages/aggregates.py)
    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("window_idx")
        .aggregate(Count(alias_name="n_events"),
                   Sum("value_cents", alias_name="total_value_cents"))
    )


def lag_gap_stats(ds, key_col: str, ts_col: str, id_col: str,
                  num_buckets: int = 64):
    """Per-key inter-arrival (LAG) gap statistics — the SQL
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id)`` window
    reduced per key to ``(n_gaps, max_gap_us, sum_gap_us)``.

    Same bucket-then-vectorize shape as ``rolling_window_sum``: ONE
    (key, ts, id) sort per hash bucket, adjacent diffs in integer
    microseconds (exact — no float policy concerns), per-key reduction
    via a single pyarrow ``group_by`` inside the bucket (C++ hash agg,
    no per-key Python). Keys with a single event emit nothing (no gap),
    matching the SQL ``WHERE gap IS NOT NULL``. Output is
    key-cardinality-sized: (key, n_gaps, max_gap_us, sum_gap_us).
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch[key_col], num_buckets)))

    def bucket_gaps(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ts = g[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if not (pa.types.is_timestamp(ts.type) and ts.type.unit == "us"):
            ts = ts.cast(pa.timestamp("us"))
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        same_key = ~new_segment_mask(keys, n)
        gaps = np.diff(micros, prepend=micros[:1])
        t = pa.table({
            key_col: keys.filter(pa.array(same_key)),
            "gap": pa.array(gaps[same_key], pa.int64()),
        })
        r = t.group_by([key_col]).aggregate(
            [("gap", "count"), ("gap", "max"), ("gap", "sum")])
        return r.rename_columns(
            [key_col, "n_gaps", "max_gap_us", "sum_gap_us"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_gaps, batch_format="pyarrow")
    )


def range_window_sum(ds, key_col: str, ts_col: str, id_col: str,
                     value_col: str, range_us: int,
                     num_buckets: int = 64):
    """Per-key RANGE-window running sum (SQL ``SUM(v) OVER (PARTITION BY
    key ORDER BY ts RANGE BETWEEN <range> PRECEDING AND CURRENT ROW)``)
    — the time-range complement of ``rolling_window_sum``'s row window.

    SQL RANGE frames are peer-inclusive: every row sharing the current
    row's ts is in the frame (even ones sorted later), which the kernel
    reproduces with a right-side ``searchsorted``. Vectorization trick:
    after the one per-bucket (key, ts) sort, per-key segments are made
    globally monotonic by re-basing each segment's timestamps and
    spacing segments ``range_us + 1`` apart — then BOTH frame edges are
    single ``np.searchsorted`` calls over the whole bucket (no per-key
    Python). ``value_col`` must be int64 (integer sums are exact)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch[key_col], num_buckets)))

    def bucket_range(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        ts = g[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if not (pa.types.is_timestamp(ts.type) and ts.type.unit == "us"):
            ts = ts.cast(pa.timestamp("us"))
        micros = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        vals = g[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = vals.cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_key = new_segment_mask(keys, n)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(new_key, pos, 0))
        seg_id = np.cumsum(new_key) - 1
        # re-base each segment at 0 and give segment i an offset of the
        # ACTUAL spans of all earlier segments plus (range_us + 1) gaps:
        # the composite axis is globally sorted, frame edges never cross
        # a segment boundary, and — unlike charging every segment the
        # bucket-max span — the axis grows only as (total real span +
        # n_segments * range_us), which cannot reach 2^63 for any
        # physical corpus (that would need ~292k key-years per bucket)
        rebased = micros - micros[seg_start]
        starts = np.flatnonzero(new_key)
        ends = np.append(starts[1:], n)
        spans = rebased[ends - 1]  # last rebased value of each segment
        step = spans + np.int64(range_us) + 1
        # overflow guard evaluated in float64 (no wrap), with margin
        est = float(spans.sum(dtype=np.float64)) \
            + len(step) * float(range_us + 1)
        if est >= 2.0 ** 61:  # pragma: no cover - astronomical spans only
            raise ValueError(
                "range_window_sum: composite time axis would overflow "
                f"int64 (~{est:.3g} us of span+gap in one bucket); "
                "shrink the window or the per-bucket key spans")
        offsets = np.concatenate([[0], np.cumsum(step[:-1])])
        comp = rebased + offsets[seg_id]
        lo = np.searchsorted(comp, comp - range_us, side="left")
        hi = np.searchsorted(comp, comp, side="right")  # peer-inclusive
        cs0 = np.concatenate([[0], np.cumsum(v)])  # int64: exact prefix
        roll = cs0[hi] - cs0[lo]
        return pa.table({
            id_col: g[id_col],
            key_col: keys,
            "range_sum": pa.array(roll, pa.int64()),
        })

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_range, batch_format="pyarrow")
    )


def ntile_by_group(ds, group_col: str, order_col: str, id_col: str,
                   n_tiles: int, num_buckets: int = 64,
                   carry_cols: tuple[str, ...] = ()):
    """Grouped NTILE — ``NTILE(n) OVER (PARTITION BY group ORDER BY
    (order_col, id_col))`` with NULL order values excluded.

    The grouped complement of ``selection.ntile_assign`` (which handles
    ONE global ordering via boundary selection): a group lives wholly
    in one hash bucket, so the bucket-then-vectorize idiom applies —
    ONE (group, order, id) sort per bucket, segment-rebased positions,
    and NTILE's positional closed form (first ``size % n`` tiles get
    ``size // n + 1`` rows) evaluated with pure array arithmetic across
    every group in the bucket. Output: (group, id, *carry_cols, tile);
    ``carry_cols`` ride the one shuffle so downstream aggregates never
    need a corpus-sized id->value lookup.
    """
    def add_bucket(batch: pa.Table) -> pa.Table:
        cols = {group_col: batch[group_col], order_col: batch[order_col],
                id_col: batch[id_col]}
        cols.update({c: batch[c] for c in carry_cols})
        t = pa.table(cols)
        t = t.filter(pc.is_valid(t[order_col]))
        return t.append_column(
            "_bucket", pa.array(_bucket_of(t[group_col], num_buckets)))

    def bucket_ntile(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (group_col, "ascending"), (order_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[group_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # NULL group keys form their OWN partition (SQL PARTITION BY):
        # null-aware adjacency via the shared mask (nulls equal each
        # other, differ from every value)
        new_seg = new_segment_mask(keys, n)
        seg_id = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        sizes_per_seg = np.diff(np.append(starts, n))
        pos = np.arange(n) - starts[seg_id]          # 0-based within group
        size = sizes_per_seg[seg_id]
        q, r = size // n_tiles, size % n_tiles
        head = r * (q + 1)                           # rows in the big tiles
        in_head = pos < head
        tile = np.where(
            in_head,
            pos // np.maximum(q + 1, 1),
            r + (pos - head) // np.maximum(q, 1),
        ) + 1
        out = {group_col: keys, id_col: g[id_col]}
        out.update({c: g[c] for c in carry_cols})
        out["tile"] = pa.array(tile.astype(np.int64))
        return pa.table(out)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(bucket_ntile, batch_format="pyarrow"))


def lead_lag_values(ds, key_col: str, ts_col: str, id_col: str,
                    value_col: str, num_buckets: int = 64):
    """Per-row LAG/LEAD emission — SQL ``LAG(v) / LEAD(v) OVER
    (PARTITION BY key ORDER BY ts, id)`` — the row-emitting complement
    of :func:`lag_gap_stats`' aggregated gaps.

    Same bucket-then-vectorize shape: ONE (key, ts, id) sort per hash
    bucket, neighbour values gathered with a single shifted ``take``
    masked by the null-aware segment boundaries (a NULL key is its own
    partition; first/last row of a segment gets NULL). Value NULLs ride
    through untouched (LAG of a NULL value is NULL, exactly as SQL).
    NULL timestamps are dropped up front per the module convention
    (mirror with ``WHERE ts IS NOT NULL`` in the oracle)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        batch = _drop_null_ts(batch, ts_col)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch[key_col], num_buckets)))

    def bucket_ll(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            (key_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = g.take(idx)
        n = g.num_rows
        keys = g[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = g[value_col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        new_seg = new_segment_mask(keys, n)          # row starts a key
        prev_ok = ~new_seg                           # has a same-key prev
        next_ok = np.concatenate([~new_seg[1:], [False]])
        ar = np.arange(n, dtype=np.int64)
        lag = pc.if_else(pa.array(prev_ok),
                         vals.take(pa.array(np.maximum(ar - 1, 0))),
                         pa.scalar(None, vals.type))
        lead = pc.if_else(pa.array(next_ok),
                          vals.take(pa.array(np.minimum(ar + 1, n - 1))),
                          pa.scalar(None, vals.type))
        return (g.append_column("lag_" + value_col, lag)
                 .append_column("lead_" + value_col, lead))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(bucket_ll, batch_format="pyarrow")
    )
