"""As-of (temporal) join — an operator Ray Data lacks natively.

``asof_join(left, right, ...)``: for every left row, find the single
right row with the same key and the greatest right timestamp <= the left
timestamp (the "latest state as of this event" join used for joining an
event stream against a slowly-changing table).

Physical plan (documented partitioning assumption: one key-hash bucket's
rows fit in one worker — the session-window / dedup regime):

1. tag + project both sides to (key, ts, side, id/value) and union —
   a metadata-thin stream, never the full payload;
2. ONE groupby shuffle on ``hash(key) % num_buckets``;
3. per bucket: ONE vectorized sort by (key, ts, side) — right rows sort
   before left rows at equal (key, ts) so a left row matches a same-ts
   right row (inclusive semantics) — then a forward-fill of the last
   right position via running maximum, reset at key boundaries. No
   per-key Python.

Ties on (key, right_ts) must be resolved by the caller (e.g. keep the
max id per (key, ts) first) — same requirement DuckDB's ASOF JOIN has
for deterministic output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import new_segment_mask
from .windows import _bucket_of


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    left_ts_col: str,
    right_ts_col: str,
    left_id_col: str,
    right_value_col: str,
    num_buckets: int = 64,
    left_id_type: pa.DataType | None = None,
    right_value_type: pa.DataType | None = None,
    right_ties: str = "error",
    direction: str = "backward",
    max_local_rows: int | None = None,
):
    """Dataset -> Dataset (left_id, key, matched right_value or null).

    ``direction``: ``"backward"`` (default) matches the LATEST right row
    with ``right_ts <= left_ts``; ``"forward"`` matches the EARLIEST
    right row with ``right_ts >= left_ts`` — implemented by negating the
    microsecond axis on both sides, so forward inherits backward's
    bucketing/sort/forward-fill machinery unchanged (with
    ``right_ties="max_value"`` still resolving same-(key, ts) ties to
    the greatest value).

    Timestamps are compared in microseconds; date/timestamp columns of
    any unit are normalized first. The left-id and right-value columns
    keep their own types — ids and values of any Arrow type work, not
    just int64. Pass ``left_id_type``/``right_value_type`` when known:
    deriving them calls ``Dataset.schema()``, which EXECUTES a lazy
    input pipeline once just to learn the type (lazy Datasets re-execute
    per consumer), so explicit types save a full extra pass over derived
    inputs.

    ``right_ties``: what to do when several right rows share (key, ts) —
    ``"error"`` (default) keeps the documented caller-must-dedup
    contract; ``"max_value"`` resolves ties to the greatest
    ``right_value_col`` IN the per-bucket sort (one extra ascending sort
    key — the forward-fill's running positional max then lands on the
    max-value row) — equivalent to pre-aggregating the right side with
    ``max(value) per (key, ts)`` but WITHOUT that groupby's all-to-all
    shuffle. Requires an orderable value type."""
    if right_ties not in ("error", "max_value"):
        raise ValueError(right_ties)
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    if left_id_type is None:
        left_id_type = dict(zip(left_ds.schema().names,
                                left_ds.schema().types))[left_id_col]
    if right_value_type is None:
        right_value_type = dict(zip(right_ds.schema().names,
                                    right_ds.schema().types))[right_value_col]
    lid_type, rval_type = left_id_type, right_value_type

    def _micros(col) -> pa.Array:
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_date(col.type):
            col = col.cast(pa.timestamp("us"))
        elif not (pa.types.is_timestamp(col.type) and col.type.unit == "us"):
            col = col.cast(pa.timestamp("us"))
        us = col.cast(pa.int64())
        # forward = backward on the negated time axis
        return pc.negate_checked(us) if direction == "forward" else us

    _NULL_TS = np.iinfo(np.int64).min + 1  # sorts before every real ts

    def tag_left(batch: pa.Table) -> pa.Table:
        key = batch[key_col]
        n = batch.num_rows
        # SQL's inequality never holds for a NULL left timestamp, but
        # the LEFT-join contract still emits the row: a -inf sentinel
        # sorts it before every right row of its key (on the negated
        # forward axis too), so the forward-fill finds nothing and the
        # row comes out unmatched — no extra passthrough scan needed
        ts = pc.fill_null(_micros(batch[left_ts_col]),
                          pa.scalar(_NULL_TS, pa.int64()))
        lid = batch[left_id_col]
        if isinstance(lid, pa.ChunkedArray):
            lid = lid.combine_chunks()
        return pa.table({
            "key": key,
            "ts": ts,
            "side": pa.array(np.ones(n, np.int8)),   # left sorts after right
            "left_id": lid.cast(lid_type),  # pin type (all-null blocks)
            "rval": pa.nulls(n, rval_type),
            "_bucket": pa.array(_bucket_of(key, num_buckets)),
        })

    def tag_right(batch: pa.Table) -> pa.Table:
        # a null-ts right row can never satisfy the inequality: drop it
        # (sorted at_end it would otherwise be forward-filled as the
        # "latest" right row of its key); a null-KEY right row can never
        # satisfy the equality (SQL NULL = NULL is not true) — drop it
        # too, so null-key LEFT rows (their own segment below) stay
        # unmatched rather than pairing with null-key right rows
        batch = batch.filter(pc.and_(pc.is_valid(batch[right_ts_col]),
                                     pc.is_valid(batch[key_col])))
        key = batch[key_col]
        n = batch.num_rows
        rv = batch[right_value_col]
        if isinstance(rv, pa.ChunkedArray):
            rv = rv.combine_chunks()
        return pa.table({
            "key": key,
            "ts": _micros(batch[right_ts_col]),
            "side": pa.array(np.zeros(n, np.int8)),
            "left_id": pa.nulls(n, lid_type),
            # cast pins the declared type even when a whole block's
            # values are null (an untyped null column would make this
            # block's schema diverge and break the local-path concat)
            "rval": rv.cast(rval_type),
            "_bucket": pa.array(_bucket_of(key, num_buckets)),
        })

    lt = left_ds.map_batches(tag_left, batch_format="pyarrow")
    rt = right_ds.map_batches(tag_right, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        sort_keys = [("key", "ascending"), ("ts", "ascending"),
                     ("side", "ascending")]
        if right_ties == "max_value":
            # right rows (side=0) tie-sorted ascending by value: the
            # positional running max picks the LAST right row at equal
            # (key, ts) = the max value; left rows all sort after them
            # at the same ts, so their rval order is irrelevant. A
            # validity key sorts NULL rvals FIRST so a null in a tied
            # group never shadows the max (SQL max() ignores nulls;
            # all-null groups still resolve to null)
            g = g.append_column(
                "_rvalid", pc.cast(pc.is_valid(g["rval"]), pa.int8()))
            sort_keys += [("_rvalid", "ascending"), ("rval", "ascending")]
        idx = pc.sort_indices(g, sort_keys=sort_keys)
        g = g.take(idx)
        n = g.num_rows
        keys = g["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        side = g["side"].to_numpy(zero_copy_only=False)
        # null-aware boundaries: null-key left rows form their own
        # segment (all right rows with null keys were dropped at tag
        # time), so they forward-fill nothing and emit unmatched — the
        # SQL LEFT-join result for a key that equals nothing
        new_key = new_segment_mask(keys, n)
        pos = np.arange(n)
        # forward-fill the most recent RIGHT row position within each key:
        # right rows carry their own position, key starts reset to a
        # sentinel; running max propagates the latest right row downward
        marker = np.where(side == 0, pos, -1)
        # segment-aware running max: offset positions by a per-key base so
        # maxima never leak across keys, then subtract the base back out
        seg_id = np.cumsum(new_key) - 1
        base = seg_id * np.int64(n + 1)
        filled = np.maximum.accumulate(np.where(marker >= 0,
                                                marker + base, -1))
        last_right = np.where(filled - base >= 0, filled - base, -1)
        valid_seg = filled >= base  # a right row seen in THIS key segment
        left_rows = side == 1
        match_pos = last_right[left_rows]
        have = valid_seg[left_rows] & (match_pos >= 0)
        # type-generic gather: take the matched right row's value through
        # Arrow (null index -> null output), no numpy dtype round-trip
        idx = pa.array(np.clip(match_pos, 0, n - 1).astype(np.int64),
                       mask=~have)
        rv = g["rval"]
        if isinstance(rv, pa.ChunkedArray):
            rv = rv.combine_chunks()
        sel = pa.array(np.flatnonzero(left_rows))
        return pa.table({
            "left_id": g["left_id"].take(sel),
            "key": keys.take(sel),
            "matched_value": rv.take(idx),
        })

    import ray
    import ray.data as rd

    from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS

    if max_local_rows is None:
        max_local_rows = DEFAULT_MAX_BROADCAST_KEYS

    # materialize the TAGGED union (metadata-thin: key, ts, side, id,
    # value, bucket — never the full payload) once: count() is then free,
    # and Ray 2.49 re-derives lazy inputs around the groupby sort's
    # sampling pass, so the distributed path wants the barrier anyway
    # (same measured win as the near-dedup band rows)
    tagged = lt.union(rt).materialize()
    n_tagged = tagged.count()
    if n_tagged <= max_local_rows:
        # size-guarded local path (the FK broadcast/distributed split):
        # the merge kernel is bucket-agnostic — ONE global (key, ts,
        # side) sort over the collected tagged rows produces exactly the
        # per-bucket outputs, without the shuffle's fixed cost
        tabs = [t for t in ray.get(tagged.to_arrow_refs()) if t.num_rows]
        if not tabs:
            sch = tagged.schema()  # free on a materialized dataset
            key_type = (dict(zip(sch.names, sch.types)).get("key")
                        if sch is not None else None) or pa.null()
            return rd.from_arrow(pa.table({
                "left_id": pa.array([], lid_type),
                "key": pa.array([], key_type),
                "matched_value": pa.array([], rval_type)}))
        return rd.from_arrow(
            merge(pa.concat_tables(tabs).combine_chunks()))
    return tagged.groupby("_bucket").map_groups(
        merge, batch_format="pyarrow")
