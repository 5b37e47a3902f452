"""Incremental EXACT dedup: flag new docs whose content key already
exists in a persisted key index, or that duplicate a smaller-id doc
within the same incoming shard.

The exact-match counterpart of :mod:`engine.stages.neardup_incremental`
(same production shape: a large corpus is deduped once; each incoming
shard — a small fraction of corpus size — must be checked against
everything kept PLUS itself without re-reading the corpus). The index
is simply the key column of the kept corpus
(``ds.select_columns([key_col])`` written to parquet): no shuffle to
build, one streaming projection.

Semantics (deterministic; reference scope:
src/checker/duplicate_checker.py:17-56, which re-scans the whole table
per ingest — here the corpus pays one key-column stream, no re-read):

- every indexed key is an ANCHOR: new rows matching it are flagged;
- within purely-new duplicate groups the minimum id is kept;
- NULL keys never participate (never flagged) — matching
  :mod:`engine.stages.dedup`.

Scale shape: the INDEX is never broadcast and never shuffled — it is
streamed ONCE against the broadcast shard key set (shard-key-sized,
guarded). A shard whose distinct-key set outgrows the broadcast guard
takes the distributed path: thin (key, id, is_new) rows, one bucketed
groupby, vectorized per-bucket resolve.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS, new_segment_mask

# driver-heap budget for the broadcast shard key set (collected once +
# one ray.put copy); beyond it the thin-row distributed path runs
_BROADCAST_KEY_BUDGET_BYTES = 2 << 30


def _all_false(ds):
    return ds.map_batches(
        lambda b: b.append_column(
            "dup_flag", pa.array(np.zeros(b.num_rows, bool))),
        batch_format="pyarrow")


def _shard_partials(key_col: str, id_col: str):
    """Per-batch distinct (key, min_id, n) — the combiner that bounds
    what leaves each block at the batch's distinct-key count."""
    def f(b: pa.Table) -> pa.Table:
        t = pa.table({"key": b[key_col], "id": b[id_col]})
        t = t.filter(pc.is_valid(t["key"]))
        if t.num_rows == 0:
            return pa.table({"key": t["key"], "min_id": t["id"],
                             "n": pa.array([], pa.int64())})
        idx = pc.sort_indices(
            t, sort_keys=[("key", "ascending"), ("id", "ascending")])
        s = t.take(idx)
        keys = s["key"].combine_chunks()
        starts = np.flatnonzero(new_segment_mask(keys, len(keys)))
        counts = np.diff(np.r_[starts, len(keys)])
        take = pa.array(starts, pa.int64())
        return pa.table({"key": keys.take(take),
                         "min_id": s["id"].combine_chunks().take(take),
                         "n": pa.array(counts, pa.int64())})
    return f


def _resolve_bucket_incremental(g: pa.Table) -> pa.Table:
    """Per bucket (distributed path): emit loser NEW ids. Rows sorted by
    (key, is_new, id) put anchor rows first in each key segment, then
    new rows in ascending id — so a segment's first NEW row is the
    keeper unless an anchor precedes it."""
    if g.num_rows == 0:
        return pa.table({"id": g["id"]})
    idx = pc.sort_indices(g, sort_keys=[
        ("key", "ascending"), ("is_new", "ascending"), ("id", "ascending")])
    s = g.take(idx)
    keys = s["key"].combine_chunks()
    is_new = s["is_new"].to_numpy(zero_copy_only=False).astype(bool)
    bound = new_segment_mask(keys, len(keys))
    seg_id = np.cumsum(bound) - 1
    nseg = int(seg_id[-1]) + 1
    any_old = np.zeros(nseg, bool)
    np.logical_or.at(any_old, seg_id, ~is_new)
    # first NEW row per segment (rows in-order: old first, new by id)
    prev_new = np.r_[False, is_new[:-1]]
    first_new = is_new & (bound | ~prev_new)
    loser = is_new & (any_old[seg_id] | ~first_new)
    return pa.table({"id": s["id"].combine_chunks().filter(pa.array(loser))})


def mark_new_exact_duplicates(
    new_ds,
    index_key_ds,
    key_col: str = "key",
    id_col: str = "doc_id",
    max_broadcast_keys: int | None = None,
    num_buckets: int = 256,
):
    """Shard Dataset -> shard Dataset with ``dup_flag`` appended
    (True = drop: the row's key exists in the index, or a smaller-id
    shard row carries the same key). ``index_key_ds`` needs only a
    ``key`` column (duplicate index keys are harmless — membership
    only). Key spaces need not be disjoint in ids; ids must be unique
    within the shard."""
    import ray

    if max_broadcast_keys is None:
        max_broadcast_keys = DEFAULT_MAX_BROADCAST_KEYS

    part_ds = new_ds.map_batches(
        _shard_partials(key_col, id_col), batch_format="pyarrow",
    ).materialize()
    # row guard AND byte guard: with whole-content keys (the default in
    # pipelines/ingest.py) a 2M-row key set can still be gigabytes —
    # size_bytes() is metadata on a materialized dataset
    if (part_ds.count() > max_broadcast_keys
            or (part_ds.size_bytes() or 0) > _BROADCAST_KEY_BUDGET_BYTES):
        return _mark_distributed(new_ds, index_key_ds, key_col, id_col,
                                 max_broadcast_keys, num_buckets)

    tabs = [t for t in ray.get(part_ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return _all_false(new_ds)
    merged = (pa.concat_tables(tabs).combine_chunks()
              .group_by("key").aggregate([("min_id", "min"), ("n", "sum")]))
    shard_keys = merged["key"].combine_chunks()

    # stream the index ONCE against the broadcast shard key set
    key_ref = ray.put(shard_keys)

    def index_hits(batch: pa.Table) -> pa.Table:
        keys = batch["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        hit = pc.is_in(keys, value_set=ray.get(key_ref))
        return pa.table({"key": pc.unique(keys.filter(hit))})

    hit_tabs = [t for t in ray.get(
        index_key_ds.map_batches(index_hits, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    idx_hits = (pc.unique(pa.concat_tables(hit_tabs)["key"].combine_chunks())
                if hit_tabs else shard_keys.slice(0, 0))

    dup_grp = merged.filter(pc.greater(merged["n_sum"], 1))
    if len(idx_hits) == 0 and dup_grp.num_rows == 0:
        return _all_false(new_ds)
    hits_ref = ray.put(idx_hits)
    dup_ref = ray.put((dup_grp["key"].combine_chunks(),
                       dup_grp["min_id_min"].combine_chunks()))

    def flag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        f_idx = pc.is_in(keys, value_set=ray.get(hits_ref))
        dk, dmin = ray.get(dup_ref)
        f = f_idx
        if len(dk):
            pos = pc.index_in(keys, value_set=dk)
            min_for_row = dmin.take(pc.fill_null(pos, 0))
            in_dup = pc.is_valid(pos)
            not_min = pc.not_equal(batch[id_col], min_for_row)
            f = pc.or_(f, pc.and_(in_dup, pc.fill_null(not_min, True)))
        return batch.append_column("dup_flag", pc.fill_null(f, False))

    return new_ds.map_batches(flag, batch_format="pyarrow")


def _mark_distributed(new_ds, index_key_ds, key_col: str, id_col: str,
                      max_broadcast_keys: int, num_buckets: int):
    """Thin-row bucketed path for shards beyond the broadcast guard:
    union (key, id, is_new) rows — the index ships key-only rows —
    ONE groupby on hash(key) % num_buckets, vectorized resolve."""
    import ray

    from ..dsutil import key_bucket

    def new_rows(b: pa.Table) -> pa.Table:
        t = pa.table({"key": b[key_col], "id": b[id_col],
                      "is_new": pa.array(np.ones(b.num_rows, bool))})
        return t.filter(pc.is_valid(t["key"]))

    # derive the id type from the materialized thin rows (schema() is
    # free on a materialized dataset; never peek a lazy one)
    new_thin = new_ds.map_batches(new_rows,
                                  batch_format="pyarrow").materialize()
    sch = new_thin.schema()  # ray.data.Schema: parallel names/types lists
    id_type = sch.types[sch.names.index("id")]

    def idx_rows(b: pa.Table) -> pa.Table:
        keys = b["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        keys = keys.filter(pc.is_valid(keys))
        n = len(keys)
        return pa.table({"key": keys, "id": pa.nulls(n, id_type),
                         "is_new": pa.array(np.zeros(n, bool))})

    union = new_thin.union(
        index_key_ds.map_batches(idx_rows, batch_format="pyarrow"))
    bucketed = union.map_batches(
        lambda b: b.append_column("_b", pa.array(
            key_bucket(b, ["key"], num_buckets))),
        batch_format="pyarrow")
    losers_ds = bucketed.groupby("_b").map_groups(
        lambda g: _resolve_bucket_incremental(g.drop_columns(["_b"])),
        batch_format="pyarrow").materialize()
    n_losers = losers_ds.count()
    if n_losers == 0:
        return _all_false(new_ds)
    if n_losers > max_broadcast_keys:
        raise ValueError(
            f"shard has {n_losers} duplicate rows, above "
            f"max_broadcast_keys={max_broadcast_keys}: run the one-shot "
            "stages.dedup.mark_duplicates over (kept corpus + shard) "
            "instead")
    loser_ids = pc.unique(pa.concat_tables(
        [t for t in ray.get(losers_ds.to_arrow_refs()) if t.num_rows]
    )["id"].combine_chunks())
    ref = ray.put(loser_ids)

    def flag(batch: pa.Table) -> pa.Table:
        f = pc.is_in(batch[id_col], value_set=ray.get(ref))
        return batch.append_column("dup_flag", pc.fill_null(f, False))

    return new_ds.map_batches(flag, batch_format="pyarrow")
