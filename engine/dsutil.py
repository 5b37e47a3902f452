"""Small Dataset utilities shared across stages."""

from __future__ import annotations

# single source of truth for "is this side small enough to broadcast":
# used by fk_check, the fused FK builder, composite-FK/soft-delete and
# the cross-table date-order query — one knob, no divergence between the
# fused and per-rule strategies
DEFAULT_MAX_BROADCAST_KEYS = 2_000_000


def join_partitions(cap: int = 64) -> int:
    """Hash-join partition count sized to the cluster: Ray's hash-shuffle
    join runs an aggregator pool scaled to num_partitions, and asking for
    far more partitions than CPUs (e.g. 32 partitions on a 4-CPU session)
    starves the pool and hangs the join. 4 partitions per CPU, capped."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(cap, cpus * 4))


def compact(ds, num_partitions: int = 16):
    """Materialize with no empty blocks.

    ANY empty block on either side of Ray's hash join — schema-less ones
    from groupby/aggregate AND schema-ful zero-row ones from a filtering
    map_batches — poisons the join aggregator ("No match ... for key
    field"; empirically verified: zero-row *partitions* are fine, empty
    *blocks* are not). Repartitioning to <= row-count merges them away —
    every output block gets at least one row. Cost: one materialization
    of the input, so call this only on key-cardinality-bounded data
    (aggregate outputs, edge lists, label sets), never on a raw corpus
    (corpus reads of nonempty parquet have no empty blocks).
    """
    m = ds.materialize()
    n = m.count()
    return m.repartition(max(1, min(num_partitions, n))).materialize()


DEFAULT_KEY_BUCKETS = 256  # coarse shuffle keys for bucketed groupbys


def new_segment_mask(keys, n: int):
    """Per-row "starts a new key segment" boolean mask over a SORTED key
    column — NULL-aware: NULL keys form their OWN single partition
    (matching SQL ``PARTITION BY`` / ``GROUP BY``, where NULLs group with
    each other and with nothing else). Plain ``pc.not_equal`` yields null
    at every null boundary, and ``astype(bool)`` silently turns that into
    "same segment" — merging null-key rows into the preceding key's frame
    AND merging the first real key after a null run (verified: a second
    comparison against a null is null too). ``pc.sort_indices`` places
    nulls contiguously (at_end), so one adjacent compare suffices."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if n <= 1:
        return np.ones(n, dtype=bool)
    a, b = keys.slice(1, n - 1), keys.slice(0, n - 1)
    same = pc.or_kleene(
        pc.fill_null(pc.equal(a, b), False),
        pc.and_(pc.is_null(a), pc.is_null(b)))
    return np.concatenate(
        [[True], ~same.to_numpy(zero_copy_only=False).astype(bool)])


def key_bucket(t, columns, num_buckets: int):
    """Deterministic coarse bucket of a multi-column key: per-column
    64-bit hashes (ints direct, strings via the vectorized FNV kernel,
    everything else through a string cast) mixed and folded. The shared
    primitive behind duplicate_check, existence_check and
    stages.aggregates.bucketed_groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .stages.sketches import _hash64_ints, _hash64_strings

    h = np.full(t.num_rows, np.uint64(0x9E3779B97F4A7C15), dtype=np.uint64)
    for c in columns:
        col = t[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_date32(col.type):
            col = col.cast(pa.int32())
        elif pa.types.is_temporal(col.type):
            col = col.cast(pa.int64())
        if pa.types.is_integer(col.type):
            # fill nulls BEFORE to_numpy: a null-bearing int column
            # otherwise converts via float64, which rounds keys >= 2^53
            # and gives nulls a platform-dependent value — the same key
            # would bucket differently depending on batch composition
            hc = _hash64_ints(pc.fill_null(col.cast(pa.int64()), 0)
                              .to_numpy(zero_copy_only=False))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hc = _hash64_strings(pc.fill_null(col, ""))
        else:
            hc = _hash64_strings(pc.fill_null(pc.cast(col, pa.string()), ""))
        h = (h * np.uint64(0x100000001B3)) ^ hc
    return ((h >> np.uint64(3)) % np.uint64(num_buckets)).astype(np.int64)


def null_key_companion(t, col: str, flag: str = "_knull"):
    """Encode a possibly-null STRING group key for a Ray groupby: Ray
    2.49's sort shuffle crashes on a null-bearing string key (numpy
    object-compare of None < str inside the range partitioner), while
    SQL GROUP BY keeps NULL as a real group. Fill with "" and add a
    boolean companion column; group by ``[col, flag]`` (composite keys
    with no nulls shuffle fine), then invert with
    :func:`restore_null_key`. The pair ("", False) and ("", True) stay
    distinct groups, so a REAL empty string never collides with NULL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = t[col]
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    isn = pc.is_null(k)
    i = t.schema.get_field_index(col)
    return (t.set_column(i, col, pc.fill_null(k, ""))
            .append_column(flag, isn))


def restore_null_key(t, col: str, flag: str = "_knull"):
    """Invert :func:`null_key_companion` after the groupby: rows whose
    companion flag is true get their NULL key back; the flag drops."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = t[col]
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    isn = t[flag]
    if isinstance(isn, pa.ChunkedArray):
        isn = isn.combine_chunks()
    i = t.schema.get_field_index(col)
    restored = pc.if_else(isn, pa.scalar(None, k.type), k)
    return t.set_column(i, col, restored).drop_columns([flag])


def bucketed_key_merge(ds, key_cols, sum_cols, num_buckets: int = 256):
    """Exact per-key sums WITHOUT a key-cardinality Ray Aggregate.

    The repo-standard rewrite (order_total_reconciliation and five
    sibling queries measured Ray's sort-based Aggregate at ~85k rows/s
    on key-cardinality inputs, 3-20x slower than this shape): hash the
    key into ``num_buckets`` coarse buckets, ONE int-keyed shuffle
    co-locates each key, and a per-bucket Arrow ``group_by`` does the
    merge vectorized. Input should already be per-block partials (the
    caller's combiner) so shuffle volume is distinct-keys-per-block.
    NULL keys hash to the sentinel bucket and form one group per the
    Arrow group_by (SQL GROUP BY semantics). Returns a Dataset with
    ``key_cols + sum_cols`` (sums aliased back to their input names).
    """
    import numpy as np
    import pyarrow as pa

    from .stages.windows import _bucket_of

    keys = list(key_cols) if isinstance(key_cols, (list, tuple)) \
        else [key_cols]
    sums = list(sum_cols)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = _bucket_of(b[keys[0]], num_buckets).astype(np.uint64)
        for k in keys[1:]:
            h = h * np.uint64(0x9E3779B97F4A7C15) + \
                _bucket_of(b[k], num_buckets).astype(np.uint64)
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(num_buckets))
                                .astype(np.int64)))

    def merge(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        out = g.group_by(keys).aggregate([(c, "sum") for c in sums])
        return out.rename_columns(keys + sums)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(merge, batch_format="pyarrow"))
