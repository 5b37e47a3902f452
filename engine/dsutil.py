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
