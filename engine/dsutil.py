"""Small Dataset utilities shared across stages."""

from __future__ import annotations


def compact(ds, num_partitions: int = 16):
    """Materialize with no schema-less empty blocks.

    Ray's groupby/aggregate (and map_batches pass-through) emit empty
    blocks carrying NO schema; a downstream hash join whose partition
    receives only such blocks fails inside pyarrow ("No match ... for key
    field"). Repartitioning to <= row-count merges them away — every
    output block gets at least one row. Cost: one materialization of the
    input, so call this only on key-cardinality-bounded data (aggregate
    outputs, edge lists, label sets), never on a raw corpus.
    """
    m = ds.materialize()
    n = m.count()
    return m.repartition(max(1, min(num_partitions, n))).materialize()
