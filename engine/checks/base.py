"""Partial-aggregate plumbing shared by all checks.

Pattern: ``map_batches`` emits a one-row Arrow table of partial counters
per batch; a global ``Dataset.aggregate`` (Sum/Min/Max) reduces them.
This is the distributed generalization of the reference's TS-1 chunked
count — partition, partial-aggregate, final sum (src/db_connector.py:
151-189, README.md:143-146: 45 s -> 13 s on 1M rows).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa


def reduce_batches(ds, partial_fn: Callable[[pa.Table], dict], spec: dict[str, str]) -> dict:
    """One streaming pass: per-batch partials -> global reduction.

    ``partial_fn`` maps a batch to ``{name: scalar}``;
    ``spec`` maps each name to one of "sum" | "min" | "max".
    Returns the reduced dict (None where every partial was null).
    """
    from ray.data.aggregate import Max, Min, Sum

    def emit(batch: pa.Table) -> pa.Table:
        d = partial_fn(batch)
        return pa.table({k: [d.get(k)] for k in spec})

    partials = ds.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    aggs = []
    for name, mode in spec.items():
        if mode == "sum":
            aggs.append(Sum(name, alias_name=name))
        elif mode == "min":
            aggs.append(Min(name, alias_name=name))
        elif mode == "max":
            aggs.append(Max(name, alias_name=name))
        else:
            raise ValueError(f"unknown reduction {mode!r}")
    out = partials.aggregate(*aggs)
    return {k: out.get(k) for k in spec}


def nonnull_count(batch_col) -> int:
    import pyarrow.compute as pc

    return len(batch_col) - batch_col.null_count if hasattr(batch_col, "null_count") else int(
        pc.sum(pc.is_valid(batch_col)).as_py() or 0
    )
