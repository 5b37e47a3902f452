"""Reference-parity data-quality checks as Ray Data operators.

Each function mirrors one checker of the reference
(src/checker/{count,null,duplicate,range,transform,masking}_checker.py)
with identical status semantics (see engine/audit.py), but executes as
streaming Ray Data aggregates: one vectorized ``map_batches`` pass emitting
per-batch partial counters, reduced by a tiny global aggregate — the
partial+final pattern the reference hand-rolled for TS-1 chunked counting
(src/db_connector.py:151-189), which Ray Data gives natively.
"""

from .extra import (
    allowed_values_check,
    composite_fk_check,
    date_order_check,
    duplicate_rate_stats,
    hierarchy_cycle_check,
    soft_delete_check,
)
from .core import (
    count_check,
    date_range_check,
    duplicate_check,
    existence_check,
    fk_check,
    hash_format_check,
    join_compare_check,
    leak_check,
    mask_format_check,
    no_future_check,
    null_check,
    numeric_range_check,
    outlier_check,
)

__all__ = [
    "allowed_values_check",
    "composite_fk_check",
    "date_order_check",
    "duplicate_rate_stats",
    "hierarchy_cycle_check",
    "soft_delete_check",
    "count_check",
    "date_range_check",
    "duplicate_check",
    "existence_check",
    "fk_check",
    "hash_format_check",
    "join_compare_check",
    "leak_check",
    "mask_format_check",
    "no_future_check",
    "null_check",
    "numeric_range_check",
    "outlier_check",
]
