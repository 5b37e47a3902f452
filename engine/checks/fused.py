"""The rule compiler: one map_batches pass per table (SURVEY §2.2 M17).

The reference dispatches each YAML rule to its own SQL round-trip
(src/main.py:117-152 — one to four queries per rule). Running each rule
as a separate Ray Data execution repeats the table scan and pays job
overhead per rule; this module compiles every *single-table,
partial-aggregate* rule targeting the same table into ONE fused
``map_batches`` pass emitting namespaced counters, reduced by one global
aggregate — N rules for the price of one scan.

Fusable rule shapes: null, numeric/date range, no-future, allowed-values,
date-order, masking (ssn/phone/hash/leak), and FK (parent key set
broadcast per rule; the child probe joins the fused pass). Non-fusable
shapes (duplicate groupby, transform joins, two-pass outliers) run on
their dedicated paths.

Equality with the per-rule path is asserted mechanically in
tests/test_validate.py::test_fused_equals_individual.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..audit import CheckResult, CheckStatus, make_result
from .base import reduce_batches
from .core import null_builder


def _count_true(mask) -> int:
    return int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)


def _pf(rule, ctype, total, viol, details):
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(rule, ctype, status, total_rows=int(total or 0),
                       violation_count=int(viol or 0), details=details)


def _numeric_range_builder(rule):
    column = rule["column"]
    lo, hi = rule.get("min_value"), rule.get("max_value")

    def partial(batch):
        col = batch[column]
        conds = []
        if lo is not None:
            conds.append(pc.less(col, lo))
        if hi is not None:
            conds.append(pc.greater(col, hi))
        m = conds[0] if conds else None
        for c in conds[1:]:
            m = pc.or_(m, c)
        return {"total": len(col) - col.null_count,
                "viol": _count_true(m) if m is not None else 0,
                "mn": pc.min(col).as_py(), "mx": pc.max(col).as_py()}

    def finalize(agg):
        return _pf(rule, "range", agg["total"], agg["viol"],
                   {"expected_min": lo, "expected_max": hi,
                    "actual_min": str(agg["mn"]), "actual_max": str(agg["mx"])})

    return partial, {"total": "sum", "viol": "sum", "mn": "min", "mx": "max"}, \
        finalize, [column]


def _date_range_builder(rule):
    import pandas as pd

    column = rule["column"]
    lo = pd.Timestamp(rule["min_date"]).to_pydatetime() if rule.get("min_date") else None
    hi = pd.Timestamp(rule["max_date"]).to_pydatetime() if rule.get("max_date") else None

    def partial(batch):
        col = batch[column]
        conds = []
        if lo is not None:
            conds.append(pc.less(col, pa.scalar(lo)))
        if hi is not None:
            conds.append(pc.greater(col, pa.scalar(hi)))
        m = conds[0] if conds else None
        for c in conds[1:]:
            m = pc.or_(m, c)
        return {"total": len(col) - col.null_count,
                "viol": _count_true(m) if m is not None else 0}

    def finalize(agg):
        return _pf(rule, "range", agg["total"], agg["viol"],
                   {"min_date": str(rule.get("min_date")),
                    "max_date": str(rule.get("max_date"))})

    return partial, {"total": "sum", "viol": "sum"}, finalize, [column]


def _no_future_builder(rule):
    import pandas as pd

    column = rule["column"]
    cutoff = pd.Timestamp(rule.get("now", "2100-01-01")).to_pydatetime()

    def partial(batch):
        col = batch[column]
        return {"total": len(col) - col.null_count,
                "viol": _count_true(pc.greater(col, pa.scalar(cutoff)))}

    def finalize(agg):
        return _pf(rule, "range", agg["total"], agg["viol"],
                   {"check": "no_future_date",
                    "now": str(rule.get("now", "2100-01-01"))})

    return partial, {"total": "sum", "viol": "sum"}, finalize, [column]


def _allowed_values_builder(rule):
    column = rule["column"]
    value_set = pa.array(list(rule["allowed_values"]))

    def partial(batch):
        col = batch[column]
        valid = pc.is_valid(col)
        bad = pc.and_(valid, pc.invert(pc.is_in(col, value_set=value_set)))
        return {"total": len(col) - col.null_count, "viol": _count_true(bad)}

    def finalize(agg):
        return _pf(rule, "range", agg["total"], agg["viol"],
                   {"allowed_values": list(rule["allowed_values"])})

    return partial, {"total": "sum", "viol": "sum"}, finalize, [column]


def _date_order_builder(rule):
    s_col, e_col = rule["start_column"], rule["end_column"]

    def partial(batch):
        s, e = batch[s_col], batch[e_col]
        both = pc.and_(pc.is_valid(s), pc.is_valid(e))
        bad = pc.and_(both, pc.greater(s, e))
        return {"total": _count_true(both), "viol": _count_true(bad)}

    def finalize(agg):
        return _pf(rule, "range", agg["total"], agg["viol"],
                   {"start_column": s_col, "end_column": e_col})

    return partial, {"total": "sum", "viol": "sum"}, finalize, [s_col, e_col]


def _mask_builder(rule):
    column = rule["column"]
    mtype = rule.get("masking_type", "")

    if mtype in ("ssn", "phone"):
        start0 = rule.get("expected_pattern_start", 8 if mtype == "ssn" else 5) - 1
        value = rule.get("expected_pattern_value",
                         "*******" if mtype == "ssn" else "****")
        length = rule.get("expected_length", 14) if mtype == "ssn" else None

        def partial(batch):
            col = batch[column]
            valid = pc.is_valid(col)
            filled = pc.fill_null(col, "")
            if length is not None:
                tail = pc.utf8_slice_codeunits(filled, start0, 2**31 - 1)
                bad = pc.or_(pc.not_equal(pc.utf8_length(filled), length),
                             pc.not_equal(tail, value))
            else:
                window = pc.utf8_slice_codeunits(filled, start0, start0 + len(value))
                bad = pc.not_equal(window, value)
            return {"total": len(col) - col.null_count,
                    "viol": _count_true(pc.and_(valid, bad))}

        def finalize(agg):
            return _pf(rule, "masking", agg["total"], agg["viol"],
                       {"expected_start": start0 + 1, "expected_value": value,
                        "expected_length": length,
                        "validation_method": "fixed-position slice (TS-3)"})

        return partial, {"total": "sum", "viol": "sum"}, finalize, [column]

    if mtype == "hash":
        length = rule.get("expected_length", 64)

        def partial(batch):
            col = batch[column]
            valid = pc.is_valid(col)
            filled = pc.fill_null(col, "")
            bad = pc.or_(pc.not_equal(pc.utf8_length(filled), length),
                         pc.match_substring_regex(filled, "[^0-9a-fA-F]"))
            return {"total": len(col) - col.null_count,
                    "viol": _count_true(pc.and_(valid, bad))}

        def finalize(agg):
            return _pf(rule, "masking", agg["total"], agg["viol"],
                       {"expected_hash_length": length, "algorithm": "SHA-256"})

        return partial, {"total": "sum", "viol": "sum"}, finalize, [column]

    if mtype == "leak_check":
        def partial(batch):
            col = batch[column]
            valid = pc.is_valid(col)
            filled = pc.fill_null(col, "")
            tail = pc.utf8_slice_codeunits(filled, 7, 2**31 - 1)
            bad = pc.and_(pc.equal(pc.utf8_length(filled), 14),
                          pc.not_equal(tail, "*******"))
            return {"total": len(col) - col.null_count,
                    "viol": _count_true(pc.and_(valid, bad))}

        def finalize(agg):
            return _pf(rule, "masking", agg["total"], agg["viol"],
                       {"masking_type": "leak_check"})

        return partial, {"total": "sum", "viol": "sum"}, finalize, [column]

    raise ValueError(f"unknown masking_type {mtype!r}")


def _fk_builder(rule, catalog):
    """FK probe joins the fused pass; the parent key set is collected and
    broadcast up front (one small-side read per FK rule). Parents too big
    to broadcast make the rule unfusable (None) — it then runs through the
    per-rule path, where fk_check takes the distributed-join fallback."""
    import ray

    from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS

    column = rule["column"]
    parent = catalog.load(rule["parent_table"], [rule["parent_column"]])
    if parent.count() > DEFAULT_MAX_BROADCAST_KEYS:
        return None
    keys_ref = ray.put(pa.array(parent.unique(rule["parent_column"])))

    def partial(batch):
        import ray as _ray

        keys = _ray.get(keys_ref)
        col = batch[column]
        valid = pc.is_valid(col)
        orphan = pc.and_(valid, pc.invert(pc.is_in(col, value_set=keys)))
        return {"total": len(col) - col.null_count, "viol": _count_true(orphan)}

    def finalize(agg):
        status = CheckStatus.PASS if not agg["viol"] else CheckStatus.FAIL
        return make_result(rule, "foreign_key", status,
                           total_rows=int(agg["total"] or 0),
                           violation_count=int(agg["viol"] or 0),
                           details={"parent_column": rule["parent_column"],
                                    "orphan_count": int(agg["viol"] or 0)})

    return partial, {"total": "sum", "viol": "sum"}, finalize, [column]


def builder_for(ctype: str, rule: dict, catalog) -> Optional[tuple]:
    """Return (partial, spec, finalize, columns) if the rule is fusable."""
    try:
        if ctype == "null":
            return null_builder(rule)
        if ctype == "masking":
            return _mask_builder(rule)
        if ctype == "range":
            sub = rule.get("check_type", "range")
            if sub in ("range", "positive"):
                return _numeric_range_builder(rule)
            if sub == "date_range":
                return _date_range_builder(rule)
            if sub == "no_future":
                return _no_future_builder(rule)
            if sub == "allowed_values":
                return _allowed_values_builder(rule)
            if sub == "date_order":
                return _date_order_builder(rule)
            if sub == "foreign_key" and not isinstance(rule["column"], (list, tuple)):
                return _fk_builder(rule, catalog)
        return None
    except KeyError:
        return None  # malformed rule -> individual path raises the real error


def run_fused_table(catalog, table: str, entries: list) -> list[tuple[int, CheckResult]]:
    """One scan of ``table`` evaluating every fusable rule on it.

    ``entries``: list of (order_idx, ctype, rule, builder_tuple).
    Returns (order_idx, CheckResult) pairs.
    """
    columns = sorted({c for _, _, _, b in entries for c in b[3]})
    ds = catalog.load(table, columns)

    def fused_partial(batch: pa.Table) -> dict:
        out = {}
        for idx, _, _, (partial, _, _, _) in entries:
            for k, v in partial(batch).items():
                out[f"r{idx}::{k}"] = v
        return out

    spec = {}
    for idx, _, _, (_, s, _, _) in entries:
        for k, mode in s.items():
            spec[f"r{idx}::{k}"] = mode

    agg = reduce_batches(ds, fused_partial, spec)

    results = []
    for idx, _, rule, (_, s, finalize, _) in entries:
        sub = {k: agg[f"r{idx}::{k}"] for k in s}
        results.append((idx, finalize(sub)))
    return results
