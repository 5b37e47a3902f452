"""The reference's six checkers as streaming Ray Data operators.

Every function returns a ``CheckResult`` with the reference's exact status
semantics; file:line citations point at the reference implementation being
re-expressed (never copied — execution is Arrow-vectorized partial
aggregation, not SQL).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import DEFAULT_KEY_BUCKETS as _DUP_NUM_BUCKETS, key_bucket as _key_bucket
from ..audit import (
    CheckResult,
    CheckStatus,
    aggregate_compare_status,
    count_compare_status,
    make_result,
    threshold_status,
)
from .base import reduce_batches


def _rule(rule: Optional[dict], **defaults) -> dict:
    out = dict(defaults)
    out.update(rule or {})
    return out


# ---------------------------------------------------------------------------
# NullChecker — src/checker/null_checker.py:36-118 (TS-2 empty-string mode)
# ---------------------------------------------------------------------------

def null_builder(rule: dict):
    """(partial, spec, finalize, columns) for the fused rule compiler."""
    column = rule["column"]
    include_empty_string = rule.get("include_empty_string", False)
    max_null_ratio = rule.get("max_null_ratio", 0.0)

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        nulls = col.null_count
        d = {"total": batch.num_rows, "pure_null": nulls, "empty": 0}
        if include_empty_string:
            trimmed = pc.utf8_trim_whitespace(pc.fill_null(col, "x"))
            d["empty"] = int(pc.sum(pc.equal(trimmed, "").cast(pa.int64())).as_py() or 0)
        return d

    def finalize(agg: dict) -> CheckResult:
        total = int(agg["total"] or 0)
        if total == 0:
            return make_result(rule, "null", CheckStatus.WARNING,
                               details={"message": "table is empty"})
        null_count = int(agg["pure_null"] or 0) + int(agg["empty"] or 0)
        ratio = null_count / total
        details = {
            "max_null_ratio": max_null_ratio,
            "actual_null_ratio": round(ratio, 6),
            "include_empty_string": include_empty_string,
        }
        if include_empty_string:
            details["pure_null_count"] = int(agg["pure_null"] or 0)
            details["empty_string_count"] = int(agg["empty"] or 0)
        return make_result(rule, "null", threshold_status(ratio, max_null_ratio),
                           total_rows=total, violation_count=null_count,
                           details=details)

    return partial, {"total": "sum", "pure_null": "sum", "empty": "sum"}, finalize, [column]


def null_check(
    ds,
    column: str,
    max_null_ratio: float = 0.0,
    include_empty_string: bool = False,
    rule: Optional[dict] = None,
) -> CheckResult:
    """NULL(-or-blank) ratio vs threshold; tri-state PASS/WARNING/FAIL."""
    rule = _rule(rule, rule_id="NULL", description="null check", column=column,
                 max_null_ratio=max_null_ratio,
                 include_empty_string=include_empty_string)
    partial, spec, finalize, _ = null_builder(rule)
    return finalize(reduce_batches(ds, partial, spec))


# ---------------------------------------------------------------------------
# CountChecker — src/checker/count_checker.py:39-116 (TS-1 chunking is native)
# ---------------------------------------------------------------------------

def count_check(
    source_ds,
    target_ds,
    threshold: float = 0.0,
    rule: Optional[dict] = None,
    source_count: Optional[int] = None,
    target_count: Optional[int] = None,
) -> CheckResult:
    """Source-vs-target row-count compare (counts may be precomputed, the
    analogue of the reference's custom count queries, count_checker.py:50-52)."""
    rule = _rule(rule, rule_id="CNT", description="count compare")
    sc = source_count if source_count is not None else source_ds.count()
    tc = target_count if target_count is not None else target_ds.count()
    status, diff_ratio = count_compare_status(sc, tc, threshold)
    return make_result(
        rule, "count", status,
        total_rows=sc, violation_count=abs(sc - tc),
        details={"source_count": sc, "target_count": tc,
                 "diff_ratio": round(diff_ratio, 6), "threshold": threshold},
    )


# ---------------------------------------------------------------------------
# DuplicateChecker — src/checker/duplicate_checker.py:79-160
# ---------------------------------------------------------------------------

def duplicate_check(
    ds,
    columns: Sequence[str],
    rule: Optional[dict] = None,
    sample_limit: int = 10,
    total_rows: Optional[int] = None,
    hash_keys: Sequence[str] = (),
) -> CheckResult:
    """GROUP BY columns: dup_groups = #groups with cnt>1,
    dup_rows = SUM(cnt-1); rows with NULL in any key column are excluded.

    ``hash_keys``: key columns replaced by their sha256 hex BEFORE the
    groupby — pass wide content columns here so the shuffle moves 64 B per
    key instead of full text (same counts; samples then show hashes).
    """
    rule = _rule(rule, rule_id="DUP", description="duplicate check",
                 column=",".join(columns))
    columns = list(columns)
    hash_keys = list(hash_keys)
    total = total_rows if total_rows is not None else ds.count()

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        t = batch.select(columns)
        mask = None
        for c in columns:
            v = pc.is_valid(t[c])
            mask = v if mask is None else pc.and_(mask, v)
        t = t.filter(mask)
        for c in hash_keys:
            from ..stages.heuristics import _sha256_column
            from ..stages.textfeat import byte_view

            data, offsets = byte_view(t[c])
            t = t.set_column(t.column_names.index(c), c,
                             _sha256_column(data, offsets, t[c]))
        # local combiner: collapse same-key rows inside the batch before
        # the shuffle, then coarse-bucket so the exchange moves ONE small
        # int key (Ray's sort-aggregate on the raw key columns measured
        # 4x slower than bucket + vectorized in-bucket counting here)
        tg = t.group_by(columns).aggregate([([], "count_all")])
        tg = tg.rename_columns(columns + ["cnt_part"])
        return tg.append_column(
            "_b", pa.array(_key_bucket(tg, columns, _DUP_NUM_BUCKETS)))

    def bucket_count(group: pa.Table) -> pa.Table:
        t = group.drop_columns(["_b"])
        out = t.group_by(columns).aggregate([("cnt_part", "sum")])
        out = out.rename_columns(columns + ["cnt"])
        return out.set_column(len(columns), "cnt",
                              pc.cast(out["cnt"], pa.int64()))

    grouped = (
        ds.map_batches(drop_null_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_b")
        .map_groups(bucket_count, batch_format="pyarrow")
    )
    if sample_limit:
        # the sample pass below re-reads `grouped`; without this the lazy
        # plan re-executes the whole groupby a second time (measured 2x
        # on the 600k-row composite-key rule)
        grouped = grouped.materialize()

    def gpartial(batch: pa.Table) -> dict:
        cnt = batch["cnt"].to_numpy()
        dups = cnt[cnt > 1]
        return {"dup_groups": int(len(dups)), "dup_rows": int((dups - 1).sum())}

    agg = reduce_batches(grouped, gpartial, {"dup_groups": "sum", "dup_rows": "sum"})
    dup_groups = int(agg["dup_groups"] or 0)
    dup_rows = int(agg["dup_rows"] or 0)

    samples: list[dict] = []
    if dup_groups and sample_limit:
        # top-N dup groups by count desc (duplicate_checker.py:115-124)
        top = (
            grouped.filter(expr="cnt > 1")
            .sort("cnt", descending=True)
            .limit(sample_limit)
            .take_all()
        )
        samples = top[:5]  # report keeps 5 (duplicate_checker.py:142)

    status = CheckStatus.PASS if dup_rows == 0 else CheckStatus.FAIL
    return make_result(
        rule, "duplicate", status,
        total_rows=total, violation_count=dup_rows,
        details={"columns": columns, "duplicate_groups": dup_groups,
                 "duplicate_rows": dup_rows, "sample_records": samples},
    )


# ---------------------------------------------------------------------------
# RangeChecker — src/checker/range_checker.py:120-288
# ---------------------------------------------------------------------------

def numeric_range_check(
    ds,
    column: str,
    min_value: Optional[float] = None,
    max_value: Optional[float] = None,
    rule: Optional[dict] = None,
) -> CheckResult:
    """col < min OR col > max over non-NULL rows; reports actual MIN/MAX."""
    rule = _rule(rule, rule_id="RNG", description="range check", column=column)

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = len(col) - col.null_count
        viol = pa.scalar(False)
        conds = []
        if min_value is not None:
            conds.append(pc.less(col, min_value))
        if max_value is not None:
            conds.append(pc.greater(col, max_value))
        nviol = 0
        if conds:
            m = conds[0]
            for c in conds[1:]:
                m = pc.or_(m, c)
            nviol = int(pc.sum(m.cast(pa.int64())).as_py() or 0)
        mn = pc.min(col).as_py()
        mx = pc.max(col).as_py()
        return {"total": valid, "violations": nviol, "mn": mn, "mx": mx}

    agg = reduce_batches(
        ds, partial,
        {"total": "sum", "violations": "sum", "mn": "min", "mx": "max"},
    )
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(
        rule, "range", status,
        total_rows=int(agg["total"] or 0), violation_count=viol,
        details={"expected_min": min_value, "expected_max": max_value,
                 "actual_min": str(agg["mn"]), "actual_max": str(agg["mx"])},
    )


def date_range_check(
    ds,
    column: str,
    min_date: Optional[Any] = None,
    max_date: Optional[Any] = None,
    rule: Optional[dict] = None,
) -> CheckResult:
    """Temporal variant of numeric_range_check (range_checker.py:175-214)."""
    import pandas as pd

    rule = _rule(rule, rule_id="RNG-DATE", description="date range check", column=column)
    lo = pd.Timestamp(min_date) if min_date is not None else None
    hi = pd.Timestamp(max_date) if max_date is not None else None

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = len(col) - col.null_count
        conds = []
        if lo is not None:
            conds.append(pc.less(col, pa.scalar(lo.to_pydatetime())))
        if hi is not None:
            conds.append(pc.greater(col, pa.scalar(hi.to_pydatetime())))
        nviol = 0
        if conds:
            m = conds[0]
            for c in conds[1:]:
                m = pc.or_(m, c)
            nviol = int(pc.sum(m.cast(pa.int64())).as_py() or 0)
        return {"total": valid, "violations": nviol}

    agg = reduce_batches(ds, partial, {"total": "sum", "violations": "sum"})
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(
        rule, "range", status,
        total_rows=int(agg["total"] or 0), violation_count=viol,
        details={"min_date": str(min_date), "max_date": str(max_date)},
    )


def no_future_check(ds, column: str, now: Any, rule: Optional[dict] = None) -> CheckResult:
    """col > now (range_checker.py:216-244). ``now`` is captured ONCE on the
    driver and shipped into tasks — never evaluated per batch (determinism)."""
    import pandas as pd

    rule = _rule(rule, rule_id="RNG-FUT", description="no future dates", column=column)
    cutoff = pd.Timestamp(now).to_pydatetime()

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        return {
            "total": len(col) - col.null_count,
            "violations": int(pc.sum(pc.greater(col, pa.scalar(cutoff)).cast(pa.int64())).as_py() or 0),
        }

    agg = reduce_batches(ds, partial, {"total": "sum", "violations": "sum"})
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(rule, "range", status,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"check": "no_future_date", "now": str(now)})


def fk_check(
    child_ds,
    fk_column: str,
    parent_ds,
    parent_column: str,
    rule: Optional[dict] = None,
    max_broadcast_keys: Optional[int] = None,
    num_partitions: int = 16,
) -> CheckResult:
    """FK orphan count via broadcast anti-join (range_checker.py:246-288).

    The parent key set is collected once (``unique`` — a small-side
    aggregate), broadcast through the object store via ``ray.put``, and
    probed with a vectorized ``is_in`` inside ``map_batches`` — no
    all-to-all shuffle of the child table. Parents beyond
    ``max_broadcast_keys`` rows take the hash-partitioned distributed
    left-outer-join path instead of materializing driver-side.
    """
    import ray

    from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS

    if max_broadcast_keys is None:
        max_broadcast_keys = DEFAULT_MAX_BROADCAST_KEYS
    rule = _rule(rule, rule_id="FK", description="fk check", column=fk_column)
    if parent_ds.count() > max_broadcast_keys:
        from .extra import _distributed_orphan_count

        def keyed(ds, col):
            def fn(b: pa.Table) -> pa.Table:
                k = b[col]
                k = k.filter(pc.is_valid(k))
                if isinstance(k, pa.ChunkedArray):
                    k = k.combine_chunks()
                return pa.table({"__k": k})

            return ds.map_batches(fn, batch_format="pyarrow")

        total, orphans = _distributed_orphan_count(
            keyed(child_ds, fk_column), keyed(parent_ds, parent_column),
            num_partitions)
        status = CheckStatus.PASS if orphans == 0 else CheckStatus.FAIL
        return make_result(
            rule, "foreign_key", status, total_rows=total,
            violation_count=orphans,
            details={"parent_column": parent_column, "orphan_count": orphans,
                     "join_strategy": "distributed_left_outer"})

    keys = pa.array(parent_ds.unique(parent_column))
    keys_ref = ray.put(keys)

    def partial(batch: pa.Table) -> dict:
        kset = ray.get(keys_ref)
        col = batch[fk_column]
        valid = pc.is_valid(col)
        orphan = pc.and_(valid, pc.invert(pc.is_in(col, value_set=kset)))
        return {
            "total": len(col) - col.null_count,
            "orphans": int(pc.sum(orphan.cast(pa.int64())).as_py() or 0),
        }

    agg = reduce_batches(child_ds, partial, {"total": "sum", "orphans": "sum"})
    orphans = int(agg["orphans"] or 0)
    status = CheckStatus.PASS if orphans == 0 else CheckStatus.FAIL
    return make_result(
        rule, "foreign_key", status,
        total_rows=int(agg["total"] or 0), violation_count=orphans,
        details={"parent_column": parent_column, "orphan_count": orphans},
    )


def outlier_check(ds, column: str, n_sigma: float = 3.0, rule: Optional[dict] = None) -> CheckResult:
    """Two-pass 3-sigma outlier detection (checks/check_range.sql:113-131):
    pass 1 aggregates mean/std (population), pass 2 counts |x-mean| > 3*std.
    Outliers yield WARNING, never FAIL (template parity)."""
    rule = _rule(rule, rule_id="RNG-OUT", description="3-sigma outliers", column=column)

    def p1(batch: pa.Table) -> dict:
        col = pc.cast(batch[column], pa.float64())
        return {
            "n": len(col) - col.null_count,
            "s": pc.sum(col).as_py() or 0.0,
            "ss": pc.sum(pc.multiply(col, col)).as_py() or 0.0,
        }

    a1 = reduce_batches(ds, p1, {"n": "sum", "s": "sum", "ss": "sum"})
    n = int(a1["n"] or 0)
    if n == 0:
        return make_result(rule, "range", CheckStatus.WARNING,
                           details={"message": "no non-null rows"})
    mean = a1["s"] / n
    var = max(a1["ss"] / n - mean * mean, 0.0)
    std = var ** 0.5
    lo, hi = mean - n_sigma * std, mean + n_sigma * std

    def p2(batch: pa.Table) -> dict:
        col = batch[column]
        m = pc.or_(pc.less(col, lo), pc.greater(col, hi))
        return {"viol": int(pc.sum(m.cast(pa.int64())).as_py() or 0)}

    a2 = reduce_batches(ds, p2, {"viol": "sum"})
    viol = int(a2["viol"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.WARNING
    return make_result(rule, "range", status, total_rows=n, violation_count=viol,
                       details={"mean": mean, "std": std, "n_sigma": n_sigma})


# ---------------------------------------------------------------------------
# MaskingChecker — src/checker/masking_checker.py:50-256 (TS-3 substring mode)
# ---------------------------------------------------------------------------

def mask_format_check(
    ds,
    column: str,
    expected_start: int,
    expected_value: str,
    expected_length: Optional[int] = None,
    rule: Optional[dict] = None,
) -> CheckResult:
    """Fixed-position mask check (1-based ``expected_start``, SQL SUBSTRING
    semantics). With ``expected_length``: violation iff
    len != expected_length OR substring(start..) != value (ssn mode,
    masking_checker.py:71-80); without: violation iff the fixed window !=
    value (phone mode, :133-137). Vectorized slice compare — the TS-3
    optimization is the baseline here, not an afterthought."""
    rule = _rule(rule, rule_id="MASK", description="mask format check", column=column)
    start0 = expected_start - 1

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = pc.is_valid(col)
        filled = pc.fill_null(col, "")
        if expected_length is not None:
            tail = pc.utf8_slice_codeunits(filled, start0, 2**31 - 1)
            bad = pc.or_(
                pc.not_equal(pc.utf8_length(filled), expected_length),
                pc.not_equal(tail, expected_value),
            )
        else:
            window = pc.utf8_slice_codeunits(filled, start0, start0 + len(expected_value))
            bad = pc.not_equal(window, expected_value)
        bad = pc.and_(valid, bad)
        return {
            "total": len(col) - col.null_count,
            "violations": int(pc.sum(bad.cast(pa.int64())).as_py() or 0),
        }

    agg = reduce_batches(ds, partial, {"total": "sum", "violations": "sum"})
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(
        rule, "masking", status,
        total_rows=int(agg["total"] or 0), violation_count=viol,
        details={"expected_start": expected_start, "expected_value": expected_value,
                 "expected_length": expected_length,
                 "validation_method": "fixed-position slice (TS-3)"},
    )


def hash_format_check(
    ds, column: str, expected_length: int = 64, rule: Optional[dict] = None
) -> CheckResult:
    """SHA-256 shape: len == 64 and all hex (masking_checker.py:181-189)."""
    rule = _rule(rule, rule_id="MASK-HASH", description="hash format check", column=column)

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = pc.is_valid(col)
        filled = pc.fill_null(col, "")
        bad = pc.or_(
            pc.not_equal(pc.utf8_length(filled), expected_length),
            pc.match_substring_regex(filled, "[^0-9a-fA-F]"),
        )
        bad = pc.and_(valid, bad)
        return {
            "total": len(col) - col.null_count,
            "violations": int(pc.sum(bad.cast(pa.int64())).as_py() or 0),
        }

    agg = reduce_batches(ds, partial, {"total": "sum", "violations": "sum"})
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(rule, "masking", status,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"expected_hash_length": expected_length,
                                "algorithm": "SHA-256"})


def leak_check(ds, column: str, rule: Optional[dict] = None,
               plain_length: int = 14, mask_start: int = 8,
               mask_value: str = "*******") -> CheckResult:
    """Unmasked-PII survival: len == plain_length AND tail != mask
    (masking_checker.py:210-256)."""
    rule = _rule(rule, rule_id="MASK-LEAK", description="pii leak check", column=column)

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = pc.is_valid(col)
        filled = pc.fill_null(col, "")
        tail = pc.utf8_slice_codeunits(filled, mask_start - 1, 2**31 - 1)
        bad = pc.and_(
            pc.equal(pc.utf8_length(filled), plain_length),
            pc.not_equal(tail, mask_value),
        )
        bad = pc.and_(valid, bad)
        return {
            "total": len(col) - col.null_count,
            "violations": int(pc.sum(bad.cast(pa.int64())).as_py() or 0),
        }

    agg = reduce_batches(ds, partial, {"total": "sum", "violations": "sum"})
    viol = int(agg["violations"] or 0)
    status = CheckStatus.PASS if viol == 0 else CheckStatus.FAIL
    return make_result(rule, "masking", status,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"masking_type": "leak_check"})


# ---------------------------------------------------------------------------
# TransformChecker — src/checker/transform_checker.py:42-229
# ---------------------------------------------------------------------------

def join_compare_check(
    src_ds,
    tgt_ds,
    join_key: str,
    compare_column: str,
    tolerance: float = 0.0,
    rule: Optional[dict] = None,
    num_partitions: int = 16,
) -> CheckResult:
    """Row-wise compare after a full-outer hash join on ``join_key``
    (transform_checker.py:103-185 — but as a distributed ``Dataset.join``,
    NOT the reference's driver-side dict build, its scalability
    anti-pattern)."""
    rule = _rule(rule, rule_id="TRF-JOIN", description="join compare")

    def mark(ds, value_alias, marker):
        def fn(batch: pa.Table) -> pa.Table:
            # presence marker distinguishes "row missing after the outer
            # join" from "row present with a NULL value" — the reference
            # treats those differently (transform_checker.py:134-156:
            # both-None -> ok, one-None -> mismatch, missing -> missing_*)
            return pa.table({
                join_key: batch[join_key],
                value_alias: batch[compare_column],
                marker: pa.array(np.ones(batch.num_rows, np.int8)),
            })

        return ds.map_batches(fn, batch_format="pyarrow")

    from ..dsutil import compact

    # join sides are (key, value) pairs — key-cardinality bounded for the
    # aggregate-compare rules this serves; compacting removes the
    # schema-less empty blocks that break the pyarrow hash join
    s = compact(mark(src_ds.select_columns([join_key, compare_column]),
                     "src_value", "src_present"), num_partitions)
    t = compact(mark(tgt_ds.select_columns([join_key, compare_column]),
                     "tgt_value", "tgt_present"), num_partitions)
    j = s.join(t, "full_outer", num_partitions=num_partitions,
               on=(join_key,), validate_schemas=True)

    def partial(batch: pa.Table) -> dict:
        s_missing = pc.is_null(batch["src_present"]).to_numpy(zero_copy_only=False)
        t_missing = pc.is_null(batch["tgt_present"]).to_numpy(zero_copy_only=False)
        sv, tv = batch["src_value"], batch["tgt_value"]
        s_null = pc.is_null(sv).to_numpy(zero_copy_only=False)
        t_null = pc.is_null(tv).to_numpy(zero_copy_only=False)
        sa = pc.cast(pc.fill_null(sv, 0), pa.float64()).to_numpy()
        ta = pc.cast(pc.fill_null(tv, 0), pa.float64()).to_numpy()
        both_rows = (~s_missing) & (~t_missing)
        # both values NULL -> no mismatch; exactly one NULL -> mismatch;
        # both present -> tolerance compare (transform_checker.py:144-156)
        one_null = both_rows & (s_null ^ t_null)
        both_vals = both_rows & ~s_null & ~t_null
        value_mismatch = one_null | (both_vals & (np.abs(sa - ta) > tolerance))
        return {
            "total_keys": batch.num_rows,
            "missing_in_target": int(t_missing.sum()),
            "missing_in_source": int(s_missing.sum()),
            "value_mismatch": int(value_mismatch.sum()),
        }

    agg = reduce_batches(
        j, partial,
        {"total_keys": "sum", "missing_in_target": "sum",
         "missing_in_source": "sum", "value_mismatch": "sum"},
    )
    mit = int(agg["missing_in_target"] or 0)
    mis = int(agg["missing_in_source"] or 0)
    vm = int(agg["value_mismatch"] or 0)
    mismatch_count = mit + mis + vm
    status = CheckStatus.PASS if mismatch_count == 0 else CheckStatus.FAIL
    return make_result(
        rule, "transform", status,
        total_rows=int(agg["total_keys"] or 0), violation_count=mismatch_count,
        details={"join_key": join_key, "compare_column": compare_column,
                 "missing_in_target": mit, "missing_in_source": mis,
                 "value_mismatches": vm, "tolerance": tolerance},
    )


def existence_check(
    src_ds,
    tgt_ds,
    join_key: str,
    rule: Optional[dict] = None,
    num_partitions: int = 16,
) -> CheckResult:
    """Key-set difference in both directions (transform_checker.py:187-229):
    distinct keys on each side, full-outer joined; violation = source keys
    missing from target."""
    rule = _rule(rule, rule_id="TRF-EXIST", description="existence check")

    def proj(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch[join_key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = pc.unique(col.drop_null())  # local combiner: batch-distinct
            t = pa.table({join_key: u})
            return t.append_column(
                "_side", pa.array(np.full(len(u), side, np.int8))
            ).append_column(
                "_b", pa.array(_key_bucket(t, [join_key], _DUP_NUM_BUCKETS)))
        return fn

    both = (src_ds.map_batches(proj(0), batch_format="pyarrow")
            .union(tgt_ds.map_batches(proj(1), batch_format="pyarrow")))

    def bucket_diff(group: pa.Table) -> pa.Table:
        # same key always hashes to the same bucket on both sides, so the
        # bidirectional set difference is exact per bucket — the two
        # sort-aggregates + compacts + full-outer join this replaces
        # measured ~4x slower on the 750k-row transform rule
        side = group["_side"]
        keys = group[join_key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if isinstance(side, pa.ChunkedArray):
            side = side.combine_chunks()
        s_keys = pc.unique(keys.filter(pc.equal(side, 0)))
        t_keys = pc.unique(keys.filter(pc.equal(side, 1)))
        in_t = pc.sum(pc.cast(pc.is_in(s_keys, value_set=t_keys),
                              pa.int64())).as_py() or 0
        in_s = pc.sum(pc.cast(pc.is_in(t_keys, value_set=s_keys),
                              pa.int64())).as_py() or 0
        return pa.table({
            "src_keys": pa.array([len(s_keys)], pa.int64()),
            "tgt_keys": pa.array([len(t_keys)], pa.int64()),
            "missing_in_target": pa.array([len(s_keys) - in_t], pa.int64()),
            "missing_in_source": pa.array([len(t_keys) - in_s], pa.int64()),
        })

    parts = both.groupby("_b").map_groups(bucket_diff, batch_format="pyarrow")
    sums = parts.sum(["src_keys", "tgt_keys",
                      "missing_in_target", "missing_in_source"]) or {}
    agg = {
        "src_keys": sums.get("sum(src_keys)", 0),
        "tgt_keys": sums.get("sum(tgt_keys)", 0),
        "missing_in_target": sums.get("sum(missing_in_target)", 0),
        "missing_in_source": sums.get("sum(missing_in_source)", 0),
    }
    mit = int(agg["missing_in_target"] or 0)
    status = CheckStatus.PASS if mit == 0 else CheckStatus.FAIL
    return make_result(
        rule, "transform", status,
        total_rows=int(agg["src_keys"] or 0), violation_count=mit,
        details={"source_count": int(agg["src_keys"] or 0),
                 "target_count": int(agg["tgt_keys"] or 0),
                 "missing_in_target": mit,
                 "missing_in_source": int(agg["missing_in_source"] or 0)},
    )
