"""Rule-driven validation runner — the reference's main flow re-expressed.

Reference: ``run_validation(env, checks, report_type, config_dir)`` walks
the checker chain Count -> Null -> Duplicate -> Range -> Transform ->
Masking, each iterating its YAML rules with one-rule try/except (ERROR
result on failure, run continues), then summarizes and reports
(src/main.py:80-204). Here every rule dispatches to the corresponding
Ray Data check operator; tables are parquet files in a directory
(``{tables_dir}/{table}.parquet``), loaded lazily with column pruning.

Rule dicts carry the same fields the reference uses (table/column/
thresholds/check_type/masking_type/compare_type, enabled already filtered
by the loader) — reference YAML files work unchanged apart from table
names.
"""

from __future__ import annotations

import logging
from typing import Optional

from . import checks as ck
from .audit import CheckResult, make_error_result, summarize

logger = logging.getLogger(__name__)

CHECK_ORDER = ["count", "null", "duplicate", "range", "transform", "masking"]


class TableCatalog:
    """Lazy parquet-table loader with per-(table, columns) caching."""

    def __init__(self, tables_dir: str):
        self.tables_dir = tables_dir
        self._cache: dict = {}

    def load(self, table: str, columns: Optional[list[str]] = None):
        import ray.data as rd

        key = (table, tuple(columns) if columns else None)
        if key not in self._cache:
            self._cache[key] = rd.read_parquet(
                f"{self.tables_dir}/{table}.parquet", columns=columns
            )
        return self._cache[key]


def _run_count_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    threshold = rule.get("threshold", 0.0)
    # custom-count parity (count_checker.py:50-52): rules may provide
    # precomputed counts (count hooks) OR the reference's SQL count
    # queries, interpreted by the sqlmini rule-SQL subset
    sc = rule.get("source_count")
    tc = rule.get("target_count")
    if "source_count_query" in rule and "target_count_query" in rule:
        from .sqlmini import scalar_from_query

        sc = int(scalar_from_query(cat, rule["source_count_query"]))
        tc = int(scalar_from_query(cat, rule["target_count_query"]))
    src = cat.load(rule["source_table"]) if sc is None else None
    tgt = cat.load(rule["target_table"]) if tc is None else None
    # where_clause parity (CNT-004, count_checker.py:55-57: the clause
    # applies to BOTH sides) — vectorized predicate mask, plus the older
    # filter_expr hook (a Ray Data expression string)
    wc = rule.get("where_clause")
    if wc:
        from .sqlmini import parse_where, where_mask

        preds = parse_where(wc)

        def flt(ds):
            return ds.map_batches(
                lambda b: b.filter(where_mask(b, preds)),
                batch_format="pyarrow")

        src = flt(src) if src is not None else None
        tgt = flt(tgt) if tgt is not None else None
    expr = rule.get("filter_expr")
    if expr:
        src = src.filter(expr=expr) if src is not None else None
        tgt = tgt.filter(expr=expr) if tgt is not None else None
    return ck.count_check(src, tgt, threshold, rule=rule,
                          source_count=sc, target_count=tc)


def _run_null_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    ds = cat.load(rule["table"], [rule["column"]])
    return ck.null_check(
        ds, rule["column"], rule.get("max_null_ratio", 0.0),
        rule.get("include_empty_string", False), rule=rule,
    )


def _run_duplicate_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    cols = rule["columns"]
    ds = cat.load(rule["table"], list(cols))
    return ck.duplicate_check(ds, cols, rule=rule)


def _run_range_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    ctype = rule.get("check_type", "range")
    if ctype == "foreign_key":
        if isinstance(rule["column"], (list, tuple)):
            return ck.composite_fk_check(
                cat.load(rule["table"], list(rule["column"])), rule["column"],
                cat.load(rule["parent_table"], list(rule["parent_column"])),
                rule["parent_column"], rule=rule)
        return ck.fk_check(
            cat.load(rule["table"], [rule["column"]]), rule["column"],
            cat.load(rule["parent_table"], [rule["parent_column"]]),
            rule["parent_column"], rule=rule)
    if ctype == "date_range":
        return ck.date_range_check(
            cat.load(rule["table"], [rule["column"]]), rule["column"],
            rule.get("min_date"), rule.get("max_date"), rule=rule)
    if ctype == "no_future":
        # 'now' must come from the rule/config, never wall clock (M7)
        return ck.no_future_check(
            cat.load(rule["table"], [rule["column"]]), rule["column"],
            rule.get("now", "2100-01-01"), rule=rule)
    if ctype == "allowed_values":
        return ck.allowed_values_check(
            cat.load(rule["table"], [rule["column"]]), rule["column"],
            rule["allowed_values"], rule=rule)
    if ctype == "date_order":
        return ck.date_order_check(
            cat.load(rule["table"], [rule["start_column"], rule["end_column"]]),
            rule["start_column"], rule["end_column"], rule=rule)
    if ctype == "outlier":
        return ck.outlier_check(
            cat.load(rule["table"], [rule["column"]]), rule["column"],
            rule.get("n_sigma", 3.0), rule=rule)
    # default numeric range / positive (check_type in {range, positive})
    return ck.numeric_range_check(
        cat.load(rule["table"], [rule["column"]]), rule["column"],
        rule.get("min_value"), rule.get("max_value"), rule=rule)


def _run_transform_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    ctype = rule.get("compare_type", "value")
    if "source_query" in rule and "target_query" in rule:
        # reference transform rules carry SQL snippets
        # (transform_rules.yml:7-63); the sqlmini subset interpreter turns
        # them into Ray Dataset plans and the standard compare operators run
        from .audit import aggregate_compare_status, make_result
        from .sqlmini import run_rule_query

        src = run_rule_query(cat, rule["source_query"])
        tgt = run_rule_query(cat, rule["target_query"])
        if ctype == "existence":
            return ck.existence_check(src, tgt, rule["join_key"], rule=rule)
        if "join_key" in rule:
            return ck.join_compare_check(
                src, tgt, rule["join_key"], rule["compare_column"],
                rule.get("tolerance", 0.0), rule=rule)
        col = rule["compare_column"]
        sv = src.take(1)[0][col]
        tv = tgt.take(1)[0][col]
        status, diff = aggregate_compare_status(
            float(sv) if sv is not None else None,
            float(tv) if tv is not None else None,
            rule.get("tolerance", 0.0))
        return make_result(rule, "transform", status, details={
            "source_value": sv, "target_value": tv, "difference": diff,
            "tolerance": rule.get("tolerance", 0.0), "compare_column": col})
    if ctype == "existence":
        key = rule["join_key"]
        src = cat.load(rule["source_table"], [rule.get("source_key", key)])
        tgt = cat.load(rule["target_table"], [rule.get("target_key", key)])
        if rule.get("source_key", key) != key:
            src = src.rename_columns({rule["source_key"]: key})
        if rule.get("target_key", key) != key:
            tgt = tgt.rename_columns({rule["target_key"]: key})
        return ck.existence_check(src, tgt, key, rule=rule)
    if "join_key" in rule:
        key, col = rule["join_key"], rule["compare_column"]
        return ck.join_compare_check(
            cat.load(rule["source_table"], [key, col]),
            cat.load(rule["target_table"], [key, col]),
            key, col, rule.get("tolerance", 0.0), rule=rule)
    # aggregate compare: sum of compare_column on both sides
    from .audit import aggregate_compare_status, make_result

    col = rule["compare_column"]
    sv = cat.load(rule["source_table"], [col]).sum(col)
    tv = cat.load(rule["target_table"], [col]).sum(col)
    status, diff = aggregate_compare_status(
        float(sv) if sv is not None else None,
        float(tv) if tv is not None else None,
        rule.get("tolerance", 0.0))
    return make_result(rule, "transform", status, details={
        "source_value": sv, "target_value": tv, "difference": diff,
        "tolerance": rule.get("tolerance", 0.0), "compare_column": col})


def _run_masking_rule(cat: TableCatalog, rule: dict) -> CheckResult:
    mtype = rule.get("masking_type", "")
    ds = cat.load(rule["table"], [rule["column"]])
    if mtype == "ssn":
        return ck.mask_format_check(
            ds, rule["column"], rule.get("expected_pattern_start", 8),
            rule.get("expected_pattern_value", "*******"),
            rule.get("expected_length", 14), rule=rule)
    if mtype == "phone":
        return ck.mask_format_check(
            ds, rule["column"], rule.get("expected_pattern_start", 5),
            rule.get("expected_pattern_value", "****"), None, rule=rule)
    if mtype == "hash":
        return ck.hash_format_check(ds, rule["column"],
                                    rule.get("expected_length", 64), rule=rule)
    if mtype == "leak_check":
        return ck.leak_check(ds, rule["column"], rule=rule)
    raise ValueError(f"unknown masking_type: {mtype!r}")


_DISPATCH = {
    "count": _run_count_rule,
    "null": _run_null_rule,
    "duplicate": _run_duplicate_rule,
    "range": _run_range_rule,
    "transform": _run_transform_rule,
    "masking": _run_masking_rule,
}


def register_check_type(name: str, runner) -> None:
    """User-extension surface (reference: subclass BaseChecker,
    docs/architecture.md:184-188): register a new check type whose YAML
    rules (``<name>_rules:``) dispatch to ``runner(catalog, rule) ->
    CheckResult``. Registered types run after the built-in chain."""
    _DISPATCH[name] = runner
    if name not in CHECK_ORDER:
        CHECK_ORDER.append(name)


def run_validation(
    tables_dir: str,
    rules_by_type: dict[str, list[dict]],
    checks: Optional[list[str]] = None,
    fuse: bool = True,
) -> tuple[list[CheckResult], dict]:
    """Sequential checker chain with per-rule error isolation
    (main.py:117-152 + base_checker.py:127-135 parity).

    ``fuse=True`` (default) compiles every fusable single-table rule into
    one scan per table (checks/fused.py — the M17 rule compiler); result
    *order* and semantics are identical to the per-rule path, which a
    table-level failure falls back to (preserving per-rule ERROR rows).

    Returns ``(results, summary)`` exactly like the reference's
    ``run_validation``.
    """
    from .checks import fused as fused_mod

    cat = TableCatalog(tables_dir)
    selected = checks or CHECK_ORDER

    ordered: list[tuple[int, str, dict]] = []
    idx = 0
    for ctype in CHECK_ORDER:
        if ctype not in selected:
            continue
        for rule in rules_by_type.get(ctype, []):
            ordered.append((idx, ctype, rule))
            idx += 1

    slots: dict[int, CheckResult] = {}
    by_table: dict[str, list] = {}
    singles: list[tuple[int, str, dict]] = []
    for i, ctype, rule in ordered:
        # builder construction itself can fail (e.g. an FK builder eagerly
        # loads a missing parent table): route such rules to the per-rule
        # path, which has the ERROR-row handling — one bad rule must never
        # abort the run (base_checker.py:127-135 per-rule isolation).
        try:
            b = fused_mod.builder_for(ctype, rule, cat) if fuse else None
        except Exception as e:
            logger.warning("[%s] fused builder failed (%s); per-rule path",
                           rule.get("rule_id"), e)
            b = None
        if b is not None and "table" in rule:
            by_table.setdefault(rule["table"], []).append((i, ctype, rule, b))
        else:
            singles.append((i, ctype, rule))

    for table, entries in by_table.items():
        try:
            for i, result in fused_mod.run_fused_table(cat, table, entries):
                slots[i] = result
        except Exception as e:
            # fused scan failed (e.g. one rule names a bad column): fall
            # back to per-rule execution so only the offending rule ERRORs
            logger.warning("fused scan of %s failed (%s); per-rule fallback",
                           table, e)
            for i, ctype, rule, _ in entries:
                singles.append((i, ctype, rule))

    for i, ctype, rule in singles:
        try:
            slots[i] = _DISPATCH[ctype](cat, rule)
        except Exception as e:  # ERROR row, keep going
            logger.error("[%s] %s failed: %s", rule.get("rule_id"), ctype, e)
            slots[i] = make_error_result(rule, ctype, e)

    results = [slots[i] for i in sorted(slots)]
    return results, summarize(results)
