"""Minimal rule-SQL interpreter — reference-YAML parity for SQL-driven rules.

The reference's rule files embed small SQL snippets (count rules'
``source_count_query`` / ``where_clause``, transform rules'
``source_query`` / ``target_query`` — reference config/rules/
count_rules.yml:24-37, transform_rules.yml:7-63). This module translates
EXACTLY that query shape into Ray Dataset plans so the reference's YAML
runs unchanged on this engine:

    SELECT <items> FROM <table> [WHERE <conjunction>] [GROUP BY <expr>]

    item  := col | DATE(col) | SUM(col) | COUNT(*)
           | COUNT(DISTINCT col) | COUNT(DISTINCT DATE(col))   [AS alias]
    pred  := col IS [NOT] NULL | col <op> literal      (op: = != <> < <= > >=)

This is NOT a SQL engine: anything outside the shape raises ValueError,
which the per-rule isolation in engine/validate.py turns into an ERROR
row (the same behavior the reference shows for a bad SQL string).
Execution is Ray-native — column-pruned reads, vectorized WHERE masks,
``groupby().aggregate`` for GROUP BY, streaming global aggregates.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc

_QUERY_RE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_ITEM_RES = [
    # (kind, regex) — first match wins
    ("count_distinct_date",
     re.compile(r"^COUNT\s*\(\s*DISTINCT\s+DATE\s*\(\s*(\w+)\s*\)\s*\)$", re.I)),
    ("count_distinct", re.compile(r"^COUNT\s*\(\s*DISTINCT\s+(\w+)\s*\)$", re.I)),
    ("count_star", re.compile(r"^COUNT\s*\(\s*\*\s*\)$", re.I)),
    ("sum", re.compile(r"^SUM\s*\(\s*(\w+)\s*\)$", re.I)),
    ("date", re.compile(r"^DATE\s*\(\s*(\w+)\s*\)$", re.I)),
    ("col", re.compile(r"^(\w+)$")),
]

_PRED_RE = re.compile(
    r"^\s*(\w+)\s+IS\s+(NOT\s+)?NULL\s*$|"
    r"^\s*(\w+)\s*(=|!=|<>|<=|>=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$",
    re.IGNORECASE,
)


def _parse_item(raw: str) -> dict:
    raw = raw.strip()
    expr, alias = raw, None
    m = re.match(r"^(.*?)\s+AS\s+(\w+)\s*$", raw, re.IGNORECASE)
    if m:
        expr, alias = m.group(1).strip(), m.group(2)
    for kind, rx in _ITEM_RES:
        km = rx.match(expr)
        if km:
            col = km.group(1) if km.groups() else None
            return {"kind": kind, "col": col,
                    "alias": alias or (col if kind == "col" else expr)}
    raise ValueError(f"unsupported select item: {raw!r}")


def parse_where(where: Optional[str]) -> list[tuple]:
    """Conjunction of simple predicates -> [(col, op, value)]."""
    if not where:
        return []
    preds = []
    for part in re.split(r"\s+AND\s+", where.strip(), flags=re.IGNORECASE):
        m = _PRED_RE.match(part)
        if not m:
            raise ValueError(f"unsupported predicate: {part!r}")
        if m.group(1):  # IS [NOT] NULL
            preds.append((m.group(1), "isnotnull" if m.group(2) else "isnull", None))
        else:
            col, op, lit = m.group(3), m.group(4), m.group(5)
            value: Any = lit[1:-1] if lit.startswith("'") else (
                float(lit) if "." in lit else int(lit))
            preds.append((col, "!=" if op == "<>" else op, value))
    return preds


def parse_query(sql: str) -> dict:
    m = _QUERY_RE.match(sql.strip())
    if not m:
        raise ValueError(f"unsupported rule query: {sql!r}")
    items = [_parse_item(p) for p in m.group("sel").split(",")]
    group = None
    if m.group("group"):
        graw = m.group("group").strip()
        gm = re.match(r"^DATE\s*\(\s*(\w+)\s*\)$", graw, re.I)
        group = {"kind": "date", "col": gm.group(1)} if gm else \
            {"kind": "col", "col": re.match(r"^(\w+)$", graw).group(1)}
    return {"items": items, "table": m.group("table"),
            "preds": parse_where(m.group("where")), "group": group}


def where_mask(batch: pa.Table, preds: list[tuple]):
    """Vectorized conjunction mask (None = keep everything)."""
    mask = None
    ops = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
           "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}
    for col, op, value in preds:
        c = batch[col]
        if op == "isnotnull":
            m = pc.is_valid(c)
        elif op == "isnull":
            m = pc.is_null(c)
        else:
            # SQL comparisons are null-rejecting
            m = pc.and_(pc.is_valid(c), pc.fill_null(ops[op](c, value), False))
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def _date_expr(batch: pa.Table, col: str) -> pa.Array:
    c = batch[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if not pa.types.is_timestamp(c.type) and not pa.types.is_date(c.type):
        c = c.cast(pa.timestamp("us"))
    return c.cast(pa.date32()) if not pa.types.is_date32(c.type) else c


def _needed_columns(q: dict) -> Optional[list[str]]:
    cols = {i["col"] for i in q["items"] if i["col"]}
    cols |= {p[0] for p in q["preds"]}
    if q["group"]:
        cols.add(q["group"]["col"])
    return sorted(cols) or None  # pure COUNT(*): parquet metadata count


def run_rule_query(catalog, sql: str):
    """Rule SQL -> Ray Dataset with the query's aliased output columns.

    Aggregate-only queries return a one-row Dataset; GROUP BY queries one
    row per group; plain projections one row per input row.
    """
    from ray.data.aggregate import Count, Sum

    q = parse_query(sql)
    ds = catalog.load(q["table"], _needed_columns(q))
    preds = q["preds"]
    items = q["items"]
    group = q["group"]

    def project(batch: pa.Table) -> pa.Table:
        mask = where_mask(batch, preds)
        if mask is not None:
            batch = batch.filter(mask)
        cols: dict[str, Any] = {}
        for it in items:
            if it["kind"] == "col":
                cols[it["alias"]] = batch[it["col"]]
            elif it["kind"] == "date":
                cols[it["alias"]] = _date_expr(batch, it["col"])
            elif it["kind"] == "sum":
                cols["__sum_" + it["alias"]] = batch[it["col"]]
            elif it["kind"] in ("count_star", "count_distinct",
                                "count_distinct_date"):
                if it["kind"] == "count_distinct":
                    cols["__cd_" + it["alias"]] = batch[it["col"]]
                elif it["kind"] == "count_distinct_date":
                    cols["__cd_" + it["alias"]] = _date_expr(batch, it["col"])
        if group:
            gname = "__group"
            cols[gname] = (_date_expr(batch, group["col"])
                           if group["kind"] == "date" else batch[group["col"]])
        if not cols:  # pure COUNT(*) query: carry only row count
            return pa.table({"__n": pa.array(
                [1] * batch.num_rows, pa.int8())})
        return pa.table(cols)

    projected = ds.map_batches(project, batch_format="pyarrow")

    agg_kinds = {"sum", "count_star", "count_distinct", "count_distinct_date"}
    has_agg = any(i["kind"] in agg_kinds for i in items)

    if group:
        aggs = []
        for it in items:
            if it["kind"] == "sum":
                aggs.append(Sum("__sum_" + it["alias"], alias_name=it["alias"]))
            elif it["kind"] == "count_star":
                aggs.append(Count(alias_name=it["alias"]))
            elif it["kind"] in ("count_distinct", "count_distinct_date"):
                raise ValueError("COUNT(DISTINCT) with GROUP BY unsupported")
        out = projected.groupby("__group").aggregate(*aggs)
        # rename the group column back to its alias — the select list must
        # contain the GROUP BY expression itself (same kind AND column),
        # otherwise the output would silently mislabel the group key
        matching = [i for i in items
                    if i["kind"] == group["kind"] and i["col"] == group["col"]]
        if not matching:
            raise ValueError(
                "GROUP BY expression must appear in the select list")
        galias = matching[0]["alias"]
        renamed = out.map_batches(
            lambda b, g=galias: b.rename_columns(
                [g if c == "__group" else c for c in b.column_names]),
            batch_format="pyarrow")
        from .dsutil import compact

        return compact(renamed, 8)  # group-cardinality bounded

    if has_agg:
        row: dict[str, list] = {}
        for it in items:
            if it["kind"] == "sum":
                row[it["alias"]] = [projected.sum("__sum_" + it["alias"])]
            elif it["kind"] == "count_star":
                row[it["alias"]] = [projected.count()]
            elif it["kind"] in ("count_distinct", "count_distinct_date"):
                # SQL COUNT(DISTINCT col) excludes NULLs; Dataset.unique
                # would count None as a distinct value
                vals = projected.unique("__cd_" + it["alias"])
                row[it["alias"]] = [sum(1 for v in vals if v is not None)]
        import ray.data as rd

        return rd.from_arrow(pa.table(row))

    return projected


def scalar_from_query(catalog, sql: str):
    """First column of the single row an aggregate rule query returns."""
    ds = run_rule_query(catalog, sql)
    rows = ds.take(2)
    if len(rows) != 1:
        raise ValueError(f"rule query returned {len(rows)} rows, want 1: {sql!r}")
    return next(iter(rows[0].values()))
