"""Template-only reference checks (SQL templates with no Python caller in
the reference) implemented as first-class operators: composite-key FK,
allowed-values, date-order, duplicate-rate stats, soft-delete reference,
and the recursive hierarchy/cycle walk."""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..audit import CheckResult, CheckStatus, make_result
from .base import reduce_batches
from .core import _rule


def allowed_values_check(
    ds, column: str, allowed: Sequence[Any], rule: Optional[dict] = None
) -> CheckResult:
    """M9 enum predicate: col NOT IN allowed (checks/check_range.sql:98-111)."""
    rule = _rule(rule, rule_id="RNG-ENUM", description="allowed values", column=column)
    value_set = pa.array(list(allowed))

    def partial(batch: pa.Table) -> dict:
        col = batch[column]
        valid = pc.is_valid(col)
        bad = pc.and_(valid, pc.invert(pc.is_in(col, value_set=value_set)))
        return {"total": len(col) - col.null_count,
                "viol": int(pc.sum(bad.cast(pa.int64())).as_py() or 0)}

    agg = reduce_batches(ds, partial, {"total": "sum", "viol": "sum"})
    viol = int(agg["viol"] or 0)
    return make_result(rule, "range",
                       CheckStatus.PASS if viol == 0 else CheckStatus.FAIL,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"allowed_values": list(allowed)})


def date_order_check(
    ds, start_col: str, end_col: str, rule: Optional[dict] = None
) -> CheckResult:
    """M10 row-wise column ordering: start > end is a violation
    (checks/check_range.sql:133-140)."""
    rule = _rule(rule, rule_id="RNG-ORDER", description="date order",
                 column=f"{start_col}>{end_col}")

    def partial(batch: pa.Table) -> dict:
        s, e = batch[start_col], batch[end_col]
        both = pc.and_(pc.is_valid(s), pc.is_valid(e))
        bad = pc.and_(both, pc.greater(s, e))
        return {"total": int(pc.sum(both.cast(pa.int64())).as_py() or 0),
                "viol": int(pc.sum(bad.cast(pa.int64())).as_py() or 0)}

    agg = reduce_batches(ds, partial, {"total": "sum", "viol": "sum"})
    viol = int(agg["viol"] or 0)
    return make_result(rule, "range",
                       CheckStatus.PASS if viol == 0 else CheckStatus.FAIL,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"start_column": start_col, "end_column": end_col})


from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS


def _join_key(batch: pa.Table, cols: list[str]) -> pa.Array:
    parts = [pc.cast(batch[c], pa.string()) for c in cols]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, "\x1f")
    return joined  # null if ANY component is null (SQL AND-semantics)


def _distributed_orphan_count(child_keys_ds, parent_keys_ds,
                              num_partitions: int = 16) -> tuple[int, int]:
    """(valid child keys, orphan count) via a distributed left-outer join —
    the fallback when the parent side is too big to broadcast. Both inputs
    are single-column ``__k`` Datasets (nulls already dropped)."""
    from ray.data.aggregate import Count

    from ..dsutil import compact

    parent_distinct = compact(
        parent_keys_ds.groupby("__k").aggregate(Count(alias_name="__pc")),
        num_partitions)
    child = compact(child_keys_ds, num_partitions)
    total = child.count()
    if not total:
        return 0, 0
    if not parent_distinct.count():
        # empty parent key set (e.g. no soft-deleted parents): every child
        # key misses it — and a join against an all-empty side would crash
        # on Ray's schema-less empty blocks
        return total, total
    j = child.join(parent_distinct, "left_outer",
                   num_partitions=num_partitions, on=("__k",))

    def partial(batch: pa.Table) -> dict:
        return {"orphans": int(pc.sum(
            pc.cast(pc.is_null(batch["__pc"]), pa.int64())).as_py() or 0)}

    agg = reduce_batches(j, partial, {"orphans": "sum"})
    return total, int(agg["orphans"] or 0)


def composite_fk_check(
    child_ds,
    fk_columns: Sequence[str],
    parent_ds,
    parent_columns: Sequence[str],
    rule: Optional[dict] = None,
    max_broadcast_keys: int = DEFAULT_MAX_BROADCAST_KEYS,
    num_partitions: int = 16,
) -> CheckResult:
    """J2 multi-column FK orphans (checks/check_foreign_key.sql:42-56):
    composite keys joined into one string key, then the broadcast
    anti-join pattern of the single-column check.

    Guarded: parents up to ``max_broadcast_keys`` rows are collected
    (vectorized, no Python sets) and broadcast; bigger parents take the
    distributed left-outer-join path instead of materializing driver-side.
    """
    import ray

    rule = _rule(rule, rule_id="FK-COMP", description="composite fk",
                 column=",".join(fk_columns))
    fk_columns = list(fk_columns)
    parent_columns = list(parent_columns)

    def parent_key_batch(b: pa.Table) -> pa.Table:
        k = _join_key(b, parent_columns)
        return pa.table({"__k": k.filter(pc.is_valid(k))})

    if parent_ds.count() > max_broadcast_keys:
        def child_key_batch(b: pa.Table) -> pa.Table:
            k = _join_key(b, fk_columns)
            return pa.table({"__k": k.filter(pc.is_valid(k))})

        total, orphans = _distributed_orphan_count(
            child_ds.map_batches(child_key_batch, batch_format="pyarrow"),
            parent_ds.map_batches(parent_key_batch, batch_format="pyarrow"),
            num_partitions)
        return make_result(
            rule, "foreign_key",
            CheckStatus.PASS if orphans == 0 else CheckStatus.FAIL,
            total_rows=total, violation_count=orphans,
            details={"parent_columns": parent_columns,
                     "join_strategy": "distributed_left_outer"})

    chunks = [
        b["__k"].combine_chunks()
        for b in parent_ds.map_batches(parent_key_batch, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    keys = pc.unique(pa.concat_arrays(chunks)) if chunks else pa.array([], pa.string())
    keys_ref = ray.put(keys)

    def partial(batch: pa.Table) -> dict:
        keys = ray.get(keys_ref)
        jk = _join_key(batch, fk_columns)
        valid = pc.is_valid(jk)
        orphan = pc.and_(valid, pc.invert(pc.is_in(jk, value_set=keys)))
        return {"total": int(pc.sum(valid.cast(pa.int64())).as_py() or 0),
                "orphans": int(pc.sum(orphan.cast(pa.int64())).as_py() or 0)}

    agg = reduce_batches(child_ds, partial, {"total": "sum", "orphans": "sum"})
    orphans = int(agg["orphans"] or 0)
    return make_result(rule, "foreign_key",
                       CheckStatus.PASS if orphans == 0 else CheckStatus.FAIL,
                       total_rows=int(agg["total"] or 0),
                       violation_count=orphans,
                       details={"parent_columns": parent_columns,
                                "join_strategy": "broadcast"})


def duplicate_rate_stats(
    ds, columns: Sequence[str], rule: Optional[dict] = None
) -> CheckResult:
    """A9 duplicate-rate profile (checks/check_duplicates.sql:51-62):
    total rows, distinct keys, duplicate rows, duplicate percentage."""
    from ray.data.aggregate import Count

    rule = _rule(rule, rule_id="DUP-RATE", description="duplicate rate",
                 column=",".join(columns))
    columns = list(columns)
    total = ds.count()
    grouped = ds.groupby(columns).aggregate(Count(alias_name="cnt"))

    def gpartial(batch: pa.Table) -> dict:
        cnt = batch["cnt"].to_numpy()
        return {"distinct": int(len(cnt)), "dup_rows": int((cnt - 1).sum())}

    agg = reduce_batches(grouped, gpartial, {"distinct": "sum", "dup_rows": "sum"})
    distinct = int(agg["distinct"] or 0)
    dup_rows = int(agg["dup_rows"] or 0)
    ratio = dup_rows / total if total else 0.0
    return make_result(rule, "duplicate",
                       CheckStatus.PASS if dup_rows == 0 else CheckStatus.WARNING,
                       total_rows=total, violation_count=dup_rows,
                       details={"distinct_keys": distinct,
                                "duplicate_pct": round(ratio * 100, 4)})


def soft_delete_check(
    child_ds,
    fk_column: str,
    parent_ds,
    parent_column: str,
    flag_column: str,
    deleted_values: Sequence[Any],
    rule: Optional[dict] = None,
    max_broadcast_keys: int = DEFAULT_MAX_BROADCAST_KEYS,
    num_partitions: int = 16,
) -> CheckResult:
    """J7 soft-delete reference (checks/check_foreign_key.sql:121-131):
    children referencing logically-deleted parents. Deleted-parent key set
    broadcast and probed with is_in when it fits (vectorized collection);
    distributed inner-join count past ``max_broadcast_keys`` parents."""
    import ray

    rule = _rule(rule, rule_id="FK-SOFTDEL", description="soft-delete refs",
                 column=fk_column)
    deleted_set = pa.array(list(deleted_values))

    def deleted_key_batch(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_in(b[flag_column], value_set=deleted_set),
                       pc.is_valid(b[parent_column]))
        k = b[parent_column].filter(mask)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        return pa.table({"__k": k})

    if parent_ds.count() > max_broadcast_keys:
        def child_key_batch(b: pa.Table) -> pa.Table:
            k = b[fk_column]
            k = k.filter(pc.is_valid(k))
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            return pa.table({"__k": k})

        total, non_deleted = _distributed_orphan_count(
            child_ds.map_batches(child_key_batch, batch_format="pyarrow"),
            parent_ds.map_batches(deleted_key_batch, batch_format="pyarrow"),
            num_partitions)
        viol = total - non_deleted  # joined rows = refs INTO deleted parents
        return make_result(
            rule, "foreign_key",
            CheckStatus.PASS if viol == 0 else CheckStatus.FAIL,
            total_rows=total, violation_count=viol,
            details={"flag_column": flag_column,
                     "join_strategy": "distributed_left_outer"})

    chunks = [
        b["__k"].combine_chunks()
        for b in parent_ds.map_batches(deleted_key_batch, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    keys = pc.unique(pa.concat_arrays(chunks)) if chunks else pa.array([])
    keys_ref = ray.put(keys)

    def partial(batch: pa.Table) -> dict:
        keys = ray.get(keys_ref)
        col = batch[fk_column]
        valid = pc.is_valid(col)
        bad = pc.and_(valid, pc.is_in(col, value_set=keys))
        return {"total": len(col) - col.null_count,
                "viol": int(pc.sum(bad.cast(pa.int64())).as_py() or 0)}

    agg = reduce_batches(child_ds, partial, {"total": "sum", "viol": "sum"})
    viol = int(agg["viol"] or 0)
    return make_result(rule, "foreign_key",
                       CheckStatus.PASS if viol == 0 else CheckStatus.FAIL,
                       total_rows=int(agg["total"] or 0), violation_count=viol,
                       details={"deleted_parent_keys": len(keys),
                                "flag_column": flag_column,
                                "join_strategy": "broadcast"})


def hierarchy_cycle_check(
    ds, id_column: str, parent_column: str, max_depth: int = 100,
    rule: Optional[dict] = None,
    max_nodes: int = DEFAULT_MAX_BROADCAST_KEYS,
) -> CheckResult:
    """J9 recursive hierarchy walk with cycle guard
    (checks/check_foreign_key.sql:85-119, the PostgreSQL recursive CTE).

    Implementation: collect the (id -> parent) edge map (hierarchies are
    dimension-sized — this is the broadcast-small-side regime), then
    vectorized pointer-stepping to find nodes that never reach a root
    within max_depth (cycles or over-deep chains). Guarded by
    ``max_nodes``: a larger hierarchy needs the iterative frontier-join
    formulation (see stages/neardup.py propagate_min_labels for the
    pattern) rather than a driver-resident edge map."""
    rule = _rule(rule, rule_id="FK-CYCLE", description="hierarchy cycles",
                 column=id_column)
    n_rows = ds.count()
    if n_rows > max_nodes:
        # distributed fallback: the edge map would not fit on the driver —
        # walk the hierarchy with pointer-doubling joins instead
        return _hierarchy_cycle_distributed(
            ds, id_column, parent_column, max_depth, rule, n_rows)
    ids, parents = [], []
    for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        ids.extend(b[id_column].to_pylist())
        parents.extend(b[parent_column].to_pylist())
    index = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    # next[i] = row index of parent, -1 = root (null or dangling parent)
    nxt = np.array(
        [index.get(p, -1) if p is not None else -1 for p in parents],
        dtype=np.int64,
    )
    cur = nxt.copy()
    depth = 0
    while depth < max_depth and (cur >= 0).any():
        step = np.where(cur >= 0, nxt[np.clip(cur, 0, n - 1)], -1)
        cur = step
        depth += 1
    stuck = int((cur >= 0).sum())  # never reached a root: cycle / too deep
    return make_result(rule, "foreign_key",
                       CheckStatus.PASS if stuck == 0 else CheckStatus.FAIL,
                       total_rows=n, violation_count=stuck,
                       details={"max_depth": max_depth,
                                "strategy": "pointer_stepping"})


def _hierarchy_cycle_distributed(
    ds, id_column: str, parent_column: str, max_depth: int,
    rule: dict, n_rows: int,
) -> CheckResult:
    """Distributed hierarchy walk for node sets too large for a driver
    edge map: pointer-doubling over join-built jump tables.

    ``J_k`` maps each node to its ancestor ``2^k`` steps up, containing
    ONLY nodes that have not reached a root within ``2^k`` steps (a null
    or dangling parent is a root, like the local path). Squaring ``J``
    (self-join) doubles the distance; applying the set bits of
    ``max_depth + 1`` to the frontier walks exactly the same
    ``max_depth + 1`` steps the local pointer-stepping path takes, with
    O(log max_depth) joins instead of max_depth rounds. Everything stays
    a Dataset — nothing node-count-sized reaches the driver; identical
    verdicts to the local path (tested).

    Assumes ``id_column`` values are unique (duplicate ids would fan out
    the joins), the same contract the reference's recursive CTE has
    (checks/check_foreign_key.sql:85-119)."""
    from ..dsutil import compact, join_partitions

    nparts = join_partitions()

    def proj_edges(b: pa.Table) -> pa.Table:
        # a block whose parents are all NULL carries a null-typed column
        # (e.g. from_items); cast to the id type so every block joins under
        # one schema
        dst = pc.cast(b[parent_column], b.schema.field(id_column).type)
        t = pa.table({"src": b[id_column], "dst": dst})
        return t.filter(pc.is_valid(t["dst"]))

    # both join inputs are compacted: proj_edges filters, so blocks can go
    # empty, and ANY empty block on a join side (schema-ful included)
    # breaks Ray's hash-join aggregator; node-count-sized data, object
    # store resident — never the driver
    edges = compact(ds.map_batches(proj_edges, batch_format="pyarrow"),
                    nparts)
    ids = compact(
        ds.map_batches(lambda b: pa.table({"node": b[id_column]}),
                       batch_format="pyarrow"),
        nparts)
    if not edges.count():
        # every parent is NULL or dangling: the whole hierarchy is roots
        # at distance <= 1 — and joining a zero-row (empty-block) dataset
        # would poison the hash join (see dsutil.compact)
        return make_result(rule, "foreign_key", CheckStatus.PASS,
                           total_rows=n_rows, violation_count=0,
                           details={"max_depth": max_depth,
                                    "strategy": "pointer_doubling"})

    # dangling parents count as roots: keep only edges whose parent exists
    j = compact(
        edges.join(ids, "inner", num_partitions=nparts,
                   on=("dst",), right_on=("node",))
        .map_batches(lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
                     batch_format="pyarrow"),
        nparts)

    # frontier starts at distance 1 (the local path's `cur = nxt`): nodes
    # with a live parent edge; everyone else is already rooted
    frontier = j.map_batches(
        lambda b: pa.table({"node": b["src"], "cur": b["dst"]}),
        batch_format="pyarrow")

    def apply_jump(front, jump):
        out = front.join(jump, "inner", num_partitions=nparts,
                         on=("cur",), right_on=("src",))
        return compact(
            out.map_batches(
                lambda b: pa.table({"node": b["node"], "cur": b["dst"]}),
                batch_format="pyarrow"),
            nparts)

    def square(jump):
        out = jump.join(jump, "inner", num_partitions=nparts,
                        on=("dst",), right_on=("src",),
                        left_suffix="_l", right_suffix="_r")

        def pick(b: pa.Table) -> pa.Table:
            src = b["src_l"] if "src_l" in b.column_names else b["src"]
            dst = b["dst_r"] if "dst_r" in b.column_names else b["dst"]
            return pa.table({"src": src, "dst": dst})

        return compact(out.map_batches(pick, batch_format="pyarrow"), nparts)

    remaining = max_depth  # the frontier already sits at distance 1
    stuck = None
    while remaining and frontier.count():
        if not j.count():
            # jump table ran dry: every chain roots within the distance
            # covered so far, and remaining>0 guarantees one more (inner)
            # apply — which would empty the frontier. Short-circuit instead
            # of joining against a zero-row (schema-less-block) dataset.
            stuck = 0
            break
        if remaining & 1:
            frontier = apply_jump(frontier, j)
        remaining >>= 1
        if remaining:
            j = square(j)

    if stuck is None:
        stuck = frontier.count()  # never reached a root: cycle / too deep
    return make_result(rule, "foreign_key",
                       CheckStatus.PASS if stuck == 0 else CheckStatus.FAIL,
                       total_rows=n_rows, violation_count=stuck,
                       details={"max_depth": max_depth,
                                "strategy": "pointer_doubling"})


def fd_violations(ds, det_col: str, dep_col: str, num_buckets: int = 256):
    """Functional-dependency consistency check: every ``det_col`` value
    that maps to MORE than one distinct ``dep_col`` value, with its
    distinct-dependent count — the cross-column generalization of the
    reference's enum/uniqueness checks (checks/check_duplicate.sql
    counts dup keys; this audits value CONSISTENCY per key).

    Scale shape (high-cardinality determinants — the bucketed_groupby
    cardinality rule): per-batch pyarrow ``group_by`` collapses to
    distinct (det, dep) pairs BEFORE the exchange; ONE coarse-bucket
    shuffle on ``hash(det) % num_buckets`` (a det value lands wholly in
    one bucket); per-bucket vectorized re-distinct + count-per-det +
    filter. Output: Dataset (det, n_dep), violation-sized.
    """
    from ..dsutil import key_bucket

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        # SQL COUNT(DISTINCT dep) excludes NULLs; drop them here so a
        # det mapping to {X, NULL} is not reported as inconsistent
        # (null DETS stay: GROUP BY treats NULL as a real group)
        t = (batch.select([det_col, dep_col])
             .filter(pc.is_valid(batch[dep_col]))
             .group_by([det_col, dep_col]).aggregate([]))
        t = t.rename_columns(["det", "dep"])
        return t.append_column(
            "_b", pa.array(key_bucket(t, ["det"], num_buckets),
                           pa.int64()))

    def count_per_det(group: pa.Table) -> pa.Table:
        pairs = (group.select(["det", "dep"])
                 .group_by(["det", "dep"]).aggregate([]))
        per_det = pairs.select(["det"]).group_by(["det"]).aggregate(
            [([], "count_all")])
        per_det = per_det.rename_columns(["det", "n_dep"])
        per_det = per_det.set_column(
            1, "n_dep", pc.cast(per_det["n_dep"], pa.int64()))
        return per_det.filter(pc.greater(per_det["n_dep"], 1))

    return (ds.map_batches(distinct_pairs, batch_format="pyarrow")
              .groupby("_b")
              .map_groups(count_per_det, batch_format="pyarrow"))
