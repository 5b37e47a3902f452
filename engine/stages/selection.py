"""Exact distributed order statistics: k-th smallest / discrete quantiles.

``Dataset.aggregate(Quantile(...))`` is quantile_cont (interpolated) and
``stages/sketches.approx_quantiles`` is a fixed-bin sketch; neither
returns an element OF the dataset. This module computes EXACT
``quantile_disc`` semantics (the value at 1-based rank ``ceil(q * n)``
of the sorted column — the same index formula the grouped
``grouped_percentiles_docs_by_lang`` query uses per group, matched to
DuckDB) WITHOUT a distributed sort:

1. one aggregate pass -> (n, min, max);
2. one histogram pass -> fixed ``num_bins`` int64 counts per batch,
   summed driver-side (KB-sized partials, the sketches.py merge shape);
   the cumulative histogram locates each rank's bin and its within-bin
   offset;
3. one filtered collect of ONLY the rank-holding bins (expected
   ``n / num_bins`` rows each) -> local sort -> pick.

Bins whose count exceeds ``collect_cap`` (heavy duplicate / skew mass)
are RECURSED into — re-histogrammed over the bin's narrowed [min, max]
range — rather than collected, so no driver materialization is ever
larger than ``collect_cap`` no matter the distribution; all-equal bins
terminate via the min == max short-circuit. Integer bin counts make
every pass associative, so results are identical at any parallelism.

Cost: 2 + #passes-per-recursion-level scans of a single pruned column —
the selection trade (cheap scans, zero shuffle) vs Dataset.sort's
all-to-all exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _project_non_null(ds, col: str):
    def proj(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({col: pc.drop_null(v)})

    return ds.map_batches(proj, batch_format="pyarrow")


def _bin_of(v: np.ndarray, lo: float, hi: float, num_bins: int) -> np.ndarray:
    b = np.floor((v - lo) * (num_bins / (hi - lo))).astype(np.int64)
    return np.clip(b, 0, num_bins - 1)


def _exact_ranks(ds, col: str, ranks: list[int], num_bins: int,
                 collect_cap: int, depth: int) -> dict[int, float]:
    """``ds`` must already be the single-column non-null projection.
    ``ranks`` are 1-based into the sorted column."""
    from ray.data.aggregate import Count, Max, Min

    # Count needs an `on` column here: in Ray 2.49 a global
    # Dataset.aggregate(Count()) with on=None returns 0
    stats = ds.aggregate(Count(col, alias_name="n"),
                         Min(col, alias_name="lo"),
                         Max(col, alias_name="hi"))
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if n == 0:
        raise ValueError(f"exact_quantiles_disc: no non-null {col!r} values")
    bad = [k for k in ranks if not 1 <= k <= n]
    if bad:
        raise ValueError(f"ranks {bad} outside [1, {n}]")
    if lo == hi:
        return {k: lo for k in ranks}
    if depth > 8:  # ulp-adjacent distinct values: range can no longer split
        raise RuntimeError("exact_quantiles_disc: recursion depth exceeded")

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        b = _bin_of(v.to_numpy(zero_copy_only=False), lo, hi, num_bins)
        counts = np.bincount(b, minlength=num_bins).astype(np.int64)
        return pa.table({"h": pa.array([counts.tolist()],
                                       pa.list_(pa.int64()))})

    counts = np.zeros(num_bins, dtype=np.int64)
    for row in ds.map_batches(hist, batch_format="pyarrow").take_all():
        counts += np.asarray(row["h"], dtype=np.int64)
    cum = np.cumsum(counts)

    by_bin: dict[int, list[int]] = {}
    for k in ranks:
        j = int(np.searchsorted(cum, k, side="left"))
        by_bin.setdefault(j, []).append(k)

    out: dict[int, float] = {}
    small = [j for j in by_bin if counts[j] <= collect_cap]
    if small:
        small_set = np.array(sorted(small), dtype=np.int64)

        def cand(batch: pa.Table) -> pa.Table:
            v = batch[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            arr = v.to_numpy(zero_copy_only=False)
            b = _bin_of(arr, lo, hi, num_bins)
            mask = np.isin(b, small_set)
            return pa.table({col: pa.array(arr[mask], v.type),
                             "_bin": pa.array(b[mask], pa.int64())})

        rows = ds.map_batches(cand, batch_format="pyarrow").take_all()
        vals = np.asarray([r[col] for r in rows])
        bins = np.asarray([r["_bin"] for r in rows], dtype=np.int64)
        for j in small:
            inbin = np.sort(vals[bins == j])
            assert len(inbin) == counts[j]
            below = int(cum[j - 1]) if j > 0 else 0
            for k in by_bin[j]:
                out[k] = inbin[k - below - 1].item()

    for j in by_bin:
        if counts[j] > collect_cap:  # heavy bin: narrow the range, recurse
            jj = int(j)

            def keep(batch: pa.Table, _j=jj) -> pa.Table:
                v = batch[col]
                if isinstance(v, pa.ChunkedArray):
                    v = v.combine_chunks()
                arr = v.to_numpy(zero_copy_only=False)
                mask = _bin_of(arr, lo, hi, num_bins) == _j
                return pa.table({col: pa.array(arr[mask], v.type)})

            below = int(cum[jj - 1]) if jj > 0 else 0
            sub = _exact_ranks(ds.map_batches(keep, batch_format="pyarrow"),
                               col, [k - below for k in by_bin[jj]],
                               num_bins, collect_cap, depth + 1)
            for k in by_bin[jj]:
                out[k] = sub[k - below]
    return out


def exact_quantiles_disc(ds, col: str, qs: list[float],
                         num_bins: int = 4096,
                         collect_cap: int = 4_000_000) -> list[float]:
    """Exact discrete quantiles (DuckDB ``quantile_disc`` semantics:
    the element at 1-based rank ``ceil(q * n)``) of a numeric column,
    NULLs excluded — see the module docstring for the scale shape.
    Returns one dataset element per q, in input order."""
    proj = _project_non_null(ds, col)
    from ray.data.aggregate import Count

    n = proj.aggregate(Count(col, alias_name="n"))["n"]
    if n == 0:
        raise ValueError(f"exact_quantiles_disc: no non-null {col!r} values")
    ranks = [min(max(int(np.ceil(q * n)), 1), n) for q in qs]
    got = _exact_ranks(proj, col, sorted(set(ranks)), num_bins,
                       collect_cap, 0)
    return [got[k] for k in ranks]


def exact_quantiles_cont(ds, col: str, qs: list[float],
                         num_bins: int = 4096,
                         collect_cap: int = 4_000_000) -> list[float]:
    """Exact INTERPOLATED quantiles (DuckDB ``quantile_cont`` /
    PERCENTILE_CONT semantics): index = (n-1)*q on the 0-based sorted
    order; result = lo + (hi - lo) * frac between the two neighbouring
    ELEMENTS. Both neighbours come from the same histogram-guided exact
    selection as ``exact_quantiles_disc`` (zero shuffle); only the final
    interpolation is derived arithmetic, evaluated with the same double
    expression the SQL engine uses."""
    proj = _project_non_null(ds, col)
    from ray.data.aggregate import Count

    n = proj.aggregate(Count(col, alias_name="n"))["n"]
    if n == 0:
        raise ValueError(f"exact_quantiles_cont: no non-null {col!r} values")
    idxs = [min(max((n - 1) * q, 0.0), float(n - 1)) for q in qs]
    ranks = sorted({r for i in idxs
                    for r in (int(np.floor(i)) + 1,
                              min(int(np.floor(i)) + 2, n))})
    got = _exact_ranks(proj, col, ranks, num_bins, collect_cap, 0)
    out = []
    for i in idxs:
        k = int(np.floor(i))
        lo = got[k + 1]
        hi = got[min(k + 2, n)]
        out.append(lo + (hi - lo) * (i - k))
    return out
