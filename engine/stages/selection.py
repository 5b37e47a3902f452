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


def ntile_assign(ds, col: str, id_col: str, n_tiles: int,
                 num_bins: int = 4096, collect_cap: int = 4_000_000,
                 max_tie_rows: int = 2_000_000):
    """Global NTILE over ``ORDER BY (col, id_col)`` — the positional
    bucketing window function, WITHOUT a distributed sort.

    SQL's NTILE is rank-positional (first ``n % n_tiles`` buckets get
    one extra row), so with a unique ``id_col`` tie-break the total
    order is unambiguous and the bucket of a row is decided entirely by
    the ``n_tiles - 1`` BOUNDARY rows. Scale shape:

    1. boundary VALUES via `_exact_ranks` (histogram-guided selection —
       cheap scans, zero shuffle; the value at composite rank k equals
       the value at value-only rank k);
    2. ONE pass computing, per distinct boundary value, the exact count
       of rows strictly below it AND the id list of its tie group
       (expected tiny for continuous data; guarded by
       ``max_tie_rows`` — a column with corpus-sized duplicate mass
       needs a genuine tie-group shuffle and raises instead of
       silently materializing it);
    3. the ``(value, id)`` composite boundaries broadcast to a final
       assign pass: tile = 1 + #boundaries strictly below the row
       (n_tiles - 1 vectorized comparisons per batch).

    Returns a Dataset = non-null-``col`` rows of ``ds`` plus an int64
    ``tile`` column in [1, n_tiles].
    """
    import ray
    from ray.data.aggregate import Count

    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def non_null(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[col]))

    rows = ds.map_batches(non_null, batch_format="pyarrow")
    proj = _project_non_null(ds, col)
    n = proj.aggregate(Count(col, alias_name="n"))["n"]
    if n == 0:
        raise ValueError(f"ntile_assign: no non-null {col!r} values")
    if n_tiles == 1:
        return rows.map_batches(
            lambda b: b.append_column(
                "tile", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow")

    q, r = divmod(n, n_tiles)
    sizes = np.full(n_tiles, q, dtype=np.int64)
    sizes[:r] += 1
    bounds = np.cumsum(sizes)[:-1]  # 1-based rank of each bucket's LAST row
    bounds = bounds[bounds >= 1]    # n < n_tiles: trailing empty buckets
    ranks = sorted({int(k) for k in bounds})
    got = _exact_ranks(proj, col, ranks, num_bins, collect_cap, 0)
    bvals = sorted({got[k] for k in ranks})
    bidx = {v: i for i, v in enumerate(bvals)}

    # one pass: per boundary value, #rows strictly below + tie-group ids
    def tie_partial(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False)
        out_i, out_c, out_id = [], [], []
        for bv in bvals:
            j = bidx[bv]
            out_i.append(j)
            out_c.append(int((x < bv).sum()))
            out_id.append(-1)
            tie_ids = iv[x == bv]
            if len(tie_ids) > max_tie_rows:
                raise ValueError(
                    "ntile_assign: a boundary tie group exceeds "
                    f"max_tie_rows={max_tie_rows}; the order column has "
                    "corpus-scale duplicate mass — pre-aggregate or use "
                    "a composite order column")
            out_i.extend([j] * len(tie_ids))
            out_c.extend([-1] * len(tie_ids))
            out_id.extend(tie_ids.tolist())
        return pa.table({"j": pa.array(out_i, pa.int64()),
                         "c": pa.array(out_c, pa.int64()),
                         "tid": pa.array(out_id, pa.int64())})

    # ONE consumption of the tiny partials (|bvals| x blocks + tie rows),
    # zero-copy to the driver, then pure-numpy accounting
    tabs = ray.get(
        rows.map_batches(tie_partial, batch_format="pyarrow")
            .materialize().to_arrow_refs())
    t = pa.concat_tables([x for x in tabs if x.num_rows]).combine_chunks()
    j_arr = t["j"].to_numpy(zero_copy_only=False)
    c_arr = t["c"].to_numpy(zero_copy_only=False)
    tid_arr = t["tid"].to_numpy(zero_copy_only=False)
    is_cnt = c_arr >= 0
    lt = np.zeros(len(bvals), np.int64)
    np.add.at(lt, j_arr[is_cnt], c_arr[is_cnt])
    tie_j, tie_id = j_arr[~is_cnt], tid_arr[~is_cnt]
    if len(tie_j) > max_tie_rows:
        raise ValueError("ntile_assign: total boundary tie rows "
                         f"exceed max_tie_rows={max_tie_rows}")
    order = np.lexsort((tie_id, tie_j))
    tie_j, tie_id = tie_j[order], tie_id[order]
    tie_start = np.searchsorted(tie_j, np.arange(len(bvals)))
    tie_end = np.searchsorted(tie_j, np.arange(len(bvals)), side="right")

    # composite boundary (value, id) per bucket edge
    b_val = np.empty(len(bounds), np.float64)
    b_id = np.empty(len(bounds), np.int64)
    for i, k in enumerate(bounds):
        bv = got[int(k)]
        j = bidx[bv]
        off = int(k) - int(lt[j])  # 1-based rank within the tie group
        n_tie_j = int(tie_end[j] - tie_start[j])
        if not 1 <= off <= n_tie_j:
            raise RuntimeError("ntile_assign: internal rank accounting "
                               f"error at boundary {k}")
        b_val[i] = bv
        b_id[i] = tie_id[tie_start[j] + off - 1]
    bref = ray.put((b_val, b_id))

    def assign(batch: pa.Table) -> pa.Table:
        bv, bi = ray.get(bref)
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        x = v.to_numpy(zero_copy_only=False)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        iv = ids.to_numpy(zero_copy_only=False)
        tile = np.ones(len(x), np.int64)
        for i in range(len(bv)):  # n_tiles - 1 vectorized comparisons
            above = (x > bv[i]) | ((x == bv[i]) & (iv > bi[i]))
            tile += above
        return batch.append_column("tile", pa.array(tile, pa.int64()))

    return rows.map_batches(assign, batch_format="pyarrow")
