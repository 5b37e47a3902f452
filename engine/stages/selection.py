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


def _nonnull_stats(proj, col: str) -> tuple:
    """(n, lo, hi) of the non-null projection in ONE aggregate pass.
    Count needs an `on` column here: in Ray 2.49 a global
    Dataset.aggregate(Count()) with on=None returns 0."""
    from ray.data.aggregate import Count, Max, Min

    stats = proj.aggregate(Count(col, alias_name="n"),
                           Min(col, alias_name="lo"),
                           Max(col, alias_name="hi"))
    return stats["n"], stats["lo"], stats["hi"]


def _exact_ranks(ds, col: str, ranks: list[int], num_bins: int,
                 collect_cap: int, depth: int,
                 stats: tuple | None = None) -> dict[int, float]:
    """``ds`` must already be the single-column non-null projection.
    ``ranks`` are 1-based into the sorted column. ``stats`` (n, lo, hi)
    skips the leading aggregate when the caller already scanned for it;
    recursion levels always recompute over their narrowed input."""
    n, lo, hi = _nonnull_stats(ds, col) if stats is None else stats
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
    stats = _nonnull_stats(proj, col)
    n = stats[0]
    if n == 0:
        raise ValueError(f"exact_quantiles_disc: no non-null {col!r} values")
    ranks = [min(max(int(np.ceil(q * n)), 1), n) for q in qs]
    got = _exact_ranks(proj, col, sorted(set(ranks)), num_bins,
                       collect_cap, 0, stats=stats)
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
    stats = _nonnull_stats(proj, col)
    n = stats[0]
    if n == 0:
        raise ValueError(f"exact_quantiles_cont: no non-null {col!r} values")
    idxs = [min(max((n - 1) * q, 0.0), float(n - 1)) for q in qs]
    ranks = sorted({r for i in idxs
                    for r in (int(np.floor(i)) + 1,
                              min(int(np.floor(i)) + 2, n))})
    got = _exact_ranks(proj, col, ranks, num_bins, collect_cap, 0,
                       stats=stats)
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

    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")

    def non_null(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[col]))

    rows = ds.map_batches(non_null, batch_format="pyarrow")
    proj = _project_non_null(ds, col)
    stats = _nonnull_stats(proj, col)
    n = stats[0]
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
    got = _exact_ranks(proj, col, ranks, num_bins, collect_cap, 0,
                       stats=stats)
    bvals = sorted({got[k] for k in ranks})
    bidx = {v: i for i, v in enumerate(bvals)}

    # thin (col, id) projection for the accounting passes — never
    # re-scan payload columns
    def thin_proj(batch: pa.Table) -> pa.Table:
        t = pa.table({col: batch[col], id_col: batch[id_col]})
        return t.filter(pc.is_valid(t[col]))

    thin = ds.map_batches(thin_proj, batch_format="pyarrow")

    def _cols_np(batch: pa.Table):
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return (v.to_numpy(zero_copy_only=False),
                ids.to_numpy(zero_copy_only=False))

    # pass 1 — counts ONLY (fixed |bvals| rows per batch): #rows
    # strictly below each boundary value and its tie-group size. The
    # max_tie_rows guard is enforced on these aggregated counts BEFORE
    # any tie id is materialized, so a corpus-scale duplicate mass
    # raises instead of flooding the driver.
    def count_partial(batch: pa.Table) -> pa.Table:
        x, _ = _cols_np(batch)
        lt_c = [int((x < bv).sum()) for bv in bvals]
        tie_c = [int((x == bv).sum()) for bv in bvals]
        return pa.table({"j": pa.array(range(len(bvals)), pa.int64()),
                         "lt": pa.array(lt_c, pa.int64()),
                         "tc": pa.array(tie_c, pa.int64())})

    cnt = (thin.map_batches(count_partial, batch_format="pyarrow")
               .groupby("j").sum(["lt", "tc"]).take_all())
    lt = np.zeros(len(bvals), np.int64)
    tie_n = np.zeros(len(bvals), np.int64)
    for rec in cnt:
        lt[rec["j"]] = rec["sum(lt)"]
        tie_n[rec["j"]] = rec["sum(tc)"]
    if int(tie_n.sum()) > max_tie_rows:
        raise ValueError(
            "ntile_assign: boundary tie groups hold "
            f"{int(tie_n.sum())} rows > max_tie_rows={max_tie_rows}; "
            "the order column has corpus-scale duplicate mass — "
            "pre-aggregate or use a composite order column")

    # pass 2 — tie ids only, total bounded by the guard above
    def tie_partial(batch: pa.Table) -> pa.Table:
        x, iv = _cols_np(batch)
        out_j, out_id = [], []
        for bv in bvals:
            tie_ids = iv[x == bv]
            out_j.extend([bidx[bv]] * len(tie_ids))
            out_id.extend(tie_ids.tolist())
        return pa.table({"j": pa.array(out_j, pa.int64()),
                         "tid": pa.array(out_id, pa.int64())})

    tabs = ray.get(
        thin.map_batches(tie_partial, batch_format="pyarrow")
            .materialize().to_arrow_refs())
    t = pa.concat_tables([x for x in tabs if x.num_rows]).combine_chunks()
    tie_j = t["j"].to_numpy(zero_copy_only=False)
    tie_id = t["tid"].to_numpy(zero_copy_only=False)
    order = np.lexsort((tie_id, tie_j))
    tie_j, tie_id = tie_j[order], tie_id[order]
    tie_start = np.searchsorted(tie_j, np.arange(len(bvals)))
    tie_end = np.searchsorted(tie_j, np.arange(len(bvals)), side="right")

    # composite boundary (value, id) per bucket edge; boundary values
    # keep the COLUMN's own type (a float64 coercion would collapse
    # int64 values beyond 2^53 and desynchronize the == comparisons
    # between the accounting and assign passes)
    b_val_list = []
    b_id = np.empty(len(bounds), np.int64)
    for i, k in enumerate(bounds):
        bv = got[int(k)]
        j = bidx[bv]
        off = int(k) - int(lt[j])  # 1-based rank within the tie group
        n_tie_j = int(tie_end[j] - tie_start[j])
        if not 1 <= off <= n_tie_j:
            raise RuntimeError("ntile_assign: internal rank accounting "
                               f"error at boundary {k}")
        b_val_list.append(bv)
        b_id[i] = tie_id[tie_start[j] + off - 1]
    bref = ray.put((b_val_list, b_id))

    def assign(batch: pa.Table) -> pa.Table:
        bvl, bi = ray.get(bref)
        x, iv = _cols_np(batch)
        tile = np.ones(len(x), np.int64)
        for i in range(len(bvl)):  # n_tiles - 1 vectorized comparisons
            above = (x > bvl[i]) | ((x == bvl[i]) & (iv > bi[i]))
            tile += above
        return batch.append_column("tile", pa.array(tile, pa.int64()))

    return rows.map_batches(assign, batch_format="pyarrow")


def grouped_exact_quantiles_disc(
    ds,
    group_col: str,
    col: str,
    qs: list[float],
    num_bins: int = 1024,
    collect_cap: int = 4_000_000,
    cont: bool = False,
) -> dict:
    """Per-GROUP exact discrete quantiles WITHOUT the one-group-per-worker
    assumption — the grouped complement of :func:`exact_quantiles_disc`.

    A ``groupby(group).map_groups(sort)`` plan ships every group to one
    worker; when groups are languages/domains, the biggest group is a
    large fraction of the corpus at scale. This keeps the selection shape
    instead — every pass streams, nothing group-sized ever lands in one
    place:

    1. one pass of per-batch ``group_by`` partials -> driver-merged
       (group, n_rows, n_vals, lo, hi) — group-cardinality-sized;
    2. one pass of per-(group, bin) histogram partials — each batch
       returns ONE ``G * num_bins`` int64 row (G = #groups; e.g. 30
       langs x 1024 bins = 240 KB), summed driver-side into the G x B
       matrix that locates every group's rank bin;
    3. one filtered collect of ONLY rank-holding (group, bin) cells
       (expected ``n_g / num_bins`` rows each) -> tiny local sorts;
       cells heavier than ``collect_cap`` recurse through
       :func:`_exact_ranks` on a (group, value-range)-filtered
       projection instead of being materialized.

    Integer partials are associative -> identical at any parallelism.
    NULL ``col`` values are excluded per SQL quantile semantics; a NULL
    group key is its own group. Returns ``{group_value: (n_rows,
    [value per q])}`` with ``None`` values for all-null groups.

    ``cont=True`` switches to PERCENTILE_CONT semantics: both
    neighbouring ELEMENTS at index (n_g - 1) * q come out of the same
    rank machinery; only the final ``lo + (hi - lo) * frac`` is derived
    arithmetic, evaluated with the same double expression a SQL engine
    uses (see exact_quantiles_cont).
    """
    gsel = [group_col, col]

    def _rank_set(nv: int) -> list[int]:
        """1-based ranks the selection must materialize for one group."""
        if not cont:
            return [min(max(int(np.ceil(q * nv)), 1), nv) for q in qs]
        ranks = []
        for q in qs:
            i = min(max((nv - 1) * q, 0.0), float(nv - 1))
            k = int(np.floor(i))
            ranks += [k + 1, min(k + 2, nv)]
        return ranks

    def stats_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col], col: batch[col]})
        g = t.group_by([group_col]).aggregate(
            [([], "count_all"), (col, "count"), (col, "min"), (col, "max")])
        return g.rename_columns([group_col, "nr", "nv", "lo", "hi"])

    def _mn(a, b):
        return a if b is None else b if a is None else min(a, b)

    def _mx(a, b):
        return a if b is None else b if a is None else max(a, b)

    groups: dict = {}
    for row in ds.select_columns(gsel).map_batches(
            stats_partial, batch_format="pyarrow").take_all():
        k = row[group_col]
        nr, nv, lo, hi = row["nr"], row["nv"], row["lo"], row["hi"]
        if k in groups:
            onr, onv, olo, ohi = groups[k]
            groups[k] = (onr + nr, onv + nv, _mn(olo, lo), _mx(ohi, hi))
        else:
            groups[k] = (nr, nv, lo, hi)

    keys = list(groups)
    G = len(keys)
    out: dict = {}
    # groups needing a histogram: >0 non-null values and lo < hi
    active = [k for k in keys
              if groups[k][1] > 0 and groups[k][2] != groups[k][3]]
    for k in keys:
        nr, nv, lo, hi = groups[k]
        if nv == 0:
            out[k] = (nr, [None] * len(qs))
        elif lo == hi:
            out[k] = (nr, [lo] * len(qs))
    if not active:
        return out

    gi_of = {k: i for i, k in enumerate(active)}
    ga = len(active)
    # index_in yields null BOTH for null inputs and for values absent
    # from the value_set (inactive groups), so the null-key slot must be
    # assigned from an explicit is_null mask — never by fill_null, which
    # would fold inactive groups' rows into the NULL group's histogram.
    nn_active = [k for k in active if k is not None]
    nn_slot = np.array([gi_of[k] for k in nn_active], dtype=np.int64)
    lo_a = np.array([float(groups[k][2]) for k in active])
    hi_a = np.array([float(groups[k][3]) for k in active])
    scale = num_bins / (hi_a - lo_a)

    def _codes(gcol):
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        out_c = np.full(len(gcol), np.nan)
        if nn_active:
            # value_set typed from the column, not inferred from the
            # Python list (an all-None list infers Arrow null type)
            vs = pa.array(nn_active, type=gcol.type)
            c = pc.index_in(gcol, value_set=vs).to_numpy(
                zero_copy_only=False)
            m = ~np.isnan(c)
            out_c[m] = nn_slot[c[m].astype(np.int64)]
        if None in gi_of:
            nulls = pc.is_null(gcol).to_numpy(zero_copy_only=False)
            out_c[nulls] = gi_of[None]
        return out_c

    def hist_partial(batch: pa.Table) -> pa.Table:
        v = batch[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        gi = _codes(batch[group_col])
        vv = v.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(gi) & ~pc.is_null(v).to_numpy(zero_copy_only=False)
        gi = gi[mask].astype(np.int64)
        vv = vv[mask]
        b = np.clip(np.floor((vv - lo_a[gi]) * scale[gi]).astype(np.int64),
                    0, num_bins - 1)
        counts = np.bincount(gi * num_bins + b, minlength=ga * num_bins)
        return pa.table({"h": pa.array([counts.astype(np.int64).tolist()],
                                       pa.list_(pa.int64()))})

    mat = np.zeros(ga * num_bins, dtype=np.int64)
    for row in ds.select_columns(gsel).map_batches(
            hist_partial, batch_format="pyarrow").take_all():
        mat += np.asarray(row["h"], dtype=np.int64)
    mat = mat.reshape(ga, num_bins)
    cum = np.cumsum(mat, axis=1)

    # locate every (group, q) rank's bin; split into light cells
    # (collect) and heavy cells (recurse through _exact_ranks)
    need: dict[tuple[int, int], list[int]] = {}
    for k in active:
        gi = gi_of[k]
        nv = groups[k][1]
        for r in _rank_set(nv):
            j = int(np.searchsorted(cum[gi], r, side="left"))
            need.setdefault((gi, j), []).append(r)

    light = {cell for cell in need if mat[cell[0], cell[1]] <= collect_cap}
    flat_light = np.array(sorted(c[0] * num_bins + c[1] for c in light),
                          dtype=np.int64)

    picked: dict[tuple[int, int], dict[int, float]] = {}
    if len(flat_light):
        def cand(batch: pa.Table) -> pa.Table:
            v = batch[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            gi = _codes(batch[group_col])
            vv = v.to_numpy(zero_copy_only=False).astype(np.float64)
            mask = ~np.isnan(gi) & ~pc.is_null(v).to_numpy(
                zero_copy_only=False)
            gi = gi[mask].astype(np.int64)
            vk = v.filter(pa.array(mask))
            vv = vv[mask]
            b = np.clip(np.floor((vv - lo_a[gi]) * scale[gi])
                        .astype(np.int64), 0, num_bins - 1)
            flat = gi * num_bins + b
            sel = np.isin(flat, flat_light)
            return pa.table({col: vk.filter(pa.array(sel)),
                             "_cell": pa.array(flat[sel], pa.int64())})

        rows = ds.select_columns(gsel).map_batches(
            cand, batch_format="pyarrow").take_all()
        vals = np.asarray([r[col] for r in rows])
        cells = np.asarray([r["_cell"] for r in rows], dtype=np.int64)
        for (gi, j) in light:
            inbin = np.sort(vals[cells == gi * num_bins + j])
            assert len(inbin) == mat[gi, j], (gi, j)
            below = int(cum[gi, j - 1]) if j > 0 else 0
            picked[(gi, j)] = {r: inbin[r - below - 1].item()
                               for r in need[(gi, j)]}

    for (gi, j) in sorted(set(need) - light):  # heavy cells: recurse
        below = int(cum[gi, j - 1]) if j > 0 else 0

        def keep(batch: pa.Table, _gi=gi, _j=j) -> pa.Table:
            v = batch[col]
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            gc = _codes(batch[group_col])
            vv = v.to_numpy(zero_copy_only=False).astype(np.float64)
            mask = ~np.isnan(gc) & ~pc.is_null(v).to_numpy(
                zero_copy_only=False)
            b = np.full(len(vv), -1, np.int64)
            mm = np.flatnonzero(mask)
            gim = gc[mm].astype(np.int64)
            b[mm] = np.clip(np.floor((vv[mm] - lo_a[gim]) * scale[gim])
                            .astype(np.int64), 0, num_bins - 1)
            sel = mask.copy()
            sel[mm] &= (gim == _gi) & (b[mm] == _j)
            return pa.table({col: v.filter(pa.array(sel))})

        sub = _exact_ranks(
            ds.select_columns(gsel).map_batches(keep,
                                                batch_format="pyarrow"),
            col, sorted({r - below for r in need[(gi, j)]}),
            num_bins, collect_cap, 1)
        picked[(gi, j)] = {r: sub[r - below] for r in need[(gi, j)]}

    def _val(gi: int, r: int):
        j = int(np.searchsorted(cum[gi], r, side="left"))
        return picked[(gi, j)][r]

    for k in active:
        gi = gi_of[k]
        nr, nv = groups[k][0], groups[k][1]
        vals_q = []
        for q in qs:
            if not cont:
                vals_q.append(_val(gi, min(max(int(np.ceil(q * nv)), 1),
                                           nv)))
            else:
                i = min(max((nv - 1) * q, 0.0), float(nv - 1))
                kf = int(np.floor(i))
                lo = _val(gi, kf + 1)
                hi = _val(gi, min(kf + 2, nv))
                vals_q.append(lo + (hi - lo) * (i - kf))
        out[k] = (nr, vals_q)
    return out
