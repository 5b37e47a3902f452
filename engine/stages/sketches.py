"""Mergeable sketches — the partial-aggregate pattern at its purest.

The reference has no approximate aggregates (nearest is the
information_schema *estimated* rowcount used to trigger TS-1 chunking,
src/checker/count_checker.py:105-112). At 10^12 rows an exact
COUNT(DISTINCT) is a full shuffle; a HyperLogLog sketch is one
map_batches pass emitting a 2^p-byte register array per batch and one
tiny driver-side merge — sketches are designed to be mergeable
(docs/SCALE.md shuffle-avoidance rules).

HyperLogLog (Flajolet et al.): p register-index bits, 64-bit hashes,
standard bias correction for the small-range regime. Deterministic
(fixed hash, no RNG); relative error ~1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view

_P_DEFAULT = 12


def _hash64_strings(arr) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string column (FNV-1a
    over bytes via the shingle machinery, finalized with a mix)."""
    data, offsets = byte_view(arr)
    # per-doc polynomial rolling hash over ALL bytes (cumulative trick)
    base = np.uint64(1099511628211)
    n = len(offsets) - 1
    out = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
    # per-row python-free approach: iterate max-length times would be slow;
    # strings here are keys (short): do a bounded loop over byte positions
    lengths = offsets[1:] - offsets[:-1]
    maxlen = int(lengths.max()) if n else 0
    for j in range(maxlen):
        active = lengths > j
        idx = offsets[:-1][active] + j
        vals = data[idx].astype(np.uint64)
        out[active] = (out[active] ^ vals) * base
    # fmix64 finalizer
    out ^= out >> np.uint64(33)
    out *= np.uint64(0xFF51AFD7ED558CCD)
    out ^= out >> np.uint64(33)
    out *= np.uint64(0xC4CEB9FE1A85EC53)
    out ^= out >> np.uint64(33)
    return out


def _hash64_ints(arr) -> np.ndarray:
    v = np.asarray(arr, dtype=np.uint64)
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xFF51AFD7ED558CCD)
    v ^= v >> np.uint64(33)
    v *= np.uint64(0xC4CEB9FE1A85EC53)
    v ^= v >> np.uint64(33)
    return v


def hll_partial(column, p: int = _P_DEFAULT) -> np.ndarray:
    """One batch -> (2^p,) uint8 register array."""
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if pa.types.is_string(column.type) or pa.types.is_large_string(column.type):
        h = _hash64_strings(column)
    else:
        h = _hash64_ints(column.to_numpy(zero_copy_only=False))
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad tail with 1s
    # rho = leading zeros of `rest` + 1, vectorized via bit tricks
    rho = np.zeros(len(h), dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    cur = rest.copy()
    val = np.ones(len(h), dtype=np.uint8)
    alive = np.ones(len(h), dtype=bool)
    for _ in range(64 - p + 1):
        top = (cur & mask) != 0
        newly = alive & top
        rho[newly] = val[newly]
        alive &= ~top
        cur = cur << np.uint64(1)
        val += 1
        if not alive.any():
            break
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(registers: list[np.ndarray]) -> np.ndarray:
    out = registers[0].copy()
    for r in registers[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def approx_distinct(ds, column: str, p: int = _P_DEFAULT) -> float:
    """Dataset-level approximate COUNT(DISTINCT col): per-batch sketches,
    driver merge. One streaming pass, no shuffle."""
    def emit(batch: pa.Table) -> pa.Table:
        regs = hll_partial(batch[column], p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(emit, batch_format="pyarrow").take_all()
    regs = hll_merge([np.frombuffer(r["sketch"], dtype=np.uint8) for r in parts])
    return hll_estimate(regs)


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

def approx_quantiles(ds, column: str, qs: list[float],
                     num_bins: int = 4096) -> list[float]:
    """Approximate quantiles via a mergeable fixed-bin histogram sketch.

    Two streaming passes, no shuffle: (1) global min/max (tiny aggregate);
    (2) per-batch np.histogram partials over the fixed range — each batch
    emits one (num_bins,) int64 row, the driver sums them and reads
    quantiles with linear interpolation inside the hit bin. Error:
    O((max-min)/num_bins) per quantile (a few bin widths when bins are
    sparsely populated). Deterministic; exact Quantile is the
    all-to-all alternative (value_percentiles_events)."""
    import pyarrow as pa

    lo = ds.min(column)
    hi = ds.max(column)
    if lo is None or hi == lo:
        return [float(lo if lo is not None else 0.0)] * len(qs)

    def part(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False)
        v = v[~np.isnan(v.astype(np.float64))]
        h = np.histogram(v, bins=num_bins, range=(lo, hi))[0]
        return pa.table({"h": pa.array([h.astype(np.int64).tobytes()],
                                       pa.binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    hist = np.zeros(num_bins, dtype=np.int64)
    for r in parts:
        hist += np.frombuffer(r["h"], dtype=np.int64)
    total = hist.sum()
    edges = np.linspace(lo, hi, num_bins + 1)
    cum = np.concatenate([[0], np.cumsum(hist)])
    out = []
    for q in qs:
        target = q * (total - 1)
        b = int(np.searchsorted(cum, target, side="right")) - 1
        b = min(max(b, 0), num_bins - 1)
        inbin = hist[b]
        frac = ((target - cum[b]) / inbin) if inbin else 0.0
        out.append(float(edges[b] + frac * (edges[b + 1] - edges[b])))
    return out


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (FK prefilter)
# ---------------------------------------------------------------------------

_BLOOM_SALTS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


def _bloom_positions(h: np.ndarray, m_bits: int) -> list[np.ndarray]:
    return [((h ^ np.uint64(s)) * np.uint64(0x2545F4914F6CDD1D)) % np.uint64(m_bits)
            for s in _BLOOM_SALTS]


def _hash_col(column) -> np.ndarray:
    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    if pa.types.is_string(column.type) or pa.types.is_large_string(column.type):
        return _hash64_strings(column)
    return _hash64_ints(column.to_numpy(zero_copy_only=False))


def bloom_build(ds, column: str, m_bits: int = 1 << 23) -> np.ndarray:
    """Mergeable Bloom filter of a key column: per-batch bitmaps OR-merged
    on the driver (m_bits/8 bytes per batch — the HLL pattern). With
    k=3 hashes, FP rate ~ (1 - e^(-3n/m))^3 (~1.1% at n = m/8)."""
    def part(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.filter(pc.is_valid(col)) if col.null_count else col
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h = _hash_col(col)
        for pos in _bloom_positions(h, m_bits):
            np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                             np.uint8(1) << (pos % np.uint64(8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r["bits"], dtype=np.uint8)
    return out


def bloom_probe_orphans(ds, column: str, bloom_bits: np.ndarray):
    """Count child keys that DEFINITELY miss the parent Bloom filter
    (bloom has no false negatives, so these are certain FK orphans) plus
    the total probed. A 100 TB prefilter: certain-orphans > 0 fails the
    check without ever materializing the exact parent key set; the
    maybe-set (FP-bounded) is what an exact pass would verify."""
    import ray

    m_bits = len(bloom_bits) * 8
    bref = ray.put(bloom_bits)

    def part(batch: pa.Table) -> pa.Table:
        bits = ray.get(bref)
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.filter(pc.is_valid(col)) if col.null_count else col
        h = _hash_col(col)
        hit = np.ones(len(h), dtype=bool)
        for pos in _bloom_positions(h, m_bits):
            byte = bits[(pos // 8).astype(np.int64)]
            hit &= (byte >> (pos % np.uint64(8)).astype(np.uint8)) & 1 > 0
        return pa.table({"total": pa.array([len(h)], pa.int64()),
                         "definite_orphans": pa.array(
                             [int((~hit).sum())], pa.int64())})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(part, batch_format="pyarrow").aggregate(
        Sum("total", alias_name="total"),
        Sum("definite_orphans", alias_name="definite_orphans"))
    return int(agg["total"] or 0), int(agg["definite_orphans"] or 0)


def misra_gries_partial(column, k: int) -> "pa.Table":
    """Per-batch Misra-Gries(k) heavy-hitter summary: exact batch
    counts, pruned to <= k survivors by decrementing everything by the
    (k+1)-th largest count (dropped keys had count <= that, so every
    key's estimate undercounts its true batch frequency by at most the
    decrement). Rows: (key, est, bdec) — ``bdec`` carries the batch's
    decrement ONCE (row 0, zero elsewhere) so merged error bounds are
    exact sums, no batch tagging. A batch whose survivors all prune
    away still emits one (null-key, est=0, dec) carrier row — real
    null-key groups always carry est>0, so carriers are separable."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(column, pa.ChunkedArray):
        column = column.combine_chunks()
    vc = pc.value_counts(column)
    keys = vc.field("values")
    counts = pc.cast(vc.field("counts"), pa.int64()).to_numpy(
        zero_copy_only=False)
    if len(counts) <= k:
        bdec = np.zeros(len(counts), dtype=np.int64)
        return pa.table({"key": keys,
                         "est": pa.array(counts, pa.int64()),
                         "bdec": pa.array(bdec)})
    order = np.argsort(counts)[::-1]
    dec = int(counts[order[k]])  # (k+1)-th largest
    est = counts - dec
    keep = est > 0
    n_keep = int(keep.sum())
    if n_keep == 0:  # all counts equal: empty summary, weight carried
        return pa.table({"key": pa.array([None], keys.type),
                         "est": pa.array([0], pa.int64()),
                         "bdec": pa.array([dec], pa.int64())})
    bdec = np.zeros(n_keep, dtype=np.int64)
    bdec[0] = dec
    return pa.table({
        "key": keys.filter(pa.array(keep)),
        "est": pa.array(est[keep], pa.int64()),
        "bdec": pa.array(bdec),
    })


def misra_gries_merge(parts: "pa.Table", k: int) -> "pa.Table":
    """Merge MG(k) partial summaries (the standard mergeable-summaries
    construction): sum estimates per key, accumulate every partial's
    deleted weight, prune to k again. Output rows (key, est,
    err_bound) satisfy ``true - err_bound <= est <= true``, and any key
    with true frequency > err_bound is guaranteed present."""
    import pyarrow as pa
    import pyarrow.compute as pc

    carried = int(pc.sum(parts["bdec"]).as_py() or 0)
    # null keys are REAL groups (SQL GROUP BY semantics); carrier rows
    # are (null, est=0) and disappear through the final est>0 filter,
    # merging harmlessly into any genuine null-key group
    g = parts.group_by(["key"]).aggregate([("est", "sum")])
    keys = g["key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    est = g["est_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(est) > k:
        order = np.argsort(est)[::-1]
        dec = int(est[order[k]])
        est = est - dec
        carried += dec
    keep = est > 0
    keys = keys.filter(pa.array(keep))
    est = est[keep]
    return pa.table({
        "key": keys,
        "est": pa.array(est, pa.int64()),
        "err_bound": pa.array(np.full(len(est), carried, dtype=np.int64)),
    })


def heavy_hitters(ds, column: str, k: int = 16):
    """Distributed heavy hitters: per-batch MG(k) partials collected
    driver-side (<= k+1 rows per block — KB-scale, like the other
    sketches in this module) and merged once. Returns (key, est,
    err_bound) sorted by est desc then key asc."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    def part(batch: pa.Table) -> pa.Table:
        return misra_gries_partial(batch[column], k)

    refs = ray.get(
        ds.map_batches(part, batch_format="pyarrow").to_arrow_refs())
    tables = [t for t in refs if t.num_rows]
    if not tables:
        key_type = refs[0]["key"].type if refs else pa.string()
        return pa.table({"key": pa.array([], key_type),
                         "est": pa.array([], pa.int64()),
                         "err_bound": pa.array([], pa.int64())})
    merged = misra_gries_merge(
        pa.concat_tables(tables).combine_chunks(), k)
    idx = pc.sort_indices(merged, sort_keys=[("est", "descending"),
                                             ("key", "ascending")])
    return merged.take(idx)
