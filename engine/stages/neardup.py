"""Near-duplicate detection family for large-scale training-data pipelines.

Beyond the reference's exact GROUP-BY duplicate check
(src/checker/duplicate_checker.py:91-112), a 100 TB corpus needs
*near*-dup detection. Four methods, all deterministic (fixed seeds, no
RNG at score time):

- **MinHash + LSH**: byte-shingle -> P permutation min-hashes -> band
  buckets; pairs generated AND signature-Jaccard-verified inside each
  band bucket (signatures ride the band rows, so they are co-located by
  construction); clusters via iterative min-label propagation (join +
  groupby Min until fixed point). Pipeline shape: per-batch signatures
  (map_batches) -> explode (band, band_hash, key, sig) rows ->
  ``groupby(band, band_hash)`` (the only corpus-sized shuffle) ->
  per-bucket verify -> edge Dataset -> label propagation. Nothing
  corpus-sized ever reaches the driver.
- **SimHash**: 64-bit sign fingerprint of hashed shingles; near-dups =
  fingerprints within a Hamming radius (bucketed by 16-bit sub-keys —
  the standard pigeonhole trick: radius<=3 implies one of 4 sub-keys
  matches exactly).
- **n-gram Jaccard**: exact shingle-set Jaccard for candidate
  verification (the "verify" stage after any sketch).
- **Embedding cosine**: near-dup pairs above a cosine threshold via
  block matmul against a broadcast matrix (see similarity.py for ANN).

Scale notes (documented partitioning assumptions): band rows carry the
full signature (num_perm*8 bytes x bands copies) — bounded and
content-independent, the price of single-shuffle in-bucket verification;
a hot bucket (many identical docs) degrades to exact-dup behaviour: star
edges from the bucket minimum are always checked (linear) and the
remaining pairs are capped by pair_limit per bucket; clustering is the
distributed min-label propagation over the VERIFIED edge Dataset — the
driver never holds candidate pairs, signatures, or labels beyond the
final (near-duplicate-set-sized) cluster listing that the convenience
wrapper returns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view

_MERSENNE = (1 << 61) - 1
_SHINGLE_K = 8  # byte shingle width
# driver-memory budget for the shuffle-free broadcast verify (sig matrix
# x2 + band/hash/rank arrays + sort temps); ~1.5M docs at num_perm=128
_BROADCAST_VERIFY_BUDGET_BYTES = 4 << 30


def _valid_text(batch: pa.Table, text_col: str) -> pa.Table:
    """Drop NULL-text rows before signature generation: NULL never
    participates in near-dup clustering (round-5 fix — matches exact
    dedup's NULL-key exclusion, dedup_incremental.py, and the spans
    "NULL doc has no substrings" semantic; previously NULL docs carried
    the all-MAX zero-shingle signature and clustered with every empty
    doc). EMPTY-but-non-NULL docs still cluster with each other — the
    documented empty-set Jaccard = 1.0. Dropped rows surface as
    flag=False via the fill_null(False) on the flag-back join."""
    col = batch[text_col]
    if col.null_count:
        batch = batch.filter(pc.is_valid(col))
    return batch


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingles(data: np.ndarray, offsets: np.ndarray, k: int = _SHINGLE_K):
    """Rolling polynomial hash of every k-byte shingle (vectorized).

    Returns (hashes uint64, doc_starts, doc_counts): doc d owns
    ``hashes[doc_starts[d] : doc_starts[d] + doc_counts[d]]``.
    Shingles crossing doc boundaries are excluded by construction.
    """
    n_docs = len(offsets) - 1
    lengths = offsets[1:] - offsets[:-1]
    counts = np.maximum(lengths - k + 1, 0)
    if len(data) < k:
        return np.zeros(0, np.uint64), np.zeros(n_docs, np.int64), counts
    base = np.uint64(1099511628211)
    # in-place ufuncs: the expression form (h = h * base + slice) allocates
    # two window-sized uint64 temporaries per byte position — measured 16x
    # slower than out= on multi-MB batches (pure allocator/memcpy traffic)
    h = np.zeros(len(data) - k + 1, dtype=np.uint64)
    for j in range(k):
        np.multiply(h, base, out=h)
        np.add(h, data[j : len(data) - k + 1 + j], out=h, casting="unsafe")
    # keep only in-doc shingle positions (shared interval-arithmetic
    # gather — textfeat.segment_keep_index)
    from .textfeat import segment_keep_index

    keep_idx, starts, total = segment_keep_index(offsets, counts)
    if total == 0:
        return np.zeros(0, np.uint64), starts, counts.astype(np.int64)
    return h[keep_idx], starts, counts.astype(np.int64)


def minhash_signatures(
    texts: pa.Array | pa.ChunkedArray,
    num_perm: int = 128,
    seed: int = 42,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures (deterministic)."""
    data, offsets = byte_view(texts)
    hashes, starts, counts = _shingles(data, offsets)
    a, b = _perm_params(num_perm, seed)
    n_docs = len(offsets) - 1
    sigs = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    total = len(hashes)
    if total == 0:
        return sigs
    # segment-reduce over doc boundaries (no per-doc Python): process the
    # shingle stream in fixed-size chunks so the (chunk, num_perm) permute
    # temp stays ~64 MB regardless of batch size, np.minimum.reduceat at
    # the doc starts inside each chunk, and fold chunk partials into sigs
    # (a doc spanning a chunk boundary min-combines across chunks).
    nz = np.flatnonzero(counts > 0)
    nz_starts = starts[nz]  # strictly increasing over non-empty docs
    # chunk sized so the (chunk, num_perm) working set stays L2-resident
    # (2048*128*8 = 2 MB) — measured fastest across 2^11..2^16 on the
    # bench corpus; bigger chunks go DRAM-bound and lose 25-45%
    chunk = 1 << 11
    buf = np.empty((min(chunk, total), num_perm), dtype=np.uint64)
    qbuf = np.empty_like(buf)
    M = np.uint64(_MERSENNE)
    for lo in range(0, total, chunk):
        hi = min(lo + chunk, total)
        hv = buf[: hi - lo]
        np.multiply(hashes[lo:hi, None], a[None, :], out=hv)
        hv += b
        # y % M for M = 2^61 - 1 via the Mersenne fold (exact for every
        # uint64 y, verified: y = q*2^61 + r => y ≡ q + r (mod M) with
        # q <= 7, so one conditional subtract suffices) — measured ~15%
        # faster than the uint64 division
        q = qbuf[: hi - lo]
        np.right_shift(hv, np.uint64(61), out=q)
        hv &= M
        hv += q
        np.subtract(hv, M, out=hv, where=hv >= M)
        d0 = int(np.searchsorted(nz_starts, lo, "right")) - 1
        d1 = int(np.searchsorted(nz_starts, hi, "left"))
        seg = np.maximum(nz_starts[d0:d1], lo) - lo
        mins = np.minimum.reduceat(hv, seg, axis=0)
        idx = nz[d0:d1]
        sigs[idx] = np.minimum(sigs[idx], mins)
    return sigs


def minhash_signatures_oph(
    texts: pa.Array | pa.ChunkedArray,
    num_perm: int = 128,
    seed: int = 42,
) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures via One-Permutation
    Hashing (Li, Owen & Zhang, NIPS 2012) with rotation densification
    (Shrivastava & Li, ICML 2014).

    ONE mixed 64-bit hash per shingle is binned by its low bits; the
    signature is the per-(doc, bin) minimum of the remaining bits; empty
    bins borrow ``value + distance * C`` from the nearest non-empty bin
    to the left (cyclically), so every bin is a valid MinHash estimate.
    ~num_perm x less hash arithmetic than :func:`minhash_signatures`
    (one multiply chain per shingle instead of num_perm scalar uint64
    multiplies, which numpy cannot SIMD-vectorize) at slightly higher
    estimator variance for docs with few shingles. LSH banding semantics
    are unchanged (band equality of r rows). Deterministic and
    batch-boundary independent. NOT signature-compatible with the
    k-permutation scheme — pick ONE scheme per corpus run.

    Docs with zero shingles keep the all-MAX signature, matching the
    k-permutation scheme's convention.
    """
    P = num_perm
    if P & (P - 1) or P < 2:
        raise ValueError("num_perm must be a power of two for scheme='oph'")
    data, offsets = byte_view(texts)
    hashes, starts, counts = _shingles(data, offsets)
    n_docs = len(offsets) - 1
    MAXV = np.iinfo(np.uint64).max
    M = np.full((n_docs, P), MAXV, dtype=np.uint64)
    total = len(hashes)
    if total == 0:
        return M
    rng = np.random.default_rng(seed)
    c_seed = np.uint64(int(rng.integers(1, 1 << 62, dtype=np.uint64)) | 1)
    # fmix64 (murmur3 finalizer) over the shingle hash, seeded — all
    # in-place (no per-step temporaries beyond one scratch buffer)
    h = hashes.copy()
    tmp = np.empty_like(h)
    h ^= c_seed
    np.right_shift(h, np.uint64(33), out=tmp); h ^= tmp
    np.multiply(h, np.uint64(0xFF51AFD7ED558CCD), out=h)
    np.right_shift(h, np.uint64(33), out=tmp); h ^= tmp
    np.multiply(h, np.uint64(0xC4CEB9FE1A85EC53), out=h)
    np.right_shift(h, np.uint64(33), out=tmp); h ^= tmp
    lb = np.uint64(P.bit_length() - 1)
    # composite sort key (doc << lb) | bin == the flat (doc, bin) slot
    doc_of = np.repeat(np.arange(n_docs, dtype=np.uint64),
                       counts.astype(np.int64))
    comp = np.empty_like(h)
    np.left_shift(doc_of, lb, out=comp)
    np.bitwise_and(h, np.uint64(P - 1), out=tmp)
    np.bitwise_or(comp, tmp, out=comp)
    np.right_shift(h, lb, out=h)  # h becomes the in-bin value
    order = np.argsort(comp, kind="stable")
    cs = comp[order]
    vs = h[order]
    seg = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
    M.ravel()[cs[seg].astype(np.int64)] = np.minimum.reduceat(vs, seg)
    # rotation densification, only over rows that need it
    empty = M == MAXV
    need = empty.any(axis=1) & ~empty.all(axis=1)
    rows = np.flatnonzero(need)
    if len(rows):
        Mr = M[rows]
        Er = Mr == MAXV
        cols = np.arange(2 * P, dtype=np.int64)
        pos = np.where(~np.concatenate([Er, Er], axis=1), cols[None, :], -1)
        # nearest non-empty bin at-or-left of each target, cyclically
        acc = np.maximum.accumulate(pos, axis=1)[:, P:]
        src = acc % P
        dist = (np.arange(P, dtype=np.int64)[None, :] + P) - acc
        borrowed = np.take_along_axis(Mr, src, axis=1)
        borrowed += dist.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        M[rows] = np.where(Er, borrowed, Mr)
    return M


_SIG_SCHEMES = {"kperm": minhash_signatures, "oph": minhash_signatures_oph}


def _sig_fn(scheme: str):
    try:
        return _SIG_SCHEMES[scheme]
    except KeyError:
        raise ValueError(
            f"unknown signature scheme {scheme!r}: one of "
            f"{sorted(_SIG_SCHEMES)}") from None


def signature_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def ngram_jaccard(text_a: str, text_b: str, k: int = _SHINGLE_K) -> float:
    """Exact byte-shingle Jaccard (the verification metric)."""
    ba, bb = text_a.encode(), text_b.encode()
    sa = {ba[i : i + k] for i in range(max(len(ba) - k + 1, 0))}
    sb = {bb[i : i + k] for i in range(max(len(bb) - k + 1, 0))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def lsh_band_rows(
    keys: pa.Array, sigs: np.ndarray, bands: int = 16
) -> pa.Table:
    """Explode signatures to (band, band_hash, key, sig) rows — the records
    that go through the LSH groupby shuffle. The full signature rides along
    (fixed-size binary, num_perm*8 bytes) so the verify phase can run
    INSIDE each bucket with no second pass over the corpus and no
    driver-side signature map. Fully vectorized (no per-row Python)."""
    n, p = sigs.shape
    assert p % bands == 0
    r = p // bands
    view = sigs.reshape(n, bands, r)
    # band hash: cheap mix of the r row-values
    mixed = np.zeros((n, bands), dtype=np.uint64)
    for j in range(r):
        mixed = mixed * np.uint64(1000003) + view[:, :, j]
    sig_arr = pa.Array.from_buffers(
        pa.binary(p * 8), n,
        [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())],
    )
    parts = [
        pa.table({
            "band": pa.array(np.full(n, band, np.int32)),
            "band_hash": pa.array(np.ascontiguousarray(mixed[:, band]), pa.uint64()),
            "key": keys,
            "sig": sig_arr,
        })
        for band in range(bands)
    ]
    return pa.concat_tables(parts)


def _add_coarse_bucket(t: pa.Table, num_coarse: int) -> pa.Table:
    """Derived shuffle key: hash of (band, band_hash) folded into
    ``num_coarse`` buckets, so the verify groupby shuffles ONE small int
    key and each group holds MANY logical buckets (vectorized together in
    _coarse_verify) instead of one Python call per tiny bucket."""
    bh = t["band_hash"]
    if isinstance(bh, pa.ChunkedArray):
        bh = bh.combine_chunks()
    band = t["band"]
    if isinstance(band, pa.ChunkedArray):
        band = band.combine_chunks()
    mix = (bh.to_numpy(zero_copy_only=False)
           * np.uint64(0x9E3779B97F4A7C15)
           + band.to_numpy(zero_copy_only=False).astype(np.uint64))
    cb = (mix % np.uint64(num_coarse)).astype(np.int64)
    return t.append_column("_cb", pa.array(cb))


def _sigs_np(arr, num_perm: int) -> np.ndarray:
    """(n, num_perm) uint64 view of a fixed-size-binary signature column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    full = np.frombuffer(arr.buffers()[1], dtype=np.uint64)
    start = arr.offset * num_perm
    return full[start : start + len(arr) * num_perm].reshape(len(arr), num_perm)


def _bucket_verify(
    group: pa.Table, num_perm: int, threshold: float, pair_limit: int
) -> pa.Table:
    """Per-bucket pair generation AND signature-Jaccard verification
    (signatures are co-located by the band groupby). Emits only VERIFIED
    edges. Star edges from the bucket minimum are always checked (linear in
    bucket size — an exact-dup hot bucket stays fully connected under the
    pair cap); the remaining i<j pairs are capped at ``pair_limit``.
    Deterministic: bucket sorted by key first."""
    n = group.num_rows
    key_arr = group["key"]
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    empty = pa.table({"key_a": key_arr.slice(0, 0), "key_b": key_arr.slice(0, 0)})
    if n < 2:
        return empty
    order = pc.sort_indices(key_arr)
    keys = key_arr.take(order)
    sigs = _sigs_np(group["sig"], num_perm)[order.to_numpy()]
    ia: list[int] = []
    ib: list[int] = []
    frac0 = (sigs[1:] == sigs[0]).mean(axis=1)
    hit0 = np.flatnonzero(frac0 >= threshold) + 1
    ia.extend([0] * len(hit0))
    ib.extend(hit0.tolist())
    checked = 0
    for i in range(1, n - 1):
        if checked >= pair_limit:
            break
        frac = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        hits = np.flatnonzero(frac >= threshold) + i + 1
        ia.extend([i] * len(hits))
        ib.extend(hits.tolist())
        checked += n - 1 - i
    if not ia:
        return empty
    return pa.table({
        "key_a": keys.take(pa.array(ia, pa.int64())),
        "key_b": keys.take(pa.array(ib, pa.int64())),
    })


def coarse_buckets_for(n_docs: int, bands: int = 16) -> int:
    """Coarse shuffle-key count targeting ~128 band rows per bucket:
    bounded per-group memory at any corpus size, enough distinct keys
    that the sort's range partitioner never degenerates on ties."""
    return max(4096, min(1 << 26, (n_docs * bands) // 128))


def _verify_sorted(
    keys, sigs: np.ndarray, band: np.ndarray, bh: np.ndarray,
    threshold: float, pair_limit: int
) -> pa.Table:
    """The shared verify KERNEL: rows must already be sorted by
    (band, band_hash, key). Semantics identical per logical bucket to
    :func:`_bucket_verify` (star edges from the bucket head always
    checked; i>=1 pairs capped at ``pair_limit``); the star phase is ONE
    (rows, num_perm) compare across all buckets and Python only touches
    the rare buckets of size >= 3. Both the distributed coarse-groupby
    path and the size-guarded broadcast path call THIS, so their edges
    are identical by construction."""
    n = len(keys)
    empty = pa.table({"key_a": keys.slice(0, 0), "key_b": keys.slice(0, 0)})
    if n < 2:
        return empty
    new_b = np.concatenate(
        [[True], (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
    pos = np.arange(n, dtype=np.int64)
    head = np.maximum.accumulate(np.where(new_b, pos, 0))
    # star phase, all buckets at once
    frac0 = (sigs == sigs[head]).mean(axis=1)
    star = (frac0 >= threshold) & (pos != head)
    out_a = [head[star]]
    out_b = [pos[star]]
    # i >= 1 pair phase, only buckets with >= 3 members — fully
    # vectorized segmented pair enumeration (semantics identical to the
    # sequential "for i: break when checked >= pair_limit" loop: row i
    # is processed iff the pairs its bucket's earlier i's checked,
    # C(i) = sum_{k=s+1}^{i-1} (e-1-k) = T(e-s-2) - T(e-i-1) with
    # T(x) = x(x+1)/2, stay under the cap; a processed i checks ALL its
    # j's). Replaces the per-bucket Python loop that dominated hot
    # exact-dup corpora.
    seg_starts = np.flatnonzero(new_b)
    seg_ends = np.append(seg_starts[1:], n)
    big = seg_ends - seg_starts >= 3
    if big.any():
        bs = seg_starts[big]
        be = seg_ends[big]
        n_i = be - bs - 2  # candidate i's per bucket: [s+1, e-2]
        off = np.concatenate([[0], np.cumsum(n_i)])
        I = (np.arange(off[-1], dtype=np.int64)
             - np.repeat(off[:-1], n_i) + np.repeat(bs + 1, n_i))
        Ee = np.repeat(be, n_i)
        Ss = np.repeat(bs, n_i)

        def _tri(x):
            return x * (x + 1) // 2

        checked_before = _tri(Ee - Ss - 2) - _tri(Ee - I - 1)
        keep_i = checked_before < pair_limit
        I, Ee = I[keep_i], Ee[keep_i]
        cnt_j = Ee - 1 - I
        joff = np.concatenate([[0], np.cumsum(cnt_j)])
        P = int(joff[-1])
        ia_all = np.repeat(I, cnt_j)
        ib_all = (np.arange(P, dtype=np.int64)
                  - np.repeat(joff[:-1], cnt_j) + ia_all + 1)
        # chunked compares bound the (rows, num_perm) gather temp
        ch = max(1, (1 << 22) // max(sigs.shape[1], 1))
        for lo in range(0, P, ch):
            a_idx = ia_all[lo: lo + ch]
            b_idx = ib_all[lo: lo + ch]
            frac = (sigs[a_idx] == sigs[b_idx]).mean(axis=1)
            hit = frac >= threshold
            out_a.append(a_idx[hit])
            out_b.append(b_idx[hit])
    ia = np.concatenate(out_a)
    if not len(ia):
        return empty
    ib = np.concatenate(out_b)
    return pa.table({
        "key_a": keys.take(pa.array(ia, pa.int64())),
        "key_b": keys.take(pa.array(ib, pa.int64())),
    })


def _coarse_verify(
    group: pa.Table, num_perm: int, threshold: float, pair_limit: int
) -> pa.Table:
    """Distributed-path wrapper: sort the coarse group by (band,
    band_hash, key) and run :func:`_verify_sorted`."""
    n = group.num_rows
    key_arr = group["key"]
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    if n < 2:
        return pa.table({"key_a": key_arr.slice(0, 0),
                         "key_b": key_arr.slice(0, 0)})
    idx = pc.sort_indices(group, sort_keys=[
        ("band", "ascending"), ("band_hash", "ascending"),
        ("key", "ascending")])
    g = group.take(idx)
    keys = g["key"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    sigs = _sigs_np(g["sig"], num_perm)
    band = g["band"].to_numpy(zero_copy_only=False)
    bh = g["band_hash"].to_numpy(zero_copy_only=False)
    return _verify_sorted(keys, sigs, band, bh, threshold, pair_limit)


def _band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) uint64 band hashes — the exact mix
    :func:`lsh_band_rows` uses (single source of truth for both the
    distributed band rows and the broadcast fast path)."""
    n, p = sigs.shape
    r = p // bands
    view = sigs.reshape(n, bands, r)
    mixed = np.zeros((n, bands), dtype=np.uint64)
    for j in range(r):
        mixed = mixed * np.uint64(1000003) + view[:, :, j]
    return mixed


def _edges_broadcast(
    ds, text_col: str, key_col: str, num_perm: int, bands: int,
    threshold: float, pair_limit: int, scheme: str = "kperm",
):
    """Size-guarded broadcast verify: the shuffle-free edges path.

    The distributed path explodes every doc into ``bands`` rows EACH
    carrying the full ``num_perm * 8``-byte signature — a 16x-duplicated
    payload that dominates the verify groupby (measured 10.8 GB shuffled
    for 600k docs / 0.6 GB of signatures). When the signature table fits
    the broadcast guard, skip the shuffle entirely:

    1. ONE streaming pass -> (key, sig) table, collected zero-copy
       (signature-table-sized: n_docs * (num_perm*8 + key) bytes —
       that this fits is exactly what the guard checked);
    2. band hashes + the (band, band_hash, key-rank) sort run driver-side
       in numpy (9.6M-row lexsort, seconds);
    3. verification fans out as Ray tasks over CONTIGUOUS bucket ranges
       of the sorted order, each gathering its rows from the ray.put
       signature matrix (plasma zero-copy) and running the same
       :func:`_verify_sorted` kernel as the distributed path — edges are
       identical by construction (tested).
    """
    import ray
    import ray.data as rd

    make_sigs = _sig_fn(scheme)

    def sig_tbl(batch: pa.Table) -> pa.Table:
        batch = _valid_text(batch, text_col)
        sigs = make_sigs(batch[text_col], num_perm)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        sig_arr = pa.Array.from_buffers(
            pa.binary(num_perm * 8), len(keys),
            [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())])
        # band hashes computed HERE, in parallel with the signatures —
        # a driver-side _band_hashes over the full matrix measured
        # 2.4-3.5 s single-threaded at 600k docs
        bh_arr = pa.Array.from_buffers(
            pa.binary(bands * 8), len(keys),
            [None, pa.py_buffer(np.ascontiguousarray(
                _band_hashes(sigs, bands)).tobytes())])
        return pa.table({"key": keys, "sig": sig_arr, "bh": bh_arr})

    blocks = [t for t in ray.get(
        ds.map_batches(sig_tbl, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not blocks:
        return rd.from_arrow(pa.table({"key_a": pa.array([], pa.string()),
                                       "key_b": pa.array([], pa.string())}))
    # assemble the matrix from per-block buffer views (ONE memcpy into
    # the concat target, no combine_chunks round-trip of the sig column)
    sigs = np.concatenate(
        [_sigs_np(b["sig"].combine_chunks()
                  if isinstance(b["sig"], pa.ChunkedArray) else b["sig"],
                  num_perm) for b in blocks])
    mixed = np.concatenate(
        [_sigs_np(b["bh"].combine_chunks()
                  if isinstance(b["bh"], pa.ChunkedArray) else b["bh"],
                  bands) for b in blocks])
    keys = pa.concat_arrays(
        [b["key"].combine_chunks()
         if isinstance(b["key"], pa.ChunkedArray) else b["key"]
         for b in blocks])
    del blocks
    return _edges_from_matrix(keys, sigs, bands, threshold, pair_limit,
                              band_hashes=mixed)


def _edges_from_matrix(keys: pa.Array, sigs: np.ndarray, bands: int,
                       threshold: float, pair_limit: int,
                       band_hashes: np.ndarray | None = None):
    """Steps 2-3 of the broadcast verify over an in-memory
    (keys, signature-matrix) pair — shared with the incremental
    candidate-probe path (neardup_incremental.py), which assembles its
    matrix from shard + index-candidate signatures. ``band_hashes``
    (n, bands) may be precomputed in the signature workers (parallel);
    derived here when absent."""
    import ray
    import ray.data as rd

    n = len(keys)
    mixed = _band_hashes(sigs, bands) if band_hashes is None else band_hashes
    # key order via ranks (equal keys share a rank — their edges are
    # equal strings either way, matching the distributed per-group sort)
    rank = np.empty(n, dtype=np.int64)
    order_keys = pc.sort_indices(keys).to_numpy(zero_copy_only=False)
    rank[order_keys] = np.arange(n, dtype=np.int64)
    # partition rows into (band, bh-top-bits) chunks with a COUNTING
    # sort (argsort of a small uint16 key — no 9.6M-row 3-key lexsort on
    # the driver); a logical (band, band_hash) bucket never splits
    # across chunks because the chunk key is a prefix of (band, bh), and
    # every row of a chunk shares ONE band value (the key's high bits).
    # Each verify task lexsorts only ITS slice — parallel, off-driver.
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    sub_bits = max(1, int(np.ceil(np.log2(max(cpus * 4 // bands, 2)))))
    band_flat = np.repeat(np.arange(bands, dtype=np.int32), n)
    bh_flat = mixed.T.reshape(-1)  # band-major, matches band_flat
    doc_flat = np.tile(np.arange(n, dtype=np.int64), bands)
    chunk_id = (band_flat.astype(np.uint16) << sub_bits) \
        | (bh_flat >> np.uint64(64 - sub_bits)).astype(np.uint16)
    order = np.argsort(chunk_id, kind="stable")
    counts = np.bincount(chunk_id, minlength=bands << sub_bits)
    bounds = np.concatenate([[0], np.cumsum(counts)])

    # the sorted row arrays go into the object store ONCE; each verify
    # task receives (lo, hi) and slices them zero-copy from plasma —
    # per-task argument slices measured ~2 s of driver serialization at
    # 9.6M rows
    keys_ref = ray.put(keys)
    sigs_ref = ray.put(sigs)
    rows_ref = ray.put((bh_flat[order], doc_flat[order],
                        rank[doc_flat[order]]))

    @ray.remote(num_cpus=1)
    def verify_chunk(ks, sg, rows, lo, hi):
        bh_c = rows[0][lo:hi]
        doc_c = rows[1][lo:hi]
        rank_c = rows[2][lo:hi]
        # band is constant within a chunk, so bucket boundaries come
        # from bh alone — a zero band axis keeps _verify_sorted exact
        srt = np.lexsort((rank_c, bh_c))
        doc_c = doc_c[srt]
        return _verify_sorted(ks.take(pa.array(doc_c, pa.int64())),
                              sg[doc_c],
                              np.zeros(hi - lo, dtype=np.int32),
                              bh_c[srt], threshold, pair_limit)

    refs = [verify_chunk.remote(keys_ref, sigs_ref, rows_ref,
                                int(lo), int(hi))
            for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    return rd.from_arrow_refs(refs)


def minhash_lsh_edges(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    pair_limit_per_bucket: int = 1000,
    num_coarse_buckets: int | None = None,
    max_broadcast_docs: int | None = None,
    n_docs: int | None = None,
    scheme: str = "kperm",
):
    """Dataset -> Dataset of verified near-dup edges (key_a, key_b).

    ``scheme`` picks the signature kernel: ``"kperm"`` (default, the
    classic num_perm-permutation MinHash) or ``"oph"`` (One-Permutation
    Hashing — ~num_perm x less hash arithmetic, see
    :func:`minhash_signatures_oph`; flags differ slightly near the
    threshold, so keep one scheme per corpus run).

    One streaming signature pass, then ONE of two verify plans behind
    the usual size guard (the FK-join broadcast/distributed split):

    - **broadcast fast path** (corpus <= ``max_broadcast_docs``, default
      ``DEFAULT_MAX_BROADCAST_KEYS``): signature table collected once,
      thin band rows sorted driver-side, verification fanned out as
      tasks against the broadcast signature matrix — no shuffle at all
      (see :func:`_edges_broadcast`);
    - **distributed path** (any scale): band rows carrying their
      signatures through ONE coarse-bucket groupby — (band, band_hash)
      folded into ``num_coarse_buckets`` shuffle keys so each group
      vectorizes many logical buckets instead of paying per-group Python
      on millions of tiny ones — and verification inside each bucket;
      nothing corpus-sized ever reaches the driver.

    Both run the same :func:`_verify_sorted` kernel per logical bucket,
    so edges are identical (tested); they may repeat across bands
    (harmless for the min-label clustering, which is idempotent).

    ``num_coarse_buckets`` defaults to ~128 band rows per bucket
    (clamped) — measured fastest at the bench scale; too few buckets
    degrade Ray's range-partition sort badly (massive key ties: 256
    buckets over 9.6M rows measured 2.5x slower than 64k) and unbound
    the per-group memory at corpus scale. Sizing needs ``n_docs`` —
    derived from ``ds.count()`` when not given, which is cheap for
    parquet reads; pass it explicitly when ``ds`` is a derived pipeline
    (count() would execute it once)."""
    from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS

    if n_docs is None:
        n_docs = ds.count()
    if max_broadcast_docs is None:
        # BYTE-based guard, not the thin-key knob: the broadcast path
        # holds the signature matrix on the driver twice (collected +
        # ray.put copy, num_perm * 8 B/doc each) plus (band, hash, rank)
        # arrays and their lexsort temps (~bands * 32 B/doc). The 2M
        # DEFAULT_MAX_BROADCAST_KEYS is calibrated for ~8-B key sets —
        # ~20x lighter per row than a signature — so cap by a driver
        # memory budget scaled to the actual per-doc payload.
        per_doc_bytes = 2 * num_perm * 8 + bands * 32
        max_broadcast_docs = min(
            DEFAULT_MAX_BROADCAST_KEYS,
            _BROADCAST_VERIFY_BUDGET_BYTES // per_doc_bytes)
    if max_broadcast_docs and n_docs <= max_broadcast_docs:
        return _edges_broadcast(ds, text_col, key_col, num_perm, bands,
                                jaccard_threshold, pair_limit_per_bucket,
                                scheme)
    if num_coarse_buckets is None:
        num_coarse_buckets = coarse_buckets_for(n_docs, bands)
    make_sigs = _sig_fn(scheme)

    def sig_batch(batch: pa.Table) -> pa.Table:
        batch = _valid_text(batch, text_col)
        sigs = make_sigs(batch[text_col], num_perm)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        return _add_coarse_bucket(
            lsh_band_rows(keys, sigs, bands), num_coarse_buckets)

    # materialize the band rows BEFORE the groupby: its sort shuffle
    # holds the full input at the barrier either way (all-to-all), but
    # feeding it the lazy signature pipeline measured 86.5 s vs 48.6 s
    # split at 600k docs (Ray 2.49 re-derives lazy inputs around the
    # sort's sampling); band rows are metadata-thin (key + band ids +
    # one signature slice per row), never the corpus text
    band_rows = ds.map_batches(sig_batch,
                               batch_format="pyarrow").materialize()
    return band_rows.groupby("_cb").map_groups(
        lambda g: _coarse_verify(g.drop_columns(["_cb"]), num_perm,
                                 jaccard_threshold, pair_limit_per_bucket),
        batch_format="pyarrow",
    )


def _local_min_labels(src: np.ndarray, dst: np.ndarray):
    """Connected components over an in-memory edge list: vectorized
    min-label propagation with pointer jumping (O(E) per round, O(log n)
    rounds). Returns (keys, labels) — label is the component-minimum key,
    identical semantics to the distributed path (np.unique sorts
    ascending, and UTF-8 byte order equals code-point order, so the min
    index IS the min key for both ints and strings)."""
    keys, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    s = inv[: len(src)]
    d = inv[len(src):]
    lab = np.arange(len(keys), dtype=np.int64)
    for _ in range(64):
        new = lab.copy()
        np.minimum.at(new, s, lab[d])
        np.minimum.at(new, d, lab[s])
        new = new[new]  # pointer jump: label <- label(label)
        if np.array_equal(new, lab):
            return keys, keys[lab]
        lab = new
    raise RuntimeError("local min-label propagation did not converge")


def propagate_min_labels(
    edges,
    num_partitions: int = 16,
    max_iters: int = 30,
    local_edge_limit: int = 2_000_000,
):
    """Connected components over an edge Dataset via iterative min-label
    propagation — the distributed replacement for driver union-find.

    Each round every node takes the minimum label among itself and its
    neighbors (join edges->labels, groupby key -> Min); converges in
    O(max component diameter) rounds (near-dup clusters are shallow).
    Returns a Dataset (key, label) covering every node incident to an
    edge; label is the component minimum (the deterministic representative).
    Only label/edge-sized data is ever materialized (object store, not
    driver heap).

    Size-guarded fast path: the edge list is *near-dup-set*-sized, not
    corpus-sized, so when it fits (``local_edge_limit`` edges) the
    components are computed with one vectorized in-memory pass instead of
    paying several fixed-cost join rounds — the same guarded
    small-side/distributed-fallback split as the FK broadcast joins.
    Outputs are identical either way (tested)."""
    from ray.data.aggregate import Min

    from ..dsutil import compact as _compact

    def _empty_labels():
        import ray.data as rd

        return rd.from_arrow(pa.table({"key": pa.array([], pa.int64()),
                                       "label": pa.array([], pa.int64())}))

    import ray

    # ONE execution of a lazy edge pipeline: count(), the local-path
    # collect and the distributed sym pass all read the materialized
    # blocks (edge-sized — the output of the verify phase, never corpus-
    # sized)
    edges = edges.materialize()
    n_edges = edges.count()
    if not n_edges:
        # zero verified edges: groupby/join over only-empty (schema-less)
        # blocks would crash — the empty label set is the correct answer
        return _empty_labels()

    if n_edges <= local_edge_limit:
        # local fast path collects the edge blocks zero-copy and runs the
        # in-memory kernel directly — the former sym-pass + repartition +
        # driver iter_batches spent ~4 s of fixed Ray stage cost on a
        # near-dup-set-sized list (it exists only to feed the distributed
        # join rounds below)
        import ray.data as rd

        tabs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        srcs = [(t["key_a"].combine_chunks()
                 if isinstance(t["key_a"], pa.ChunkedArray)
                 else t["key_a"]).to_numpy(zero_copy_only=False)
                for t in tabs]
        dsts = [(t["key_b"].combine_chunks()
                 if isinstance(t["key_b"], pa.ChunkedArray)
                 else t["key_b"]).to_numpy(zero_copy_only=False)
                for t in tabs]
        keys, labs = _local_min_labels(np.concatenate(srcs),
                                       np.concatenate(dsts))
        return rd.from_arrow(pa.table({"key": pa.array(keys),
                                       "label": pa.array(labs)}))

    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table({"src": batch["key_a"], "dst": batch["key_b"]})
        rev = pa.table({"src": batch["key_b"], "dst": batch["key_a"]})
        return pa.concat_tables([fwd, rev])

    adj = _compact(edges.map_batches(sym, batch_format="pyarrow"),
                   num_partitions)

    def init_lab(batch: pa.Table) -> pa.Table:
        m = pc.min_element_wise(batch["src"], batch["dst"])
        return pa.table({"key": batch["src"], "label": m})

    labels = _compact(
        adj.map_batches(init_lab, batch_format="pyarrow")
        .groupby("key").aggregate(Min("label", alias_name="label")),
        num_partitions,
    )
    if not labels.count():
        return labels

    converged = False
    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda b: b.rename_columns(["src", "label"]), batch_format="pyarrow")
        msgs = adj.join(lab_src, "inner", num_partitions=num_partitions,
                        on=("src",))
        cand = msgs.map_batches(
            lambda b: pa.table({"key": b["dst"], "label": b["label"]}),
            batch_format="pyarrow")
        new_labels = _compact(
            cand.union(labels)
            .groupby("key").aggregate(Min("label", alias_name="label")),
            num_partitions,
        )
        # pointer-jumping shortcut: label <- label(label). Every label IS
        # a node key (component minima propagate through node ids), so an
        # inner self-join is total; this turns O(diameter) convergence
        # into O(log diameter) — a 10^6-long near-dup chain converges in
        # ~20 rounds instead of silently hitting the iteration cap.
        lab_of = new_labels.map_batches(
            lambda b: b.rename_columns(["label", "label2"]),
            batch_format="pyarrow")
        jumped = new_labels.join(lab_of, "inner",
                                 num_partitions=num_partitions, on=("label",))
        new_labels = _compact(
            jumped.map_batches(
                lambda b: pa.table({
                    "key": b["key"],
                    "label": pc.min_element_wise(b["label"], b["label2"]),
                }),
                batch_format="pyarrow"),
            num_partitions,
        )
        old = labels.map_batches(
            lambda b: b.rename_columns(["key", "old_label"]),
            batch_format="pyarrow")
        diff = new_labels.join(old, "inner", num_partitions=num_partitions,
                               on=("key",))

        def count_changed(b: pa.Table) -> pa.Table:
            ne = pc.not_equal(b["label"], b["old_label"])
            return pa.table({"c": pa.array(
                [int(pc.sum(pc.cast(ne, pa.int64())).as_py() or 0)], pa.int64())})

        changed = diff.map_batches(count_changed, batch_format="pyarrow").sum("c")
        labels = new_labels
        if not changed:
            converged = True
            break
    if not converged:
        # never return silently-wrong clusters: with pointer jumping this
        # needs component diameter > 2^max_iters, i.e. a pathology worth
        # surfacing loudly
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds")
    return labels


def minhash_lsh_labels(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    pair_limit_per_bucket: int = 1000,
    num_coarse_buckets: int | None = None,
    max_broadcast_docs: int | None = None,
    n_docs: int | None = None,
    scheme: str = "kperm",
):
    """Scale API: Dataset -> Dataset (key, label) of near-dup cluster
    labels (label = cluster-minimum key). Keys with no near-dup are absent.
    Fully distributed end to end — safe to write_parquet at any scale."""
    edges = minhash_lsh_edges(
        ds, text_col, key_col, num_perm, bands,
        jaccard_threshold, pair_limit_per_bucket, num_coarse_buckets,
        max_broadcast_docs=max_broadcast_docs, n_docs=n_docs,
        scheme=scheme,
    ).materialize()
    return propagate_min_labels(edges)


def minhash_lsh_dedup(
    ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    pair_limit_per_bucket: int = 1000,
    scheme: str = "kperm",
):
    """Full MinHash-LSH near-dup pipeline over a Dataset.

    Returns ``(clusters, rep_of)``: list of near-dup clusters (each a
    sorted list of keys, len >= 2) and a {key: representative} map where
    the representative is the cluster minimum (deterministic keep-first).

    Convenience wrapper over :func:`minhash_lsh_labels`: only the final
    (key, label) rows — the *near-duplicate set*, not the corpus — are
    pulled to the driver to build the Python return value. Use
    ``minhash_lsh_labels`` directly when even that set is large."""
    labels = minhash_lsh_labels(
        ds, text_col, key_col, num_perm, bands,
        jaccard_threshold, pair_limit_per_bucket, scheme=scheme,
    )
    clusters_map: dict = {}
    for r in labels.take_all():
        clusters_map.setdefault(r["label"], []).append(r["key"])
    clusters = sorted(sorted(c) for c in clusters_map.values() if len(c) >= 2)
    rep_of = {k: c[0] for c in clusters for k in c}
    return clusters, rep_of


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """64-bit SimHash fingerprint per doc (deterministic, vectorized)."""
    data, offsets = byte_view(texts)
    hashes, starts, counts = _shingles(data, offsets)
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    total = len(hashes)
    if total == 0 or n_docs == 0:
        return out
    # per-doc bit votes via segment-reduce (no per-doc Python): unpack each
    # chunk of shingle hashes to (chunk, 64) bits and np.add.reduceat into
    # int64 per-doc counts (int64 accumulate — uint8 reduceat would wrap);
    # chunking bounds the unpacked temp regardless of batch size.
    nz = np.flatnonzero(counts > 0)
    nz_starts = starts[nz]
    bitcounts = np.zeros((n_docs, 64), dtype=np.int64)
    chunk = 1 << 16
    for lo in range(0, total, chunk):
        hi = min(lo + chunk, total)
        bits = np.unpackbits(
            hashes[lo:hi].view(np.uint8).reshape(-1, 8), axis=1)  # (c, 64)
        d0 = int(np.searchsorted(nz_starts, lo, "right")) - 1
        d1 = int(np.searchsorted(nz_starts, hi, "left"))
        seg = np.maximum(nz_starts[d0:d1], lo) - lo
        idx = nz[d0:d1]
        bitcounts[idx] += np.add.reduceat(bits, seg, axis=0, dtype=np.int64)
    votes = bitcounts * 2 - counts.astype(np.int64)[:, None]  # +/-1 votes
    fps = np.packbits((votes >= 0).astype(np.uint8), axis=1)  # (n_docs, 8)
    out = np.ascontiguousarray(fps).view(np.uint64).ravel()
    out[counts == 0] = 0  # empty docs keep the sentinel fingerprint
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_neardup_pairs(
    keys: list, fingerprints: np.ndarray, max_hamming: int = 3
) -> list[tuple]:
    """Near-dup pairs within a Hamming radius via the 4x16-bit pigeonhole
    bucketing (any pair within radius 3 shares at least one exact 16-bit
    quarter). Deterministic output order.

    ``max_hamming`` must be <= 3: with 4 sub-keys the pigeonhole guarantee
    breaks at radius 4 (the differing bits can span all four quarters), so
    larger radii would silently miss qualifying pairs.
    """
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the radius-3 recall "
            "guarantee of 4x16-bit pigeonhole bucketing; use more sub-keys "
            "or an all-pairs scan for larger radii"
        )
    buckets: dict = {}
    for i, fp in enumerate(fingerprints):
        for q in range(4):
            sub = int((int(fp) >> (16 * q)) & 0xFFFF)
            buckets.setdefault((q, sub), []).append(i)
    seen = set()
    pairs = []
    for members in buckets.values():
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                i, j = members[ai], members[bi]
                if (i, j) in seen:
                    continue
                seen.add((i, j))
                if hamming64(fingerprints[i : i + 1], fingerprints[j : j + 1])[0] <= max_hamming:
                    pairs.append(tuple(sorted((keys[i], keys[j]))))
    return sorted(set(pairs))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    keys: list, vectors: np.ndarray, threshold: float = 0.95
) -> list[tuple]:
    """All pairs with cosine >= threshold (block matmul; float64).

    PER-BUCKET KERNEL ONLY: O(n^2) in its input size, so it must run on
    LSH-bucketed candidate groups (see :func:`embedding_neardup_edges`),
    never on a whole dataset."""
    v = vectors.astype(np.float64)
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    v = v / np.maximum(norms, 1e-12)
    sims = v @ v.T
    iu = np.triu_indices(len(keys), k=1)
    mask = sims[iu] >= threshold
    return sorted(
        (keys[i], keys[j]) if keys[i] <= keys[j] else (keys[j], keys[i])
        for i, j in zip(iu[0][mask], iu[1][mask])
    )


def embedding_neardup_edges(
    ds,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    n_tables: int = 8,
    n_planes: int = 8,
    seed: int = 42,
    pair_limit_per_bucket: int = 1000,
):
    """Distributed embedding near-dup: the whole-set O(n^2) matmul becomes
    a per-bucket kernel behind a sign-random-projection LSH partitioner.

    ``n_tables`` independent hyperplane tables boost recall (a cosine>=0.95
    pair collides in at least one of 8 8-plane tables w.p. ~0.99); ONE
    groupby on (table, sig) co-locates each bucket; duplicate pair hits
    across tables are deduplicated with a second (pair-sized) groupby.
    Returns a Dataset (key_a, key_b).

    Hot buckets are bounded by the same semantics as the MinHash path's
    ``_bucket_verify``: star edges from the (key-sorted) bucket head are
    ALWAYS checked — linear in bucket size, so a degenerate bucket of
    thousands of identical embeddings (exactly what a near-dup corpus
    contains) stays fully connected through the head and still collapses
    to one cluster — while the remaining i>=1 pair comparisons are capped
    at ``pair_limit_per_bucket`` per bucket, keeping the worst-case
    per-bucket work O(n + pair_limit) instead of O(n^2)."""
    from .similarity import LSHIndex, _normalize, _vecs_np

    dim = len(ds.take(1)[0][vec_col])
    plane_mats = [LSHIndex(dim, n_planes, seed + t).planes
                  for t in range(n_tables)]

    def assign(batch: pa.Table) -> pa.Table:
        v = _normalize(_vecs_np(batch[vec_col]))
        n = len(v)
        parts = []
        for t, planes in enumerate(plane_mats):
            bits = (v @ planes.T) >= 0
            sig = np.zeros(n, dtype=np.int64)
            for b in range(n_planes):
                sig |= bits[:, b].astype(np.int64) << b
            parts.append(pa.table({
                "table": pa.array(np.full(n, t, np.int32)),
                "sig": pa.array(sig),
                key_col: batch[key_col],
                vec_col: batch[vec_col],
            }))
        return pa.concat_tables(parts)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        keys = group[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        empty = pa.table({"key_a": keys.slice(0, 0), "key_b": keys.slice(0, 0)})
        n = group.num_rows
        if n < 2:
            return empty
        # deterministic: key-sort the bucket so the star center and the
        # cap's scan order never depend on shuffle arrival order; with
        # sorted keys and i<j every emitted pair is already canonical
        # (key_a <= key_b) for the cross-table dedup groupby
        order = pc.sort_indices(keys)
        keys = keys.take(order)
        v = _normalize(_vecs_np(group[vec_col]))[order.to_numpy()]
        ia: list[int] = []
        ib: list[int] = []
        # star phase (always, linear): one matvec against the head row
        hit0 = np.flatnonzero(v[1:] @ v[0] >= threshold) + 1
        ia.extend([0] * len(hit0))
        ib.extend(hit0.tolist())
        checked = 0
        for i in range(1, n - 1):
            if checked >= pair_limit_per_bucket:
                break
            hits = np.flatnonzero(v[i + 1:] @ v[i] >= threshold) + i + 1
            ia.extend([i] * len(hits))
            ib.extend(hits.tolist())
            checked += n - 1 - i
        if not ia:
            return empty
        return pa.table({
            "key_a": keys.take(pa.array(ia, pa.int64())),
            "key_b": keys.take(pa.array(ib, pa.int64())),
        })

    edges = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["table", "sig"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # same pair can surface from several tables: keep one copy — a plain
    # groupby aggregate (vectorized sort-based distinct), not per-group
    # Python via map_groups
    from ray.data.aggregate import Count

    return (
        edges.groupby(["key_a", "key_b"])
        .aggregate(Count(alias_name="_hits"))
        .map_batches(lambda b: b.drop_columns(["_hits"]),
                     batch_format="pyarrow")
    )


def mark_near_duplicates(
    ds,
    text_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path", "commit"),
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    num_partitions: int | None = None,
    max_broadcast_losers: int | None = None,
    keep: str = "min_key",
    quality_col: str | None = None,
    scheme: str = "kperm",
):
    """Corpus-level near-dedup: append ``near_dup_flag`` (True = drop, the
    row is a non-representative member of a near-dup cluster).

    NULL ``text_col`` rows never participate (flag always False) —
    consistent with exact dedup's NULL-key exclusion and the spans NULL
    semantic; see :func:`_valid_text`. Empty-but-non-NULL docs DO
    cluster with each other (empty-set Jaccard = 1.0, jaccard()).

    ``keep`` selects the cluster representative: ``"min_key"`` (default,
    deterministic, unbounded scale) keeps the minimum-key member;
    ``"max_quality"`` keeps the member with the greatest ``quality_col``
    (ties -> min key; NULL quality never wins unless the whole cluster
    is NULL) — the curation policy that retains the BEST near-duplicate
    instead of an arbitrary one. Quality selection materializes the
    cluster-member (key, label, quality) rows driver-side — near-dup-
    SET-sized, bounded by ``max_broadcast_losers`` (raises beyond it;
    fall back to ``min_key`` for corpora whose near-dup set itself
    outgrows memory).

    Composition of the distributed primitives: a deterministic string key
    is derived from ``id_cols``, clusters come from
    :func:`minhash_lsh_labels`, and the loser set (key != label) flows
    back onto the corpus through the size-guarded broadcast/distributed
    split (the FK-join knob): a loser set that fits
    (``max_broadcast_losers``, default dsutil's 2M keys) is broadcast
    once and checked per batch with ``pc.is_in`` — NO corpus shuffle at
    all — while a larger one falls back to the distributed left-outer
    join (which must move the content-bearing corpus through the join
    exchange). Opt-in next to exact dedup (stages/dedup.py): exact dedup
    is the flagship default because the keep/drop contract is
    exact-content-keyed; near-dedup is the aggressive variant for
    training-data curation.

    ``scheme`` (round-5 decision, BASELINE.md round-5 recall table):
    ``"kperm"`` STAYS the default — the planted-pair eval
    (neardup_recall_corpus) measures both schemes at recall 1.0 /
    false-cluster 0 at 600k docs, but their near-threshold flag sets on
    ORGANIC pairs differ ~4% (16,697 vs 16,006 at sf0.1), and the
    4-round flag lineage that anchors regression tracking is kperm.
    ``scheme="oph"`` is the recommended 100-TB preset: ~2.4-2.9x
    cheaper end-to-end with identical planted-pair quality; pick one
    scheme per corpus and keep it for the corpus's lifetime
    (signatures/indexes are not comparable across schemes)."""
    from ..dsutil import (DEFAULT_MAX_BROADCAST_KEYS, compact,
                          join_partitions)

    if num_partitions is None:
        num_partitions = join_partitions()
    if max_broadcast_losers is None:
        max_broadcast_losers = DEFAULT_MAX_BROADCAST_KEYS

    def add_key(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch[id_cols[0]], pa.string())
        for c in id_cols[1:]:
            k = pc.binary_join_element_wise(k, pc.cast(batch[c], pa.string()),
                                            "\x1f")
        return batch.append_column("_nd_key", k)

    # count the RAW input (metadata-cheap for parquet reads) so the
    # coarse-bucket sizing never has to count the derived keyed pipeline
    n_docs = ds.count()
    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    labels = minhash_lsh_labels(
        keyed, text_col=text_col, key_col="_nd_key",
        num_perm=num_perm, bands=bands, jaccard_threshold=jaccard_threshold,
        num_coarse_buckets=coarse_buckets_for(n_docs, bands),
        n_docs=n_docs, scheme=scheme)

    def _all_false():
        return keyed.map_batches(
            lambda b: b.append_column(
                "near_dup_flag",
                pa.array(np.zeros(b.num_rows, bool))).drop_columns(
                    ["_nd_key"]),
            batch_format="pyarrow")

    def _flag_from_broadcast(loser_arr: pa.Array):
        import ray

        loser_ref = ray.put(loser_arr)

        def flag(batch: pa.Table) -> pa.Table:
            vals = ray.get(loser_ref)
            f = pc.is_in(batch["_nd_key"], value_set=vals)
            return batch.drop_columns(["_nd_key"]).append_column(
                "near_dup_flag", pc.fill_null(f, False))

        return keyed.map_batches(flag, batch_format="pyarrow")

    if keep not in ("min_key", "max_quality"):
        raise ValueError(f"keep={keep!r}")
    if keep == "max_quality":
        import ray

        if quality_col is None:
            raise ValueError("keep='max_quality' requires quality_col")
        lab_tabs = [t for t in ray.get(
            labels.materialize().to_arrow_refs()) if t.num_rows]
        if not lab_tabs:
            return _all_false()
        lab = pa.concat_tables(lab_tabs).combine_chunks()
        if lab.num_rows > max_broadcast_losers:
            raise ValueError(
                f"max_quality selection needs the {lab.num_rows}-row "
                "cluster-member set driver-side, above "
                f"max_broadcast_losers={max_broadcast_losers}; use "
                "keep='min_key' at this near-dup-set scale")
        member_ref = ray.put(lab["key"].combine_chunks().cast(pa.string()))

        def member_quality(batch: pa.Table) -> pa.Table:
            t = pa.table({"_nd_key": batch["_nd_key"],
                          "_q": batch[quality_col]})
            hit = pc.is_in(t["_nd_key"], value_set=ray.get(member_ref))
            return t.filter(pc.fill_null(hit, False))

        q = pa.concat_tables([t for t in ray.get(
            keyed.map_batches(member_quality, batch_format="pyarrow")
                 .materialize().to_arrow_refs()) if t.num_rows]
        ).combine_chunks()
        qual = pc.take(q["_q"].combine_chunks(), pc.index_in(
            lab["key"].combine_chunks().cast(pa.string()),
            q["_nd_key"].combine_chunks().cast(pa.string())))
        t = pa.table({"label": lab["label"], "key": lab["key"], "q": qual})
        # winner per cluster: greatest quality, tie -> min key; NULL
        # quality sorts last (never wins unless the cluster is all-NULL)
        idx = pc.sort_indices(t, sort_keys=[
            ("label", "ascending"), ("q", "descending"),
            ("key", "ascending")])
        t = t.take(idx)
        labs = t["label"].combine_chunks()
        n = len(labs)
        neq = pc.not_equal(labs.slice(1, n - 1), labs.slice(0, n - 1))
        first = np.concatenate(
            [[True], neq.to_numpy(zero_copy_only=False).astype(bool)])
        loser_arr = t["key"].combine_chunks().cast(pa.string()).filter(
            pa.array(~first))
        if len(loser_arr) == 0:
            return _all_false()
        return _flag_from_broadcast(loser_arr)

    def losers_only(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch["key"], batch["label"])
        t = batch.filter(mask)
        n = t.num_rows
        return pa.table({"_nd_key": t["key"],
                         "_nd_loser": pa.array(np.ones(n, np.int8))})

    losers = compact(labels.map_batches(losers_only, batch_format="pyarrow"),
                     num_partitions)

    n_losers = losers.count()
    if not n_losers:
        return _all_false()

    if n_losers <= max_broadcast_losers:
        parts = []
        for b in losers.iter_batches(batch_size=1 << 16,
                                     batch_format="pyarrow"):
            col = b["_nd_key"]
            parts.append(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
        return _flag_from_broadcast(pa.concat_arrays(
            [p.cast(pa.string()) for p in parts]))

    # rare fallback (loser set too large to broadcast): the corpus must
    # ride the join exchange, and a filtered/derived input can carry empty
    # blocks that poison Ray's hash join (dsutil.compact) — so THIS path
    # compacts the corpus side; the common broadcast path above never
    # joins and never pays that double materialization
    joined = compact(keyed, num_partitions).join(
        losers, "left_outer", num_partitions=num_partitions, on=("_nd_key",))

    def finalize(batch: pa.Table) -> pa.Table:
        flag = pc.is_valid(batch["_nd_loser"])
        return batch.drop_columns(["_nd_key", "_nd_loser"]).append_column(
            "near_dup_flag", flag)

    return joined.map_batches(finalize, batch_format="pyarrow")
