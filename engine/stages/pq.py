"""Product Quantization ANN — the compressed-domain scale path.

PQ (Jegou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011) splits each d-dim vector into ``m`` subvectors and
vector-quantizes each subspace against its own ``ks``-entry codebook, so
a float32[d] embedding becomes ``m`` uint8 codes (e.g. 128 B -> 8 B) and
query-to-database distances are computed WITHOUT decompressing: one
(m, ks) lookup table of subspace distances per query, then a distance is
``m`` table lookups + a sum (asymmetric distance computation, ADC).

Scale shape, matching the IVF/LSH siblings in stages/similarity.py:

- **codebooks fit on a BOUNDED sample** (first ``sample_size`` rows in
  dataset order — deterministic), pure driver-side numpy Lloyd per
  subspace; at 100 TB the fit never sees more than the sample;
- **encoding streams**: codebooks broadcast once via ``ray.put``, every
  batch quantizes its own rows -> (key, fixed_size_binary(m)) codes,
  16-64x smaller than the vectors — THE artifact you persist and
  re-search;
- **search streams**: per batch, codes (from vectors on the fly, or a
  pre-encoded code table) are scored against the per-query LUT and only
  partial top-k rows reach the driver (same `_merge_partials` shape and
  exact tie policy — full (dist asc, key asc) order — as the exact
  brute-force path, so results are identical at any parallelism).

Cosine note: vectors are L2-normalized first, so L2-NN == cosine-NN and
PQ's ADC approximates the same ranking the exact kernels use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _col_np, _merge_partials, _normalize, _vecs_np


def _lloyd(x: np.ndarray, ks: int, iters: int) -> np.ndarray:
    """Deterministic driver-side k-means for one subspace: seeded by the
    first ``ks`` sample rows, empty clusters keep their centroid."""
    cents = x[:ks].astype(np.float64).copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)  # ties -> lowest code (deterministic)
        sums = np.zeros_like(cents)
        np.add.at(sums, a, x)
        cnt = np.bincount(a, minlength=ks)
        nz = cnt > 0
        cents[nz] = sums[nz] / cnt[nz, None]
    return cents


def pq_fit_sample(ds, vec_col: str = "embedding", m: int = 8, ks: int = 16,
                  sample_size: int = 65536, iters: int = 8,
                  key_col: str = "vec_id",
                  sample: np.ndarray | None = None) -> np.ndarray:
    """Fit PQ codebooks on a bounded deterministic sample (seeded
    hash-threshold row sample — uniform across the corpus, unlike a
    ``limit(n)`` that sees only the first files; identical at any
    parallelism). Pass ``sample`` (raw vectors) to reuse one sampling
    pass across several model fits.

    Returns (m, ks, d/m) float64 codebooks. ``d`` must divide by ``m``;
    ``ks <= 256`` (codes are uint8).
    """
    from .similarity import hash_sample_vectors

    if ks > 256:
        raise ValueError("ks > 256 does not fit uint8 codes")
    raw = sample if sample is not None else hash_sample_vectors(
        ds, vec_col, key_col, sample_size)
    if len(raw) < ks:
        raise ValueError(f"sample has {len(raw)} rows < ks={ks}")
    vecs = _normalize(raw)
    d = vecs.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack([
        _lloyd(vecs[:, j * dsub:(j + 1) * dsub], ks, iters)
        for j in range(m)
    ])


def _encode(vecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes — nearest centroid per subspace, vectorized."""
    m, ks, dsub = codebooks.shape
    n = vecs.shape[0]
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        x = vecs[:, j * dsub:(j + 1) * dsub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 is rank-free
        d = x @ (-2.0 * codebooks[j].T)
        d += (codebooks[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = d.argmin(axis=1)
    return codes


def pq_encode(ds, codebooks: np.ndarray, vec_col: str = "embedding",
              key_col: str = "vec_id"):
    """Stream-encode vectors to PQ codes: Dataset (key_col,
    ``pq_code`` fixed_size_binary(m)) — the persisted compressed table."""
    import ray

    m = codebooks.shape[0]
    cref = ray.put(codebooks)

    def do(batch: pa.Table) -> pa.Table:
        cb = ray.get(cref)
        codes = _encode(_normalize(_vecs_np(batch[vec_col])), cb)
        return pa.table({
            key_col: batch[key_col],
            "pq_code": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), len(codes),
                [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())]),
        })

    return ds.map_batches(do, batch_format="pyarrow")


def _lut(q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n_q, m, ks) squared subspace distances of each query to every
    codebook entry — the ADC lookup tables."""
    m, ks, dsub = codebooks.shape
    n_q = q.shape[0]
    out = np.empty((n_q, m, ks), dtype=np.float64)
    for j in range(m):
        diff = q[:, None, j * dsub:(j + 1) * dsub] - codebooks[j][None, :, :]
        out[:, j, :] = (diff ** 2).sum(axis=2)
    return out


def _adc_partial(keys: np.ndarray, codes: np.ndarray, lut: np.ndarray,
                 k: int, keep: np.ndarray | None = None) -> pa.Table:
    """Per-batch ADC top-k: dist = sum of m LUT gathers; emitted as
    ``sim = -dist`` so `_merge_partials`'s (sim desc, key asc) tie policy
    yields (dist asc, key asc) — batch-boundary-independent. Optional
    ``keep`` (n_q, n) bool restricts each query to its rows (the IVF
    cell-prune hook, mirroring similarity._partial_topk_rows): the
    per-element ``+=`` accumulation order over ``j`` is unchanged, so
    pruning never perturbs a surviving row's distance."""
    n_q, m, _ = lut.shape
    out_qi, out_key, out_sim = [], [], []
    if keep is None:
        n = len(keys)
        d = np.zeros((n_q, n), dtype=np.float64)
        for j in range(m):
            d += lut[:, j, codes[:, j]]
    for qi in range(n_q):
        if keep is None:
            kk_keys, row = keys, d[qi]
        else:
            sel = np.flatnonzero(keep[qi])
            if not len(sel):
                continue
            kk_keys = keys[sel]
            row = np.zeros(len(sel), dtype=np.float64)
            for j in range(m):
                row += lut[qi, j, codes[sel, j]]
        take = min(k, len(kk_keys))
        idx = np.lexsort((kk_keys, row))[:take]  # exact tie policy
        out_qi.extend([qi] * take)
        out_key.extend(kk_keys[idx].tolist())
        out_sim.extend((-row[idx]).tolist())
    return pa.table({
        "query_idx": pa.array(out_qi, pa.int32()),
        "key": pa.array(out_key, pa.int64()),
        "sim": pa.array(out_sim, pa.float64()),
    })


def pq_topk(ds, query_vectors: np.ndarray, k: int = 10,
            vec_col: str = "embedding", key_col: str = "vec_id",
            m: int = 8, ks: int = 16, sample_size: int = 65536,
            codebooks: np.ndarray | None = None) -> pa.Table:
    """Index-free PQ search over raw vectors: fit-on-sample (unless
    ``codebooks`` given), broadcast codebooks + query LUTs, per-batch
    encode + ADC partial top-k, tiny driver merge. Returns (query_idx,
    rank, key, sim) with ``sim = -ADC_distance^2`` (nearest first)."""
    import ray

    if codebooks is None:
        codebooks = pq_fit_sample(ds, vec_col, m, ks, sample_size,
                                  key_col=key_col)
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    ref = ray.put((codebooks, _lut(q, codebooks)))

    def partial(batch: pa.Table) -> pa.Table:
        cb, lut = ray.get(ref)
        keys = _col_np(batch[key_col])
        codes = _encode(_normalize(_vecs_np(batch[vec_col])), cb)
        return _adc_partial(keys, codes, lut, k)

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partials(partials, k)


def pq_topk_codes(codes_ds, query_vectors: np.ndarray,
                  codebooks: np.ndarray, k: int = 10,
                  key_col: str = "vec_id") -> pa.Table:
    """ADC search over a PRE-ENCODED code table (`pq_encode` output) —
    the repeat-search path that never touches the raw vectors."""
    import ray

    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    m = codebooks.shape[0]
    ref = ray.put(_lut(q, codebooks))

    def partial(batch: pa.Table) -> pa.Table:
        lut = ray.get(ref)
        keys = _col_np(batch[key_col])
        col = batch["pq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        buf = col.buffers()[1]
        codes = np.frombuffer(buf, dtype=np.uint8,
                              count=(col.offset + len(col)) * m).reshape(
            -1, m)[col.offset:]
        return _adc_partial(keys, codes, lut, k)

    partials = codes_ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partials(partials, k)


def ivfpq_topk(ds, query_vectors: np.ndarray, k: int = 10,
               nprobe: int = 4, vec_col: str = "embedding",
               key_col: str = "vec_id", m: int = 8, ks: int = 16,
               n_lists: int = 16, sample_size: int = 65536,
               seed: int = 42, codebooks: np.ndarray | None = None,
               centroids: np.ndarray | None = None) -> pa.Table:
    """Composed IVF + PQ search (the production ANN shape at corpus
    scale: coarse cell prune, then compressed-domain scoring): both
    models fit on bounded deterministic samples and broadcast once; per
    batch, rows assign themselves to cells, only rows in a query's
    ``nprobe`` nearest cells are PQ-encoded and ADC-scored, and tiny
    partial top-k rows reach the driver. With ``nprobe == n_lists``
    the candidate set is every row, so the result is IDENTICAL to
    :func:`pq_topk` (tested) — the prune only ever removes candidates,
    exactly like IVF over exact distances."""
    import ray

    from .similarity import fit_centroids_sample, hash_sample_vectors

    if centroids is None or codebooks is None:
        # ONE sampling pass shared by both model fits
        raw = hash_sample_vectors(ds, vec_col, key_col, sample_size)
        if centroids is None:
            centroids = fit_centroids_sample(ds, vec_col, n_lists,
                                             sample_size, seed,
                                             key_col=key_col, sample=raw)
        if codebooks is None:
            codebooks = pq_fit_sample(ds, vec_col, m, ks, sample_size,
                                      key_col=key_col, sample=raw)
    q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probe = np.argsort(-(q @ centroids.T), axis=1,
                       kind="stable")[:, :nprobe]
    ref = ray.put((centroids, codebooks, _lut(q, codebooks), probe))

    def partial(batch: pa.Table) -> pa.Table:
        c, cb, lut, pr = ray.get(ref)
        keys = _col_np(batch[key_col])
        mat = _normalize(_vecs_np(batch[vec_col]))
        cell = np.argmax(mat @ c.T, axis=1)
        keep = (pr[:, :, None] == cell[None, None, :]).any(axis=1)
        sel = keep.any(axis=0)  # encode only rows some query probes
        codes = _encode(mat[sel], cb)
        return _adc_partial(keys[sel], codes, lut, k, keep=keep[:, sel])

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partials(partials, k)
