"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does one numpy matmul + partial top-k; the
driver merges the tiny per-batch partials. No shuffle at all: this is the
"small side broadcast + map_batches" join pattern (SURVEY.md §2.4 J1)
applied to vector search.

Scale path: LSH-bucketed search — random-hyperplane signatures put
vectors into buckets; queries probe only their own (and neighboring)
buckets. At cluster scale the buckets become the partition key (one
``groupby`` to build, bucket-pruned probing after); recall is tunable by
hyperplane count / probe multiplicity and is asserted against the
brute-force baseline in tests.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _col_np(col) -> np.ndarray:
    """Zero-copy-ish numpy view of a (typically int64) key column —
    no per-row Python objects on the hot batch path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _normalize(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.float64)
    return v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)


def knn_brute_force(
    ds,
    query_vectors: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
):
    """Exact cosine top-k for each query row.

    Returns a pyarrow Table (query_idx, rank, key, sim) with
    deterministic ordering (sim desc, key asc tiebreak). Float64 math.
    """
    import ray

    q = _normalize(np.asarray(query_vectors))
    qref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        keys = _col_np(batch[key_col])
        mat = _normalize(_vecs_np(batch[vec_col]))
        return _partial_topk_rows(keys, mat, qm, None, k)

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    # driver merge: tiny (n_batches * n_q * k rows)
    return _merge_partials(partials, k)


def _merge_partials(partials, k: int) -> pa.Table:
    """Tiny driver merge of per-batch partial top-k rows (n_batches*n_q*k)."""
    rows_by_q: dict[int, list] = {}
    for r in partials:
        rows_by_q.setdefault(r["query_idx"], []).append((r["key"], r["sim"]))
    out_qi, out_rank, out_key, out_sim = [], [], [], []
    for qi in sorted(rows_by_q):
        ranked = sorted(rows_by_q[qi], key=lambda t: (-t[1], t[0]))[:k]
        for rank, (key, sim) in enumerate(ranked):
            out_qi.append(qi)
            out_rank.append(rank)
            out_key.append(key)
            out_sim.append(sim)
    return pa.table({
        "query_idx": pa.array(out_qi, pa.int32()),
        "rank": pa.array(out_rank, pa.int32()),
        "key": pa.array(out_key, pa.int64()),
        "sim": pa.array(out_sim, pa.float64()),
    })


def _partial_topk_rows(keys: np.ndarray, mat: np.ndarray, qm: np.ndarray,
                       keep_mask, k: int) -> pa.Table:
    """Per-batch top-k against the query matrix, optionally restricted per
    query by ``keep_mask`` (n_q, n_batch) — the cell/bucket pruning hook."""
    sims = qm @ mat.T  # (n_q, n_batch)
    if keep_mask is not None:
        sims = np.where(keep_mask, sims, -np.inf)
    out_qi, out_key, out_sim = [], [], []
    for qi in range(sims.shape[0]):
        row = sims[qi]
        valid = np.flatnonzero(row > -np.inf)
        kk = min(k, len(valid))
        if not kk:
            continue
        # full (sim desc, key asc) order — NOT bare argpartition: exact
        # sim ties straddling the batch's top-k boundary must keep the
        # same keys the global merge (and a built index) would keep
        idx = valid[np.lexsort((keys[valid], -row[valid]))[:kk]]
        out_qi.extend([qi] * kk)
        out_key.extend(keys[idx].tolist())
        out_sim.extend(row[idx].tolist())
    return pa.table({
        "query_idx": pa.array(out_qi, pa.int32()),
        "key": pa.array(out_key, pa.int64()),
        "sim": pa.array(out_sim, pa.float64()),
    })


def ivf_topk(
    ds,
    query_vectors: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_lists: int = 16,
    sample_size: int = 65536,
    seed: int = 42,
):
    """Index-free IVF search — the 100-TB path: NO driver-resident inverted
    lists. Centroids are fit on a bounded sample and broadcast; every batch
    assigns its own rows to cells, keeps only rows in each query's nprobe
    nearest cells, and emits partial top-k; the driver merges tiny partials.
    Same candidates (hence same answer) as IVFIndex.query over a built
    index."""
    import ray

    centroids = fit_centroids_sample(ds, vec_col, n_lists, sample_size,
                                     seed, key_col=key_col)
    q = _normalize(np.asarray(query_vectors))
    # (n_q, nprobe) probe cells per query
    probe = np.argsort(-(q @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    ref = ray.put((centroids, q, probe))

    def partial(batch: pa.Table) -> pa.Table:
        c, qm, pr = ray.get(ref)
        keys = _col_np(batch[key_col])
        mat = _normalize(_vecs_np(batch[vec_col]))
        cell = np.argmax(mat @ c.T, axis=1)
        keep = (pr[:, :, None] == cell[None, None, :]).any(axis=1)
        return _partial_topk_rows(keys, mat, qm, keep, k)

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partials(partials, k)


def lsh_topk(
    ds,
    query_vectors: np.ndarray,
    k: int = 10,
    probe_bits: int = 2,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
):
    """Index-free LSH search: each batch computes its own signatures and
    keeps rows whose bucket is within ``probe_bits`` bit flips of each
    query's bucket (multi-probe), then partial top-k + tiny driver merge.
    Same candidates as LSHIndex.query over a built index.
    ``probe_bits`` must be <= 2 (the implemented probe radius)."""
    import ray

    if probe_bits > 2:
        raise ValueError(
            f"probe_bits={probe_bits} unsupported: multi-probe is "
            "implemented for radius <= 2 bit flips")
    q = _normalize(np.atleast_2d(np.asarray(query_vectors, dtype=np.float64)))
    dim = q.shape[1]
    shared = LSHIndex(dim, n_planes, seed)
    qsigs = shared._sig(q)
    probe_sets = []
    for s in qsigs:
        sig = int(s)
        probe = {sig}
        if probe_bits >= 1:
            probe |= {sig ^ (1 << b) for b in range(n_planes)}
        if probe_bits >= 2:
            probe |= {
                sig ^ (1 << b1) ^ (1 << b2)
                for b1 in range(n_planes)
                for b2 in range(b1 + 1, n_planes)
            }
        probe_sets.append(np.fromiter(probe, dtype=np.int64))
    ref = ray.put((q, probe_sets))

    def partial(batch: pa.Table) -> pa.Table:
        qm, probes = ray.get(ref)
        idx = LSHIndex(dim, n_planes, seed)
        keys = _col_np(batch[key_col])
        mat = _normalize(_vecs_np(batch[vec_col]))
        sigs = idx._sig(mat)
        keep = np.stack([np.isin(sigs, p) for p in probes])
        return _partial_topk_rows(keys, mat, qm, keep, k)

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_partials(partials, k)


class LSHIndex:
    """Random-hyperplane LSH over unit vectors (deterministic seed).

    ``n_planes`` hyperplanes -> 2^n_planes buckets; ``probe_bits`` allows
    multi-probe (flip up to that many signature bits) to trade compute
    for recall.
    """

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((n_planes, dim))
        self.n_planes = n_planes
        self.buckets: dict[int, list[tuple[int, np.ndarray]]] = {}

    def _sig(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes.T) >= 0
        out = np.zeros(len(vecs), dtype=np.int64)
        for b in range(self.n_planes):
            out |= bits[:, b].astype(np.int64) << b
        return out

    def add(self, keys: np.ndarray, vecs: np.ndarray) -> None:
        vecs = _normalize(vecs)
        sigs = self._sig(vecs)
        for key, sig, v in zip(keys, sigs, vecs):
            self.buckets.setdefault(int(sig), []).append((int(key), v))

    def query(self, vec: np.ndarray, k: int = 10, probe_bits: int = 2):
        """Top-k (key, sim) among vectors in the query's bucket and all
        buckets within ``probe_bits`` bit flips (multi-probe).
        ``probe_bits`` must be <= 2 (the implemented probe radius)."""
        if probe_bits > 2:
            raise ValueError(
                f"probe_bits={probe_bits} unsupported: multi-probe is "
                "implemented for radius <= 2 bit flips")
        v = _normalize(vec.reshape(1, -1))[0]
        sig = int(self._sig(v.reshape(1, -1))[0])
        probe = [sig]
        if probe_bits >= 1:
            probe += [sig ^ (1 << b) for b in range(self.n_planes)]
        if probe_bits >= 2:
            probe += [
                sig ^ (1 << b1) ^ (1 << b2)
                for b1 in range(self.n_planes)
                for b2 in range(b1 + 1, self.n_planes)
            ]
        cand: list[tuple[int, np.ndarray]] = []
        for s in probe:
            cand.extend(self.buckets.get(s, ()))
        if not cand:
            return []
        keys = np.array([c[0] for c in cand])
        mat = np.stack([c[1] for c in cand])
        sims = mat @ v
        order = np.lexsort((keys, -sims))[:k]
        return [(int(keys[i]), float(sims[i])) for i in order]


class IVFIndex:
    """Inverted-file ANN index: a deterministic k-means coarse quantizer
    (fixed seed, fixed iterations — no RNG at query time) partitions
    vectors into ``n_lists`` cells; queries scan only the ``nprobe``
    nearest cells. The cell id is the natural partition key at cluster
    scale (build = one groupby on cell; probe = read nprobe partitions).
    """

    def __init__(self, n_lists: int = 16, n_iter: int = 10, seed: int = 42):
        self.n_lists = n_lists
        self.n_iter = n_iter
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None
        self.lists: dict[int, list[tuple[int, np.ndarray]]] = {}

    def fit(self, vecs: np.ndarray) -> None:
        """Lloyd's k-means on unit vectors (cosine == dot after norm)."""
        v = _normalize(vecs)
        rng = np.random.Generator(np.random.PCG64(self.seed))
        init = rng.choice(len(v), size=min(self.n_lists, len(v)), replace=False)
        c = v[np.sort(init)].copy()
        for _ in range(self.n_iter):
            assign = np.argmax(v @ c.T, axis=1)
            for j in range(len(c)):
                members = v[assign == j]
                if len(members):
                    m = members.mean(axis=0)
                    c[j] = m / max(np.linalg.norm(m), 1e-12)
        self.centroids = c

    def add(self, keys: np.ndarray, vecs: np.ndarray) -> None:
        v = _normalize(vecs)
        assign = np.argmax(v @ self.centroids.T, axis=1)
        for key, a, vec in zip(keys, assign, v):
            self.lists.setdefault(int(a), []).append((int(key), vec))

    def query(self, vec: np.ndarray, k: int = 10, nprobe: int = 4):
        v = _normalize(vec.reshape(1, -1))[0]
        order = np.argsort(-(self.centroids @ v))[:nprobe]
        cand: list[tuple[int, np.ndarray]] = []
        for cell in order:
            cand.extend(self.lists.get(int(cell), ()))
        if not cand:
            return []
        keys = np.array([c[0] for c in cand])
        mat = np.stack([c[1] for c in cand])
        sims = mat @ v
        top = np.lexsort((keys, -sims))[:k]
        return [(int(keys[i]), float(sims[i])) for i in top]


def _vecs_np(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list/fixed_size_list column —
    zero-copy-ish reshape of the flat child values when widths are uniform
    (the common embedding case); to_pylist fallback otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
        start = col.offset * t.list_size
        return vals[start : start + len(col) * t.list_size].reshape(
            len(col), t.list_size)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        offs = col.offsets.to_numpy()
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
            return vals[offs[0] : offs[-1]].reshape(len(col), int(widths[0]))
    return np.asarray(col.to_pylist(), dtype=np.float64)


def hash_sample_vectors(ds, vec_col: str = "embedding",
                        key_col: str = "vec_id",
                        sample_size: int = 65536,
                        oversample: float = 4.0) -> np.ndarray:
    """Deterministic UNIFORM sample of <= ``sample_size`` vectors —
    the codebook/quantizer-fit sampler.

    ``ds.limit(n)`` is deterministic but takes the FIRST files of the
    corpus — at 100 TB that is one crawl slice / one domain, a biased
    sample to fit a quantizer on. This ranks every row by a Knuth
    multiplicative hash of its key instead (the `sample_hash_topk`
    machinery): one count, one scan keeping only rows whose hash clears
    an ``oversample * sample_size / n`` threshold (so ~oversample *
    sample_size rows reach the driver, never the corpus), then the
    global ``sample_size`` smallest (hash, key) win. Hash ranks are a
    property of the ROW, not the partitioning — identical at any
    parallelism."""
    from .sketches import _hash64_ints, _hash64_strings

    n = ds.count()
    thin = ds.select_columns([key_col, vec_col])
    if n <= sample_size:
        rows = thin.take_all()
        rows.sort(key=lambda r: r[key_col])
        return np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    tau = np.uint64(min(2**64 - 1,
                        int(2**64 * oversample * sample_size / n)))

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
            h = _hash64_strings(keys)
        else:
            h = _hash64_ints(keys.cast(pa.int64())
                             .to_numpy(zero_copy_only=False))
        mask = pa.array(h < tau)
        return pa.table({
            "_h": pa.array(h[h < tau].astype(np.int64)),  # shifted cmp-safe:
            # uint64 < tau implies high bit rarely set at real sampling
            # rates (tau << 2^63); keep int64 for Arrow friendliness
            key_col: keys.filter(mask),
            vec_col: batch[vec_col].filter(mask) if not isinstance(
                batch[vec_col], pa.ChunkedArray)
            else batch[vec_col].combine_chunks().filter(mask),
        })

    import ray

    parts = [t for t in ray.get(
        thin.map_batches(pick, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not parts:  # pathological tiny-tau rounding: fall back to first-n
        rows = thin.limit(sample_size).take_all()
        return np.asarray([r[vec_col] for r in rows], dtype=np.float64)
    t = pa.concat_tables(parts).combine_chunks()
    h = t["_h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    keys = t[key_col]
    kn = (keys.to_numpy(zero_copy_only=False)
          if not (pa.types.is_string(keys.type)
                  or pa.types.is_large_string(keys.type))
          else np.asarray(keys.to_pylist()))
    order = np.lexsort((kn, h))[:sample_size]
    return _vecs_np(t[vec_col])[order]


def fit_centroids_sample(ds, vec_col: str = "embedding", n_lists: int = 16,
                         sample_size: int = 65536, seed: int = 42,
                         key_col: str = "vec_id",
                         sample: np.ndarray | None = None) -> np.ndarray:
    """Fit the IVF coarse quantizer on a BOUNDED deterministic sample
    (seeded hash-threshold row sample — uniform across the corpus, not
    the first files), never the whole dataset: at 100 TB the quantizer
    sees a fixed-size unbiased sample while cell assignment streams
    over everything. Pass ``sample`` (raw, unnormalized vectors) to
    reuse one sampling pass across several model fits (ivfpq_topk)."""
    vecs = sample if sample is not None else hash_sample_vectors(
        ds, vec_col, key_col, sample_size)
    index = IVFIndex(n_lists=n_lists, seed=seed)
    index.fit(vecs)
    return index.centroids


def _pack_groups(group: pa.Table, part_col: str, key_col: str,
                 vec_col: str) -> pa.Table:
    """One row per partition cell: (cell id, keys int64-list, normalized
    vectors as a float64 binary blob) — the inverted list, built where the
    groupby co-located it."""
    cells = group[part_col]
    if isinstance(cells, pa.ChunkedArray):
        cells = cells.combine_chunks()
    cell = cells[0].as_py()
    keys = group[key_col]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    vecs = _normalize(_vecs_np(group[vec_col]))
    return pa.table({
        "cell": pa.array([cell], pa.int64()),
        "keys": pa.array([keys.to_pylist()], pa.list_(pa.int64())),
        "vecs": pa.array([vecs.tobytes()], pa.large_binary()),
        "dim": pa.array([vecs.shape[1]], pa.int64()),
    })


def build_ivf_index(ds, vec_col: str = "embedding", key_col: str = "vec_id",
                    n_lists: int = 16, seed: int = 42,
                    sample_size: int = 65536) -> IVFIndex:
    """Distributed IVF build: quantizer fit on a bounded sample, cell
    assignment in ``map_batches`` (centroids broadcast once), inverted
    lists assembled by ONE groupby on cell id — the driver only receives
    the packed per-cell rows, never iterates raw batches."""
    import ray

    centroids = fit_centroids_sample(ds, vec_col, n_lists, sample_size,
                                     seed, key_col=key_col)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        v = _normalize(_vecs_np(batch[vec_col]))
        cell = np.argmax(v @ c.T, axis=1).astype(np.int64)
        return pa.table({"cell": pa.array(cell), key_col: batch[key_col],
                         vec_col: batch[vec_col]})

    packed = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(lambda g: _pack_groups(g, "cell", key_col, vec_col),
                    batch_format="pyarrow")
    )
    index = IVFIndex(n_lists=n_lists, seed=seed)
    index.centroids = centroids
    for row in packed.take_all():  # <= n_lists rows
        vecs = np.frombuffer(row["vecs"], dtype=np.float64).reshape(
            -1, row["dim"])
        index.lists[int(row["cell"])] = list(zip(
            (int(k) for k in row["keys"]), vecs))
    return index


def build_lsh_index(ds, vec_col: str = "embedding", key_col: str = "vec_id",
                    n_planes: int = 12, seed: int = 42) -> LSHIndex:
    """Distributed LSH build: signatures in ``map_batches`` (planes are a
    deterministic function of (dim, seed) — recomputed per task, nothing
    shipped), buckets assembled by ONE groupby on the signature."""
    dim = len(ds.take(1)[0][vec_col])

    def assign(batch: pa.Table) -> pa.Table:
        idx = LSHIndex(dim, n_planes, seed)
        v = _normalize(_vecs_np(batch[vec_col]))
        sig = idx._sig(v)
        return pa.table({"cell": pa.array(sig), key_col: batch[key_col],
                         vec_col: batch[vec_col]})

    packed = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(lambda g: _pack_groups(g, "cell", key_col, vec_col),
                    batch_format="pyarrow")
    )
    index = LSHIndex(dim, n_planes, seed)
    for row in packed.take_all():  # <= 2^n_planes occupied buckets
        vecs = np.frombuffer(row["vecs"], dtype=np.float64).reshape(
            -1, row["dim"])
        index.buckets[int(row["cell"])] = list(zip(
            (int(k) for k in row["keys"]), vecs))
    return index
