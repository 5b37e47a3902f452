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
        keys = np.asarray(batch[key_col].to_pylist())
        mat = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        mat = _normalize(mat)
        sims = qm @ mat.T  # (n_q, n_batch)
        kk = min(k, sims.shape[1])
        out_qi, out_key, out_sim = [], [], []
        for qi in range(sims.shape[0]):
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_qi.extend([qi] * kk)
            out_key.extend(keys[idx].tolist())
            out_sim.extend(sims[qi][idx].tolist())
        return pa.table({
            "query_idx": pa.array(out_qi, pa.int32()),
            "key": pa.array(out_key, pa.int64()),
            "sim": pa.array(out_sim, pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").take_all()
    # driver merge: tiny (n_batches * n_q * k rows)
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
        buckets within ``probe_bits`` bit flips (multi-probe)."""
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


def build_ivf_index(ds, vec_col: str = "embedding", key_col: str = "vec_id",
                    n_lists: int = 16, seed: int = 42) -> IVFIndex:
    """Two streaming passes: fit the quantizer on the data (small sample
    suffices at scale), then assign every vector to its cell."""
    keys_all, vecs_all = [], []
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        keys_all.append(np.asarray(batch[key_col].to_pylist()))
        vecs_all.append(np.asarray(batch[vec_col].to_pylist(), dtype=np.float64))
    keys = np.concatenate(keys_all)
    vecs = np.vstack(vecs_all)
    index = IVFIndex(n_lists=n_lists, seed=seed)
    index.fit(vecs)
    index.add(keys, vecs)
    return index


def build_lsh_index(ds, vec_col: str = "embedding", key_col: str = "vec_id",
                    n_planes: int = 12, seed: int = 42) -> LSHIndex:
    """Build the bucketed index from a Dataset (streaming batches)."""
    index: Optional[LSHIndex] = None
    for batch in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        keys = np.asarray(batch[key_col].to_pylist())
        if index is None:
            index = LSHIndex(vecs.shape[1], n_planes, seed)
        index.add(keys, vecs)
    if index is None:
        raise ValueError("empty dataset")
    return index
