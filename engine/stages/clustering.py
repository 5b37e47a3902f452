"""Deterministic distributed k-means over an embedding column, and
cluster-scoped embedding near-dedup (the SemDeDup shape: cluster first,
then compare only WITHIN clusters — arXiv:2303.09540).

The reference has no clustering (it is a rule-validation engine); this
is part of the training-data-pipeline extension (SURVEY.md §2.10):
cluster-based curation / pruning needs k-means at corpus scale, and
embedding dedup needs its candidate sets.

Scale + determinism design:

- **Every pass is map_batches + driver-merged KB-sized partials** (the
  sketches.py shape): one batch emits at most ``k`` rows of integer
  partial sums. No shuffle anywhere; the corpus never moves.
- **Float sums are NOT associative**, so per-cluster centroid partials
  are accumulated as integers: each embedding is scaled by ``2**20``
  and rounded to int64 once per pass; int64 sums are exact and
  order-free, so centroids are BIT-IDENTICAL at any parallelism /
  block order (the same trick the engine's oracle float policy uses).
- **Per-row distances avoid BLAS reductions**: ``((x - c) ** 2).sum``
  over the fixed dim axis only — each row's distance depends only on
  that row and the centroid matrix, never on batch shape, so
  assignments are deterministic under any batching.
- Seeding is the k smallest ``id_col`` rows (distributed top-k via
  per-batch partials), so the whole fit is a pure function of the data.

``semdedup_pairs`` partitioning assumption (documented per the build
spec): one cluster's vectors fit in one worker. At 100 TB that holds by
CHOOSING k ~ corpus/5k (SemDeDup uses tens of thousands of clusters);
the per-group kernel is one normalized upper-triangle matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCALE = float(2 ** 20)


def _to_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    v = batch[vec_col]
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    if pa.types.is_fixed_size_list(v.type):
        d = v.type.list_size
        flat = v.values
    else:
        lens = np.unique(pc.list_value_length(v).to_numpy(zero_copy_only=False))
        if len(lens) != 1:
            raise ValueError(f"ragged {vec_col!r}: lengths {lens[:5]}")
        d = int(lens[0])
        flat = pc.list_flatten(v)
    x = flat.to_numpy(zero_copy_only=False).astype(np.float64)
    return x.reshape(-1, d)


def _ids_of(batch: pa.Table, id_col: str) -> np.ndarray:
    c = batch[id_col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


def _assign(x: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row nearest centroid + squared distance; reduction only over
    the fixed dim axis (batch-shape-independent, see module docstring)."""
    d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)  # ties -> lowest cluster index (deterministic)
    return a, d2[np.arange(len(a)), a]


def kmeans_fit(ds, vec_col: str, id_col: str, k: int = 8,
               iters: int = 5) -> dict:
    """Lloyd's k-means; returns {"centroids": (k,d) float64,
    "counts": int64[k], "inertia_scaled": int64[k]} — counts/inertia
    are vs the FINAL centroids (one extra stats pass). Empty clusters
    keep their previous centroid."""

    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = _ids_of(batch, id_col)
        order = np.argsort(ids, kind="stable")[:k]
        x = _to_matrix(batch, vec_col)[order]
        return pa.table({
            "_id": pa.array(ids[order], pa.int64()),
            "_v": pa.array(list(x), pa.list_(pa.float64())),
        })

    rows = ds.map_batches(seed_partial, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["_id"])
    if len(rows) < k:
        raise ValueError(f"k={k} > {len(rows)} rows")
    centroids = np.asarray([r["_v"] for r in rows[:k]], dtype=np.float64)
    d = centroids.shape[1]

    def stats_pass(cents: np.ndarray, with_inertia: bool = False):
        def partial(batch: pa.Table) -> pa.Table:
            x = _to_matrix(batch, vec_col)
            a, dist = _assign(x, cents)
            xi = np.floor(x * _SCALE + 0.5).astype(np.int64)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, a, xi)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            inertia = np.zeros(k, dtype=np.int64)
            if with_inertia:  # only the final pass reports it; the
                # Lloyd iterations discard inertia, so skip the
                # full-corpus floor/scatter there
                np.add.at(inertia, a,
                          np.floor(dist * 1e6 + 0.5).astype(np.int64))
            return pa.table({
                "cluster": pa.array(np.arange(k), pa.int64()),
                "cnt": pa.array(cnt, pa.int64()),
                "inertia": pa.array(inertia, pa.int64()),
                "sums": pa.array(list(sums), pa.list_(pa.int64())),
            })

        cnt = np.zeros(k, dtype=np.int64)
        inertia = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, d), dtype=np.int64)
        for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
            c = r["cluster"]
            cnt[c] += r["cnt"]
            inertia[c] += r["inertia"]
            sums[c] += np.asarray(r["sums"], dtype=np.int64)
        return cnt, inertia, sums

    for _ in range(iters):
        cnt, _, sums = stats_pass(centroids)
        nz = cnt > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / (_SCALE * cnt[nz, None])

    cnt, inertia, _ = stats_pass(centroids, with_inertia=True)
    return {"centroids": centroids, "counts": cnt,
            "inertia_scaled": inertia}


def assign_clusters(ds, vec_col: str, centroids: np.ndarray):
    """Append ``cluster`` (int64) — nearest final centroid per row."""
    def do(batch: pa.Table) -> pa.Table:
        a, _ = _assign(_to_matrix(batch, vec_col), centroids)
        return batch.append_column("cluster", pa.array(a, pa.int64()))

    return ds.map_batches(do, batch_format="pyarrow")


def semdedup_pairs(ds, vec_col: str, id_col: str, centroids: np.ndarray,
                   tau: float = 0.99):
    """Within-cluster cosine near-dup pairs (id_a < id_b, cos >= tau).
    One cluster = one map_groups kernel: rows sorted by id, L2-normalized,
    upper-triangle of the gram matrix thresholded. Returns a Dataset
    (id_a, id_b, cluster, cos_x1e6) — near-dup-set-sized. Cross-cluster
    pairs are by design not compared (the SemDeDup recall trade)."""
    k = len(centroids)

    def pairs(group: pa.Table) -> pa.Table:
        ids = _ids_of(group, id_col)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        x = _to_matrix(group, vec_col)[order]
        norms = np.sqrt((x * x).sum(axis=1))
        norms[norms == 0] = 1.0
        xn = x / norms[:, None]
        g = xn @ xn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = g[iu, ju] >= tau
        cl = group["cluster"][0].as_py()
        return pa.table({
            "id_a": pa.array(ids[iu[hit]], pa.int64()),
            "id_b": pa.array(ids[ju[hit]], pa.int64()),
            "cluster": pa.array(np.full(int(hit.sum()), cl), pa.int64()),
            "cos_x1e6": pa.array(
                np.floor(g[iu, ju][hit] * 1e6 + 0.5).astype(np.int64),
                pa.int64()),
        })

    return (assign_clusters(ds, vec_col, centroids)
            .groupby("cluster")
            .map_groups(pairs, batch_format="pyarrow"))
