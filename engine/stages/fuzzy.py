"""Fuzzy (edit-distance-1) string self-join via deletion neighborhoods.

The classic approximate-string-join trick (FastSS / SymSpell family):
two strings are within edit distance 1 iff they share a *deletion
variant* — for a substitution, delete the differing position from both;
for an insertion/deletion, the shorter string IS a deletion variant of
the longer. So every string emits ``len + 1`` keys (each single-char
deletion plus itself), equal keys are brought together by ONE groupby,
and candidate pairs are verified exactly. Full recall by construction,
no n^2 scan.

Everything is vectorized:

- **variant keys are hashed, never materialized**: with the polynomial
  hash ``h(s) = sum(b_j * r^(j+1)) + len(s)`` (mod 2^64), the hash of
  s-with-position-i-deleted is ``prefix_i + (suffix_i / r) + len - 1``
  where prefix/suffix are cumulative sums — so all L+1 keys of every
  string in a batch come out of two cumsums over the flattened bytes
  (padding-free, batch-boundary-independent);
- **pair generation** inside each coarse bucket is the offset-sweep
  over key-sorted rows (one vectorized same-key mask per offset d, d
  bounded by the largest key group);
- **exact verification** compares padded byte matrices: equal lengths
  -> exactly one differing position (substitution); lengths off by one
  -> delete the first mismatch position from the longer and compare
  (gather-index shift, no Python per pair). Hash collisions and
  distance-0 (identical) candidates are rejected here.

Partitioning: one ``groupby`` on ``hash(key) % num_buckets``; bucket
rows are (key, id, string) — strings ride the shuffle once.

**Edit-distance unit contract: BYTES, not Unicode code points.** The
deletion neighborhoods, padding matrices and banded DP all operate on
UTF-8 bytes, so for non-ASCII input one code-point substitution counts
as 2–4 byte edits and results diverge from a character-based oracle
(DuckDB ``levenshtein`` is char-based). On ASCII input (the TPC-H name
columns these joins target) byte and char distances coincide exactly —
the same ASCII-equivalence assumption stages/decontam.py documents for
its shingles. Callers with non-ASCII keys should normalize/transliterate
first or treat distances as byte-level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textfeat import byte_view

_R = np.uint64(1099511628211)  # FNV prime as the polynomial base


def _hash_prefixes(names: pa.Array, levels: int = 2):
    """Shared polynomial-hash kernel: per-flat-byte weighted prefix sums.

    Returns (offs, lens, pos, cpre_hi, cpre_lo[, cpre_lo2]):
    ``cpre_hi[x]`` is the exclusive prefix sum of ``byte * r^(pos+1)``
    (the "kept at its slot" weighting that defines the identity hash),
    ``cpre_lo`` the same with ``r^pos`` (char shifted left by ONE
    deletion), and — with ``levels=3`` — ``cpre_lo2`` with ``r^(pos-1)``
    (shifted by TWO deletions; pos<2 entries are garbage that cancels
    inside every window difference taken at pos >= 2). Every deletion
    key, identity hash and distance-0 pre-filter derives from THIS
    kernel, so the whole key domain is bit-identical by construction.
    """
    data, offs = byte_view(names)
    lens = np.diff(offs)
    total = int(offs[-1])
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], lens)
    b = data.astype(np.uint64)
    max_len = int(lens.max()) if len(lens) else 0
    powers = np.empty(max_len + 2, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # uint64 wrap IS the mod-2^64 math
        for i in range(1, max_len + 2):
            powers[i] = powers[i - 1] * _R
    w_hi = b * powers[pos + 1]  # weight r^(j+1) (char kept at its slot)
    w_lo = b * powers[pos]      # weight r^j (char shifted left by one)
    # GLOBAL exclusive prefixes (cpre[x] = sum of w over flat indices
    # < x) — empty strings fall out naturally as zero-width windows
    cpre_hi = np.concatenate(
        [np.zeros(1, np.uint64), np.cumsum(w_hi, dtype=np.uint64)])
    cpre_lo = np.concatenate(
        [np.zeros(1, np.uint64), np.cumsum(w_lo, dtype=np.uint64)])
    if levels == 2:
        return offs, lens, pos, cpre_hi, cpre_lo
    w_lo2 = b * powers[np.maximum(pos - 1, 0)]
    cpre_lo2 = np.concatenate(
        [np.zeros(1, np.uint64), np.cumsum(w_lo2, dtype=np.uint64)])
    return offs, lens, pos, cpre_hi, cpre_lo, cpre_lo2


def _del1_and_id(offs, lens, pos, cpre_hi, cpre_lo):
    """(del1_keys, del1_rows, id_keys) from precomputed prefixes —
    shared by the distance-1 and distance-2 key generators."""
    n = len(offs) - 1
    flat = pos + np.repeat(offs[:-1], lens)
    prefix = cpre_hi[flat] - np.repeat(cpre_hi[offs[:-1]], lens)
    suffix = np.repeat(cpre_lo[offs[1:]], lens) - cpre_lo[flat + 1]
    del_keys = prefix + suffix + np.repeat(
        (lens - 1).astype(np.uint64), lens)
    # identity hash of each full string (0 for empty strings)
    full = cpre_hi[offs[1:]] - cpre_hi[offs[:-1]]
    id_keys = full + lens.astype(np.uint64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    return del_keys, rows, id_keys


def _deletion_keys(names: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """All deletion-variant hashes + identity hashes for a batch.

    Returns (keys, row_idx): for every string j with length L_j, its
    L_j deletion hashes and 1 identity hash, each tagged with j.
    """
    offs, lens, pos, cpre_hi, cpre_lo = _hash_prefixes(names)
    n = len(offs) - 1
    del_keys, del_rows, id_keys = _del1_and_id(offs, lens, pos,
                                               cpre_hi, cpre_lo)
    keys = np.concatenate([del_keys, id_keys])
    rows = np.concatenate([del_rows, np.arange(n, dtype=np.int64)])
    return keys, rows


def _name_hashes(names: pa.Array) -> np.ndarray:
    """Identity polynomial hash per string (the _deletion_keys id key)."""
    offs, lens, _, cpre_hi, _ = _hash_prefixes(names)
    return cpre_hi[offs[1:]] - cpre_hi[offs[:-1]] + lens.astype(np.uint64)


def _pad_matrix(names: list[bytes], width: int) -> np.ndarray:
    m = np.zeros((len(names), width), dtype=np.uint8)
    for i, s in enumerate(names):  # result-sized (candidate pairs only)
        m[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    return m


def _verify_pairs(na: pa.Array, nb: pa.Array) -> np.ndarray:
    """Exact edit-distance==1 mask for candidate string pairs."""
    a_bytes = [x.encode() for x in na.to_pylist()]
    b_bytes = [x.encode() for x in nb.to_pylist()]
    la = np.array([len(x) for x in a_bytes], dtype=np.int64)
    lb = np.array([len(x) for x in b_bytes], dtype=np.int64)
    w = int(max(la.max(initial=1), lb.max(initial=1)))
    A = _pad_matrix(a_bytes, w)
    B = _pad_matrix(b_bytes, w)
    diff = A != B
    ndiff = diff.sum(axis=1)
    ok = np.zeros(len(la), dtype=bool)
    same_len = la == lb
    ok[same_len & (ndiff == 1)] = True  # substitution
    # length off by one: delete first-mismatch char from the longer
    off1 = np.abs(la - lb) == 1
    if off1.any():
        idx = np.flatnonzero(off1)
        L = np.where(la[idx] >= lb[idx], 0, 1)  # 0: a longer, 1: b longer
        longm = np.where(L[:, None] == 0, A[idx], B[idx])
        shortm = np.where(L[:, None] == 0, B[idx], A[idx])
        first = (longm != shortm).argmax(axis=1)
        cols = np.arange(w - 1, dtype=np.int64)[None, :]
        gather = cols + (cols >= first[:, None])
        deleted = np.take_along_axis(longm, gather, axis=1)
        ok[idx] = (deleted == shortm[:, :w - 1]).all(axis=1)
    return ok


def fuzzy_join_dist1(ds, id_col: str, s_col: str, num_buckets: int = 128):
    """All id pairs (a < b) whose strings are at edit distance EXACTLY 1.

    Per batch: hashed deletion-neighborhood keys (no variant strings
    materialized), local (key, id) dedup; ONE coarse-bucket groupby;
    per bucket a key-sort + offset-sweep yields candidate pairs, then
    the exact vectorized verifier (which also rejects hash collisions
    and distance-0 duplicates). Output: (id_a, id_b) rows.
    """
    def emit(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[s_col]))  # SQL: NULL
        # strings satisfy no levenshtein predicate, so they never join
        names = batch[s_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        keys, rows = _deletion_keys(names)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[rows]
        t = pa.table({
            "k": pa.array(keys.astype(np.int64)),
            id_col: pa.array(ids),
            s_col: names.take(pa.array(rows)),
        })
        # local dedup: repeated chars make duplicate variants of a row
        t = t.group_by(["k", id_col], use_threads=False).aggregate(
            [(s_col, "first")]).rename_columns(["k", id_col, s_col])
        bucket = (t["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[
            ("k", "ascending"), (id_col, "ascending")])
        g = g.take(idx)
        k = g["k"].to_numpy(zero_copy_only=False)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        names = g[s_col]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        n = len(k)
        ia_all, ib_all = [], []
        d = 1
        while True:  # offset sweep, bounded by the largest key group
            if d >= n:
                break
            same = k[d:] == k[:-d]
            if not same.any():
                break
            t0 = np.flatnonzero(same)
            ia_all.append(t0)
            ib_all.append(t0 + d)
            d += 1
        if not ia_all:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        # cheap pre-filter: identical strings are distance 0, never 1 —
        # drops the g^2 candidates a heavily-duplicated name generates
        # before they reach the byte-matrix verifier (run exact dedup
        # upstream to also bound the offset sweep's group sizes)
        nh = _name_hashes(names)
        differ = nh[ia] != nh[ib]
        ia, ib = ia[differ], ib[differ]
        if not len(ia):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ok = _verify_pairs(names.take(pa.array(ia)),
                           names.take(pa.array(ib)))
        ia, ib = ia[ok], ib[ok]
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        # same pair can never arise twice WITHIN a key group, and a
        # dist-1 pair shares exactly one variant VALUE, but two distinct
        # key values could collide into one group only across k values —
        # (k, id) sort keeps groups separate, so pairs are unique here
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    return (ds.map_batches(emit, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(bucket_pairs, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Edit distance <= 2: 2-deletion neighborhoods + banded-DP verification
# ---------------------------------------------------------------------------

def _deletion2_keys(
        names: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All deletion-variant hashes for distance <= 2 (0, 1 and 2 chars
    deleted) for a batch. Returns (keys, row_idx, id_hashes) — the
    per-string identity hashes come for free from the shared kernel
    (they ARE the 0-deletion keys) and feed the distance-0 pre-filter.

    FastSS: ed(s, t) <= 2 iff the <=2-deletion neighborhoods intersect.
    A variant with positions i < j deleted hashes as
    ``prefix(i) + mid(i, j) + suffix(j) + (L - 2)`` where chars before
    i keep weight r^(x+1), chars between shift to r^x and chars after j
    shift to r^(x-1) — ONE `_hash_prefixes(levels=3)` kernel call plus
    per-length-class broadcasting (no per-variant Python). The
    weighting makes a variant hash equal the IDENTITY hash of the
    deleted string, so 0-, 1- and 2-deletion keys share one domain and
    cross-length matches (|len(s)-len(t)| in {0,1,2}) meet in the same
    groupby key space as `_deletion_keys`.
    """
    offs, lens, pos, cp1, cp2, cp3 = _hash_prefixes(names, levels=3)
    n = len(offs) - 1
    del1_keys, del1_rows, id_keys = _del1_and_id(offs, lens, pos, cp1, cp2)

    out_keys = [del1_keys, id_keys]
    out_rows = [del1_rows, np.arange(n, dtype=np.int64)]
    for length in np.unique(lens):
        ln = int(length)
        if ln < 2:
            continue
        members = np.flatnonzero(lens == ln)
        ii, jj = np.triu_indices(ln, k=1)  # deleted positions i < j
        s0 = offs[members][:, None].astype(np.int64)  # (n_L, 1)
        pre = cp1[s0 + ii[None, :]] - cp1[s0]
        mid = cp2[s0 + jj[None, :]] - cp2[s0 + ii[None, :] + 1]
        suf = cp3[s0 + ln] - cp3[s0 + jj[None, :] + 1]
        k2 = pre + mid + suf + np.uint64(ln - 2)
        out_keys.append(k2.ravel())
        out_rows.append(np.repeat(members.astype(np.int64), len(ii)))
    return np.concatenate(out_keys), np.concatenate(out_rows), id_keys


def _edit_distance_capped(na: pa.Array, nb: pa.Array,
                          cap: int = 2) -> np.ndarray:
    """Exact Levenshtein distance per pair, saturated at ``cap + 1`` —
    banded DP (band half-width ``cap``) vectorized ACROSS pairs: the
    row loop runs max_len times and the 2*cap+1 in-band diagonal
    offsets loop 5 times; everything else is whole-pair-set numpy."""
    a_bytes = [x.encode() for x in na.to_pylist()]
    b_bytes = [x.encode() for x in nb.to_pylist()]
    la = np.array([len(x) for x in a_bytes], dtype=np.int64)
    lb = np.array([len(x) for x in b_bytes], dtype=np.int64)
    n = len(la)
    big = cap + 1
    out = np.full(n, big, dtype=np.int64)
    empty_a = la == 0
    out[empty_a] = np.minimum(lb[empty_a], big)
    w = int(max(la.max(initial=1), lb.max(initial=1)))
    A = _pad_matrix(a_bytes, w)
    B = _pad_matrix(b_bytes, w)
    width = 2 * cap + 1
    BIG = np.full(n, big, dtype=np.int64)
    # row[:, c] = D[i][i + c - cap], saturated at big; row 0: D[0][j] = j
    row = np.stack([BIG if c < cap else np.minimum(
        np.full(n, c - cap, dtype=np.int64), big)
        for c in range(width)], axis=1)
    max_la = int(la.max(initial=0))
    for i in range(1, w + 1):
        new = np.empty((n, width), dtype=np.int64)
        ai = A[:, i - 1].astype(np.int64)  # i-th char of a (1-based)
        for c in range(width):
            j = i + c - cap  # scalar column index into b, this diagonal
            if j < 0:
                new[:, c] = BIG
                continue
            if j == 0:
                new[:, c] = min(i, big)  # D[i][0] = i
                continue
            up = row[:, c + 1] + 1 if c + 1 < width else BIG
            left = new[:, c - 1] + 1 if c >= 1 else BIG
            bj = B[:, j - 1].astype(np.int64) if j <= w else \
                np.zeros(n, dtype=np.int64)
            diag = row[:, c] + (ai != bj).astype(np.int64)
            cell = np.minimum(np.minimum(up, left), diag)
            # out-of-b columns can never feed D[la][lb]; saturate them
            new[:, c] = np.where(j <= lb, np.minimum(cell, big), big)
        row = new
        at_end = la == i
        if at_end.any():
            sel = np.flatnonzero(at_end & (np.abs(la - lb) <= cap))
            c_fin = (lb[sel] - la[sel]) + cap  # offset of D[la][lb]
            out[sel] = row[sel, c_fin]
        if i >= max_la:
            break
    return np.minimum(out, big)


def fuzzy_join_dist2(ds, id_col: str, s_col: str, num_buckets: int = 256,
                     max_broadcast: int = 2_000_000,
                     max_str_len: int = 512):
    """All id pairs (a < b) with Levenshtein distance 1 or 2.

    Unlike :func:`fuzzy_join_dist1`, the <=2-deletion neighborhood is
    ~L^2/2 keys per string, so STRINGS DO NOT RIDE THE SHUFFLE — only
    (key_hash, id, identity_hash) rows do (24 B/key). Stages:

    1. the (id, string) projection is materialized ONCE and feeds
       everything (the row-count guard, the key pipeline and the
       broadcast verify map — a lazy input re-executes per consumer);
    2. per batch: `_deletion2_keys` hashes (0/1/2 deletions), local
       (key, id) dedup; ONE coarse-bucket groupby; per bucket the
       key-sort + offset-sweep yields candidate id pairs, identical
       names pre-filtered by identity hash; local pair dedup; then one
       pair-cardinality groupby dedups candidates that met under
       several shared variants/buckets;
    3. strings are re-attached from the broadcast id->string map and
       the banded DP emits exact distances.

    Guards: ``max_broadcast`` rows (the verify map is driver/worker
    resident — this operator targets entity/name tables, not corpora)
    and ``max_str_len`` bytes per string (the L^2/2 key fan-out and the
    (n_L, L^2/2) hashing intermediates are quadratic in string length;
    one 10k-char outlier would alone emit ~50M keys).

    Output: (id_a, id_b, dist) rows with dist in {1, 2}.
    """
    import ray

    proj = ds.map_batches(
        lambda b: pa.table({"id": b[id_col], "s": b[s_col]}).filter(
            pc.is_valid(b[s_col])), batch_format="pyarrow").materialize()

    def emit(batch: pa.Table) -> pa.Table:
        names = batch["s"]
        if isinstance(names, pa.ChunkedArray):
            names = names.combine_chunks()
        max_len = int(pc.max(pc.binary_length(names)).as_py() or 0)
        if max_len > max_str_len:
            raise ValueError(
                f"fuzzy_join_dist2: a string of {max_len} bytes exceeds "
                f"max_str_len={max_str_len}; the 2-deletion key fan-out "
                "is quadratic in string length — truncate or pre-filter")
        keys, rows, id_hashes = _deletion2_keys(names)
        ids = batch["id"].to_numpy(zero_copy_only=False)[rows]
        nh = id_hashes[rows]
        t = pa.table({
            "k": pa.array(keys.astype(np.int64)),
            "id": pa.array(ids),
            "nh": pa.array(nh.astype(np.int64)),
        })
        t = t.group_by(["k", "id"], use_threads=False).aggregate(
            [("nh", "first")]).rename_columns(["k", "id", "nh"])
        bucket = (t["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("_bucket", pa.array(bucket))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["_bucket"])
        idx = pc.sort_indices(g, sort_keys=[("k", "ascending"),
                                            ("id", "ascending")])
        g = g.take(idx)
        k = g["k"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        nh = g["nh"].to_numpy(zero_copy_only=False)
        n = len(k)
        ia_all, ib_all = [], []
        d = 1
        while d < n:
            same = k[d:] == k[:-d]
            if not same.any():
                break
            t0 = np.flatnonzero(same)
            ia_all.append(t0)
            ib_all.append(t0 + d)
            d += 1
        if not ia_all:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        differ = nh[ia] != nh[ib]  # identical strings are distance 0
        ia, ib = ia[differ], ib[differ]
        a = np.minimum(ids[ia], ids[ib])
        b = np.maximum(ids[ia], ids[ib])
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)  # local dedup
        return pa.table({"id_a": pa.array(pairs[:, 0], pa.int64()),
                         "id_b": pa.array(pairs[:, 1], pa.int64())})

    n_rows = proj.count()  # materialized: metadata-cheap
    if n_rows > max_broadcast:  # pragma: no cover - contract guard
        raise ValueError(
            f"fuzzy_join_dist2: {n_rows} rows > max_broadcast guard; "
            "this operator targets dimension-sized name tables")

    cand = (proj.map_batches(emit, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_pairs, batch_format="pyarrow"))

    # global pair dedup: the same pair can surface under several shared
    # variants that hashed into DIFFERENT buckets. A coarse-bucket
    # map_groups dedup, NOT a (id_a, id_b) key-cardinality Aggregate:
    # dense name spaces (numeric-suffix entity names) yield pair sets
    # ~1000x the row count, and Ray's sort-based Aggregate measured
    # ~85k rows/s on that volume while the 256-bucket np.unique path
    # streams it (same rewrite as order_total_reconciliation)
    def add_pair_bucket(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ bb
        return b.append_column("_pb", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    def dedup_bucket(group: pa.Table) -> pa.Table:
        a = group["id_a"].to_numpy(zero_copy_only=False)
        b = group["id_b"].to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        pairs = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"id_a": pa.array(pairs[:, 0], pa.int64()),
                         "id_b": pa.array(pairs[:, 1], pa.int64())})

    cand = (cand.map_batches(add_pair_bucket, batch_format="pyarrow")
                .groupby("_pb")
                .map_groups(dedup_bucket, batch_format="pyarrow"))

    # id_col must be unique (entity-table PK): the map resolves each
    # candidate id via first-match index_in
    m = pa.concat_tables(
        [t for t in ray.get(proj.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    map_ref = ray.put((m["id"].combine_chunks(), m["s"].combine_chunks()))

    def verify(batch: pa.Table) -> pa.Table:
        ids_m, strs_m = ray.get(map_ref)
        sa = strs_m.take(pc.index_in(batch["id_a"], ids_m))
        sb = strs_m.take(pc.index_in(batch["id_b"], ids_m))
        dist = _edit_distance_capped(sa, sb, cap=2)
        keep = (dist >= 1) & (dist <= 2)
        t = batch.select(["id_a", "id_b"]).filter(pa.array(keep))
        return t.append_column("dist", pa.array(dist[keep], pa.int64()))

    return cand.map_batches(verify, batch_format="pyarrow")
