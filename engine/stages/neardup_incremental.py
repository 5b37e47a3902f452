"""Incremental near-dedup: flag NEW docs against a persisted signature
index without re-signaturing (or re-reading) the existing corpus.

The production shape this serves: a large corpus is near-deduped once
and its (key, signature) table is persisted next to it; each incoming
shard (a day's crawl — a small fraction of corpus size) must be checked
against everything already kept PLUS itself. Re-running the full
near-dedup would pay a corpus-sized text read + signature pass + shuffle
per shard; the incremental path pays only a shard-sized signature pass
and a thin band-row shuffle over (index + shard) — the expensive MinHash
kernel runs on new text only.

Semantics (deterministic):

- every indexed key is an ANCHOR: it stays kept, never flagged;
- a new doc that near-dups ANY anchor is flagged (drop);
- within purely-new clusters the minimum key is kept — exactly
  ``mark_near_duplicates``' ``keep='min_key'`` rule.

Parity contract (tested): when the index is dedup-clean and index keys
order before shard keys, the incremental flags over the shard equal the
one-shot ``mark_near_duplicates`` flags over (index corpus + shard)
restricted to the shard.

Scale notes: band rows and the verify groupby are the same thin-row
machinery as :func:`engine.stages.neardup.minhash_lsh_edges`'s
distributed path (nothing corpus-sized on the driver). The cluster
RESOLUTION (per-cluster "contains an anchor?" / min-new-key) runs
driver-side on the shard's near-dup set — shard-near-dup-set-sized,
guarded by ``max_broadcast_losers`` with a loud raise; a shard whose
near-dup set alone outgrows driver memory should run the full
distributed pipeline instead. Classifying edge endpoints as old/new
never broadcasts the index: the (small) endpoint set is broadcast and
the index KEYS are streamed once against it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS
from .neardup import (_BROADCAST_VERIFY_BUDGET_BYTES, _add_coarse_bucket,
                      _band_hashes, _coarse_verify, _edges_from_matrix,
                      _local_min_labels, _sig_fn, _sigs_np,
                      coarse_buckets_for, lsh_band_rows)

_COMP_MIX = np.uint64(0x9E3779B97F4A7C15)


def _check_sig_type(sig, num_perm: int) -> None:
    """Loud failure on a num_perm/index mismatch: decoding a 256-wide
    index with num_perm=128 would otherwise silently interleave halves
    of adjacent signatures (mostly-missed dups, no error)."""
    if (not pa.types.is_fixed_size_binary(sig.type)
            or sig.type.byte_width != num_perm * 8):
        raise ValueError(
            f"index sig column is {sig.type}, expected "
            f"fixed_size_binary({num_perm * 8}) — was the index built "
            f"with a different num_perm than {num_perm}? (the hash "
            "scheme must match the index build too; it is not "
            "recoverable from the bytes)")


def minhash_signature_table(ds, text_col: str = "text",
                            key_col: str = "doc_id",
                            num_perm: int = 128, scheme: str = "kperm"):
    """Dataset -> Dataset (key, sig) — the persistable near-dup index.

    ``sig`` is ``fixed_size_binary(num_perm * 8)`` (parquet-writable);
    ~1 KB/doc at num_perm=128, independent of doc length. Write it with
    ``write_parquet`` next to the deduped corpus and feed it back as
    ``index_sig_ds``. One streaming pass, no shuffle."""
    make_sigs = _sig_fn(scheme)

    def sig_tbl(batch: pa.Table) -> pa.Table:
        from .neardup import _valid_text

        batch = _valid_text(batch, text_col)  # NULL text never indexed
        sigs = make_sigs(batch[text_col], num_perm)
        keys = batch[key_col]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        sig_arr = pa.Array.from_buffers(
            pa.binary(num_perm * 8), len(keys),
            [None, pa.py_buffer(np.ascontiguousarray(sigs).tobytes())])
        return pa.table({"key": keys, "sig": sig_arr})

    return ds.map_batches(sig_tbl, batch_format="pyarrow")


def _sig_matrix(tabs, nperm: int):
    """(keys, sigs-matrix) from collected (key, sig) tables. Every sig
    column is width-validated — a caller-provided ``shard_sig`` built
    with a different num_perm must fail as loudly here as the index
    does in ``index_band_rows``."""
    cols = [t["sig"].combine_chunks()
            if isinstance(t["sig"], pa.ChunkedArray) else t["sig"]
            for t in tabs]
    for c in cols:
        _check_sig_type(c, nperm)
    sigs = np.concatenate([_sigs_np(c, nperm) for c in cols])
    keys = pa.concat_arrays([
        t["key"].combine_chunks()
        if isinstance(t["key"], pa.ChunkedArray) else t["key"]
        for t in tabs])
    return keys, sigs


def _probe_edges(shard_sig, index_sig_ds, nperm: int, bands: int,
                 threshold: float, pair_limit: int, cand_budget: int):
    """Candidate-probe edges: broadcast the shard's composite
    (band, band_hash) set, stream the index signature table ONCE
    emitting only colliding rows, verify shard + candidates through the
    shared in-memory kernel. Returns the edge tables, or None when the
    candidate set overflows ``cand_budget`` (caller falls back to the
    distributed band-row exchange). Composite collisions across bands
    can only ADD candidates (verified later) — never lose one."""
    import ray

    tabs = [t for t in ray.get(shard_sig.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return []
    keys_new, sigs_new = _sig_matrix(tabs, nperm)
    band_ids = np.arange(bands, dtype=np.uint64)
    comp_set = np.unique(
        (_band_hashes(sigs_new, bands) * _COMP_MIX + band_ids[None, :])
        .reshape(-1))
    comp_ref = ray.put(comp_set)

    def probe(batch: pa.Table) -> pa.Table:
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        _check_sig_type(sig, nperm)
        keys = batch["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        c = (_band_hashes(_sigs_np(sig, nperm), bands) * _COMP_MIX
             + band_ids[None, :])
        hit = np.isin(c.reshape(-1), ray.get(comp_ref)).reshape(c.shape)
        sel = pa.array(hit.any(axis=1))
        return pa.table({"key": keys.filter(sel), "sig": sig.filter(sel)})

    # when even an all-hits candidate set would fit the budget, go
    # straight to the sig-carrying pass; otherwise pay a THIN counting
    # pass first so an over-budget probe never materializes index-scale
    # signatures into the object store just to discard them
    n_index = index_sig_ds.count()
    if len(keys_new) + n_index > cand_budget:
        def probe_count(batch: pa.Table) -> pa.Table:
            sig = batch["sig"]
            if isinstance(sig, pa.ChunkedArray):
                sig = sig.combine_chunks()
            _check_sig_type(sig, nperm)
            c = (_band_hashes(_sigs_np(sig, nperm), bands) * _COMP_MIX
                 + band_ids[None, :])
            hit = np.isin(c.reshape(-1),
                          ray.get(comp_ref)).reshape(c.shape)
            return pa.table({"n": pa.array(
                [int(hit.any(axis=1).sum())], pa.int64())})

        n_hits = int(index_sig_ds.map_batches(
            probe_count, batch_format="pyarrow").sum("n") or 0)
        if len(keys_new) + n_hits > cand_budget:
            return None

    cand = index_sig_ds.map_batches(probe,
                                    batch_format="pyarrow").materialize()
    if len(keys_new) + cand.count() > cand_budget:
        return None
    ctabs = [t for t in ray.get(cand.to_arrow_refs()) if t.num_rows]
    keys_all, sigs_all = keys_new, sigs_new
    if ctabs:
        keys_c, sigs_c = _sig_matrix(ctabs, nperm)
        keys_all = pa.concat_arrays([keys_new, keys_c])
        sigs_all = np.concatenate([sigs_new, sigs_c])
    edges_ds = _edges_from_matrix(keys_all, sigs_all, bands,
                                  threshold, pair_limit)
    return [t for t in ray.get(edges_ds.materialize().to_arrow_refs())
            if t.num_rows]


def mark_new_near_duplicates(
    new_ds,
    index_sig_ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    pair_limit_per_bucket: int = 1000,
    scheme: str = "kperm",
    num_coarse_buckets: int | None = None,
    max_broadcast_losers: int | None = None,
    shard_sig=None,
):
    """Shard Dataset -> shard Dataset with ``near_dup_flag`` appended
    (True = drop: the row near-dups an indexed anchor or a smaller-key
    new doc). The index corpus is touched only through its signature
    table. Key spaces must be disjoint (a shard key equal to an index
    key is treated as old — re-ingest should exact-dedup first).

    Physical plan (default, size-guarded): the shard is signatured once
    and its (band, band_hash) set is BROADCAST; the index signature
    table is streamed ONCE against it, emitting only colliding
    candidates (shard-collision-sized — never the index). Shard +
    candidate signatures then verify through the shared in-memory
    kernel (:func:`engine.stages.neardup._edges_from_matrix`). Nothing
    index-sized is shuffled, broadcast, or held anywhere — the 16x
    signature-duplicating band-row exchange of the one-shot distributed
    path is avoided entirely. Shards beyond the broadcast budget fall
    back to that exchange (over the already-materialized shard sig
    table + index)."""
    import ray

    if max_broadcast_losers is None:
        max_broadcast_losers = DEFAULT_MAX_BROADCAST_KEYS
    nperm = num_perm

    def index_band_rows(batch: pa.Table) -> pa.Table:
        keys = batch["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        sig = batch["sig"]
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        _check_sig_type(sig, nperm)
        return lsh_band_rows(keys, _sigs_np(sig, nperm), bands)

    # shard signatures: computed ONCE, reused by whichever path runs.
    # Callers that need the shard's (key, sig) table anyway (e.g. the
    # ingest pipeline persists it as the index delta) pass it in as
    # ``shard_sig`` (MATERIALIZED, same num_perm/scheme) so the text is
    # signatured exactly once end-to-end.
    if shard_sig is None:
        shard_sig = minhash_signature_table(
            new_ds, text_col=text_col, key_col=key_col,
            num_perm=num_perm, scheme=scheme).materialize()
    n_new = shard_sig.count()  # free on a materialized dataset
    per_doc_bytes = 2 * num_perm * 8 + bands * 32
    cand_budget = min(DEFAULT_MAX_BROADCAST_KEYS,
                      _BROADCAST_VERIFY_BUDGET_BYTES // per_doc_bytes)

    edge_tabs = None
    if n_new <= cand_budget // 2:  # leave half the budget for candidates
        edge_tabs = _probe_edges(shard_sig, index_sig_ds, nperm, bands,
                                 jaccard_threshold, pair_limit_per_bucket,
                                 cand_budget)
    if edge_tabs is None:
        # distributed fallback: the thin band-row exchange over
        # (shard sig table + index sig table)
        rows = (shard_sig.map_batches(index_band_rows,
                                      batch_format="pyarrow")
                .union(index_sig_ds.map_batches(index_band_rows,
                                                batch_format="pyarrow"))
                .materialize())  # same barrier rationale as
        # minhash_lsh_edges
        if num_coarse_buckets is None:
            # every doc emits exactly ``bands`` rows, so the doc count
            # falls out of the materialized row count — no extra
            # execution of the shard pipeline just to size buckets
            num_coarse_buckets = coarse_buckets_for(
                rows.count() // bands, bands)
        nc = num_coarse_buckets
        edges_ds = rows.map_batches(
            lambda b: _add_coarse_bucket(b, nc), batch_format="pyarrow",
        ).groupby("_cb").map_groups(
            lambda g: _coarse_verify(g.drop_columns(["_cb"]), nperm,
                                     jaccard_threshold,
                                     pair_limit_per_bucket),
            batch_format="pyarrow")
        edge_tabs = [t for t in
                     ray.get(edges_ds.materialize().to_arrow_refs())
                     if t.num_rows]
    n_edges = sum(t.num_rows for t in edge_tabs)
    if n_edges > max_broadcast_losers:
        # raise BEFORE concatenating the edge set into driver heap — the
        # blow-up this guard exists to prevent
        raise ValueError(
            f"shard near-dup edge set has {n_edges} rows, above "
            f"max_broadcast_losers={max_broadcast_losers}: resolve this "
            "shard with the full distributed pipeline "
            "(minhash_lsh_labels over index corpus + shard) instead")

    def _all_false():
        return new_ds.map_batches(
            lambda b: b.append_column(
                "near_dup_flag", pa.array(np.zeros(b.num_rows, bool))),
            batch_format="pyarrow")

    if not edge_tabs:
        return _all_false()
    edges = pa.concat_tables(edge_tabs).combine_chunks()

    # endpoint old/new classification WITHOUT broadcasting the index:
    # broadcast the (near-dup-set-sized) endpoint set, stream the index
    # keys once, collect which endpoints the index contains
    ka = edges["key_a"].combine_chunks()
    kb = edges["key_b"].combine_chunks()
    endpoints = pc.unique(pa.concat_arrays([ka, kb]))
    ep_ref = ray.put(endpoints)

    def index_hits(batch: pa.Table) -> pa.Table:
        keys = batch["key"]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        hit = pc.is_in(keys, value_set=ray.get(ep_ref))
        return pa.table({"key": keys.filter(hit)})

    old_eps = pa.concat_tables(
        [t for t in ray.get(index_sig_ds
                            .map_batches(index_hits, batch_format="pyarrow")
                            .materialize().to_arrow_refs()) if t.num_rows]
        or [pa.table({"key": endpoints.slice(0, 0)})]
    )["key"].combine_chunks()

    a_old = pc.is_in(ka, value_set=old_eps).to_numpy(zero_copy_only=False)
    b_old = pc.is_in(kb, value_set=old_eps).to_numpy(zero_copy_only=False)
    touch_new = ~(a_old & b_old)  # drop old-old pairs (a clean index has
    # none; shared-bucket re-finds are harmless and filtered here)
    if not touch_new.any():
        return _all_false()
    src = ka.filter(pa.array(touch_new)).to_numpy(zero_copy_only=False)
    dst = kb.filter(pa.array(touch_new)).to_numpy(zero_copy_only=False)

    # cluster driver-side (edge list already here and guarded)
    keys, labels = _local_min_labels(src, dst)
    is_old = pc.is_in(pa.array(keys), value_set=old_eps).to_numpy(
        zero_copy_only=False)
    # per-cluster: does it contain an anchor? min NEW key?
    order = np.argsort(labels, kind="stable")
    lab_s, key_s, old_s = labels[order], keys[order], is_old[order]
    seg = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
    seg_id = np.cumsum(np.r_[True, lab_s[1:] != lab_s[:-1]]) - 1
    any_old = np.zeros(len(seg), bool)
    np.logical_or.at(any_old, seg_id, old_s)
    # min new key per cluster: scan new members in sorted-key order,
    # first new member per cluster wins (keys sorted ascending within
    # the lexsort below)
    new_mask = ~old_s
    ord2 = np.lexsort((key_s, seg_id))
    sid2, key2, new2 = seg_id[ord2], key_s[ord2], new_mask[ord2]
    # first NEW member per cluster: positions where sid changes, scanned
    # over new members only
    nsid = sid2[new2]
    nkey = key2[new2]
    first_new = np.r_[True, nsid[1:] != nsid[:-1]]
    min_new_of = dict(zip(nsid[first_new].tolist(),
                          nkey[first_new].tolist()))
    # losers: new members of anchored clusters, or new members that are
    # not their cluster's min-new
    losers = [k for k, s, o in zip(key_s.tolist(), seg_id.tolist(),
                                   old_s.tolist())
              if not o and (any_old[s] or k != min_new_of[s])]
    if not losers:
        return _all_false()
    loser_ref = ray.put(pa.array(losers, type=pa.array(keys[:1]).type))

    def flag(batch: pa.Table) -> pa.Table:
        f = pc.is_in(batch[key_col], value_set=ray.get(loser_ref))
        return batch.append_column("near_dup_flag", pc.fill_null(f, False))

    return new_ds.map_batches(flag, batch_format="pyarrow")
