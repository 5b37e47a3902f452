"""Incremental shard ingest: the steady-state loop of a 100 TB corpus.

A production corpus is deduped ONCE; afterwards every incoming shard (a
day's crawl, a fraction of corpus size) must be admitted against
everything already kept. This pipeline composes the two incremental
stages so the kept corpus is never re-read, re-hashed or re-signatured:

    shard
      -> mark_new_exact_duplicates   vs persisted content-key index
      -> mark_new_near_duplicates    vs persisted (key, sig) MinHash index
      -> kept rows + INDEX DELTAS (the kept rows' keys and signatures,
         ready to append to the persisted indices for the next shard)

Ordering matters twice: exact runs first because it is cheaper and an
exact duplicate would otherwise burn a MinHash signature; and the near
stage only signatures EXACT SURVIVORS — the one signature pass is then
reused verbatim (``shard_sig=``) both for flagging and as the sig-index
delta, so shard text is hashed exactly once end-to-end.

Reference scope: the reference re-runs its duplicate checker over the
full table per ingest (src/checker/duplicate_checker.py:17-56); here
each index is touched through one streaming pass and the corpus text
not at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..dsutil import DEFAULT_MAX_BROADCAST_KEYS
from ..stages.dedup_incremental import mark_new_exact_duplicates
from ..stages.neardup_incremental import (mark_new_near_duplicates,
                                          minhash_signature_table)


def ingest_shard(
    shard_ds,
    exact_index_ds,
    sig_index_ds,
    text_col: str = "text",
    key_col: str = "doc_id",
    exact_key_col: str | None = None,
    num_perm: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    scheme: str = "kperm",
    max_broadcast_keys: int | None = None,
):
    """Admit one shard. Returns a dict:

    - ``kept``: Dataset of surviving shard rows (all input columns);
    - ``exact_keys_delta``: Dataset (key) — kept rows' content keys, to
      append to the exact index;
    - ``sig_delta``: Dataset (key, sig) — kept rows' signatures, to
      append to the MinHash index;
    - ``stats``: {n_shard, n_exact_dropped, n_near_dropped, n_kept}.

    ``exact_key_col`` names the content-key column on the shard (e.g. a
    sha256 or prefix fingerprint); when None, the raw ``text_col`` is
    the key (whole-content equality). Bootstrap (first shard) = empty
    index datasets; within-shard dedup still applies. Deterministic at
    any parallelism (both stages keep minimum keys)."""
    if max_broadcast_keys is None:
        max_broadcast_keys = DEFAULT_MAX_BROADCAST_KEYS
    kcol = exact_key_col if exact_key_col is not None else text_col

    exact_marked = mark_new_exact_duplicates(
        shard_ds, exact_index_ds, key_col=kcol, id_col=key_col,
        max_broadcast_keys=max_broadcast_keys).materialize()
    n_shard = exact_marked.count()
    survivors = exact_marked.map_batches(
        lambda b: b.filter(pc.invert(pc.fill_null(b["dup_flag"], False)))
                   .drop_columns(["dup_flag"]),
        batch_format="pyarrow")

    # ONE signature pass over exact survivors — reused by the near-dup
    # flagging AND as the sig-index delta
    shard_sig = minhash_signature_table(
        survivors, text_col=text_col, key_col=key_col,
        num_perm=num_perm, scheme=scheme).materialize()
    n_surv = shard_sig.count()

    near_marked = mark_new_near_duplicates(
        survivors, sig_index_ds, text_col=text_col, key_col=key_col,
        num_perm=num_perm, bands=bands,
        jaccard_threshold=jaccard_threshold, scheme=scheme,
        max_broadcast_losers=max_broadcast_keys,
        shard_sig=shard_sig).materialize()
    kept = near_marked.map_batches(
        lambda b: b.filter(
            pc.invert(pc.fill_null(b["near_dup_flag"], False)))
        .drop_columns(["near_dup_flag"]),
        batch_format="pyarrow").materialize()
    n_kept = kept.count()

    # index deltas: kept keys only. The near-dup loser set is small
    # (bounded by the stage's own broadcast guard), so filter the sig
    # table by exclusion instead of re-deriving anything from text.
    import ray

    losers = near_marked.map_batches(
        lambda b: pa.table({
            "key": b[key_col].filter(
                pc.fill_null(b["near_dup_flag"], False))}),
        batch_format="pyarrow")
    loser_tabs = [t for t in ray.get(losers.materialize().to_arrow_refs())
                  if t.num_rows]
    if loser_tabs:
        loser_keys = pa.concat_tables(loser_tabs)["key"].combine_chunks()
        ref = ray.put(loser_keys)

        def keep_sig(b: pa.Table) -> pa.Table:
            drop = pc.is_in(b["key"], value_set=ray.get(ref))
            return b.filter(pc.invert(pc.fill_null(drop, False)))

        sig_delta = shard_sig.map_batches(keep_sig,
                                          batch_format="pyarrow")
    else:
        sig_delta = shard_sig

    def exact_keys(b: pa.Table) -> pa.Table:
        t = pa.table({"key": b[kcol]})
        return t.filter(pc.is_valid(t["key"]))

    exact_keys_delta = kept.map_batches(exact_keys,
                                        batch_format="pyarrow")
    return {
        "kept": kept,
        "exact_keys_delta": exact_keys_delta,
        "sig_delta": sig_delta,
        "stats": {
            "n_shard": n_shard,
            "n_exact_dropped": n_shard - n_surv,
            "n_near_dropped": n_surv - n_kept,
            "n_kept": n_kept,
        },
    }
