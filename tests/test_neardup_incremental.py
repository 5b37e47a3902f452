"""Incremental near-dedup (stages/neardup_incremental.py): planted
shard-vs-index fixtures, parity with the one-shot pipeline over the
combined corpus, parquet round-trip of the signature index, and the
OPH scheme."""

import numpy as np
import pyarrow as pa

from engine.stages.neardup_incremental import (mark_new_near_duplicates,
                                               minhash_signature_table)

BODY = "def load_config(path):\n    return json.loads(open(path).read())\n"


def _old_rows():
    # mutually distinct (pairwise Jaccard ~0) so the index is dedup-clean
    # at threshold 0.7 — the parity contract's precondition
    return [{"doc_id": i,
             "text": " ".join(f"tok{i}_{j} line {i * 97 + j}"
                              for j in range(40)) + "\n" + BODY}
            for i in range(30)]


def _new_rows():
    base3 = _old_rows()[3]["text"]
    rows = [
        # near-dup of indexed doc 3 (tail tweak)
        {"doc_id": 1000, "text": base3 + " pass"},
        # exact dup of indexed doc 7
        {"doc_id": 1001, "text": _old_rows()[7]["text"]},
        # purely-new near-dup pair: 1002 kept (min), 1003 flagged
        {"doc_id": 1002, "text": "brand new shard payload " * 30 + "a"},
        {"doc_id": 1003, "text": "brand new shard payload " * 30 + "b"},
        # distinct new docs
        {"doc_id": 1004, "text": "completely unrelated content " * 10},
        {"doc_id": 1005, "text": "another unrelated document body " * 9},
    ]
    return rows


def _flags(ds) -> dict[int, bool]:
    return {r["doc_id"]: r["near_dup_flag"] for r in ds.take_all()}


def test_incremental_planted(ray_session):
    import ray.data as rd

    old_ds = rd.from_items(_old_rows()).repartition(3)
    sig = minhash_signature_table(old_ds).materialize()
    new_ds = rd.from_items(_new_rows()).repartition(2)
    got = _flags(mark_new_near_duplicates(new_ds, sig,
                                          jaccard_threshold=0.7))
    assert got == {1000: True, 1001: True, 1002: False, 1003: True,
                   1004: False, 1005: False}


def test_incremental_parity_with_one_shot(ray_session):
    """With a dedup-clean index whose keys order before the shard's,
    incremental flags == one-shot min-key flags over the combined corpus
    restricted to the shard (flag <=> key != cluster label)."""
    import ray.data as rd

    from engine.stages.neardup import minhash_lsh_labels

    old_rows, new_rows = _old_rows(), _new_rows()
    combined = rd.from_items(old_rows + new_rows).repartition(4)
    labels = {r["key"]: r["label"] for r in minhash_lsh_labels(
        combined, jaccard_threshold=0.7).take_all()}
    expected = {r["doc_id"]: labels.get(r["doc_id"], r["doc_id"])
                != r["doc_id"] for r in new_rows}

    old_ds = rd.from_items(old_rows).repartition(3)
    sig = minhash_signature_table(old_ds).materialize()
    got = _flags(mark_new_near_duplicates(
        rd.from_items(new_rows).repartition(2), sig,
        jaccard_threshold=0.7))
    assert got == expected
    # sanity: no one-shot flag lands on an index key (clean + key order)
    assert not any(labels.get(r["doc_id"], r["doc_id"]) != r["doc_id"]
                   for r in old_rows)


def test_incremental_parquet_round_trip(ray_session, tmp_path):
    """The signature index survives write_parquet/read_parquet with
    identical downstream flags (fixed_size_binary column)."""
    import ray.data as rd

    old_ds = rd.from_items(_old_rows()).repartition(3)
    p = str(tmp_path / "sig_index")
    minhash_signature_table(old_ds).write_parquet(p)
    sig = rd.read_parquet(p)
    new_ds = rd.from_items(_new_rows()).repartition(2)
    got = _flags(mark_new_near_duplicates(new_ds, sig,
                                          jaccard_threshold=0.7))
    assert got[1000] and got[1001] and got[1003]
    assert not (got[1002] or got[1004] or got[1005])


def test_incremental_no_duplicates_all_false(ray_session):
    import ray.data as rd

    old_ds = rd.from_items(_old_rows()).repartition(2)
    sig = minhash_signature_table(old_ds).materialize()
    new_ds = rd.from_items([
        {"doc_id": 2000, "text": "nothing like the index " * 8},
        {"doc_id": 2001, "text": "also totally fresh text " * 7},
    ])
    got = _flags(mark_new_near_duplicates(new_ds, sig))
    assert got == {2000: False, 2001: False}


def test_incremental_parallelism_invariant_and_oph(ray_session):
    import ray.data as rd

    old_rows, new_rows = _old_rows(), _new_rows()
    for scheme in ("kperm", "oph"):
        flags = []
        for parts in (1, 5):
            sig = minhash_signature_table(
                rd.from_items(old_rows).repartition(parts),
                scheme=scheme).materialize()
            flags.append(_flags(mark_new_near_duplicates(
                rd.from_items(new_rows).repartition(parts), sig,
                jaccard_threshold=0.7, scheme=scheme)))
        assert flags[0] == flags[1]
        # the unambiguous plants hold under both schemes
        assert flags[0][1001] and not flags[0][1004]


def test_incremental_probe_vs_distributed_parity(ray_session, monkeypatch):
    """Shrinking the candidate budget forces the distributed band-row
    exchange; flags must equal the default candidate-probe path."""
    import ray.data as rd

    import engine.stages.neardup_incremental as ndi

    old_ds = rd.from_items(_old_rows()).repartition(3)
    sig = minhash_signature_table(old_ds).materialize()
    new_ds = rd.from_items(_new_rows()).repartition(2)
    probe = _flags(mark_new_near_duplicates(new_ds, sig,
                                            jaccard_threshold=0.7))
    monkeypatch.setattr(ndi, "_BROADCAST_VERIFY_BUDGET_BYTES", 1)
    dist = _flags(mark_new_near_duplicates(new_ds, sig,
                                           jaccard_threshold=0.7))
    assert probe == dist == {1000: True, 1001: True, 1002: False,
                             1003: True, 1004: False, 1005: False}


def test_incremental_counting_prepass(ray_session, monkeypatch):
    """An index larger than the candidate budget triggers the thin
    counting pre-pass (36 sig rows > budget 20); when the actual hits
    fit, the probe path still runs and flags are unchanged. When even
    the hits overflow, _probe_edges declines with None so the caller
    never materializes index-scale signatures."""
    import ray.data as rd

    import engine.stages.neardup_incremental as ndi

    old_ds = rd.from_items(_old_rows()).repartition(3)
    sig = minhash_signature_table(old_ds).materialize()
    new_ds = rd.from_items(_new_rows()).repartition(2)
    base = _flags(mark_new_near_duplicates(new_ds, sig,
                                           jaccard_threshold=0.7))

    rets = []
    orig = ndi._probe_edges

    def spy(*a, **k):
        rets.append(orig(*a, **k))
        return rets[-1]

    monkeypatch.setattr(ndi, "_probe_edges", spy)
    monkeypatch.setattr(ndi, "DEFAULT_MAX_BROADCAST_KEYS", 20)
    got = _flags(mark_new_near_duplicates(new_ds, sig,
                                          jaccard_threshold=0.7,
                                          max_broadcast_losers=10_000))
    assert got == base
    assert len(rets) == 1 and rets[0] is not None  # probe path survived

    # 6 shard + 2 colliding index docs overflow a budget of 7
    shard_sig = ndi.minhash_signature_table(new_ds).materialize()
    assert orig(shard_sig, sig, 128, 16, 0.7, 1000, 7) is None


def test_incremental_num_perm_mismatch_raises(ray_session):
    """A num_perm different from the index build must fail loudly —
    silently interleaved signatures would mostly miss dups."""
    import pytest as _pytest
    import ray.data as rd

    old_ds = rd.from_items(_old_rows()).repartition(2)
    sig = minhash_signature_table(old_ds, num_perm=64).materialize()
    with _pytest.raises(Exception, match="fixed_size_binary"):
        mark_new_near_duplicates(rd.from_items(_new_rows()), sig)


def test_incremental_edge_guard_raises(ray_session):
    import pytest as _pytest
    import ray.data as rd

    old_ds = rd.from_items(_old_rows()).repartition(2)
    sig = minhash_signature_table(old_ds).materialize()
    new_ds = rd.from_items(_new_rows())
    with _pytest.raises(ValueError, match="max_broadcast_losers"):
        mark_new_near_duplicates(new_ds, sig, jaccard_threshold=0.7,
                                 max_broadcast_losers=1)
