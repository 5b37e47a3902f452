"""Incremental exact dedup (stages/dedup_incremental.py): planted
shard-vs-index fixtures, parity between the broadcast and distributed
paths, NULL-key exclusion, parquet round-trip of the key index, and
parity with one-shot mark_duplicates over the combined corpus."""

import pyarrow as pa

from engine.stages.dedup_incremental import mark_new_exact_duplicates


def _index_rows():
    # kept corpus keys: k0..k19, with k5 appearing twice in the index
    # (duplicate index keys are harmless: membership only)
    return [{"key": f"k{i}"} for i in range(20)] + [{"key": "k5"}]


def _new_rows():
    return [
        {"doc_id": 100, "key": "k5"},     # anchor hit -> flagged
        {"doc_id": 101, "key": "k19"},    # anchor hit -> flagged
        {"doc_id": 102, "key": "newA"},   # min of purely-new pair -> kept
        {"doc_id": 103, "key": "newA"},   # -> flagged
        {"doc_id": 104, "key": "newB"},   # unique -> kept
        {"doc_id": 105, "key": None},     # NULL key never participates
        {"doc_id": 106, "key": "newC"},   # unique -> kept
    ]


EXPECTED = {100: True, 101: True, 102: False, 103: True,
            104: False, 105: False, 106: False}


def _flags(ds):
    return {r["doc_id"]: r["dup_flag"] for r in ds.take_all()}


def test_incremental_exact_planted(ray_session):
    import ray.data as rd

    idx = rd.from_items(_index_rows()).repartition(3)
    new = rd.from_items(_new_rows()).repartition(2)
    assert _flags(mark_new_exact_duplicates(new, idx)) == EXPECTED


def test_incremental_exact_distributed_parity(ray_session):
    """Shrinking the broadcast guard forces the thin-row bucketed path;
    flags must be identical."""
    import ray.data as rd

    idx = rd.from_items(_index_rows()).repartition(3)
    new = rd.from_items(_new_rows()).repartition(2)
    # guard=4 < the shard's ~6 partial rows -> distributed path; the 3
    # loser ids still fit the flag-back broadcast
    got = _flags(mark_new_exact_duplicates(new, idx, max_broadcast_keys=4))
    assert got == EXPECTED


def test_incremental_exact_loser_guard_raises(ray_session):
    import pytest as _pytest
    import ray.data as rd

    idx = rd.from_items(_index_rows()).repartition(3)
    new = rd.from_items(_new_rows()).repartition(2)
    with _pytest.raises(Exception, match="mark_duplicates"):
        mark_new_exact_duplicates(new, idx, max_broadcast_keys=2)


def test_incremental_exact_parity_with_one_shot(ray_session):
    """Incremental flags == one-shot mark_duplicates over the combined
    corpus restricted to the shard, when index ids order before shard
    ids (the index is its own dedup's winner set)."""
    import ray.data as rd

    from engine.stages.dedup import mark_duplicates

    index_docs = [{"doc_id": i, "key": f"k{i}"} for i in range(20)]
    new_docs = [r for r in _new_rows() if r["key"] is not None]
    combined = rd.from_items(index_docs + new_docs).repartition(4)
    one_shot = {
        r["doc_id"]: r["dup_flag"]
        for r in mark_duplicates(combined, key="key",
                                 tiebreak=("doc_id",)).take_all()
        if r["doc_id"] >= 100
    }
    idx = rd.from_items([{"key": r["key"]} for r in index_docs])
    got = _flags(mark_new_exact_duplicates(
        rd.from_items(new_docs).repartition(2), idx))
    assert got == one_shot


def test_incremental_exact_parquet_round_trip(ray_session, tmp_path):
    import ray.data as rd

    p = str(tmp_path / "key_index")
    rd.from_items(_index_rows()).write_parquet(p)
    got = _flags(mark_new_exact_duplicates(
        rd.from_items(_new_rows()).repartition(2), rd.read_parquet(p)))
    assert got == EXPECTED


def test_incremental_exact_no_duplicates(ray_session):
    import ray.data as rd

    idx = rd.from_items(_index_rows())
    new = rd.from_items([{"doc_id": 200, "key": "x1"},
                         {"doc_id": 201, "key": "x2"}])
    assert _flags(mark_new_exact_duplicates(new, idx)) == {
        200: False, 201: False}


def test_incremental_exact_parallelism_invariant(ray_session):
    import ray.data as rd

    flags = []
    for parts in (1, 4):
        idx = rd.from_items(_index_rows()).repartition(parts)
        new = rd.from_items(_new_rows()).repartition(parts)
        flags.append(_flags(mark_new_exact_duplicates(new, idx)))
    assert flags[0] == flags[1] == EXPECTED
