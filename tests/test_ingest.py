"""Incremental shard ingest pipeline (pipelines/ingest.py): bootstrap
shard, a second shard admitted against the first's index deltas, and
parallelism invariance."""

import pyarrow as pa

from engine.pipelines.ingest import ingest_shard

SIG_W = 128 * 8


def _empty_indices():
    import ray.data as rd

    return (rd.from_arrow(pa.table({"key": pa.array([], pa.string())})),
            rd.from_arrow(pa.table({"key": pa.array([], pa.int64()),
                                    "sig": pa.array([], pa.binary(SIG_W))})))


def _doc(i: int, text: str):
    return {"doc_id": i, "text": text}


def _distinct(i: int) -> str:
    return " ".join(f"tok{i}_{j} line {i * 97 + j}" for j in range(40))


def test_ingest_bootstrap(ray_session):
    import ray.data as rd

    exact_idx, sig_idx = _empty_indices()
    shard = rd.from_items([
        _doc(1, _distinct(1)),
        _doc(2, _distinct(1)),          # exact dup of 1 -> dropped
        _doc(3, _distinct(3)),
        _doc(4, _distinct(3) + " x"),   # near dup of 3 -> dropped
        _doc(5, _distinct(5)),
    ]).repartition(2)
    out = ingest_shard(shard, exact_idx, sig_idx,
                       jaccard_threshold=0.7)
    assert out["stats"] == {"n_shard": 5, "n_exact_dropped": 1,
                            "n_near_dropped": 1, "n_kept": 3}
    kept_ids = sorted(r["doc_id"] for r in out["kept"].take_all())
    assert kept_ids == [1, 3, 5]
    # deltas cover exactly the kept rows
    assert out["exact_keys_delta"].count() == 3
    assert sorted(r["key"] for r in out["sig_delta"].take_all()) == kept_ids


def test_ingest_second_shard_against_deltas(ray_session):
    import ray.data as rd

    exact_idx, sig_idx = _empty_indices()
    shard1 = rd.from_items([
        _doc(1, _distinct(1)),
        _doc(2, _distinct(2)),
        _doc(3, _distinct(2)),  # dropped in shard 1 (exact dup of 2)
    ]).repartition(2)
    out1 = ingest_shard(shard1, exact_idx, sig_idx,
                        jaccard_threshold=0.7)
    # append the deltas (what a production run writes back to parquet)
    exact_idx2 = out1["exact_keys_delta"].materialize()
    sig_idx2 = out1["sig_delta"].materialize()

    shard2 = rd.from_items([
        _doc(10, _distinct(1)),          # exact dup of kept 1 -> dropped
        _doc(11, _distinct(1) + " y"),   # near dup of kept 1 -> dropped
        _doc(12, _distinct(12)),         # fresh -> kept
    ]).repartition(2)
    out2 = ingest_shard(shard2, exact_idx2, sig_idx2,
                        jaccard_threshold=0.7)
    assert out2["stats"] == {"n_shard": 3, "n_exact_dropped": 1,
                             "n_near_dropped": 1, "n_kept": 1}
    assert [r["doc_id"] for r in out2["kept"].take_all()] == [12]


def test_ingest_parallelism_invariant(ray_session):
    import ray.data as rd

    rows = ([_doc(i, _distinct(i)) for i in range(8)]
            + [_doc(100, _distinct(3)), _doc(101, _distinct(5) + " z")])
    results = []
    for parts in (1, 4):
        exact_idx, sig_idx = _empty_indices()
        out = ingest_shard(rd.from_items(rows).repartition(parts),
                           exact_idx, sig_idx, jaccard_threshold=0.7)
        results.append((out["stats"],
                        sorted(r["doc_id"] for r in out["kept"].take_all())))
    assert results[0] == results[1]
    assert results[0][0]["n_kept"] == 8
