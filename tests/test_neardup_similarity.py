"""Near-dup family + similarity search + text analysis + multimodal."""

import numpy as np
import pyarrow as pa
import pytest

from engine.stages.neardup import (
    embedding_neardup_pairs,
    minhash_lsh_dedup,
    minhash_signatures,
    ngram_jaccard,
    signature_jaccard,
    simhash64,
    simhash_neardup_pairs,
    hamming64,
)

BASE = ("def compute_total(values):\n    total = 0\n"
        "    for v in values:\n        total += v\n    return total\n") * 4
NEAR = BASE.replace("total", "summed", 2)  # small edit
FAR = "SELECT a, b FROM table_x WHERE a > 10 ORDER BY b DESC;\n" * 5


def test_ngram_jaccard_values():
    assert ngram_jaccard(BASE, BASE) == 1.0
    assert 0.5 < ngram_jaccard(BASE, NEAR) < 1.0
    assert ngram_jaccard(BASE, FAR) < 0.1
    assert ngram_jaccard("", "") == 1.0
    assert ngram_jaccard(BASE, "") == 0.0


def test_minhash_estimates_jaccard():
    texts = pa.array([BASE, NEAR, FAR], pa.large_string())
    sigs = minhash_signatures(texts, num_perm=256)
    est_near = signature_jaccard(sigs[0], sigs[1])
    est_far = signature_jaccard(sigs[0], sigs[2])
    exact_near = ngram_jaccard(BASE, NEAR)
    assert abs(est_near - exact_near) < 0.12
    assert est_far < 0.1


def test_minhash_deterministic_and_batch_independent():
    texts = [BASE, NEAR, FAR, BASE + "x", FAR + "y"]
    full = minhash_signatures(pa.array(texts, pa.large_string()))
    parts = np.vstack([
        minhash_signatures(pa.array(texts[:2], pa.large_string())),
        minhash_signatures(pa.array(texts[2:], pa.large_string())),
    ])
    assert (full == parts).all()


def test_minhash_lsh_finds_planted_near_dups(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": NEAR},          # near-dup of 0
        {"doc_id": 2, "text": FAR},
        {"doc_id": 3, "text": BASE},          # exact dup of 0
        {"doc_id": 4, "text": "completely different short text here"},
    ]
    ds = rd.from_items(rows).repartition(3)
    clusters, rep_of = minhash_lsh_dedup(ds, jaccard_threshold=0.6)
    cluster_with_0 = next(c for c in clusters if 0 in c)
    assert 1 in cluster_with_0 and 3 in cluster_with_0
    assert 2 not in cluster_with_0 and 4 not in cluster_with_0
    assert rep_of[3] == 0  # deterministic keep-first: min key representative


def test_simhash_properties():
    fps = simhash64(pa.array([BASE, BASE, NEAR, FAR], pa.large_string()))
    assert fps[0] == fps[1]
    d_near = hamming64(fps[0:1], fps[2:3])[0]
    d_far = hamming64(fps[0:1], fps[3:4])[0]
    assert d_near < d_far
    assert d_near <= 12


def test_simhash_neardup_pairs():
    keys = [10, 20, 30, 40]
    fps = simhash64(pa.array([BASE, BASE, NEAR, FAR], pa.large_string()))
    pairs = simhash_neardup_pairs(keys, fps, max_hamming=3)
    assert (10, 20) in pairs
    assert all(40 not in p for p in pairs)


def test_embedding_neardup():
    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal(32)
    near = base + rng.standard_normal(32) * 0.01
    far = rng.standard_normal(32)
    pairs = embedding_neardup_pairs([1, 2, 3], np.stack([base, near, far]), 0.95)
    assert pairs == [(1, 2)]


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def test_knn_brute_force_self_top1(ray_session):
    import ray.data as rd

    from engine.stages.similarity import knn_brute_force

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.asarray(ds.filter(expr="vec_id == 5").take_all()[0]["embedding"])
    out = knn_brute_force(ds, q.reshape(1, -1), k=5)
    assert out["key"][0].as_py() == 5  # the query vector itself ranks first
    assert abs(out["sim"][0].as_py() - 1.0) < 1e-9
    sims = out["sim"].to_pylist()
    assert sims == sorted(sims, reverse=True)


def test_lsh_recall_on_planted_neighbors(ray_session):
    """LSH is built for *close* neighbors: plant perturbed copies around
    base vectors and require high recall of those. (On unclustered random
    vectors — e.g. the testdata embeddings, where the nearest neighbor
    sits at cosine ~0.33 — hyperplane LSH legitimately needs many probes;
    that regime is the brute-force path's job.)"""
    import ray.data as rd

    from engine.stages.similarity import LSHIndex

    rng = np.random.Generator(np.random.PCG64(11))
    noise = rng.standard_normal((400, 64))
    bases = rng.standard_normal((5, 64))
    planted = []
    for bi, b in enumerate(bases):
        for j in range(10):
            planted.append(b + rng.standard_normal(64) * 0.05)
    vecs = np.vstack([noise, planted])
    keys = np.arange(len(vecs))
    index = LSHIndex(64, n_planes=10, seed=42)
    index.add(keys, vecs)
    recalls = []
    for bi, b in enumerate(bases):
        truth = set(range(400 + bi * 10, 400 + bi * 10 + 10))
        got = {k for k, _ in index.query(b, k=10, probe_bits=2)}
        recalls.append(len(truth & got) / 10)
    assert np.mean(recalls) >= 0.9, recalls


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def test_token_counts_match_re():
    import re

    from engine.stages.textstats import BPE_TOKEN_RE, add_token_counts

    texts = ["hello world 123", "a,b;c", "", "  spaced   out  ", "x"]
    t = add_token_counts(pa.table({"text": texts}))
    for i, s in enumerate(texts):
        assert t["ws_token_count"][i].as_py() == len(s.split())
        assert t["bpe_token_count"][i].as_py() == len(re.findall(BPE_TOKEN_RE, s))


def test_winnowing_shared_substring_guarantee():
    from engine.stages.textstats import winnowing_fingerprints

    shared = "this exact shared passage is long enough to fingerprint"
    a = "prefix one " + shared + " suffix alpha"
    b = "totally different opening " + shared + " and another tail"
    fa, fb = winnowing_fingerprints(pa.array([a, b]), k=8, window=16)
    assert set(fa) & set(fb)  # guarantee: shared substring >= window+k-1
    fc = winnowing_fingerprints(pa.array(["nothing in common whatsoever zzz"]))[0]
    assert not (set(fa) & set(fc))


def test_heuristic_langid():
    from engine.stages.textstats import heuristic_langid

    out = heuristic_langid(pa.array([
        "the cat is in the house and it is warm",
        "der Hund ist nicht mit der Katze",
        "le chat est dans la maison pour un moment",
        "el perro es un animal que vive en la casa",
        "这是一个中文句子",
    ]))
    assert out == ["en", "de", "fr", "es", "zh"]


def test_quality_score_range():
    from engine.stages.textstats import add_quality_score

    t = add_quality_score(pa.table({"text": [
        "", "the quick brown fox, it jumps; over the lazy dog. " * 10, "x" * 50000,
    ]}))
    scores = t["quality_score"].to_pylist()
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[1] > scores[0] and scores[1] > scores[2]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------

def test_fake_decoder_pipeline(ray_session):
    import ray.data as rd

    from engine.stages.multimodal import (
        FakeDecoder, decode_stage, synth_media_table)

    tbl = synth_media_table(64, "image")
    out = decode_stage(rd.from_arrow(tbl), concurrency=(1, 2)).materialize()
    assert out.count() == 64
    schema = out.schema()
    feat_type = schema.types[schema.names.index("features")]
    assert pa.types.is_fixed_size_list(feat_type)
    assert feat_type.list_size == FakeDecoder.FEATURE_DIM
    rows = out.take(2)
    assert len(rows[0]["payload_sha256"]) == 64
    # deterministic: same payload -> same features on a rerun
    again = decode_stage(rd.from_arrow(tbl), concurrency=(1, 2)).materialize()
    a = {r["media_id"]: r["payload_sha256"] for r in out.take_all()}
    b = {r["media_id"]: r["payload_sha256"] for r in again.take_all()}
    assert a == b


def test_decode_stub_raises():
    from engine.stages.multimodal import DecodeStub, synth_media_table

    stub = DecodeStub("jpeg")
    with pytest.raises(NotImplementedError):
        stub(synth_media_table(2))


def test_frame_sampling(ray_session):
    import ray.data as rd

    from engine.stages.multimodal import frame_sample_stage, synth_media_table

    tbl = synth_media_table(10, "video")  # duration 1000ms each
    out = frame_sample_stage(rd.from_arrow(tbl), every_ms=200).materialize()
    assert out.count() == 10 * 5
    rows = [r for r in out.take_all() if r["media_id"] == 3]
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 200, 400, 600, 800]


def test_ivf_recall_vs_brute_force(ray_session):
    """IVF with nprobe=4 of 16 cells recovers most of the true top-10 on
    real (unclustered) embeddings — the coarse quantizer adapts to the
    data, unlike data-oblivious hyperplanes."""
    import ray.data as rd

    from engine.stages.similarity import build_ivf_index, knn_brute_force

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    index = build_ivf_index(ds, n_lists=16)
    recalls = []
    for r in ds.filter(expr="vec_id < 5").take_all():
        q = np.asarray(r["embedding"])
        truth = set(knn_brute_force(ds, q.reshape(1, -1), k=10)["key"].to_pylist())
        got = {k for k, _ in index.query(q, k=10, nprobe=4)}
        recalls.append(len(truth & got) / 10)
    assert np.mean(recalls) >= 0.5, recalls


def test_ivf_deterministic(ray_session):
    import ray.data as rd

    from engine.stages.similarity import build_ivf_index

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.asarray(ds.filter(expr="vec_id == 3").take_all()[0]["embedding"])
    a = build_ivf_index(ds, n_lists=16).query(q, k=10, nprobe=4)
    b = build_ivf_index(ds, n_lists=16).query(q, k=10, nprobe=4)
    assert a == b


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------

def test_hll_accuracy_ints(ray_session):
    import ray.data as rd

    from engine.stages.sketches import approx_distinct

    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey"])
    exact = len(ds.unique("l_orderkey"))
    est = approx_distinct(ds, "l_orderkey")
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_accuracy_strings(ray_session):
    import ray.data as rd

    from engine.stages.sketches import approx_distinct

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    exact = 500  # all distinct at sf0.001
    est = approx_distinct(ds, "text")
    assert abs(est - exact) / exact < 0.08, est


def test_hll_merge_equals_single_pass():
    import numpy as np
    import pyarrow as pa

    from engine.stages.sketches import hll_estimate, hll_merge, hll_partial

    vals = [f"key-{i}" for i in range(10000)]
    full = hll_partial(pa.array(vals))
    merged = hll_merge([hll_partial(pa.array(vals[:3000])),
                        hll_partial(pa.array(vals[3000:]))])
    assert (full == merged).all()  # mergeability is exact, not approximate
    assert abs(hll_estimate(full) - 10000) / 10000 < 0.05


def test_simhash_max_hamming_bound():
    """4x16-bit pigeonhole bucketing only guarantees recall to radius 3:
    larger radii must be rejected, not silently lossy."""
    import numpy as np
    import pytest

    from engine.stages.neardup import simhash_neardup_pairs

    fps = np.array([0, 0xF], dtype=np.uint64)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs([1, 2], fps, max_hamming=4)


def test_minhash_lsh_hot_bucket_linear(ray_session):
    """An exact-dup hot bucket (one content repeated 5000x — every band
    hashes it to the same bucket) must stay linear: star edges keep the
    cluster fully connected while the quadratic pair space is capped, and
    nothing corpus-sized is pulled to the driver (the verify phase runs
    inside the bucket map_groups by construction)."""
    import ray.data as rd

    from engine.stages.neardup import minhash_lsh_edges, minhash_lsh_dedup

    n_hot, bands, limit = 5000, 16, 1000
    rows = [{"doc_id": i, "text": "the exact same hot content " * 8}
            for i in range(n_hot)]
    rows += [{"doc_id": n_hot + i, "text": f"unique filler document {i} " * 6}
             for i in range(50)]
    ds = rd.from_items(rows).repartition(8)

    edges = minhash_lsh_edges(ds, pair_limit_per_bucket=limit).materialize()
    # linear bound: per band-bucket (n-1) star edges + `limit` checked
    # pairs (+ one iteration of overshoot, <= n-2) — never the ~12.5M
    # pair quadratic blowup
    assert edges.count() <= bands * (2 * (n_hot - 1) + limit)

    clusters, rep_of = minhash_lsh_dedup(ds, pair_limit_per_bucket=limit)
    hot = [c for c in clusters if 0 in c]
    assert len(hot) == 1 and len(hot[0]) == n_hot  # fully connected via stars
    assert rep_of[n_hot - 1] == 0


def test_scan_search_matches_index_query(ray_session):
    """The index-free pruned scans (ivf_topk / lsh_topk — the 100-TB path,
    no driver-resident inverted lists) must return exactly the hits of
    querying a built index with the same parameters."""
    import ray.data as rd

    from engine.stages.similarity import (
        build_ivf_index, build_lsh_index, ivf_topk, lsh_topk)

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = np.asarray(ds.take(1)[0]["embedding"])

    ivf = build_ivf_index(ds, n_lists=16)
    want = ivf.query(q, k=10, nprobe=4)
    got = ivf_topk(ds, q.reshape(1, -1), k=10, nprobe=4, n_lists=16)
    assert list(zip(got["key"].to_pylist(),
                    [round(s, 12) for s in got["sim"].to_pylist()])) == [
        (k, round(s, 12)) for k, s in want]

    lsh = build_lsh_index(ds, n_planes=10)
    want = lsh.query(q, k=10, probe_bits=2)
    got = lsh_topk(ds, q.reshape(1, -1), k=10, probe_bits=2, n_planes=10)
    assert list(zip(got["key"].to_pylist(),
                    [round(s, 12) for s in got["sim"].to_pylist()])) == [
        (k, round(s, 12)) for k, s in want]


def test_embedding_neardup_distributed(ray_session):
    """embedding_neardup_edges finds planted near-dup vector pairs via
    LSH buckets (per-bucket kernel), without a whole-set matmul."""
    import ray.data as rd

    from engine.stages.neardup import embedding_neardup_edges

    rng = np.random.Generator(np.random.PCG64(7))
    base = rng.standard_normal((40, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # plant 5 near-dups: tiny perturbations of vectors 0..4
    for j in range(5):
        rows.append({"vec_id": 100 + j,
                     "embedding": (base[j] + 0.01 * rng.standard_normal(16)).tolist()})
    ds = rd.from_items(rows).repartition(4)
    edges = embedding_neardup_edges(ds, threshold=0.95)
    pairs = {(r["key_a"], r["key_b"]) for r in edges.take_all()}
    for j in range(5):
        assert (j, 100 + j) in pairs, j
    # random 16-dim gaussians are nowhere near cos 0.95 of each other
    assert all(a % 100 == b % 100 for a, b in pairs)


def test_minhash_edges_broadcast_equals_distributed(ray_session):
    """The size-guarded broadcast verify (shuffle-free) and the
    distributed coarse-groupby path share the _verify_sorted kernel and
    must emit IDENTICAL edge sets on the same corpus — including planted
    near-dup pairs and a hot exact-dup group that exercises the star+cap
    structure."""
    import ray.data as rd

    from engine.stages.neardup import minhash_lsh_edges

    rows = []
    for i in range(120):
        rows.append({"doc_id": i,
                     "text": f"totally distinct document body {i} " * 6
                     + str(i * 104729)})
    base = "the quick brown fox jumps over the lazy dog again and again "
    for j in range(6):  # planted near-dups of each other
        rows.append({"doc_id": 1000 + j, "text": base * 8 + f"tail{j}"})
    for j in range(25):  # hot exact-dup group (star edges + cap)
        rows.append({"doc_id": 2000 + j, "text": "identical payload " * 20})
    ds = rd.from_items(rows).repartition(5)
    e_bc = minhash_lsh_edges(ds, jaccard_threshold=0.8,
                             pair_limit_per_bucket=10)
    e_dist = minhash_lsh_edges(ds, jaccard_threshold=0.8,
                               pair_limit_per_bucket=10,
                               max_broadcast_docs=0)
    pb = {(r["key_a"], r["key_b"]) for r in e_bc.take_all()}
    pd_ = {(r["key_a"], r["key_b"]) for r in e_dist.take_all()}
    assert pb == pd_
    # the planted cluster is connected in both
    assert any(a >= 2000 and b >= 2000 for a, b in pb)
    assert any(1000 <= a < 2000 and 1000 <= b < 2000 for a, b in pb)


def test_embedding_neardup_hot_bucket_capped(ray_session):
    """A degenerate bucket (thousands of IDENTICAL embeddings — exactly
    what a near-dup corpus contains) completes in bounded time under the
    per-bucket pair cap, and the always-checked star edges keep the
    bucket fully connected through its head: every member still reaches
    the minimum key, so the cluster survives the cap intact."""
    import time

    import ray.data as rd

    from engine.stages.neardup import (embedding_neardup_edges,
                                       propagate_min_labels)

    rng = np.random.Generator(np.random.PCG64(3))
    v = rng.standard_normal(16)
    n = 3000  # uncapped would be ~4.5M pairs per table x 8 tables
    rows = [{"vec_id": i, "embedding": v.tolist()} for i in range(n)]
    ds = rd.from_items(rows).repartition(4)
    t0 = time.time()
    edges = embedding_neardup_edges(ds, threshold=0.95,
                                    pair_limit_per_bucket=500)
    pairs = [(r["key_a"], r["key_b"]) for r in edges.take_all()]
    elapsed = time.time() - t0
    # star edges from the head (key 0) survive: every member connects
    star = {(0, j) for j in range(1, n)}
    assert star <= set(pairs)
    # capped: far below the ~4.5M all-pairs blowup
    assert len(pairs) < n + 8 * 500 + 8
    labels = propagate_min_labels(
        rd.from_items([{"key_a": a, "key_b": b} for a, b in pairs])
        .repartition(4), num_partitions=4)
    lab = {r["key"]: r["label"] for r in labels.take_all()}
    assert set(lab.values()) == {0}  # one cluster, rep = min key
    assert elapsed < 120, elapsed


def test_minhash_lsh_no_duplicates_empty_result(ray_session):
    """Zero verified edges (all-distinct corpus) must yield ([], {}) —
    not a crash in label propagation over empty-block datasets."""
    import ray.data as rd

    from engine.stages.neardup import minhash_lsh_dedup

    rows = [{"doc_id": i, "text": f"totally distinct document body {i} " * 8
             + str(i * 7919)} for i in range(30)]
    clusters, rep_of = minhash_lsh_dedup(rd.from_items(rows).repartition(4),
                                         jaccard_threshold=0.9)
    assert clusters == [] and rep_of == {}


def test_label_propagation_long_chain(ray_session):
    """A 100-node path graph (diameter 99 > the 30-iteration cap) must
    still converge to ONE component — the pointer-jumping shortcut makes
    convergence O(log diameter)."""
    import ray.data as rd

    from engine.stages.neardup import propagate_min_labels

    edges = rd.from_items([{"key_a": i, "key_b": i + 1}
                           for i in range(99)]).repartition(4)
    labels = propagate_min_labels(edges, num_partitions=4, max_iters=30)
    got = {r["key"]: r["label"] for r in labels.take_all()}
    assert got == {i: 0 for i in range(100)}


def test_lsh_probe_bits_guard(ray_session):
    import ray.data as rd

    from engine.stages.similarity import LSHIndex, lsh_topk

    idx = LSHIndex(8, n_planes=6)
    with pytest.raises(ValueError, match="probe_bits"):
        idx.query(np.ones(8), probe_bits=3)
    ds = rd.from_items([{"vec_id": 0, "embedding": [1.0] * 8}])
    with pytest.raises(ValueError, match="probe_bits"):
        lsh_topk(ds, np.ones((1, 8)), probe_bits=3, n_planes=6)


def test_mark_near_duplicates_corpus(ray_session):
    """Corpus-level near-dedup flags exactly the non-representative
    members of each near-dup cluster (distributed join-back, no loser
    broadcast); distinct docs stay unflagged."""
    import ray.data as rd

    from engine.stages.neardup import mark_near_duplicates

    rows = []
    for i in range(6):  # 6 near-identical variants -> keep 1, drop 5
        rows.append({"repo": "r1", "path": f"a/{i}.py", "commit": f"c{i}",
                     "content": BASE + f" tiny-suffix-{i}"})
    for i in range(10):  # distinct docs -> all kept
        rows.append({"repo": "r2", "path": f"b/{i}.py", "commit": f"d{i}",
                     "content": f"wholly different program number {i} " * 10
                     + str(i * 104729)})
    ds = rd.from_items(rows).repartition(4)
    out = mark_near_duplicates(ds, jaccard_threshold=0.6)
    flags = {(r["repo"], r["path"]): r["near_dup_flag"]
             for r in out.take_all()}
    assert len(flags) == 16
    dropped = [k for k, v in flags.items() if v]
    assert len(dropped) == 5 and all(k[0] == "r1" for k in dropped)
    assert ("r1", "a/0.py") not in dropped  # min-key representative kept


def test_mark_near_duplicates_no_dups(ray_session):
    import ray.data as rd

    from engine.stages.neardup import mark_near_duplicates

    rows = [{"repo": "r", "path": f"p{i}", "commit": f"c{i}",
             "content": f"unique doc {i} " * 12 + str(i * 7919)}
            for i in range(12)]
    out = mark_near_duplicates(rd.from_items(rows).repartition(3),
                               jaccard_threshold=0.9)
    assert all(not r["near_dup_flag"] for r in out.take_all())


def test_propagate_min_labels_local_equals_distributed(ray_session):
    """The size-guarded local fast path and the distributed join+groupby-Min
    loop produce identical (key, label) sets — int and string keys, chains
    (pointer-jump stress), multi-component graphs, and repeated edges."""
    import ray.data as rd

    from engine.stages.neardup import propagate_min_labels

    cases = [
        # chain 0-1-2-...-9, separate triangle, isolated pair, dup edges
        [(i, i + 1) for i in range(9)]
        + [(100, 101), (101, 102), (100, 102), (200, 201), (200, 201)],
        [(5, 3), (3, 1), (7, 5)],
    ]
    for pairs in cases:
        edges = rd.from_items(
            [{"key_a": a, "key_b": b} for a, b in pairs]).repartition(3)
        local = sorted(
            (r["key"], r["label"])
            for r in propagate_min_labels(edges).take_all())
        dist = sorted(
            (r["key"], r["label"])
            for r in propagate_min_labels(
                edges, local_edge_limit=0).take_all())
        assert local == dist
        assert local  # non-empty

    # string keys (the mark_near_duplicates regime)
    spairs = [("b", "a"), ("b", "c"), ("x", "y")]
    edges = rd.from_items(
        [{"key_a": a, "key_b": b} for a, b in spairs]).repartition(2)
    local = sorted((r["key"], r["label"])
                   for r in propagate_min_labels(edges).take_all())
    dist = sorted((r["key"], r["label"])
                  for r in propagate_min_labels(
                      edges, local_edge_limit=0).take_all())
    assert local == dist
    assert local == [("a", "a"), ("b", "a"), ("c", "a"),
                     ("x", "x"), ("y", "x")]


def test_ppm_codec_roundtrip():
    """encode_ppm/decode_ppm are exact inverses; comments parse."""
    import numpy as np

    from engine.stages.multimodal import decode_ppm, encode_ppm

    rng = np.random.Generator(np.random.PCG64(11))
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # header comments are legal PPM
    with_comment = b"P6\n# a comment\n5 7\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)
    import pytest

    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n5 7\n255\n" + img.tobytes()[:-1])  # truncated


def test_png_codec_roundtrip_all_filters():
    """encode_png/decode_png are exact inverses on odd shapes whose row
    count covers ALL FIVE scanline filters (the encoder rotates y % 5);
    CRC corruption and non-RGB profiles raise."""
    import zlib

    import pytest

    from engine.stages.multimodal import decode_png, encode_png

    rng = np.random.Generator(np.random.PCG64(21))
    for h, w in [(7, 5), (5, 1), (1, 3), (11, 4), (32, 32)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_png(img)
        assert payload.startswith(b"\x89PNG")
        assert np.array_equal(decode_png(payload), img), (h, w)
        # compression is real: gradient images shrink well below raw
    flat = np.zeros((64, 64, 3), np.uint8)
    assert len(encode_png(flat)) < 64 * 64 * 3 // 10
    img = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    payload = bytearray(encode_png(img))
    payload[50] ^= 0xFF  # corrupt inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")
    # unsupported profile (grayscale) rejected loudly, not mis-decoded
    import struct
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
    gray = (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR"
            + ihdr + struct.pack(">I", crc))
    with pytest.raises(ValueError, match="profile"):
        decode_png(gray)


def test_png_ppm_feature_parity(ray_session):
    """The PNG round-trip is lossless, so the ImageDecoder features over
    synth_png_table (compressed payloads) match synth_ppm_table's exactly
    — same pixels, different container. Also certifies the dispatching
    decoder path end-to-end through the actor-pool stage."""
    import ray.data as rd

    from engine.stages.multimodal import (ImageDecoder, decode_stage,
                                          synth_png_table, synth_ppm_table)

    def feats(t):
        ds = rd.from_arrow(t).repartition(3)
        out = decode_stage(ds, decoder_cls=ImageDecoder).take_all()
        return {r["media_id"]: list(r["features"]) for r in out}

    f_png = feats(synth_png_table(24))
    f_ppm = feats(synth_ppm_table(24))
    assert f_png == f_ppm


def test_wav_codec_roundtrip():
    """encode_wav/decode_wav are exact inverses; chunk walking skips
    unknown chunks."""
    import struct

    import numpy as np

    from engine.stages.multimodal import decode_wav, encode_wav

    rng = np.random.Generator(np.random.PCG64(12))
    samples = rng.integers(-32768, 32768, size=1001, dtype=np.int16)
    payload = encode_wav(samples, 8000)
    got, rate = decode_wav(payload)
    assert rate == 8000 and np.array_equal(got, samples)
    # inject an unknown chunk between fmt and data
    fmt_end = payload.index(b"data")
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = payload[:fmt_end] + junk + payload[fmt_end:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    got2, rate2 = decode_wav(patched)
    assert rate2 == 8000 and np.array_equal(got2, samples)


def test_resize_nearest():
    import numpy as np

    from engine.stages.multimodal import resize_nearest

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    up = resize_nearest(img, 12, 8)
    assert up.shape == (8, 12, 3)
    assert np.array_equal(up[0, 0], img[0, 0])
    assert np.array_equal(up[-1, -1], img[-1, -1])
    down = resize_nearest(img, 3, 2)
    assert down.shape == (2, 3, 3)


def test_real_decoders_end_to_end(ray_session):
    """ImageDecoder/AudioDecoder actor-pool stages decode REAL payload
    bytes; features match a direct in-process decode (determinism across
    the Ray pipeline)."""
    import numpy as np
    import ray.data as rd

    from engine.stages.multimodal import (
        AudioDecoder, ImageDecoder, decode_ppm, decode_stage,
        synth_ppm_table, synth_wav_table)

    tbl = synth_ppm_table(16, width=8, height=6)
    out = decode_stage(rd.from_arrow(tbl).repartition(3),
                       decoder_cls=ImageDecoder).sort("media_id").take_all()
    assert len(out) == 16
    img0 = decode_ppm(tbl["payload"][0].as_py())
    lum0 = img0.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert abs(out[0]["features"][0] - lum0.mean()) < 1e-3
    assert out[0]["features"][10] == 8.0 and out[0]["features"][11] == 6.0

    wtbl = synth_wav_table(8, sample_rate=8000, duration_ms=100)
    wout = decode_stage(rd.from_arrow(wtbl).repartition(3),
                        decoder_cls=AudioDecoder).sort("media_id").take_all()
    assert len(wout) == 8
    assert wout[0]["features"][10] == 8000.0  # sample_rate
    assert wout[0]["features"][11] == 800.0   # n_samples
    assert 0.0 < wout[0]["features"][12] < 1.0  # rms of a 0.5-amp sine


def test_mark_near_duplicates_broadcast_equals_join(ray_session):
    """The broadcast loser flag path and the distributed-join fallback
    produce identical near_dup_flag columns."""
    import ray.data as rd

    from engine.stages.neardup import mark_near_duplicates

    base = ("def sort(xs):\n    return sorted(xs)\n" * 8)
    rows = []
    for i in range(40):
        text = base + (f"# variant {i}\n" if i % 2 else "")
        rows.append({"repo": f"r{i % 5}", "path": f"p{i}.py",
                     "commit": f"c{i}", "lang": "python",
                     "content": text + ("x" * (i % 3))})
    ds = rd.from_items(rows).repartition(4)

    def flags(out):
        return sorted((r["repo"], r["path"], r["near_dup_flag"])
                      for r in out.take_all())

    bcast = flags(mark_near_duplicates(ds, jaccard_threshold=0.6))
    joined = flags(mark_near_duplicates(ds, jaccard_threshold=0.6,
                                        max_broadcast_losers=0))
    assert bcast == joined
    assert any(f for _, _, f in bcast)  # some near-dups planted


def test_mark_near_duplicates_max_quality(ray_session):
    """keep="max_quality": the cluster representative is the member with
    the greatest quality (ties -> min key), flag COUNT matches min_key,
    and a NULL-quality member never wins over a scored one."""
    import ray.data as rd

    from engine.stages.neardup import mark_near_duplicates

    rows = []
    for i in range(6):  # one 6-member cluster; best quality at i=4
        rows.append({"repo": "r1", "path": f"a/{i}.py", "commit": f"c{i}",
                     "content": BASE + f" tiny-suffix-{i}",
                     "score": [0.1, 0.5, 0.3, None, 0.9, 0.2][i]})
    for i in range(8):  # distinct docs, never flagged
        rows.append({"repo": "r2", "path": f"b/{i}.py", "commit": f"d{i}",
                     "content": f"wholly different program number {i} " * 10
                     + str(i * 104729), "score": 0.01})
    ds = rd.from_items(rows).repartition(4)
    out = mark_near_duplicates(ds, jaccard_threshold=0.6,
                               keep="max_quality", quality_col="score")
    flags = {(r["repo"], r["path"]): r["near_dup_flag"]
             for r in out.take_all()}
    assert len(flags) == 14
    dropped = {k for k, v in flags.items() if v}
    assert len(dropped) == 5 and all(k[0] == "r1" for k in dropped)
    assert ("r1", "a/4.py") not in dropped    # max-quality member kept
    assert ("r1", "a/0.py") in dropped        # min-key member now drops
    assert ("r1", "a/3.py") in dropped        # NULL quality never wins

    # same clusters, min_key policy: identical flag count, different rep
    base = mark_near_duplicates(ds, jaccard_threshold=0.6)
    bflags = {(r["repo"], r["path"]): r["near_dup_flag"]
              for r in base.take_all()}
    assert sum(bflags.values()) == 5
    assert not bflags[("r1", "a/0.py")]


def test_ann_custom_key_col_threads_through_sampler(ray_session):
    """ivf_topk / pq_topk / build_ivf_index accept key_col; the
    hash-threshold fit sampler must receive it too (it ranks rows by a
    hash of the key column — a hard 'vec_id' would crash any dataset
    whose key is named differently)."""
    import ray.data as rd

    from engine.stages.pq import pq_topk
    from engine.stages.similarity import build_ivf_index, ivf_topk

    ds = (rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
          .map_batches(lambda b: b.rename_columns(
              ["id" if c == "vec_id" else c for c in b.column_names]),
              batch_format="pyarrow"))
    q = np.asarray(ds.take(1)[0]["embedding"]).reshape(1, -1)
    got = ivf_topk(ds, q, k=5, nprobe=4, key_col="id", n_lists=8,
                   sample_size=512)
    assert got.num_rows == 5
    got2 = pq_topk(ds, q, k=5, key_col="id", m=8, ks=16, sample_size=512)
    assert got2.num_rows == 5
    idx = build_ivf_index(ds, key_col="id", n_lists=8, sample_size=512)
    assert len(idx.query(q[0], k=5, nprobe=4)) == 5


# ---------------------------------------------------------------------------
# One-Permutation Hashing scheme (scheme="oph")
# ---------------------------------------------------------------------------

def test_oph_estimates_jaccard():
    from engine.stages.neardup import minhash_signatures_oph

    texts = pa.array([BASE, NEAR, FAR], pa.large_string())
    sigs = minhash_signatures_oph(texts, num_perm=256)
    est_near = signature_jaccard(sigs[0], sigs[1])
    est_far = signature_jaccard(sigs[0], sigs[2])
    assert abs(est_near - ngram_jaccard(BASE, NEAR)) < 0.12
    assert est_far < 0.1
    # identical docs -> identical signatures (est exactly 1.0)
    s2 = minhash_signatures_oph(pa.array([BASE, BASE]), num_perm=128)
    assert (s2[0] == s2[1]).all()


def test_oph_deterministic_and_batch_independent():
    from engine.stages.neardup import minhash_signatures_oph

    texts = [BASE, NEAR, FAR, BASE + "x", FAR + "y", "tiny", ""]
    full = minhash_signatures_oph(pa.array(texts, pa.large_string()))
    parts = np.vstack([
        minhash_signatures_oph(pa.array(texts[:3], pa.large_string())),
        minhash_signatures_oph(pa.array(texts[3:], pa.large_string())),
    ])
    assert (full == parts).all()
    again = minhash_signatures_oph(pa.array(texts, pa.large_string()))
    assert (full == again).all()


def test_oph_densification_and_empty_docs():
    from engine.stages.neardup import minhash_signatures_oph

    MAXV = np.iinfo(np.uint64).max
    # a doc with very few shingles (far fewer than num_perm bins) still
    # gets a fully-densified signature: no MAX slots survive
    few = "abcdefghij"  # 3 shingles at k=8
    sigs = minhash_signatures_oph(pa.array([few, "", "1234567"]), 128)
    assert not (sigs[0] == MAXV).any()
    # zero-shingle docs (empty / shorter than k) keep the all-MAX row,
    # the same convention as the k-permutation kernel
    assert (sigs[1] == MAXV).all() and (sigs[2] == MAXV).all()


def test_oph_rejects_non_power_of_two():
    import pytest as _pytest

    from engine.stages.neardup import minhash_signatures_oph

    with _pytest.raises(ValueError):
        minhash_signatures_oph(pa.array([BASE]), num_perm=96)


def test_oph_estimator_accuracy_on_corpus():
    """Mean |estimate - exact| over real doc pairs from the testdata
    corpus stays within MinHash sampling noise for the OPH scheme too
    (prototype measurement: kperm 0.015, oph 0.017 at num_perm=128)."""
    import pyarrow.parquet as pq

    from engine.stages.neardup import (minhash_signatures,
                                       minhash_signatures_oph)

    tx = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["text"])["text"].combine_chunks()
    s_k = minhash_signatures(tx, 128)
    s_o = minhash_signatures_oph(tx, 128)
    txl = tx.to_pylist()
    errs_k, errs_o = [], []
    for i in range(0, 200, 3):
        for j in range(i + 1, min(i + 12, len(txl)), 4):
            jx = ngram_jaccard(txl[i], txl[j])
            if jx < 0.05:
                continue
            errs_k.append(abs(signature_jaccard(s_k[i], s_k[j]) - jx))
            errs_o.append(abs(signature_jaccard(s_o[i], s_o[j]) - jx))
    assert len(errs_o) >= 20
    assert np.mean(errs_o) < 0.05 and np.max(errs_o) < 0.15
    # not materially worse than the k-permutation kernel
    assert np.mean(errs_o) < np.mean(errs_k) + 0.02


def test_lsh_edges_scheme_oph_end_to_end(ray_session):
    """scheme='oph' finds the same planted near-dup structure as the
    default kernel, on BOTH the broadcast and distributed verify paths
    (which must also agree with each other exactly)."""
    import ray.data as rd

    from engine.stages.neardup import minhash_lsh_edges

    rows = []
    for i in range(80):
        rows.append({"doc_id": i,
                     "text": f"totally distinct document body {i} " * 6
                     + str(i * 104729)})
    base = "the quick brown fox jumps over the lazy dog again and again "
    for j in range(6):
        rows.append({"doc_id": 1000 + j, "text": base * 8 + f"tail{j}"})
    for j in range(10):
        rows.append({"doc_id": 2000 + j, "text": "identical payload " * 20})
    ds = rd.from_items(rows).repartition(5)
    e_bc = {(r["key_a"], r["key_b"]) for r in minhash_lsh_edges(
        ds, jaccard_threshold=0.8, scheme="oph").take_all()}
    e_dist = {(r["key_a"], r["key_b"]) for r in minhash_lsh_edges(
        ds, jaccard_threshold=0.8, scheme="oph",
        max_broadcast_docs=0).take_all()}
    assert e_bc == e_dist
    keys_linked = {k for e in e_bc for k in e}
    assert {1000 + j for j in range(6)} <= keys_linked
    assert {2000 + j for j in range(10)} <= keys_linked
    assert not any(k < 1000 for k in keys_linked)
