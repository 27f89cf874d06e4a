"""Embedding near-dup tests: exact pairwise as ground truth, LSH
variant must reach high recall for genuinely-near pairs (cosine >=
0.9) while touching only bucket-local candidates."""

from __future__ import annotations

import numpy as np
import pytest

from rechercheinfoweb_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """20 cluster centers x 5 jittered members: members of a cluster
    are near-dups (cosine ~0.99), cross-cluster pairs are not."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for _ in range(20):
        center = rng.standard_normal(32)
        center /= np.linalg.norm(center)
        for _ in range(5):
            v = center + 0.02 * rng.standard_normal(32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_exact_near_dup_pairs(clustered_emb):
    pairs = similarity.embedding_near_dup_pairs(
        clustered_emb, threshold=0.9).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every within-cluster pair must be found, no cross-cluster pair
    want = {(a, b) for c in range(20)
            for a in range(c * 5, c * 5 + 5)
            for b in range(a + 1, c * 5 + 5)}
    assert want <= got
    cross = {(a, b) for a, b in got if a // 5 != b // 5}
    assert not cross


def test_ann_index_matches_oneshot(spark, clustered_emb,
                                   tmp_path_factory):
    """The materialized index probe returns exactly what the
    one-shot LSH path returns (same planes → same buckets → same
    candidates → same exact re-rank)."""
    out = str(tmp_path_factory.mktemp("ann_idx"))
    similarity.build_ann_index(spark, clustered_emb, out,
                               n_planes=6, n_tables=8)
    qv = clustered_emb.where("vec_id = 0").collect()[0]["embedding"]
    a = [(r["vec_id"], r["cosine"]) for r in
         similarity.lsh_ann_topk(clustered_emb, qv, k=10,
                                 n_planes=6, n_tables=8).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in
         similarity.ann_index_topk(spark, out, qv, k=10).collect()]
    assert a == b and len(a) > 0
    assert a[0][0] == 0  # the query vector itself is its own top-1


def test_lsh_near_dup_recall(clustered_emb):
    truth = {(r["id_a"], r["id_b"]) for r in
             similarity.embedding_near_dup_pairs(
                 clustered_emb, threshold=0.9).collect()}
    approx = {(r["id_a"], r["id_b"]) for r in
              similarity.embedding_near_dup_pairs_lsh(
                  clustered_emb, threshold=0.9).collect()}
    assert approx <= truth  # exact-cosine filter: no false positives
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.9, recall


def test_ivf_all_probe_equals_exact(spark, clustered_emb,
                                    tmp_path_factory):
    """Probing every IVF list is an exact scan: must equal
    brute-force cosine_topk bit-for-bit (k-means-trained
    centroids, the production default)."""
    out = str(tmp_path_factory.mktemp("ivf_idx"))
    meta = similarity.build_ivf_index(spark, clustered_emb, out,
                                      n_lists=16, sample_size=100)
    assert meta["n_lists"] == 16
    qv = clustered_emb.where("vec_id = 7").collect()[0]["embedding"]
    exact = [(r["vec_id"], r["cosine"]) for r in
             similarity.cosine_topk(clustered_emb, qv, k=10).collect()]
    allp = [(r["vec_id"], r["cosine"]) for r in
            similarity.ivf_topk(spark, out, qv, k=10,
                                n_probe=16).collect()]
    assert allp == exact


def test_ivf_recall_and_probe_bound(spark, clustered_emb,
                                    tmp_path_factory):
    """With trained centroids on clustered data, a 4/16-list probe
    keeps high recall@10 — and the probe only reads n_probe list
    dirs (candidate count strictly below the corpus)."""
    out = str(tmp_path_factory.mktemp("ivf_idx2"))
    similarity.build_ivf_index(spark, clustered_emb, out,
                               n_lists=16, sample_size=100)
    qv = clustered_emb.where("vec_id = 0").collect()[0]["embedding"]
    exact = [r["vec_id"] for r in
             similarity.cosine_topk(clustered_emb, qv, k=10).collect()]
    approx = [r["vec_id"] for r in
              similarity.ivf_topk(spark, out, qv, k=10,
                                  n_probe=4).collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.8
    assert approx[0] == 0  # query vector is its own nearest


def test_ivf_anchor_quantizer_deterministic(spark, clustered_emb,
                                            tmp_path_factory):
    """Anchor-quantizer build (the oracle-pinned variant): same
    seed → identical assignments across two builds, and
    ivf_probe_lists is stable under its rounding/tie rule."""
    a1 = similarity.build_ivf_index(
        spark, clustered_emb, str(tmp_path_factory.mktemp("iva")),
        centroids=similarity.seeded_anchors(32, 8, seed=3))
    a2 = similarity.build_ivf_index(
        spark, clustered_emb, str(tmp_path_factory.mktemp("ivb")),
        centroids=similarity.seeded_anchors(32, 8, seed=3))
    assert a1["centroids"] == a2["centroids"]
    qv = np.asarray(
        clustered_emb.where("vec_id = 3").collect()[0]["embedding"])
    cents = np.asarray(a1["centroids"])
    assert (similarity.ivf_probe_lists(cents, qv, 3)
            == similarity.ivf_probe_lists(cents, qv, 3))
    assert len(similarity.ivf_probe_lists(cents, qv, 99)) == 8


def test_semantic_dedup_pairs_bruteforce(spark, clustered_emb):
    """SemDedup pairs == exact pairwise pairs restricted to
    same-assigned-cluster membership (numpy ground truth), at any
    matmul block size and input partitioning."""
    rows = sorted((r["vec_id"], np.asarray(r["embedding"]))
                  for r in clustered_emb.collect())
    ids = np.array([i for i, _ in rows])
    v = np.stack([x for _, x in rows])
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    anchors = similarity.seeded_anchors(32, 16, seed=11)
    assign = np.argmax(np.round(vn @ anchors.T, 6), axis=1)
    g = np.round(vn @ vn.T, 6)
    want = {(int(ids[i]), int(ids[j]), float(g[i, j]))
            for i in range(len(ids)) for j in range(i + 1, len(ids))
            if assign[i] == assign[j] and g[i, j] >= 0.9}

    def run(df, block):
        return {(r["id_a"], r["id_b"], r["cosine"]) for r in
                similarity.semantic_dedup_pairs(
                    df, threshold=0.9, n_lists=16, seed=11,
                    block=block).collect()}

    got = run(clustered_emb, 2048)
    assert got == want and len(want) > 10
    assert run(clustered_emb.repartition(7), 3) == want  # block path


def test_semantic_dedup_keep_min_id_survives(spark, clustered_emb):
    pairs = similarity.semantic_dedup_pairs(
        clustered_emb, threshold=0.9, n_lists=16, seed=11).collect()
    dropped = {r["id_b"] for r in pairs}
    kept = {r["vec_id"] for r in similarity.semantic_dedup_keep(
        clustered_emb, threshold=0.9, n_lists=16, seed=11).collect()}
    assert kept == {r["vec_id"] for r in clustered_emb.collect()} \
        - dropped
    # each cluster's minimum id always survives
    for r in pairs:
        assert r["id_a"] < r["id_b"]
    assert kept  # non-degenerate


def test_semantic_dedup_trained_centroids(spark, clustered_emb):
    """Production path: k-means-trained quantizer concentrates true
    clusters, so every within-cluster near-dup pair is found."""
    sample = np.stack([np.asarray(r["embedding"]) for r in
                       clustered_emb.orderBy("vec_id").collect()])
    cents = similarity.train_ivf_centroids(sample, 10, seed=3)
    got = {(r["id_a"], r["id_b"]) for r in
           similarity.semantic_dedup_pairs(
               clustered_emb, threshold=0.9,
               centroids=cents).collect()}
    want = {(a, b) for c in range(20)
            for a in range(c * 5, c * 5 + 5)
            for b in range(a + 1, c * 5 + 5)}
    # a tight true cluster can straddle a Voronoi boundary (the
    # paper's recall trade) — require near-total recall, not 100%
    assert len(want & got) / len(want) >= 0.95
    # and no false positives: every found pair is a true near-dup
    assert all(a // 5 == b // 5 for a, b in got)


# ---- product quantization ------------------------------------------


def test_pq_encode_matches_numpy(spark, clustered_emb):
    """pq_encode == a direct numpy reimplementation (normalize,
    per-subspace rounded-L2 argmin, first-min ties)."""
    books = similarity.pq_codebooks(32, m=4, n_codes=8, seed=13)
    got = {r["vec_id"]: list(r["codes"])
           for r in similarity.pq_encode(
               clustered_emb, books).collect()}
    rows = clustered_emb.collect()
    m, _, dsub = books.shape
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        want = []
        for s in range(m):
            vs = v[s * dsub:(s + 1) * dsub]
            d = np.square(vs - books[s]).sum(axis=1)
            want.append(int(np.argmin(np.round(d, 6))))
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_pq_adc_recall_vs_exact(spark, clustered_emb, tmp_path):
    """ADC over the persisted PQ index must put most of the true
    top-k (the query's own jittered cluster) in its top-k — the
    quantizer loses precision, not the neighborhood structure — and
    trained codebooks must not be worse than seeded ones."""
    out = str(tmp_path / "pq")
    qv = clustered_emb.where("vec_id = 0").collect()[0]["embedding"]
    exact = [r["vec_id"] for r in similarity.cosine_topk(
        clustered_emb, qv, k=5).collect()]

    books = similarity.pq_codebooks(32, m=8, n_codes=16, seed=13)
    similarity.build_pq_index(spark, clustered_emb, out, books=books)
    got = [r["vec_id"] for r in similarity.pq_index_topk(
        spark, out, qv, k=5).collect()]
    seeded_recall = len(set(got) & set(exact)) / len(exact)
    assert seeded_recall >= 0.6

    sample = np.array([r["embedding"] for r in
                       clustered_emb.orderBy("vec_id").collect()])
    trained = similarity.train_pq_codebooks(sample, m=8, n_codes=16)
    similarity.build_pq_index(spark, clustered_emb, out,
                              books=trained)
    got_t = [r["vec_id"] for r in similarity.pq_index_topk(
        spark, out, qv, k=5).collect()]
    trained_recall = len(set(got_t) & set(exact)) / len(exact)
    assert trained_recall >= seeded_recall


def test_pq_codes_are_m_small_ints(spark, clustered_emb, tmp_path):
    """The storage contract: every vector becomes exactly m codes in
    [0, n_codes) — the 32x-at-scale compression surface."""
    books = similarity.pq_codebooks(32, m=4, n_codes=8, seed=13)
    rows = similarity.pq_encode(clustered_emb, books).collect()
    assert len(rows) == clustered_emb.count()
    for r in rows:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 8 for c in r["codes"])


def test_ivfpq_full_probe_equals_flat_pq(spark, clustered_emb,
                                         tmp_path):
    """Probing EVERY list must reproduce the flat PQ scan exactly —
    list partitioning changes where codes live, never their ADC
    scores (the IVF/PQ composition contract)."""
    cents = similarity.seeded_anchors(32, 8, seed=11)
    books = similarity.pq_codebooks(32, m=8, n_codes=16, seed=13)
    out = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(spark, clustered_emb, out,
                                 centroids=cents, books=books)
    flat = str(tmp_path / "pq")
    similarity.build_pq_index(spark, clustered_emb, flat,
                              books=books)
    qv = clustered_emb.where("vec_id = 3").collect()[0]["embedding"]
    a = [(r["vec_id"], r["adc_score"]) for r in
         similarity.ivfpq_topk(spark, out, qv, k=10,
                               n_probe=8).collect()]
    b = [(r["vec_id"], r["adc_score"]) for r in
         similarity.pq_index_topk(spark, flat, qv, k=10).collect()]
    assert a == b


def test_ivfpq_probe_recall(spark, clustered_emb, tmp_path):
    """A bounded probe must still surface the query's own jittered
    cluster: recall@5 vs exact cosine ≥ 0.6 at n_probe=4 of 16."""
    out = str(tmp_path / "ivfpq")
    similarity.build_ivfpq_index(
        spark, clustered_emb, out,
        centroids=similarity.seeded_anchors(32, 16, seed=11),
        books=similarity.pq_codebooks(32, m=8, n_codes=16, seed=13))
    qv = clustered_emb.where("vec_id = 0").collect()[0]["embedding"]
    exact = {r["vec_id"] for r in similarity.cosine_topk(
        clustered_emb, qv, k=5).collect()}
    got = {r["vec_id"] for r in similarity.ivfpq_topk(
        spark, out, qv, k=5, n_probe=4).collect()}
    assert len(got & exact) / len(exact) >= 0.6
