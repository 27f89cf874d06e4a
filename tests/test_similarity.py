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
