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
