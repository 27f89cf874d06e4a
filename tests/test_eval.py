"""Eval harness tests (SURVEY.md §5.5): the Spark V1-V3 pipeline must
reproduce a pure-Python reimplementation of the reference's
precision_recall.go math to 1e-9, and the engine's batch top-k must be
rank-identical to the oracle on the synthetic query set (the
north-rule match-rate metric at 100%)."""

from __future__ import annotations

import numpy as np
import pytest

from rechercheinfoweb_spark.operators import evaluate
from rechercheinfoweb_spark.operators.query_vector import (
    vector_topk, vector_topk_batch,
)


@pytest.fixture(scope="module")
def eval_set(oracle_index):
    return evaluate.synthetic_eval_set(oracle_index, n_queries=18)


def _py_map(ranked: dict[int, list[int]], qrels: dict[int, set[int]],
            n_samples: int = evaluate.N_SAMPLES) -> float:
    """Reference math (precision_recall.go:129-178,271-316), no
    Spark: strict ``recall > r`` interpolation (funcFromPoints), the
    ``i/256`` sample grid (getMAP, never reaching 1.0), and the
    <2-point query skip rule (Draw)."""
    curves = []
    for qid, rels in qrels.items():
        pts = []  # (recall, precision)
        hits = 0
        for i, d in enumerate(ranked.get(qid, [])):
            if d in rels:
                hits += 1
                pts.append((hits / len(rels), hits / (i + 1)))
        if len(pts) >= 2:  # reference skip rule
            curves.append(pts)
    samples = [i / n_samples for i in range(n_samples)]
    per_q = []
    for pts in curves:
        p_at = [max((p for r, p in pts if r > s), default=0.0)
                for s in samples]
        per_q.append(p_at)
    return float(np.mean(np.mean(np.array(per_q), axis=0)))


def test_batch_matches_single(spark, reader, eval_set):
    queries, _ = eval_set
    batch = vector_topk_batch(spark, reader, queries, "bm25", k=10)
    rows = {}
    for r in batch.orderBy("qid", "rank").collect():
        rows.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, q in queries.items():
        single = [(r["doc_id"], r["score"]) for r in
                  vector_topk(spark, reader, q, "bm25", k=10).collect()]
        assert rows.get(qid, []) == single, f"qid={qid}"


def test_match_rate_100(spark, reader, oracle_index, eval_set):
    queries, qrels = eval_set
    res = evaluate.evaluate_engine(
        spark, reader, queries, qrels, oracle_index=oracle_index, k=10)
    for scheme, entry in res.items():
        assert entry["match"]["match_rate"] == 1.0, (scheme, entry)


def test_map_matches_python_reference(spark, reader, oracle_index,
                                      eval_set):
    queries, qrels = eval_set
    results = vector_topk_batch(spark, reader, queries, "bm25", k=10)
    pts = evaluate.pr_points(results, evaluate.qrels_df(spark, qrels))
    got = evaluate.mean_average_precision(pts)
    ranked = {qid: [d for d, _ in oracle_index.vector_query(q, "bm25", 10)]
              for qid, q in queries.items()}
    want = _py_map(ranked, qrels)
    assert abs(got - want) < 1e-9, (got, want)


def test_average_precision_df(spark, reader, eval_set):
    queries, qrels = eval_set
    results = vector_topk_batch(spark, reader, queries, "bm25", k=10)
    ap = evaluate.average_precision_df(
        results, evaluate.qrels_df(spark, qrels)).collect()
    assert len(ap) == len(qrels)
    assert all(0.0 <= r["ap"] <= 1.0 for r in ap)
    # qrels are the oracle top-10 and the engine is rank-identical,
    # so every judged query must score a perfect AP of 1
    assert all(r["ap"] == 1.0 for r in ap)
