"""Evaluation harness — SURVEY.md §2.6 (V1-V3) as DataFrame ops.

Reference semantics (cited into /root/reference):
  * V1 per-query P/R walk (precision_recall.go:129-178): for each
    ranked result list, at every relevant hit emit
    (recall = hits/valid, precision = hits/rank).
  * V2 interpolated precision (precision_recall.go:271-284):
    P_interp(r) = max{ P(r') : r' >= r }.
  * V3 average curve + MAP (precision_recall.go:288-316): mean of
    per-query interpolated curves, MAP = mean of 256 uniform
    samples of the averaged curve.

Plus the north-rule metric the reference never computes explicitly:
**rank-identical top-k match rate** between the Spark engine and the
reference-faithful oracle, per weighting scheme.

All heavy steps are joins/windows over the batch-query results
(query_vector.vector_topk_batch — one distributed pass for the whole
query set); only the 256-point curve sampling materializes a
(n_queries x 256)-row grid, which is negligible at any corpus scale
because it never touches the postings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

N_SAMPLES = 256  # precision_recall.go:309-316


def synthetic_eval_set(oracle_index, n_queries: int = 32, seed: int = 7,
                       rel_k: int = 10) -> tuple[dict[int, str], dict]:
    """Deterministic CACM-shaped eval set over a built oracle index
    (FIXTURES.md §2): queries mix 1-3 vocabulary terms; qrels for a
    judged subset are the oracle's BM25 top-``rel_k`` docs (seeded).
    Returns (queries {qid: text}, qrels {qid: set(doc_id)});
    one-third of queries are unjudged, as in CACM (52 of 64)."""
    rng = np.random.default_rng(seed)
    vocab = sorted(t for t in oracle_index.postings
                   if len(oracle_index.postings[t]) >= 2)
    queries: dict[int, str] = {}
    qrels: dict[int, set[int]] = {}
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 4))
        words = [vocab[int(i)] for i in
                 rng.integers(0, len(vocab), size=n_terms)]
        queries[qid] = " ".join(words)
        if qid % 3 != 0:  # judged subset
            top = oracle_index.vector_query(queries[qid], "bm25",
                                            k=rel_k)
            rels = {d for d, _ in top}
            if rels:
                qrels[qid] = rels
    return queries, qrels


def qrels_df(spark: SparkSession, qrels: dict[int, set[int]]) -> DataFrame:
    rows = [(qid, int(d)) for qid, ds in qrels.items() for d in ds]
    return spark.createDataFrame(rows, "qid int, doc_id long")


def pr_points(results: DataFrame, qrels: DataFrame) -> DataFrame:
    """V1: P/R point per relevant hit.

    ``results``: (qid, rank, doc_id, score); ``qrels``: (qid, doc_id).
    Returns (qid, rank, recall, precision) for judged queries only.
    qrels is tiny (hundreds of rows) → broadcast join against the
    ranked lists; the running relevant-hit count is a rank window."""
    valid = qrels.groupBy("qid").agg(F.count("*").alias("n_valid"))
    rel = results.join(F.broadcast(qrels.withColumn("rel", F.lit(1))),
                       ["qid", "doc_id"], "left")
    w = Window.partitionBy("qid").orderBy("rank")
    hits = rel.withColumn(
        "cum_rel", F.sum(F.coalesce("rel", F.lit(0))).over(w))
    return (hits.where(F.col("rel") == 1)
            .join(F.broadcast(valid), "qid")
            .select("qid", "rank",
                    (F.col("cum_rel") / F.col("n_valid")).alias("recall"),
                    (F.col("cum_rel") / F.col("rank")).alias("precision")))


def interpolate(points: DataFrame) -> DataFrame:
    """V2 (textbook variant, used for plots/inspection): add
    ``p_interp`` = running max of precision from the high-recall end.
    NOTE: the reference's own curve function uses a STRICT
    ``recall > r`` comparison (funcFromPoints,
    precision_recall.go:271-284); the reference-parity path below
    (:func:`average_curve`) implements that directly and does not go
    through this column."""
    w = (Window.partitionBy("qid").orderBy(F.desc("recall"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return points.withColumn("p_interp", F.max("precision").over(w))


def valid_qids(points: DataFrame) -> DataFrame:
    """Queries that survive the reference's skip rule: a query needs
    >= 2 P/R points to produce a curve (precision_recall.go:154-157
    ``len(pts) < 2 → continue``); 0- and 1-point queries are dropped
    from the average, exactly as the reference drops them."""
    return (points.groupBy("qid").agg(F.count("*").alias("np"))
            .where(F.col("np") >= 2).select("qid"))


def average_curve(points: DataFrame, n_samples: int = N_SAMPLES
                  ) -> DataFrame:
    """V3 curve, reference-parity semantics (precision_recall.go):

      * sample grid r = i/n_samples for i in 0..n_samples-1 — the
        reference's getMAP samples ``i/256`` and never reaches 1.0;
      * P_interp(r) = max{ precision(pt) : recall(pt) > r } with a
        STRICT comparison (funcFromPoints), 0 when no point remains;
      * averaged over the queries that pass the >=2-point skip rule
        (:func:`valid_qids`) — NOT over all judged queries.

    Returns (r, avg_p_interp) with n_samples rows."""
    spark = points.sparkSession
    grid = spark.range(n_samples).select(
        (F.col("id") / F.lit(float(n_samples))).alias("r"))
    per_q = (valid_qids(points).crossJoin(grid)
             .join(points.select(F.col("qid").alias("pqid"),
                                 "recall", "precision"),
                   on=[F.col("qid") == F.col("pqid"),
                       F.col("recall") > F.col("r")], how="left")
             .groupBy("qid", "r")
             .agg(F.coalesce(F.max("precision"), F.lit(0.0))
                  .alias("p_at_r")))
    return (per_q.groupBy("r")
            .agg(F.avg("p_at_r").alias("avg_p_interp"))
            .orderBy("r"))


def mean_average_precision(points: DataFrame,
                           n_samples: int = N_SAMPLES) -> float:
    """V3 MAP: mean of the averaged interpolated curve's samples
    (precision_recall.go:309-316), reference-parity semantics per
    :func:`average_curve`."""
    curve = average_curve(points, n_samples)
    row = curve.agg(F.avg("avg_p_interp").alias("m")).collect()[0]
    return float(row["m"] or 0.0)


def average_precision_df(results: DataFrame, qrels: DataFrame
                         ) -> DataFrame:
    """Standard AP per query (textbook MAP variant): mean over
    relevant hits of precision@rank, divided by |qrels(q)|.
    Kept alongside the reference-shaped V3 because it is
    SQL-expressible for the DuckDB oracle contract."""
    pts = pr_points(results, qrels)
    valid = qrels.groupBy("qid").agg(F.count("*").alias("n_valid"))
    return (pts.groupBy("qid").agg(F.sum("precision").alias("sum_p"))
            .join(F.broadcast(valid), "qid")
            .select("qid",
                    F.round(F.col("sum_p") / F.col("n_valid"), 6)
                    .alias("ap"))
            .orderBy("qid"))


def rank_match_rate(engine: DataFrame,
                    oracle_lists: dict[int, list[tuple[int, float]]],
                    tol: float = 1e-9) -> dict:
    """North-rule metric: fraction of queries whose engine top-k is
    rank-identical to the oracle's (same doc_ids in the same order)
    with scores equal within ``tol``."""
    got: dict[int, list[tuple[int, float]]] = {}
    for r in engine.orderBy("qid", "rank").collect():
        got.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    n = match = 0
    mismatches = []
    for qid, want in oracle_lists.items():
        n += 1
        have = got.get(qid, [])
        ok = (len(have) == len(want)
              and all(h[0] == w[0] and abs(h[1] - w[1]) <= tol
                      for h, w in zip(have, want)))
        if ok:
            match += 1
        else:
            mismatches.append(qid)
    return {"n_queries": n, "n_match": match,
            "match_rate": match / n if n else 1.0,
            "mismatched_qids": mismatches}


def evaluate_engine(spark: SparkSession, index_dir,
                    queries: dict[int, str],
                    qrels: dict[int, set[int]],
                    oracle_index=None,
                    schemes: tuple[str, ...] = ("raw", "norm", "half",
                                                "bm25"),
                    k: int = 20, stopwords=None) -> dict:
    """Full eval run: per scheme, batch top-k → MAP (+ optional
    rank-identical match rate vs the oracle).  ``stopwords`` must be
    the set the index was built with (e.g. the real CACM
    common-words list for the reference eval set)."""
    from ..functions.tokenizer import STOPWORDS
    from .query_vector import vector_topk_batch

    sw = STOPWORDS if stopwords is None else stopwords
    qdf = qrels_df(spark, qrels)
    out: dict[str, dict] = {}
    for scheme in schemes:
        results = vector_topk_batch(spark, index_dir, queries,
                                    scheme=scheme, k=k, stopwords=sw)
        results = results.persist()
        pts = pr_points(results, qdf)
        entry: dict = {"map": mean_average_precision(pts)}
        if oracle_index is not None:
            oracle_lists = {qid: oracle_index.vector_query(q, scheme, k)
                            for qid, q in queries.items()}
            entry["match"] = rank_match_rate(results, oracle_lists)
        results.unpersist()
        out[scheme] = entry
    return out
