"""Similarity search over embedding columns (array<float>).

Two paths, same contract:

* ``cosine_topk`` — brute-force exact scan: the correctness baseline
  and still the right plan when the query set is small (broadcast
  query vectors, one pass over the table, local top-k per partition
  → global TakeOrderedAndProject).  Dot products run JVM-side via
  higher-order functions (zip_with + aggregate) — no Python.
* ``lsh_ann_topk`` — random-hyperplane LSH bucketing: candidates
  share at least one of ``n_tables`` signature buckets; exact cosine
  re-rank on candidates only.  At 10^12 rows this is the scale path:
  bucket assignment is a map-only pass, probing touches only
  matching buckets.  Recall is tunable via (n_planes, n_tables);
  tests pin recall ≥ 0.8 @ k=10 on the synthetic table and exact
  agreement of re-ranked scores with the brute-force path.

Hyperplanes are seeded numpy normals materialized as literal arrays
in the plan (deterministic, no external state).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6) -> DataFrame:
    """Exact top-k by cosine to *query_vec* (score desc, id asc)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64)
                              ** 2)))
    cos = F.round(
        _dot(F.col(vec_col), q)
        / (F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)) * F.lit(qn)),
        round_to)
    return (emb.select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def _hyperplanes(dim: int, n_planes: int, n_tables: int,
                 seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_bucket_ids(emb: DataFrame, dim: int, n_planes: int = 8,
                   n_tables: int = 4, seed: int = 7,
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """(id, table_id, bucket) rows: bucket = sign-bit signature of
    the vector against each table's hyperplanes."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    tables = []
    for t in range(n_tables):
        bits = [
            F.when(_dot(F.col(vec_col),
                        F.array(*[F.lit(float(v))
                                  for v in planes[t, p]])) >= 0, 1)
             .otherwise(0) * F.lit(1 << p)
            for p in range(n_planes)
        ]
        bucket = bits[0]
        for extra in bits[1:]:
            bucket = bucket + extra
        tables.append(F.struct(F.lit(t).alias("table_id"),
                               bucket.alias("bucket")))
    return (emb.select(F.col(id_col), F.col(vec_col),
                       F.explode(F.array(*tables)).alias("tb"))
            .select(id_col, vec_col, "tb.table_id", "tb.bucket"))


def lsh_ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 dim: int | None = None, n_planes: int = 8,
                 n_tables: int = 4, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 6) -> DataFrame:
    """Approximate top-k: probe the query's buckets, exact re-rank."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = dim or qv.size
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    q_buckets = [
        (t, int(sum((1 << p) for p in range(n_planes)
                    if float(planes[t, p] @ qv) >= 0)))
        for t in range(n_tables)
    ]
    buckets = lsh_bucket_ids(emb, dim, n_planes, n_tables, seed,
                             id_col, vec_col)
    cond = None
    for t, bkt in q_buckets:
        c = (F.col("table_id") == t) & (F.col("bucket") == bkt)
        cond = c if cond is None else (cond | c)
    cands = (buckets.where(cond)
             .select(id_col, vec_col).dropDuplicates([id_col]))
    return cosine_topk(cands, query_vec, k, id_col, vec_col, round_to)


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.15,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             round_to: int = 6) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine >= threshold).  O(n²) dot products — the correctness
    baseline for bounded sets; use the LSH variant at scale."""
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vb"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.greatest(_norm(F.col("va")), F.lit(1e-12))
           * F.greatest(_norm(F.col("vb")), F.lit(1e-12))), round_to)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold))


def embedding_near_dup_pairs_lsh(emb: DataFrame,
                                 threshold: float = 0.15,
                                 dim: int | None = None,
                                 n_planes: int = 6, n_tables: int = 8,
                                 seed: int = 7,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 round_to: int = 6) -> DataFrame:
    """Scale path: candidates must share an LSH bucket in some table
    (bucket-join — each bucket's pair work is local), then exact
    cosine filter.  Misses pairs whose signatures differ in every
    table; recall rises with n_tables / falls with n_planes."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    buckets = lsh_bucket_ids(emb, dim, n_planes, n_tables, seed,
                             id_col, vec_col)
    a = buckets.select(F.col(id_col).alias("id_a"),
                       F.col(vec_col).alias("va"),
                       "table_id", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"),
                       F.col(vec_col).alias("vb"),
                       "table_id", "bucket")
    cand = (a.join(b, ["table_id", "bucket"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (F.greatest(_norm(F.col("va")), F.lit(1e-12))
           * F.greatest(_norm(F.col("vb")), F.lit(1e-12))), round_to)
    return (cand.select("id_a", "id_b", cos.alias("cosine"))
            .where(F.col("cosine") >= threshold))
