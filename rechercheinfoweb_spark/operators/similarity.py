"""Similarity search over embedding columns (array<float>).

Three paths, one contract:

* ``cosine_topk`` — brute-force exact scan: the correctness baseline
  and still the right plan when the query set is small (broadcast
  query vector, one pass over the table, local top-k per partition
  → global TakeOrderedAndProject).  Dot products run JVM-side via
  higher-order functions (zip_with + aggregate) — no Python.
* ``lsh_ann_topk`` — random-hyperplane LSH bucketing computed on the
  fly: candidates share at least one of ``n_tables`` signature
  buckets; exact cosine re-rank on candidates only.  Signatures come
  from ONE Arrow-batched numpy matmul per partition
  (``_signature_kernel``) — the earlier design evaluated
  n_tables × n_planes literal-array dot products per row as nested
  Catalyst expressions and was slower than the exact scan it was
  meant to beat.
* ``build_ann_index`` / ``ann_index_topk`` — the 100-TB path: the
  signature pass runs ONCE at build time and lands as a parquet
  table partitioned by (table_id, bucket) with the vectors stored
  in-bucket (IVF-style).  A query probes exactly ``n_tables``
  partitions via partition-pruned filters and re-ranks only those
  candidates — per-query cost is proportional to bucket size, never
  to corpus size.  Plane geometry is regenerated from the recorded
  (dim, n_planes, n_tables, seed), so the index is self-describing.

Recall is tunable via (n_planes, n_tables); tests pin recall ≥ 0.8
@ k=10 on the synthetic table and exact agreement of re-ranked
scores with the brute-force path.  Hyperplanes are seeded numpy
normals — deterministic, no external state; both the row side and
the query side compute signs with the same numpy float64 matmul, so
bucket assignment is self-consistent.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


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


def _query_buckets(planes: np.ndarray, qv: np.ndarray
                   ) -> list[tuple[int, int]]:
    n_tables, n_planes, _ = planes.shape
    pow2 = 1 << np.arange(n_planes)
    signs = (planes @ qv) >= 0  # (tables, planes)
    return [(t, int((signs[t] * pow2).sum())) for t in range(n_tables)]


def _signature_kernel(planes: np.ndarray, id_col: str, vec_col: str,
                      keep_vec: bool):
    """mapInPandas: (id, vec) → (id[, vec], table_id, bucket) —
    one float64 matmul per Arrow batch, no per-row Python."""
    n_tables, n_planes, dim = planes.shape
    proj = planes.reshape(n_tables * n_planes, dim).T  # (dim, T·P)
    pow2 = 1 << np.arange(n_planes)

    def fn(batches):
        import pandas as pd
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            vecs = pdf[vec_col].to_numpy()
            V = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vecs])
            signs = (V @ proj) >= 0
            buckets = (signs.reshape(n, n_tables, n_planes)
                       * pow2).sum(axis=2)
            out = {
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table_id": np.tile(
                    np.arange(n_tables, dtype=np.int32), n),
                "bucket": buckets.reshape(-1).astype(np.int32),
            }
            if keep_vec:
                out[vec_col] = np.repeat(vecs, n_tables)
            yield pd.DataFrame(out)

    return fn


def lsh_bucket_ids(emb: DataFrame, dim: int, n_planes: int = 8,
                   n_tables: int = 4, seed: int = 7,
                   id_col: str = "vec_id", vec_col: str = "embedding"
                   ) -> DataFrame:
    """(id, vec, table_id, bucket) rows: bucket = sign-bit signature
    of the vector against each table's hyperplanes."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    schema = (f"{id_col} long, table_id int, bucket int, "
              f"{vec_col} array<double>")
    return (emb.select(F.col(id_col),
                       F.col(vec_col).cast("array<double>")
                       .alias(vec_col))
            .mapInPandas(_signature_kernel(planes, id_col, vec_col,
                                           keep_vec=True),
                         schema=schema)
            .select(id_col, vec_col, "table_id", "bucket"))


def lsh_ann_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 dim: int | None = None, n_planes: int = 8,
                 n_tables: int = 4, seed: int = 7,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_to: int = 6) -> DataFrame:
    """Approximate top-k: probe the query's buckets, exact re-rank.
    One-shot variant (signatures computed in the same job); for
    repeated queries build the materialized index instead
    (:func:`build_ann_index`)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    dim = dim or qv.size
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    buckets = lsh_bucket_ids(emb, dim, n_planes, n_tables, seed,
                             id_col, vec_col)
    cond = None
    for t, bkt in _query_buckets(planes, qv):
        c = (F.col("table_id") == t) & (F.col("bucket") == bkt)
        cond = c if cond is None else (cond | c)
    cands = (buckets.where(cond)
             .select(id_col, vec_col).dropDuplicates([id_col]))
    return cosine_topk(cands, query_vec, k, id_col, vec_col, round_to)


# ---- materialized ANN index (the repeated-query / 100-TB path) ------

def build_ann_index(spark: SparkSession, emb: DataFrame, out_dir: str,
                    *, dim: int | None = None, n_planes: int = 8,
                    n_tables: int = 4, seed: int = 7,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> dict:
    """One signature pass → parquet partitioned by (table_id,
    bucket), vectors stored in-bucket.  2^n_planes × n_tables
    partitions; each query later reads exactly n_tables of them."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    buckets = lsh_bucket_ids(emb, dim, n_planes, n_tables, seed,
                             id_col, vec_col)
    n_parts = min(64, (1 << n_planes) * n_tables)
    (buckets.repartition(n_parts, "table_id", "bucket")
     .write.partitionBy("table_id", "bucket")
     .mode("overwrite").parquet(os.path.join(out_dir, "buckets")))
    meta = {"dim": dim, "n_planes": n_planes, "n_tables": n_tables,
            "seed": seed, "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(out_dir, "ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ann_index_topk(spark: SparkSession, index_dir: str,
                   query_vec: list[float], k: int = 10,
                   round_to: int = 6) -> DataFrame:
    """Probe the materialized index: read EXACTLY the query's
    n_tables bucket directories by explicit path (no partition
    discovery over the 2^n_planes × n_tables dirs — the listing job
    would dwarf the probe), exact cosine re-rank of candidates."""
    with open(os.path.join(index_dir, "ann_meta.json")) as f:
        meta = json.load(f)
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(meta["dim"], meta["n_planes"],
                          meta["n_tables"], meta["seed"])
    base = os.path.join(index_dir, "buckets")
    paths = [os.path.join(base, f"table_id={t}", f"bucket={b}")
             for t, b in _query_buckets(planes, qv)]
    paths = [p for p in paths if os.path.isdir(p)]  # empty buckets
    if not paths:
        return spark.createDataFrame(
            [], f"{meta['id_col']} long, cosine double")
    rows = (spark.read.parquet(*paths)
            .select(meta["id_col"], meta["vec_col"])
            .dropDuplicates([meta["id_col"]]))
    return cosine_topk(rows, query_vec, k, meta["id_col"],
                       meta["vec_col"], round_to)


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
