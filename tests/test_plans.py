"""Physical-plan regression tests (SURVEY.md §4): the properties
that make the engine scale must be visible in the executed plan, not
assumed — partition pruning on bucket/chunk, term predicate pushdown
to the parquet scan, column-pruned ReadSchema, broadcast of the
k-row side of the result-projection join."""

from __future__ import annotations

from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators.query_vector import vector_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_and_pushes(reader):
    plan = _plan(reader.postings_for(["search", "engine"]))
    # partition pruning on BOTH physical partition keys: bucket
    # (term routing) and salt (snapshot pinning)
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "bucket" in pf and "salt" in pf, pf
    assert "PushedFilters: [In(term" in plan


def test_stage1_input_prunes_html_and_broadcasts_map(
        spark, pages_df, index_dir, tmp_path_factory):
    """The stage-1 shape: corpus ⋈ url_map must broadcast the small
    map and must never read the fat ``html`` column (parquet-backed
    corpus, like the real build input)."""
    src = str(tmp_path_factory.mktemp("plan_pages"))
    pages_df.write.mode("overwrite").parquet(src)
    ids_map = spark.read.parquet(f"{index_dir}/url_map")
    df = (spark.read.parquet(src).join(F.broadcast(ids_map), "url")
          .select("doc_id", "chunk", "text"))
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "html" not in plan


def test_boolean_urls_join_never_hints_result_broadcast(spark, reader):
    """A boolean result is unbounded (an OR over hot terms can match
    most of a web corpus), so the url join must NOT carry a broadcast
    hint on the result side — AQE may still broadcast at runtime off
    ACTUAL size stats, which is correct; an unconditional hint OOMs
    executors at scale.  The ranked path may hint (k-row result)."""
    from rechercheinfoweb_spark.operators.query_bool import (
        boolean_search,
    )
    df = boolean_search(spark, reader, "search OR engine OR webpage",
                        with_urls=True)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical, logical
    # the ranked path's hint is intentional — keep it as contrast
    v = vector_topk(spark, reader, "search engine", "bm25", k=5,
                    with_urls=True)
    vlogical = v._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" in vlogical


def test_pipeline_scan_prunes_to_two_columns(spark, tmp_path_factory):
    """clean_corpus's fused stage-1/2 projection must column-prune
    the parquet scan to (doc_id, text) — a documents table at 100 TB
    carries many more columns (html, lang, warc_ts...) that the
    cleaning scan must never read."""
    from rechercheinfoweb_spark.operators import pipeline

    src = str(tmp_path_factory.mktemp("plan_docs"))
    (spark.range(50)
     .select(F.col("id").alias("doc_id"),
             F.concat(F.lit("the data of doc "),
                      F.col("id").cast("string")).alias("text"),
             F.lit("x" * 100).alias("html"),
             F.lit("extra").alias("meta"))
     .write.mode("overwrite").parquet(src))
    docs = spark.read.parquet(src)
    plan = _plan(pipeline.doc_stats(docs))
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan and "html" not in scan[0] and "meta" not in scan[0]
    # whole pipeline: still no fat columns anywhere in the plan
    full = _plan(pipeline.clean_corpus(docs, min_quality=0.0))
    assert "html" not in full and "meta" not in full


def test_lsh_verified_join_has_no_cartesian(spark, tmp_path_factory):
    """The verify step must stay an equi-join chain (candidates ⋈
    shingle-arrays) — no NestedLoop/Cartesian anywhere, or the
    composition quietly degenerates to all-pairs at scale."""
    from rechercheinfoweb_spark.operators import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text").limit(60)
    plan = _plan(dedup.lsh_jaccard_verified_pairs(docs,
                                                  max_bucket=100))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sample_to_mix_is_map_side(spark, tmp_path_factory):
    """After the one totals aggregate (a separate job), the returned
    sample is scan + filter only — NO Exchange: the mix predicate
    must compose with the parquet scan without moving data."""
    from rechercheinfoweb_spark.operators import pipeline
    src = str(tmp_path_factory.mktemp("mix_src"))
    (spark.range(0, 200)
     .select(F.col("id").alias("doc_id"),
             F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
             .alias("source"),
             F.lit("alpha beta gamma delta").alias("text"))
     .write.mode("overwrite").parquet(src))
    docs = spark.read.parquet(src)
    out = pipeline.sample_to_mix(
        docs, {"s0": 0.5, "s1": 0.25, "s2": 0.25})
    plan = _plan(out)
    assert "Exchange" not in plan, plan


def test_remove_dup_spans_shuffles_hash_not_gram(spark, pages_df):
    """The corpus-wide occurrence window must key its exchange on
    the 8-byte xxhash64, never the gram string (the string would be
    ~9x wider on the wire at n=8)."""
    from rechercheinfoweb_spark.operators import dedup
    docs = pages_df.select(
        F.monotonically_increasing_id().alias("doc_id"), "text")
    import re
    plan = _plan(dedup.remove_dup_spans(docs, n=8))
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)",
                           plan)
    assert any("gh#" in e for e in exchanges), exchanges
    assert not any("gram#" in e for e in exchanges), exchanges


def test_topk_url_join_broadcasts_small_side(spark, reader):
    df = vector_topk(spark, reader, "search engine", "bm25", k=10,
                     with_urls=True)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # docs side reads only (doc_id, url) + partition column
    docs_scan = [ln for ln in plan.splitlines()
                 if "docs/chunk=" in ln and "FileScan" in ln]
    assert docs_scan and "text" not in docs_scan[0]
