"""spark-submit entry point for the index build (north-rule launch).

Usage (the launch shape the north rule mandates):

    python scripts/make_pkg_zip.py                      # -> /tmp/riw_pkg.zip
    spark-submit --master local[8] \\
        --py-files /tmp/riw_pkg.zip \\
        scripts/submit_build.py \\
        --input /path/to/web_pages_parquet \\
        --out /path/to/index \\
        [--n-chunks 8] [--n-buckets 32] [--resume] \\
        [--synthetic N]          # generate an N-doc corpus instead

On a real cluster swap --master for yarn/k8s; the job itself is
master-agnostic (it only sees the SparkSession).  Prints one JSON
line with n_docs, wall seconds, docs/sec and per-stage timings.
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None,
                    help="parquet dir with web_pages schema")
    ap.add_argument("--synthetic", type=int, default=None,
                    help="generate an N-doc synthetic corpus instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-chunks", type=int, default=8)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--chunk-batch", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if not args.input and not args.synthetic:
        ap.error("one of --input / --synthetic is required")

    # under spark-submit the session already exists with the
    # submitted master/conf; fall back to our factory otherwise
    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("riw-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from rechercheinfoweb_spark.operators.index_build import build_index
    from rechercheinfoweb_spark.sources.web_pages import (
        synthetic_web_pages,
    )

    pages = (spark.read.parquet(args.input) if args.input
             else synthetic_web_pages(spark, args.synthetic))
    res = build_index(spark, pages, args.out,
                      n_chunks=args.n_chunks, n_buckets=args.n_buckets,
                      chunk_batch=args.chunk_batch, resume=args.resume)
    print(json.dumps({
        "n_docs": res.n_docs,
        "wall_secs": round(res.wall_secs, 2),
        "docs_per_sec": round(res.docs_per_sec, 1),
        "stage_secs": {k: round(v, 2) for k, v in res.stage_secs.items()},
        "resumed_stages": res.resumed_stages,
        "out": args.out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
