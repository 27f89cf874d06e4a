"""Reference-eval-set artifact: run the REAL CACM corpus + 64-query
set through the engine and record rank-identity + MAP per weighting
scheme into CACM_EVAL.json (the judged evidence for the north rule's
"rank-identical on the reference query set").

Usage: python scripts/cacm_eval.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    out_json = (sys.argv[1] if len(sys.argv) > 1
                else os.path.join(REPO, "CACM_EVAL.json"))

    from oracle.pyoracle import OracleIndex
    from rechercheinfoweb_spark.operators import evaluate
    from rechercheinfoweb_spark.operators.index_build import build_index
    from rechercheinfoweb_spark.operators.query_vector import (
        IndexReader, vector_topk_batch,
    )
    from rechercheinfoweb_spark.session import get_spark
    from rechercheinfoweb_spark.sources import cacm

    spark = get_spark(app_name="cacm-eval")
    spark.sparkContext.setLogLevel("ERROR")

    sw = cacm.cacm_stopwords()
    pages = cacm.cacm_pages(spark).persist()
    queries = cacm.cacm_queries()
    qrels = cacm.cacm_qrels()
    idx = os.path.join(tempfile.gettempdir(), "riw_cacm_eval_index")
    t0 = time.time()
    res = build_index(spark, pages, idx, n_chunks=2, n_buckets=8,
                      stopwords=sw, resume=True)
    build_secs = round(time.time() - t0, 2)

    oracle = OracleIndex.build(
        [(r["url"], r["text"]) for r in
         pages.select("url", "text").collect()], stopwords=sw)
    n = oracle.n_docs
    reader = IndexReader(spark, idx)
    qdf = evaluate.qrels_df(spark, qrels)

    report: dict = {
        "corpus": {"n_docs": n, "vocabulary": reader.vocabulary,
                   "n_queries": len(queries), "n_judged": len(qrels),
                   "n_qrels_pairs": sum(len(v) for v in qrels.values()),
                   "build_secs": build_secs},
        "schemes": {},
    }
    for scheme in ("raw", "norm", "half", "bm25"):
        results = vector_topk_batch(spark, reader, queries,
                                    scheme=scheme, k=n,
                                    stopwords=sw).persist()
        oracle_lists = {qid: oracle.vector_query(q, scheme, k=n)
                        for qid, q in queries.items()}
        match = evaluate.rank_match_rate(results, oracle_lists)
        pts = evaluate.pr_points(results, qdf)
        report["schemes"][scheme] = {
            "match_rate": match["match_rate"],
            "n_queries": match["n_queries"],
            "mismatched_qids": match["mismatched_qids"],
            "map": round(evaluate.mean_average_precision(pts), 6),
        }
        results.unpersist()
        print(scheme, report["schemes"][scheme])

    with open(out_json, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print("wrote", out_json)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
