"""The north rule's launch shape, exercised for real: the index
build runs under the actual ``spark-submit --py-files`` binary
(separate driver JVM, engine shipped as a zip, cwd outside the
repo so ONLY the zip provides the package), and the index it
leaves behind is bit-equivalent to an in-process build of the same
deterministic corpus (reference launch: 20-goroutine in-process
build, cs276.go:20 — ours is cluster-submittable by construction).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

N_DOCS = 300


@pytest.mark.skipif(SPARK_SUBMIT is None,
                    reason="spark-submit binary not on PATH")
def test_spark_submit_py_files_build(spark, tmp_path):
    sys.path.insert(0, REPO)
    from scripts.make_pkg_zip import make

    zip_path = make(str(tmp_path / "riw_pkg.zip"))
    out_dir = str(tmp_path / "ix_submitted")
    env = dict(os.environ,
               PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    # cwd is tmp_path, NOT the repo: the driver must resolve
    # rechercheinfoweb_spark from the --py-files zip alone
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_build.py"),
         "--synthetic", str(N_DOCS), "--out", out_dir,
         "--n-chunks", "2", "--n-buckets", "8"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = json.loads(
        [ln for ln in proc.stdout.splitlines()
         if ln.startswith("{")][-1])
    assert report["n_docs"] == N_DOCS
    assert report["docs_per_sec"] > 0

    # the submitted build must be interchangeable with an
    # in-process build of the same deterministic corpus
    from rechercheinfoweb_spark.operators.index_build import build_index
    from rechercheinfoweb_spark.operators.query_vector import (
        IndexReader, vector_topk,
    )
    from rechercheinfoweb_spark.sources.web_pages import (
        synthetic_web_pages,
    )

    local_dir = str(tmp_path / "ix_local")
    build_index(spark, synthetic_web_pages(spark, N_DOCS), local_dir,
                n_chunks=2, n_buckets=8)

    def topk(ix):
        return [(r["doc_id"], r["score"]) for r in vector_topk(
            spark, IndexReader(spark, ix), "search engine index",
            "bm25", k=10).collect()]

    assert topk(out_dir) == topk(local_dir)
