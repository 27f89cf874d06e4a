"""Shared fixtures: one SparkSession, one tiny corpus, one built index.

Session-scoped so the whole suite pays a single JVM startup and a
single build (SURVEY.md §5 strategy)."""

from __future__ import annotations

import shutil

import pytest

from oracle.pyoracle import OracleIndex
from rechercheinfoweb_spark.operators.index_build import build_index
from rechercheinfoweb_spark.operators.query_vector import IndexReader
from rechercheinfoweb_spark.session import get_spark
from rechercheinfoweb_spark.sources.web_pages import synthetic_web_pages

N_DOCS = 150


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark):
    df = synthetic_web_pages(spark, N_DOCS)
    df.persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="session")
def corpus(pages_df) -> list[tuple[str, str]]:
    return [(r["url"], r["text"])
            for r in pages_df.select("url", "text").collect()]


@pytest.fixture(scope="session")
def oracle_index(corpus) -> OracleIndex:
    return OracleIndex.build(corpus)


@pytest.fixture(scope="session")
def index_dir(spark, pages_df, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("index"))
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, pages_df, out, n_chunks=2, n_buckets=8)
    return out


@pytest.fixture(scope="session")
def reader(spark, index_dir) -> IndexReader:
    return IndexReader(spark, index_dir)
