"""Spell suggestion + autocomplete vs a brute-force DP oracle."""

import pytest
from pyspark.sql import Row

from rechercheinfoweb_spark.operators.suggest import (
    complete_prefix, spell_suggest,
)

DICT = [("query", 415), ("quart", 7), ("quarry", 3), ("weary", 2),
        ("stream", 394), ("steam", 50), ("strap", 4), ("scan", 405),
        ("scans", 60), ("column", 386), ("count", 100), ("cost", 90),
        ("whatever", 1)]


def _lev(a: str, b: str) -> int:
    """Independent unit-cost DP (not the JVM function)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def dict_df(spark):
    return spark.createDataFrame(
        [Row(term=t, df=d) for t, d in DICT])


def test_spell_suggest_matches_bruteforce(spark, dict_df):
    qs = ["quary", "stream", "colunm", "xyzzy"]
    got = [(r["query_term"], r["suggestion"], r["dist"], r["df"])
           for r in spell_suggest(dict_df, qs, k=3, max_dist=2)
           .collect()]
    want = []
    for q in qs:
        cand = [(t, _lev(q, t), d) for t, d in DICT
                if _lev(q, t) <= 2]
        cand.sort(key=lambda x: (x[1], -x[2], x[0]))
        want += [(q, t, dist, d) for t, dist, d in cand[:3]]
    assert sorted(got) == sorted(want)
    # no candidates within budget → the term simply has no rows
    assert not [r for r in got if r[0] == "xyzzy"]


def test_spell_exact_hit_ranks_first(dict_df):
    rows = spell_suggest(dict_df, ["stream"], k=3).collect()
    assert rows[0]["suggestion"] == "stream"
    assert rows[0]["dist"] == 0


def test_spell_min_df(dict_df):
    got = {r["suggestion"]
           for r in spell_suggest(dict_df, ["whatevar"], k=5,
                                  min_df=2).collect()}
    assert "whatever" not in got


def test_complete_prefix_ranking_and_pushdown(spark, dict_df, tmp_path):
    p = str(tmp_path / "dict")
    dict_df.write.parquet(p)
    ondisk = spark.read.parquet(p)
    q = complete_prefix(ondisk, "co", k=2)
    got = [(r["term"], r["df"]) for r in q.collect()]
    assert got == [("column", 386), ("count", 100)]  # df DESC
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan.split("PushedFilters")[1][:120]
