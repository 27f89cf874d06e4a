"""Dictionary-backed query assists: spell suggestion + autocomplete.

Beyond-reference serving features over the index the engine already
maintains (the reference's dictionary is its in-memory trie,
trie.go — it ships no did-you-mean or completion; both are standard
search-frontend operations, so they belong to the "complete engine a
reference user could switch to" tier).  Both run entirely over the
``dictionary`` table (term, df) — the corpus text is never read.

Scale shape at a 10^8-term web dictionary:

* ``complete_prefix`` is a StartsWith filter PUSHED to the parquet
  scan (visible in PushedFilters) + a k-row ordered take — no
  shuffle, no Python.
* ``spell_suggest`` broadcasts the (tiny) query-term list and scans
  the dictionary ONCE map-side: a length-band prune (edit distance
  ≥ length difference, so |len Δ| > max_dist rows drop before any
  distance work) then JVM ``levenshtein`` — a single column-pruned
  scan per suggestion batch, O(dictionary) work but zero exchanges
  until the final per-term top-k (a window over ≤ batch·candidates
  rows).  The precomputed alternative (SymSpell delete-neighborhood
  buckets) trades that scan for index storage; at this engine's
  dictionary sizes (≤ millions of distinct terms even at 10^12 docs
  — Heaps' law sublinearity, see ft_heaps_curve) the scan is already
  interactive, so the simpler plan wins.

Ranking is deterministic: (edit distance ASC, df DESC, term ASC) —
ties can't reorder between engines, which is what lets the DuckDB
oracle (``ix_spell_suggest`` / ``ix_complete_prefix``) pin both
operators exactly (Spark and DuckDB implement the same classic
unit-cost Levenshtein).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def spell_suggest(dictionary: DataFrame, terms: list[str],
                  k: int = 5, max_dist: int = 2,
                  min_df: int = 1) -> DataFrame:
    """Top-*k* correction candidates per query term.

    → (query_term, suggestion, dist, df), ranked (dist, -df, term);
    exact dictionary hits rank first (dist 0) so callers can also use
    this as an is-in-vocabulary probe.  ``min_df`` drops junk terms
    the crawl itself introduced (a misspelling suggesting another
    misspelling).
    """
    qt = dictionary.sparkSession.createDataFrame(
        [(t,) for t in terms], "query_term string")
    cand = (dictionary.select("term", "df")
            .where(F.col("df") >= min_df)
            .join(F.broadcast(qt),
                  F.abs(F.length("term") - F.length("query_term"))
                  <= max_dist)
            .withColumn("dist", F.levenshtein("query_term", "term"))
            .where(F.col("dist") <= max_dist))
    w = Window.partitionBy("query_term").orderBy(
        F.asc("dist"), F.desc("df"), F.asc("term"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_term", F.col("term").alias("suggestion"),
                    "dist", "df"))


def complete_prefix(dictionary: DataFrame, prefix: str,
                    k: int = 10) -> DataFrame:
    """Top-*k* dictionary completions of *prefix* by document
    frequency → (term, df), ranked (df DESC, term ASC).  The prefix
    predicate reaches the parquet scan as a StartsWith pushed
    filter."""
    return (dictionary.select("term", "df")
            .where(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k))
