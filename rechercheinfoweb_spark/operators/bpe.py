"""Byte-pair-encoding tokenizer: distributed training + encoding.

BPE (Sennrich et al. 2016) is the standard subword tokenizer for LM
training corpora; a training-data engine needs it for real token
counting (shard budgets, context packing — `pipeline.pack_token_shards`
consumes whatever counts it is given) and vocabulary induction.

Scale design (how the big tokenizer trainers actually work):

* **Training never loops over the corpus.**  One corpus scan builds
  the (word, count) table — Heaps-bounded (~n^0.5 of corpus tokens,
  further capped by ``min_count``) — and every merge round runs on
  THAT table: explode each word's current symbol sequence into
  weighted adjacent pairs, aggregate, take the argmax.  A round costs
  O(vocab) regardless of corpus size, so 100 TB trains as fast as
  10 GB once the word table exists.
* **Merges apply as a JVM array fold** (left-to-right non-overlapping,
  the BPE rule) — no Python in the training loop.
* **Encoding** is the one legitimate Python stage: applying an
  ordered merge list per word is inherently iterative, so it runs as
  an Arrow-batched pandas UDF over the token arrays with a per-batch
  word→pieces cache (web text repeats words heavily; the cache turns
  per-token work into per-distinct-word work).  The merge table is a
  broadcast closure, never a corpus-sized join.

Determinism: merge argmax ties break lexicographically on (a, b) —
pinned by the pure-Python twin in tests/test_bpe.py.  No RNG anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from .textstats import lower_tokens_col

END_MARK = "</w>"  # end-of-word symbol (the paper's convention)


def word_counts(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """(word, c) over the SQL-portable lowercased tokens — the one
    corpus-scan of BPE training.  ``min_count`` caps the table (the
    long Heaps tail carries almost no pair mass but all the rows)."""
    wc = (docs.select(F.explode(lower_tokens_col()).alias("word"))
          .groupBy("word").agg(F.count("*").alias("c")))
    if min_count > 1:
        wc = wc.where(F.col("c") >= min_count)
    return wc


def _chars_col(word: Column) -> Column:
    """Initial symbol sequence: characters + the end-of-word mark."""
    return F.concat(F.regexp_extract_all(word, F.lit("."), 0),
                    F.array(F.lit(END_MARK)))


def _apply_merge_col(sym: Column, a: str, b: str) -> Column:
    """One merge (a, b) → "ab" applied left-to-right non-overlapping
    (the BPE rule) as a JVM array fold: push each symbol; when the
    accumulator tail is ``a`` and the incoming symbol is ``b``,
    replace the tail with the merged symbol instead.  "aaa" under
    (a,a) folds to [aa, a] — overlap consumed, exactly like the
    reference implementation's pairwise scan."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        sym, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la)
            & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(F.element_at(acc, -1), s)))
        ).otherwise(F.concat(acc, F.array(s))))


def train_bpe(docs: DataFrame, n_merges: int = 100,
              min_count: int = 1,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge list.

    Each round: weighted adjacent-pair counts over the word table's
    current symbol sequences (explode + partial-agg shuffle on pair
    strings — table-sized, not corpus-sized), argmax with
    deterministic (count desc, a asc, b asc) tie-break via
    TakeOrderedAndProject, then one fold pass applying the merge.
    Stops early when the best pair's count drops below
    ``min_pair_count`` (nothing useful left to merge).

    The evolving symbol table is ``localCheckpoint``-ed (eager)
    every round: persist() alone caches DATA but leaves the LOGICAL
    plan growing one nested fold per round, which makes round-k
    analysis O(k) and the whole loop quadratic (and eventually
    overflows the analyzer) — the standard iterative-algorithm trap;
    checkpointing truncates lineage so every round plans against a
    flat vocabulary-sized table (the PageRank pattern)."""
    syms = (word_counts(docs, min_count)
            .select("c", _chars_col(F.col("word")).alias("sym"))
            .localCheckpoint())
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size("sym")
        pairs = (syms.where(n >= 2)
                 .select("c", F.explode(F.zip_with(
                     F.slice("sym", 1, n - 1),
                     F.slice("sym", 2, n - 1),
                     lambda x, y: F.struct(x.alias("a"),
                                           y.alias("b"))))
                     .alias("p"))
                 .groupBy("p.a", "p.b")
                 .agg(F.sum("c").alias("n"))
                 .orderBy(F.desc("n"), "a", "b")
                 .limit(1).collect())
        if not pairs or pairs[0]["n"] < min_pair_count:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))
        syms = syms.select(
            "c", _apply_merge_col(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """(rank, a, b) — the merge list as a table (persistable model
    artifact; rank is application order)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, a string, b string")


def _encode_word(word: str, ranks: dict[tuple[str, str], int]
                 ) -> list[str]:
    """Classic BPE encode: repeatedly merge the lowest-rank adjacent
    pair until none applies.  Pure Python — called per DISTINCT word
    per Arrow batch (cached), not per token."""
    sym = list(word) + [END_MARK]
    while len(sym) > 1:
        best, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best, best_i = r, i
        if best is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_piece_counts(docs: DataFrame,
                     merges: list[tuple[str, str]]) -> DataFrame:
    """(doc_id, n_words, n_pieces) — BPE token counts per doc (the
    number an LM pipeline budgets shards and context windows by).

    The merge list rides the UDF closure (broadcast once per
    executor, model-sized); each Arrow batch keeps a word→length
    cache so cost scales with distinct words per batch, not tokens."""
    ranks = {m: i for i, m in enumerate(merges)}

    @F.pandas_udf("long")
    def _count(tok_arrays: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def doc_count(toks) -> int:
            total = 0
            for w in toks:
                n = cache.get(w)
                if n is None:
                    n = len(_encode_word(w, ranks))
                    cache[w] = n
                total += n
            return total

        return tok_arrays.map(doc_count)

    toked = docs.select("doc_id", lower_tokens_col().alias("_toks"))
    return toked.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_words"),
        _count("_toks").alias("n_pieces"))
