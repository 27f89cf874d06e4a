"""Dedup clustering + cleaning-pipeline tests.

dedup_clusters must compute exact connected components (including
multi-round convergence on path graphs — the worst case for label
propagation, where pointer jumping earns its keep), and the fused
map-side doc_stats must be column-identical to the standalone
textstats operators it replaces in the pipeline's stage-1/2 scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators import dedup, pipeline, textstats


@pytest.fixture(scope="module")
def small_docs(spark):
    df = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text").limit(120).persist())
    yield df
    df.unpersist()


def _components_brute(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> component min."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("pairs", [
    # two triangles + an isolated edge
    [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
    # a 12-node PATH (diameter 11 — needs >1 propagation round;
    # pointer jumping converges in O(log d))
    [(i, i + 1) for i in range(100, 112)],
    # star with high-id center (canonical must be a leaf)
    [(50, j) for j in range(40, 50)],
    # single pair
    [(7, 3)],
])
def test_dedup_clusters_exact_components(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical"]
           for r in dedup.dedup_clusters(df).collect()}
    assert got == _components_brute(pairs)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_dedup_clusters_random_graphs(spark, seed):
    """Seeded random graphs (mixed cycles, bridges, isolated edges)
    vs union-find ground truth."""
    import random
    rng = random.Random(seed)
    nodes = rng.sample(range(1000), 30)
    pairs = []
    for _ in range(45):
        a, b = rng.sample(nodes, 2)
        pairs.append((min(a, b), max(a, b)))
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["canonical"]
           for r in dedup.dedup_clusters(df).collect()}
    assert got == _components_brute(pairs)


def test_dedup_keep_drops_non_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)],
                                  "doc_a long, doc_b long")
    kept = sorted(r["doc_id"]
                  for r in dedup.dedup_keep(docs, pairs).collect())
    # component {0,1,2} keeps 0; {4,5} keeps 4; 3 untouched
    assert kept == [0, 3, 4]


def test_lsh_verified_equals_exact_on_candidates(spark, small_docs):
    """lsh_jaccard_verified_pairs == ngram_jaccard_pairs restricted
    to the LSH candidate set (same exact Jaccard values — the verify
    step recomputes truth, LSH only prunes the pair space)."""
    cand = {(r["doc_a"], r["doc_b"]) for r in
            dedup.minhash_lsh_pairs(small_docs, max_bucket=100)
            .collect()}
    exact = {(r["doc_a"], r["doc_b"]):
             (r["inter"], r["size_a"], r["size_b"], r["jaccard"])
             for r in dedup.ngram_jaccard_pairs(
                 small_docs, threshold=0.1).collect()}
    got = {(r["doc_a"], r["doc_b"]):
           (r["inter"], r["size_a"], r["size_b"], r["jaccard"])
           for r in dedup.lsh_jaccard_verified_pairs(
               small_docs, threshold=0.1, max_bucket=100).collect()}
    want = {p: v for p, v in exact.items() if p in cand}
    assert got == want


def test_doc_stats_matches_standalone_operators(spark, small_docs):
    """The fused map-side projection == textstats.lang_id +
    textstats.quality_score (same votes, same tie-break, same
    rounding) — pins that pipeline thresholds and standalone-operator
    thresholds agree."""
    fused = {r["doc_id"]: (r["lang_pred"], r["quality"])
             for r in pipeline.doc_stats(small_docs).collect()}
    lang = {r["doc_id"]: r["lang_pred"]
            for r in textstats.lang_id(small_docs).collect()}
    qual = {r["doc_id"]: r["quality"]
            for r in textstats.quality_score(small_docs).collect()}
    # since r4 lang_id also emits 'und' rows for zero-token docs,
    # so both sides cover every doc
    assert set(lang) <= set(fused)
    for d, (lp, qv) in fused.items():
        assert lang.get(d, "und") == lp
        assert qual[d] == qv


def test_doc_stats_null_text_propagates_null(spark):
    """NULL text (distinct from EMPTY text) yields NULL
    lang_pred/quality — expression-path semantics: the row fails
    every gate comparison instead of masquerading as an 'und'/0.0
    empty doc — and the quantile gate never keeps it."""
    docs = spark.createDataFrame(
        [(1, "the of and is a document with actual words in it"),
         (2, None), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["lang_pred"], r["quality"])
            for r in pipeline.doc_stats(docs).collect()}
    assert rows[2] == (None, None)
    assert rows[3][0] == "und" and rows[3][1] == 0.0
    # the quantile gate ranks NULL quality below every real score
    # (nulls last on desc) — the null-text doc is cut first
    docs2 = docs.withColumn("source", F.lit("web"))
    kept = {r["doc_id"] for r in pipeline.quality_quantile_filter(
        docs2, keep_frac=0.5).collect()}
    assert kept == {1, 3}


def test_clean_corpus_stages_compose(spark, small_docs):
    """Survivors = (lang & quality pass) minus exact dups minus
    non-canonical near-dup members, computed independently here from
    the standalone operators."""
    from pyspark.sql import functions as F

    res = pipeline.clean_corpus(small_docs, lang="en",
                                min_quality=0.42, simhash_radius=6)
    got = sorted(r["doc_id"] for r in res.collect())

    stats = pipeline.doc_stats(small_docs)
    kept12 = stats.where((F.col("lang_pred") == "en")
                         & (F.col("quality") >= 0.42))
    # exact: min doc_id per md5 group
    ids12 = {r["doc_id"] for r in kept12.select("doc_id").collect()}
    by_md5: dict[str, int] = {}
    for r in small_docs.select(
            "doc_id", F.md5("text").alias("h")).collect():
        if r["doc_id"] in ids12:
            h = r["h"]
            by_md5[h] = min(by_md5.get(h, r["doc_id"]), r["doc_id"])
    ids3 = set(by_md5.values())
    kept3 = small_docs.where(F.col("doc_id").isin(*ids3))
    pairs = [(r["doc_a"], r["doc_b"]) for r in
             dedup.simhash_near_pairs(kept3, radius=6).collect()]
    canon = _components_brute(pairs)
    want = sorted(d for d in ids3 if canon.get(d, d) == d)
    assert got == want


def _winnow_brute(text: str) -> set[int]:
    from rechercheinfoweb_spark.operators.textstats import (
        WINNOW_B, WINNOW_K, WINNOW_M, WINNOW_W,
    )
    codes = [ord(c) for c in text]
    n = len(codes) - WINNOW_K + 1
    if n < WINNOW_W:
        return set()
    hs = []
    for i in range(n):
        h = 0
        for j in range(WINNOW_K):
            h = (h * WINNOW_B + codes[i + j]) % WINNOW_M
        hs.append(h)
    return {min(hs[i:i + WINNOW_W]) for i in range(n - WINNOW_W + 1)}


def test_winnow_fingerprints_match_bruteforce(spark):
    """The vectorized Horner kernel == positional polynomial
    evaluation, including short-doc edge cases (len < k+w-1 emits
    nothing) and non-ASCII codepoints."""
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",            # < k: no k-grams
        "exactly11ch",      # k-grams but no full window
        "a" * 30,           # all-identical hashes
        "naïve café über — ünïcode",  # non-ASCII codepoints
        "The data of streams and queries, repeated. " * 3,
    ]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got: dict[int, set] = {}
    for r in textstats.winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_brute(t), t


def test_winnow_overlap_pairs_shared_content(spark):
    """Docs sharing a long passage pair up; unrelated docs don't;
    the hot-fingerprint cap drops boilerplate-only pairs."""
    shared = "an identical long passage that yields many fingerprints"
    boiler = "common boilerplate header present everywhere here"
    texts = [
        (0, shared + " with tail zero"),
        (1, shared + " and another different ending"),
        (2, "completely unrelated text about something else entirely"),
        (3, boiler + " unique suffix three"),
        (4, boiler + " unique suffix four four"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.winnow_overlap_pairs(
                 docs, min_overlap=5).collect()}
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    # cap at df > 4 keeps everything (no fp is in all 5 docs), but a
    # cap of 1 kills every shared fingerprint -> no pairs at all
    none = dedup.winnow_overlap_pairs(docs, min_overlap=1,
                                      max_fp_df=1).collect()
    assert none == []


def test_dedup_clusters_empty_and_keep_noop(spark):
    """Empty pair set: no clusters, dedup_keep passes docs through."""
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.dedup_clusters(empty).collect() == []
    docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, text string")
    assert sorted(r["doc_id"] for r in
                  dedup.dedup_keep(docs, empty).collect()) == [1, 2]


def test_clean_corpus_all_filtered(spark):
    """A corpus with nothing in the target language survives as an
    empty result, not an error (stage 4 sees zero pairs)."""
    docs = spark.createDataFrame(
        [(1, "der und das nicht ist"), (2, "el que de en es")],
        "doc_id long, text string")
    assert pipeline.clean_corpus(docs, lang="en").collect() == []


def test_stratified_sample_deterministic_and_stratified(spark):
    import math

    from pyspark.sql import functions as F
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    kept = pipeline.stratified_sample(docs, rates)
    rows = sorted(r["doc_id"] for r in kept.collect())
    # partitioning-invariant: the hash predicate is per-row, so the
    # sample is identical at any split layout (unlike df.sample)
    rows2 = sorted(r["doc_id"] for r in pipeline.stratified_sample(
        docs.repartition(13), rates).collect())
    assert rows == rows2
    per_src = {r["source"]: r["n"] for r in kept.groupBy("source")
               .agg(F.count("*").alias("n")).collect()}
    n0 = docs.where(F.col("source") == "src0").count()
    assert per_src.get("src0") == n0          # rate 1.0 keeps all
    assert "src2" not in per_src              # rate 0.0 keeps none
    assert set(per_src) <= {"src0", "src1"}   # unlisted sources drop
    # rate 0.5 keeps a binomial-plausible share
    n1 = docs.where(F.col("source") == "src1").count()
    k1 = per_src.get("src1", 0)
    sd = math.sqrt(n1 * 0.25)
    assert abs(k1 - 0.5 * n1) <= 4 * sd + 1


def test_quality_quantile_filter_exact_counts(spark):
    from pyspark.sql import functions as F
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    frac = 0.3
    kept = pipeline.quality_quantile_filter(docs, frac)
    n_in = {r["source"]: r["n"] for r in docs.groupBy("source")
            .agg(F.count("*").alias("n")).collect()}
    n_out = {r["source"]: r["n"] for r in kept.groupBy("source")
             .agg(F.count("*").alias("n")).collect()}
    import math
    for src, n in n_in.items():
        assert n_out.get(src, 0) == math.ceil(n * frac), src
    # kept docs dominate dropped docs on quality within each source
    scored = pipeline.quality_quantile_filter(docs, frac).select(
        "source", "quality")
    worst_kept = {r["source"]: r["q"] for r in scored.groupBy("source")
                  .agg(F.min("quality").alias("q")).collect()}
    all_scored = docs.withColumn(
        "quality", pipeline._quality_col(textstats.tokens_col()))
    dropped = all_scored.join(
        pipeline.quality_quantile_filter(docs, frac).select("doc_id"),
        "doc_id", "left_anti")
    for r in (dropped.groupBy("source")
              .agg(F.max("quality").alias("q")).collect()):
        assert r["q"] <= worst_kept[r["source"]], r["source"]


# ------------------------------------------------ URL canonicalization

URL_CASES = [
    # (input, canonical)
    ("https://WWW.Ex.COM:443/a/b/?utm_source=f&z=2&a=1#frag",
     "https://ex.com/a/b?a=1&z=2"),
    ("https://ex.com/a/b?z=2&a=1",           # param order collides
     "https://ex.com/a/b?a=1&z=2"),
    ("HTTP://www.ex.com:80/a/b",             # scheme case + port
     "http://ex.com/a/b"),
    ("http://ex.com:8080/a",                 # non-default port kept
     "http://ex.com:8080/a"),
    ("https://ex.com/?fbclid=abc123",        # click id + empty path
     "https://ex.com/"),
    ("https://ex.com",                       # no path at all
     "https://ex.com/"),
    ("https://ex.com/a//",                   # trailing slash run
     "https://ex.com/a"),
    ("https://ex.com/A/B?Q=1",               # path/query case KEPT
     "https://ex.com/A/B?Q=1"),
    ("not-a-url",                            # non-absolute: pass-through
     "not-a-url"),
    ("https://ex.com/a?utm_source=x&utm_medium=y",  # all params tracking
     "https://ex.com/a"),
]


def test_canonical_url_cases(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], "i int, url string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", pipeline.canonical_url_col("url").alias("c")).collect()}
    for i, (u, want) in enumerate(URL_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_url_dedup_keeps_min_url_per_canonical(spark):
    rows = [
        (0, "https://WWW.Ex.COM:443/a/b/?utm_source=f&z=2&a=1"),
        (1, "https://ex.com/a/b?z=2&a=1"),   # same canonical as 0
        (2, "https://ex.com/other"),
        (3, "https://ex.com/a/b?a=1&z=2"),   # same canonical again
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = pipeline.url_dedup(df).orderBy("doc_id").collect()
    # survivor per canonical = min url string; 2 groups survive
    assert len(out) == 2
    kept = {r["canonical_url"]: r["url"] for r in out}
    assert kept["https://ex.com/a/b?a=1&z=2"] == min(
        rows[0][1], rows[1][1], rows[3][1])
    assert kept["https://ex.com/other"] == "https://ex.com/other"


def test_pack_token_shards_brute_force_and_parallelism(spark,
                                                       small_docs):
    """Two-phase distributed running sum == single-node cumsum by
    doc_id, identical at any input partitioning, multi-bucket path
    exercised (target_rows_per_bucket=20 over 120 docs)."""
    import re
    budget = 500
    want = {}
    cum = 0
    for did, text in sorted((r["doc_id"], r["text"])
                            for r in small_docs.collect()):
        nt = len([t for t in re.split(r"[^a-zA-Z0-9]+", text) if t])
        start = cum
        cum += nt
        want[did] = (nt, cum, start // budget)

    def run(docs):
        return {r["doc_id"]: (r["n_tokens"], r["cum_tokens"],
                              r["shard"])
                for r in pipeline.pack_token_shards(
                    docs, budget=budget,
                    target_rows_per_bucket=20).collect()}

    got = run(small_docs)
    assert got == want
    assert len({v[2] for v in got.values()}) > 1  # several shards
    # repartitioned input must produce the identical assignment
    assert run(small_docs.repartition(7)) == got
    assert run(small_docs.coalesce(1)) == got


def test_paragraph_dedup_brute_force(spark, small_docs):
    """paragraph_dedup == a python reimplementation of the C4 line
    rule (first (doc_id, idx) occurrence of each trimmed non-empty
    line wins), on real corpus text plus crafted docs covering:
    cross-doc boilerplate, within-doc repeats, blank-line-only docs,
    and winner order across doc ids."""
    from pyspark.sql import functions as F
    crafted = spark.createDataFrame(
        [(800001, "COOKIE BANNER\nunique alpha content\n"
                  "COOKIE BANNER"),             # within-doc repeat
         (800002, "COOKIE BANNER\nfresh beta paragraph"),  # cross-doc
         (800003, "  \n\n   \n"),               # blank lines only
         (800004, "fresh beta paragraph"),      # whole doc duplicated
         (800005, "   unique alpha content  \nnever seen line")],
        "doc_id long, text string")             # trim collision
    docs = small_docs.unionByName(crafted)

    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    first: dict[str, tuple] = {}
    want = {}
    for r in rows:
        lines = [ln.strip() for ln in r["text"].split("\n")]
        lines = [ln for ln in lines if ln]
        kept = []
        for i, ln in enumerate(lines):
            if ln not in first:
                first[ln] = (r["doc_id"], i)
                kept.append(ln)
        want[r["doc_id"]] = (len(lines), len(kept), "\n".join(kept))

    got = {r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_clean"])
           for r in pipeline.paragraph_dedup(docs).collect()}
    assert got == want
    # crafted expectations hit the branches explicitly
    assert got[800001][1] == 2          # second banner copy cut
    assert got[800002] == (2, 1, "fresh beta paragraph")
    assert got[800003] == (0, 0, "")    # blank doc -> empty, kept row
    assert got[800004] == (1, 0, "")    # fully-duplicated doc emptied
    assert got[800005][1] == 1          # trimmed line collides


def test_paragraph_dedup_partitioning_invariant(spark, small_docs):
    """Winners depend only on (doc_id, idx) order — never on physical
    layout: 1-partition and 16-partition inputs agree exactly."""
    a = pipeline.paragraph_dedup(small_docs.repartition(1)).collect()
    b = pipeline.paragraph_dedup(small_docs.repartition(16)).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_nb_quality_brute_force(spark):
    """train_quality_nb/nb_quality_score == a python multinomial-NB
    reimplementation (Laplace smoothing over the joint vocabulary,
    OOV terms skipped, empty/OOV docs score exactly the prior)."""
    import math
    import re
    pos_rows = [(0, "clean prose with varied informative words here"),
                (7, "another well formed sentence about information")]
    neg_rows = [(3, "buy buy buy cheap cheap spam spam spam"),
                (10, "spam click here buy now cheap")]
    score_rows = pos_rows + neg_rows + [
        (20, "informative prose about information"),  # pos-ish
        (21, "cheap spam buy"),                       # neg-ish
        (22, "zzz qqq xxx"),                          # fully OOV
        (23, "")]                                     # empty
    pos = spark.createDataFrame(pos_rows, "doc_id long, text string")
    neg = spark.createDataFrame(neg_rows, "doc_id long, text string")
    docs = spark.createDataFrame(score_rows,
                                 "doc_id long, text string")

    model, meta = pipeline.train_quality_nb(pos, neg)
    got = {r["doc_id"]: r["nb_score"]
           for r in pipeline.nb_quality_score(
               docs, model, prior=meta["prior"]).collect()}

    tok = lambda t: [x for x in re.split(r"[^a-zA-Z0-9]+", t) if x]  # noqa: E731
    from collections import Counter
    cp = Counter(w for _, t in pos_rows for w in tok(t))
    cn = Counter(w for _, t in neg_rows for w in tok(t))
    vocab = set(cp) | set(cn)
    v, tp, tn = len(vocab), sum(cp.values()), sum(cn.values())
    llr = {w: math.log((cp[w] + 1) / (tp + v))
           - math.log((cn[w] + 1) / (tn + v)) for w in vocab}
    prior = math.log(len(pos_rows) / len(neg_rows))
    want = {d: round(sum(llr[w] for w in tok(t) if w in llr) + prior,
                     6)
            for d, t in score_rows}
    assert got == want
    assert meta["vocab"] == v and meta["tot_pos"] == tp
    # direction sanity + the OOV/empty rule
    assert got[20] > 0 > got[21]
    assert got[22] == got[23] == round(prior, 6)


def test_nb_quality_min_count_bounds_model(spark):
    """min_count drops rare terms BEFORE totals: the model is
    smaller and totals shrink consistently (the broadcast-size
    guard for 100-TB vocabularies)."""
    pos = spark.createDataFrame(
        [(0, "common common common rare1")],
        "doc_id long, text string")
    neg = spark.createDataFrame(
        [(1, "common rare2 rare2")], "doc_id long, text string")
    m1, meta1 = pipeline.train_quality_nb(pos, neg, min_count=1)
    m3, meta3 = pipeline.train_quality_nb(pos, neg, min_count=3)
    assert meta1["vocab"] == 3 and meta3["vocab"] == 1
    assert {r["term"] for r in m3.collect()} == {"common"}
    assert meta3["tot_pos"] == 3 and meta3["tot_neg"] == 1


# ---- DSIR importance resampling -------------------------------------


def _dsir_brute(rows, target_ids, B):
    """Pure-Python DSIR twin: hashed uni+bigram buckets via the same
    md5-prefix bytes, Laplace-smoothed log ratio, per-doc sum."""
    import hashlib
    import math
    import re
    from collections import Counter

    def grams(t):
        ts = [w.lower() for w in re.split(r"[^a-zA-Z0-9]+", t) if w]
        return ts + [" ".join(ts[i:i + 2]) for i in range(len(ts) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    tc, rc = Counter(), Counter()
    for did, t in rows:
        for g in grams(t):
            rc[bucket(g)] += 1
            if did in target_ids:
                tc[bucket(g)] += 1
    tt, tr = sum(tc.values()), sum(rc.values())

    def llr(b):
        return (math.log((tc[b] + 1) / (tt + B))
                - math.log((rc[b] + 1) / (tr + B)))

    return {did: round(sum(llr(bucket(g)) for g in grams(t)), 6)
            for did, t in rows}


def test_dsir_weights_brute_force(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "spark shuffles data across the cluster"),
            (3, "the cat and the hat"),
            (4, ""),  # featureless doc -> weight exactly 0
            (5, "CAT sat ON the MAT"),  # case-folds into 1's features
            (6, "quantum flux harmonics resonate wildly")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id in (1, 3)")
    B = 64
    exp = _dsir_brute(rows, {1, 3}, B)
    got = {r["doc_id"]: r["lw"]
           for r in pipeline.dsir_weights(docs, target, B).collect()}
    assert got == pytest.approx(exp, abs=0)
    # semantics: target docs score highest, off-distribution lowest
    assert got[3] == max(got.values())
    assert got[2] == min(got.values())
    assert got[4] == 0.0


def test_dsir_weights_partitioning_invariant(spark, small_docs):
    target = small_docs.where("doc_id % 11 = 0")
    a = sorted(pipeline.dsir_weights(small_docs, target, 256)
               .collect())
    b = sorted(pipeline.dsir_weights(small_docs.repartition(13),
                                     target.repartition(3), 256)
               .collect())
    assert a == b


def test_dsir_select_gumbel_topk(spark):
    import hashlib
    import math

    rows = [(i, f"word{i % 5} common text body") for i in range(1, 41)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id % 4 = 0")
    B, k = 128, 10
    sel = pipeline.dsir_select(docs, target, k, B).collect()
    assert len(sel) == k
    # twin: recompute keys from the brute weights + the same
    # deterministic Gumbel and verify the exact top-k set
    exp_lw = _dsir_brute(rows, {i for i, _ in rows if i % 4 == 0}, B)

    def key(did):
        u = (int(hashlib.md5(f"dsir:{did}".encode())
                 .hexdigest()[:8], 16) + 0.5) / 2 ** 32
        return round(exp_lw[did] + -math.log(-math.log(u)), 6)

    exp_top = sorted(rows, key=lambda r: (-key(r[0]), r[0]))[:k]
    assert [(r["doc_id"], r["key"]) for r in
            sorted(sel, key=lambda r: (-r["key"], r["doc_id"]))] \
        == [(d, key(d)) for d, _ in exp_top]
    # every selected row carries its weight
    for r in sel:
        assert r["lw"] == exp_lw[r["doc_id"]]


# ---- backoff-LM perplexity (CCNet stage) -----------------------------


def _lm_brute(rows, target_ids, min_count=1, alpha=0.4):
    """Pure-Python twin of train_backoff_lm + lm_doc_scores."""
    import math
    import re
    from collections import Counter

    def toks(t):
        return [w.lower() for w in re.split(r"[^a-zA-Z0-9]+", t) if w]

    uni_all, bi_all = Counter(), Counter()
    for did, t in rows:
        if did not in target_ids:
            continue
        ts = toks(t)
        uni_all.update(ts)
        bi_all.update(zip(ts, ts[1:]))
    tot, vocab = sum(uni_all.values()), len(uni_all)
    uni = {w: c for w, c in uni_all.items() if c >= min_count}
    ctx = Counter()
    for (p, _w), c in bi_all.items():
        ctx[p] += c
    bi = {pw: c for pw, c in bi_all.items() if c >= min_count}

    def ln_uni(w):
        return math.log((uni.get(w, 0) + 1) / (tot + vocab + 1))

    out = {}
    for did, t in rows:
        ts = toks(t)
        if not ts:
            out[did] = (0, 0.0)
            continue
        s = ln_uni(ts[0])
        for p, w in zip(ts, ts[1:]):
            if (p, w) in bi:
                s += math.log(bi[(p, w)] / ctx[p])
            else:
                s += math.log(alpha) + ln_uni(w)
        out[did] = (len(ts), round(-s / len(ts), 6))
    return out


LM_ROWS = [(1, "the cat sat on the mat"),
           (2, "the cat sat on the cat"),
           (3, "spark shuffles data across the cluster"),
           (4, ""),                      # empty -> (0, 0.0)
           (5, "mat"),                   # single token: unigram only
           (6, "zz qq zz qq unseen"),    # OOV-heavy
           (7, "the mat sat on a cat")]


@pytest.mark.parametrize("min_count", [1, 2])
def test_lm_scores_brute_force(spark, min_count):
    docs = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    target = docs.where("doc_id in (1, 2)")
    exp = _lm_brute(LM_ROWS, {1, 2}, min_count=min_count)
    uni, bi, ctx, meta = pipeline.train_backoff_lm(target, min_count)
    got = {r["doc_id"]: (r["n_tok"], r["lm_score"])
           for r in pipeline.lm_doc_scores(
               docs, uni, bi, ctx, meta).collect()}
    assert got == exp
    # semantics: the two target docs score lowest, OOV-heavy highest
    sc = {d: v[1] for d, v in got.items() if v[0] > 0}
    assert sorted(sc, key=sc.get)[:2] == [2, 1]
    assert sc[6] == max(sc.values())
    assert got[4] == (0, 0.0)


def test_lm_min_count_prunes_model(spark):
    docs = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    target = docs.where("doc_id in (1, 2)")
    uni1, bi1, _, meta1 = pipeline.train_backoff_lm(target, 1)
    uni2, bi2, _, meta2 = pipeline.train_backoff_lm(target, 2)
    assert uni2.count() < uni1.count()
    assert bi2.count() < bi1.count()
    # Laplace scalars are UNpruned — same under any cutoff
    assert meta1 == meta2
    # surviving bigrams keep their true (unpruned) denominator
    kept = {(r["prev"], r["w"]) for r in bi2.collect()}
    assert ("the", "cat") in kept  # appears 3x across target


def test_lm_scores_partitioning_invariant(spark, small_docs):
    target = small_docs.where("doc_id % 11 = 0")
    uni, bi, ctx, meta = pipeline.train_backoff_lm(target, 2)
    a = sorted(pipeline.lm_doc_scores(small_docs, uni, bi, ctx,
                                      meta).collect())
    uni2, bi2, ctx2, meta2 = pipeline.train_backoff_lm(
        target.repartition(3), 2)
    b = sorted(pipeline.lm_doc_scores(
        small_docs.repartition(13), uni2, bi2, ctx2,
        meta2).collect())
    assert a == b


def test_lm_perplexity_filter_head(spark):
    docs = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    target = docs.where("doc_id in (1, 2)")
    kept = pipeline.lm_perplexity_filter(docs, target, 3 / 7)
    rows = kept.collect()
    assert len(rows) == 3  # ceil(7 * 3/7)
    exp = _lm_brute(LM_ROWS, {1, 2})
    exp_head = sorted(exp, key=lambda d: (exp[d][1], d))[:3]
    assert sorted(r["doc_id"] for r in rows) == sorted(exp_head)


def test_lm_perplexity_buckets(spark):
    docs = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    target = docs.where("doc_id in (1, 2)")
    got = {r["doc_id"]: (r["n_tok"], r["lm_score"], r["bucket"])
           for r in pipeline.lm_perplexity_buckets(
               docs, target).collect()}
    assert len(got) == len(LM_ROWS)
    # twin: same scores, value-based cutoffs at exact percentiles
    # (numpy 'linear' == Spark percentile == DuckDB quantile_cont)
    import numpy as np
    exp = _lm_brute(LM_ROWS, {1, 2})
    scores = np.array([v[1] for v in exp.values()])
    c1, c2 = np.percentile(scores, [100 / 3, 200 / 3])
    for d, (n_tok, sc) in exp.items():
        want = ("head" if sc <= c1 else
                "middle" if sc <= c2 else "tail")
        assert got[d] == (n_tok, sc, want), d
    # the two target docs are the most target-like -> head
    assert got[1][2] == "head" and got[2][2] == "head"
    # OOV-heavy doc lands in the tail
    assert got[6][2] == "tail"


def test_lm_buckets_by_lang(spark):
    """Per-language terciles: each language is cut against its own
    score distribution (CCNet's actual shape)."""
    rows = [(d, t, "en" if d <= 4 else "de") for d, t in LM_ROWS]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    target = docs.where("doc_id in (1, 2)")
    got = {r["doc_id"]: (r["n_tok"], r["lm_score"], r["lang"],
                         r["bucket"])
           for r in pipeline.lm_perplexity_buckets(
               docs, target, by="lang").collect()}
    assert len(got) == len(LM_ROWS)
    import numpy as np
    exp = _lm_brute(LM_ROWS, {1, 2})
    for lang in ("en", "de"):
        ids = [d for d, _, la in rows if la == lang]
        sc = np.array([exp[d][1] for d in ids])
        c1, c2 = np.percentile(sc, [100 / 3, 200 / 3])
        for d in ids:
            want = ("head" if exp[d][1] <= c1 else
                    "middle" if exp[d][1] <= c2 else "tail")
            assert got[d] == (exp[d][0], exp[d][1], lang, want), d
    # every language has a head doc under its own cutoffs
    assert any(v[3] == "head" and v[2] == "de" for v in got.values())


# ---- training-mix assembly -------------------------------------------


def _mix_docs(spark):
    rows = []
    for i in range(10):
        rows.append((100 + i, "A", "tok " * 100))
    for i in range(10):
        rows.append((200 + i, "B", "tok " * 30))
    for i in range(5):
        rows.append((300 + i, "C", "tok " * 20))
    return rows, spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def test_mix_rates_and_sample(spark):
    rows, docs = _mix_docs(spark)
    mix = {"A": 1 / 3, "B": 1 / 3, "C": 1 / 3}
    rates = pipeline.mix_rates(docs, mix)
    # totals: A=1000, B=300, C=100 -> budget = min(t/f) = 300
    # -> per-source target 100 tokens
    assert abs(rates["A"] - 0.1) < 1e-12
    assert abs(rates["B"] - 1 / 3) < 1e-12
    assert rates["C"] == 1.0  # never oversample
    got = sorted(r["doc_id"] for r in
                 pipeline.sample_to_mix(docs, mix).collect())
    import hashlib
    def fr(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8],
                   16) / 2 ** 32
    want = sorted(d for d, s, _ in rows if fr(d) < rates[s])
    assert got == want
    # all of the scarcest source is kept
    assert all(300 + i in got for i in range(5))
    # an explicit smaller budget halves every rate
    r2 = pipeline.mix_rates(docs, mix, budget=150)
    for s in rates:
        assert abs(r2[s] - min(1.0, rates[s] / 2)) < 1e-12


def test_mix_validation(spark):
    _rows, docs = _mix_docs(spark)
    with pytest.raises(ValueError, match="sum to 1"):
        pipeline.mix_rates(docs, {"A": 0.5, "B": 0.2})
    # sources absent from the mix are dropped entirely
    sel = pipeline.sample_to_mix(docs, {"A": 0.5, "B": 0.5})
    assert sel.where("source = 'C'").count() == 0


def test_lm_buckets_partitioning_invariant(spark, small_docs):
    target = small_docs.where("doc_id % 11 = 0")
    a = sorted(tuple(r) for r in pipeline.lm_perplexity_buckets(
        small_docs, target, min_count=2).collect())
    b = sorted(tuple(r) for r in pipeline.lm_perplexity_buckets(
        small_docs.repartition(13), target.repartition(3),
        min_count=2).collect())
    assert a == b


# ---- C4 page cleaning rules ------------------------------------------


def _c4_brute(rows, min_words=5, min_sent=3):
    import re
    out = {}
    for did, t in rows:
        if "{" in t or "lorem ipsum" in t.lower():
            continue
        lines = [l.strip() for l in t.split("\n") if l.strip()]
        kept = [l for l in lines
                if re.search(r'[.!?"]$', l)
                and len(re.split(r"\s+", l)) >= min_words
                and not re.search(r"(?i)\bjavascript\b", l)]
        clean = "\n".join(kept)
        n_sent = sum(c in ".!?" for c in clean)
        if n_sent >= min_sent:
            out[did] = (len(lines), len(kept), n_sent, clean)
    return out


C4_ROWS = [
    (1, 'A good long sentence with many words here.\n'
        'Another fine sentence that also ends well!\n'
        'And a third one, asking a question perhaps?'),
    (2, 'too short.\nno terminal punctuation on this long line\n'
        'This line mentions JavaScript libraries all over it.\n'
        'Only one good surviving sentence lives right here.'),
    (3, 'Curly brace page with code { return 0; }\n'
        'Great sentences do not save this page at all.'),
    (4, 'Lorem Ipsum dolor sit amet is placeholder filler.\n'
        'Great sentences do not save this page either way.'),
    (5, ''),
    (6, 'One single sentence, even a long one, is not enough. '
        'Unless it has multiple sentence ends! See?'),  # one LINE, 3 ends
    (7, 'Ends with a quoted phrase "like this one does."\n'
        'Second line is also quite long and ends properly.\n'
        'Third keeps the page over the sentence minimum.'),
]


def test_c4_clean_brute_force(spark):
    docs = spark.createDataFrame(C4_ROWS, "doc_id long, text string")
    exp = _c4_brute(C4_ROWS)
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["n_sent"],
                         r["text_clean"])
           for r in pipeline.c4_clean(docs).collect()}
    assert got == exp
    # page semantics: 1 survives whole; 2 loses 3 lines but dies on
    # the <3-sentence rule; 3 curly, 4 lorem, 5 empty all dropped;
    # 6 survives on ONE line carrying 3 sentence ends; 7 survives
    assert set(got) == {1, 6, 7}
    assert got[1][1] == 3 and got[6][1] == 1


def test_c4_clean_map_side_plan(spark):
    docs = spark.createDataFrame(C4_ROWS, "doc_id long, text string")
    plan = pipeline.c4_clean(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure projection


# ---- Gopher A1 quality rules -----------------------------------------


def _gopher_brute(rows):
    import re
    out = {}
    for did, t in rows:
        words = [w for w in re.split(r"\s+", t) if w]
        lines = [l.strip() for l in t.split("\n") if l.strip()]
        toks = {w.lower()
                for w in re.split(r"[^a-zA-Z0-9]+", t) if w}
        nw, nl = len(words), len(lines)
        wdiv, ldiv = max(nw, 1), max(nl, 1)
        mean_wl = round(sum(map(len, words)) / wdiv, 6)
        hr = round(t.count("#") / wdiv, 6)
        er = round(len(re.findall(r"(\.\.\.|…)", t)) / wdiv, 6)
        bf = round(sum(bool(re.match(r"^[•\-\*]", l))
                       for l in lines) / ldiv, 6)
        ef = round(sum(bool(re.search(r"(\.\.\.|…)$", l))
                       for l in lines) / ldiv, 6)
        af = round(sum(bool(re.search("[A-Za-z]", w))
                       for w in words) / wdiv, 6)
        sh = sum(s in toks for s in textstats.GOPHER_STOPWORDS)
        keep = int(50 <= nw <= 100_000 and 3 <= mean_wl <= 10
                   and hr <= 0.1 and er <= 0.1 and bf <= 0.9
                   and ef <= 0.3 and af >= 0.8 and sh >= 2)
        out[did] = (nw, mean_wl, hr, er, bf, ef, af, sh, keep)
    return out


GOOD_PAGE = ("The quick brown fox jumps over the lazy dog today. "
             * 8 + "\nIt would have been fine to be here with all "
             "of that and more words of text.")
GOPHER_ROWS = [
    (1, GOOD_PAGE),
    (2, "short page."),                              # word count
    (3, "# " * 60 + "the be of and have with that"),  # hash ratio
    (4, "\n".join("• bullet line item" for _ in range(19))
        + "\nthe be of and that have words more here today"),  # bullets 19/20
    (5, ("a sentence trailing off... \n" * 9)
        + "the be of and have words " * 10),          # ellipsis lines
    (6, "12345 67890 " * 30 + "the be of and"),       # alpha frac
    (7, ("zz " * 60).strip()),                        # no stopwords
    (8, ""),                                          # empty
    (9, GOOD_PAGE + " And so on… with a bit more."),  # mid-line … ok
]


def test_gopher_stats_brute_force(spark):
    docs = spark.createDataFrame(GOPHER_ROWS,
                                 "doc_id long, text string")
    exp = _gopher_brute(GOPHER_ROWS)
    got = {r["doc_id"]: (r["n_words"], r["mean_word_len"],
                         r["hash_ratio"], r["ellipsis_ratio"],
                         r["bullet_line_frac"],
                         r["ellipsis_line_frac"],
                         r["alpha_word_frac"], r["stop_hits"],
                         r["keep"])
           for r in textstats.gopher_quality_stats(docs).collect()}
    assert got == exp
    assert got[1][-1] == 1 and got[9][-1] == 1
    assert all(got[i][-1] == 0 for i in (2, 3, 4, 5, 6, 7, 8))


def test_gopher_filter_semi_join(spark):
    docs = spark.createDataFrame(GOPHER_ROWS,
                                 "doc_id long, text string")
    kept = sorted(r["doc_id"]
                  for r in textstats.gopher_filter(docs).collect())
    assert kept == [1, 9]


def test_gopher_stats_map_side_plan(spark):
    docs = spark.createDataFrame(GOPHER_ROWS,
                                 "doc_id long, text string")
    plan = textstats.gopher_quality_stats(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_keep_col_equals_stats_gate(spark):
    """The one-expression streamable predicate == the stats table's
    keep column (shared feature/threshold exprs must not drift)."""
    docs = spark.createDataFrame(GOPHER_ROWS + C4_ROWS,
                                 "doc_id long, text string")
    via_stats = sorted(
        r["doc_id"] for r in textstats.gopher_quality_stats(docs)
        .where("keep = 1").collect())
    via_pred = sorted(
        r["doc_id"]
        for r in docs.where(textstats.gopher_keep_col()).collect())
    assert via_stats == via_pred


def test_dsir_weights_single_corpus_scan_plan(spark):
    """dsir_weights must serve the ratio table's raw-side counts
    from the SAME shuffle as the scoring join (ReusedExchange), so
    the corpus text is scanned once — checked with AQE off (the
    static planner's ReuseExchange; AQE applies the same
    canonicalized-stage reuse at runtime).  A plain parquet source
    (no cache/limit wrappers) so subplan canonicalization is
    exercised on the production read path."""
    import re
    docs = (spark.read
            .parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        target = docs.where("doc_id % 11 = 0")
        plan = (pipeline.dsir_weights(docs, target, 256)
                ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert plan.count("ReusedExchange") >= 3
    # one text-bearing scan of raw + one of target — never more
    scans = len(re.findall(
        r"ReadSchema: struct<doc_id:bigint,text:string>", plan))
    assert scans == 2


# ---- Gopher A1.1 n-gram repetition table -----------------------------


def _rep_brute(rows):
    import re
    from collections import Counter

    def toks(t):
        return [w.lower() for w in re.split(r"[^a-zA-Z0-9]+", t) if w]

    out = {}
    for did, t in rows:
        ts = toks(t)
        tot = max(sum(map(len, ts)), 1)
        feats = []
        for n in (2, 3, 4):
            grams = [" ".join(ts[i:i + n])
                     for i in range(len(ts) - n + 1)]
            if grams:
                cnt = Counter(grams)
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                chars = best[1] * (len(best[0]) - (n - 1))
            else:
                chars = 0
            feats.append(round(chars / tot, 6))
        for n in (5, 6, 7, 8, 9, 10):
            grams = [" ".join(ts[i:i + n])
                     for i in range(len(ts) - n + 1)]
            cnt = Counter(grams)
            dup = {g for g, c in cnt.items() if c >= 2}
            cov = 0
            for ti in range(len(ts)):
                starts = range(max(0, ti - n + 1),
                               min(ti, len(grams) - 1) + 1)
                if any(grams[i] in dup for i in starts):
                    cov += len(ts[ti])
            feats.append(round(cov / tot, 6))
        thr = list(textstats.GOPHER_TOP_NGRAM_MAX.values()) \
            + list(textstats.GOPHER_DUP_NGRAM_MAX.values())
        keep = int(all(f <= m for f, m in zip(feats, thr)))
        out[did] = tuple(feats) + (keep,)
    return out


REP_ROWS = [
    (1, "the quick brown fox jumps over one lazy dog near a river "
        "bank while birds sing songs above tall green trees today "
        "and children play games beside old wooden fences watching "
        "clouds drift slowly across bright blue skies until evening "
        "brings cool winds that carry distant church bells ringing "
        "softly through quiet valley towns where lanterns glow"),
    (2, "spam eggs spam eggs spam eggs spam eggs spam eggs"),  # top-2
    (3, ("one two three four five six seven eight nine ten " * 3)
        .strip()),                                   # dup 5..10-grams
    (4, "alpha beta gamma"),                         # shorter than 5
    (5, ""),                                         # empty
    (6, "x y x y z " * 2 + "unique tail words here now"),
]


def test_gopher_repetition_brute_force(spark):
    docs = spark.createDataFrame(REP_ROWS, "doc_id long, text string")
    exp = _rep_brute(REP_ROWS)
    res = textstats.gopher_repetition_stats(docs).collect()
    names = ([f"top{n}gram_char_frac" for n in (2, 3, 4)]
             + [f"dup{n}gram_char_frac" for n in range(5, 11)]
             + ["rep_keep"])
    got = {r["doc_id"]: tuple(r[c] for c in names) for r in res}
    assert got == exp
    # semantics: long clean prose passes, loops fail, empty passes;
    # a 3-word doc FAILS on top-gram fractions (one gram covers most
    # of its chars — faithful to the formula; in the full pipeline
    # Gopher's >=50-word rule screens such docs first)
    assert got[1][-1] == 1 and got[5][-1] == 1
    assert got[2][-1] == 0 and got[3][-1] == 0 and got[4][-1] == 0


def test_gopher_repetition_filter_and_plan(spark):
    docs = spark.createDataFrame(REP_ROWS, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  textstats.gopher_repetition_filter(docs).collect())
    exp = sorted(d for d, v in _rep_brute(REP_ROWS).items()
                 if v[-1] == 1)
    assert kept == exp
    plan = textstats.gopher_repetition_stats(docs)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # the filter variant is map-side too: zero Exchange, no join,
    # output schema exactly the input schema
    filt = textstats.gopher_repetition_filter(docs)
    fplan = filt._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in fplan
    assert "Join" not in fplan
    assert filt.columns == docs.columns


def test_dup_cov_kernel_equals_catalyst_reference(spark):
    """The Arrow dup-coverage kernel == the pure-Catalyst fold
    column for every n, including repetitive/short/empty docs."""
    from pyspark.sql import functions as F

    from rechercheinfoweb_spark.operators.textstats import (
        _dup_gram_cov_chars_col, lower_tokens_col, ngrams_of_tokens,
    )
    docs = spark.createDataFrame(REP_ROWS + GOPHER_ROWS,
                                 "doc_id long, text string")
    toked = docs.select("doc_id", lower_tokens_col().alias("_toks"))
    toks = F.col("_toks")
    ns = (5, 6, 7, 8, 9, 10)
    kern = textstats._dup_cov_kernel(ns)
    got = {r["doc_id"]: list(r["cov"]) for r in
           toked.select("doc_id", kern("_toks").alias("cov"))
           .collect()}
    ref_cols = [
        _dup_gram_cov_chars_col(toks, ngrams_of_tokens(toks, n), n)
        .alias(f"c{n}") for n in ns]
    want = {r["doc_id"]: [r[f"c{n}"] for n in ns]
            for r in toked.select("doc_id", *ref_cols).collect()}
    assert got == want


def test_gopher_rep_kernel_equals_references(spark):
    """The unified one-pass kernel (r4: one factorization, all nine
    numerators) == the per-n reference implementations — the JVM
    top-gram sorted-run fold and the first-generation dup-coverage
    kernel — on adversarial random docs from a tiny vocabulary
    (forcing repeats, ties, and tie-broken tied counts)."""
    import random

    from pyspark.sql import functions as F

    from rechercheinfoweb_spark.operators.textstats import (
        _top_gram_chars_col, lower_tokens_col, ngrams_of_tokens,
    )

    rng = random.Random(42)
    vocab = ["a", "b", "ab", "ba", "aa", "longword", "x9"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 40))))
            for i in range(60)]
    rows += [(100 + i, t) for i, (_d, t) in enumerate(REP_ROWS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    toked = docs.select("doc_id", lower_tokens_col().alias("_toks"))
    toks = F.col("_toks")
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    kern = textstats._gopher_rep_kernel(top_ns, dup_ns)
    # element 1 is the total-token-chars denominator; the numerators
    # follow in declaration order
    got = {r["doc_id"]: list(r["rep"])[1:] for r in
           docs.select("doc_id", kern("text").alias("rep"))
           .collect()}
    got_tot = {r["doc_id"]: list(r["rep"])[0] for r in
               docs.select("doc_id", kern("text").alias("rep"))
               .collect()}

    ref_cols = [
        _top_gram_chars_col(ngrams_of_tokens(toks, n), n)
        .alias(f"t{n}") for n in top_ns]
    dup_kern = textstats._dup_cov_kernel(dup_ns)
    ref = toked.select(
        "doc_id", *ref_cols, dup_kern("_toks").alias("cov"),
        textstats._tok_chars_col(toks).alias("tot")).collect()
    want = {r["doc_id"]: [r[f"t{n}"] for n in top_ns] + list(r["cov"])
            for r in ref}
    assert got == want
    assert got_tot == {r["doc_id"]: r["tot"] for r in ref}


def test_badwords_brute_force_and_plan(spark):
    """badwords_stats/filter == pure-Python twin (lowercase, strip
    edge punctuation, any-hit drops the page); the plan is one
    map-side projection (zero Exchange)."""
    import re

    import pytest

    rows = [
        (1, "Clean prose with nothing flagged at all"),
        (2, "the BadWord appears here"),
        (3, 'punctuated "badword!" still matches'),
        (4, "embedded notbadword does not match"),
        (5, ""),
        (6, "badword badword twice, and Other."),
    ]
    bl = ["badword", "other"]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def strip(w):
        return re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", w.lower())

    exp = {}
    for did, t in rows:
        ws = [strip(w) for w in re.split(r"\s+", t.strip())]
        hits = sum(1 for w in ws if w in bl)
        exp[did] = (hits, int(hits == 0))
    got = {r["doc_id"]: (r["bad_hits"], r["bad_keep"]) for r in
           pipeline.badwords_stats(docs, bl).collect()}
    assert got == exp
    kept = sorted(r["doc_id"] for r in
                  pipeline.badwords_filter(docs, bl).collect())
    assert kept == sorted(d for d, (h, k) in exp.items() if k == 1)
    plan = pipeline.badwords_stats(docs, bl)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="non-empty"):
        pipeline.badwords_filter(docs, [])


def test_url_filter_brute_force_and_plan(spark):
    """url_filter_stats/url_filter == pure-Python twin: host
    extraction (scheme or schemeless, www. strip), dot-boundary
    domain suffix blocking, substring word hits; plan is one
    map-side projection (zero Exchange)."""
    import re

    rows = [
        (1, "https://ads.example.com/page"),        # subdomain block
        (2, "https://example.com/x"),               # exact block
        (3, "https://notexample.com/x"),            # NOT a suffix hit
        (4, "http://www.good.org/casino-night"),    # banned word
        (5, "good.org/fine"),                       # schemeless, clean
        (6, "HTTPS://Example.COM:443/x"),           # case + port kept in host
        (7, "https://ok.net/a?q=CASINO"),           # banned word, upper
    ]
    blocked, banned = ["example.com"], ["casino"]
    pages = spark.createDataFrame(rows, "doc_id long, url string")

    def twin(url):
        u = url.strip().lower()
        m = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", u)
        host = m.group(1) if m else re.match("^([^/]+)", u).group(1)
        host = re.sub(r"^www\.", "", host)
        dom = any(host == d or host.endswith("." + d) for d in blocked)
        hits = sum(1 for w in banned if w in u)
        return host, int(dom), hits, int(not dom and hits == 0)

    exp = {did: twin(u) for did, u in rows}
    got = {r["doc_id"]: (r["host"], r["domain_blocked"],
                         r["url_word_hits"], r["url_keep"])
           for r in pipeline.url_filter_stats(
               pages, blocked, banned).collect()}
    assert got == exp
    kept = sorted(r["doc_id"] for r in
                  pipeline.url_filter(pages, blocked, banned).collect())
    assert kept == sorted(d for d, v in exp.items() if v[3] == 1)
    # doc 6: ':443' stays in host (this is the raw-gate, not the
    # canonicalizer) so the exact-match rule does NOT fire
    assert got[6][1] == 0
    plan = pipeline.url_filter_stats(pages, blocked, banned)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # empty lists: everything keeps
    assert pipeline.url_filter(pages).count() == len(rows)


def test_quality_quantile_filter_approximate(spark):
    """The approximate=True path (the 100 TB shape: per-stratum
    percentile_approx cut broadcast back, map-side gate, no window
    sort) keeps a TOP SEGMENT by quality in every stratum: no
    dropped doc outscores a kept one, every doc strictly above the
    cut that the exact gate keeps is kept here too, ties at the cut
    all pass, and null-text docs never pass."""
    rows = []
    for i in range(1, 21):
        # two strata, quality increases with word count
        rows.append((i, "web" if i % 2 else "books",
                     "the of and is a " + "word " * i))
    rows.append((99, "web", None))  # null text
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    exact = pipeline.quality_quantile_filter(
        docs, keep_frac=0.4)
    approx = pipeline.quality_quantile_filter(
        docs, keep_frac=0.4, approximate=True)
    ex = {(r["source"], r["doc_id"]): r["quality"]
          for r in exact.collect()}
    ap = {(r["source"], r["doc_id"]): r["quality"]
          for r in approx.collect()}
    assert all(k[1] != 99 for k in ap)            # null never kept
    for src in ("web", "books"):
        kept_q = [q for (s, _), q in ap.items() if s == src]
        dropped_q = [r["quality"] for r in
                     pipeline.doc_stats(docs).join(
                         docs.select("doc_id", "source"), "doc_id")
                     .collect()
                     if r["source"] == src and r["quality"] is not None
                     and (src, r["doc_id"]) not in ap]
        if kept_q and dropped_q:                  # top segment
            assert min(kept_q) >= max(dropped_q)
    # exact keeps strictly-above-cut docs that approx must also keep
    for src in ("web", "books"):
        cut = min(q for (s, _), q in ap.items() if s == src)
        for (s, d), q in ex.items():
            if s == src and q > cut:
                assert (s, d) in ap, (s, d, q, cut)
    # tie case: identical text -> identical quality -> ALL pass
    tied = spark.createDataFrame(
        [(i, "web", "same words here the of and") for i in range(8)],
        "doc_id long, source string, text string")
    kept = pipeline.quality_quantile_filter(
        tied, keep_frac=0.25, approximate=True)
    assert kept.count() == 8


def test_lm_buckets_approximate(spark):
    """approximate=True (the 100 TB shape: percentile_approx
    cutoffs, sketch-sized reducer state) keeps the value-based
    bucket contract: every doc labeled, buckets ordered by score
    (max head score <= min middle <= min tail), cutoffs are REAL
    score values so head is non-empty, and the per-language variant
    still cuts each stratum independently."""
    docs = spark.createDataFrame(LM_ROWS, "doc_id long, text string")
    target = docs.where("doc_id in (1, 2)")
    got = {r["doc_id"]: (r["lm_score"], r["bucket"])
           for r in pipeline.lm_perplexity_buckets(
               docs, target, approximate=True).collect()}
    assert len(got) == len(LM_ROWS)
    by_bucket = {b: [s for s, bb in got.values() if bb == b]
                 for b in ("head", "middle", "tail")}
    assert by_bucket["head"]
    if by_bucket["middle"]:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if by_bucket["tail"]:
        prev = (by_bucket["middle"] or by_bucket["head"])
        assert max(prev) <= min(by_bucket["tail"])
    # target docs stay most-target-like
    assert got[1][1] == "head" and got[2][1] == "head"
    rows = [(d, t, "en" if d <= 4 else "de") for d, t in LM_ROWS]
    docs2 = spark.createDataFrame(
        rows, "doc_id long, text string, lang string")
    got2 = {r["doc_id"]: (r["lang"], r["lm_score"], r["bucket"])
            for r in pipeline.lm_perplexity_buckets(
                docs2, target, by="lang", approximate=True).collect()}
    assert len(got2) == len(LM_ROWS)
    for lang in ("en", "de"):
        hb = [s for la, s, b in got2.values()
              if la == lang and b == "head"]
        rest = [s for la, s, b in got2.values()
                if la == lang and b != "head"]
        assert hb                                  # per-stratum head
        if rest:
            assert max(hb) <= min(rest)
