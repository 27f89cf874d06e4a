"""Dedup operator tests: simhash chunk-blocking must have EXACT
recall at any radius (the round-1 4-chunk split silently missed
pairs for radius > 3), and the LSH hot-bucket guard must drop only
degenerate buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rechercheinfoweb_spark.operators import dedup


@pytest.fixture(scope="module")
def small_docs(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(120).persist())


@pytest.mark.parametrize("radius", [3, 6])
def test_simhash_blocking_exact_recall(spark, small_docs, radius):
    """Blocked candidate generation == brute-force hamming pairs."""
    sims = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(small_docs).collect()}
    ids = sorted(sims)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            <= radius}
    got = {(r["doc_a"], r["doc_b"]) for r in
           dedup.simhash_near_pairs(small_docs, radius=radius).collect()}
    assert got == want


def test_chunk_bounds_cover_64_bits():
    for n in (1, 2, 4, 7, 13, 64):
        bounds = dedup._chunk_bounds(n)
        assert len(bounds) == n
        assert sum(w for _, w in bounds) == 64
        pos = 0
        for shift, width in bounds:
            assert shift == pos and width >= 1
            pos += width


def test_minhash_max_bucket_guard(spark):
    """A degenerate corpus (many identical docs) must not explode:
    with a tight cap the hot bucket is dropped; pairs from
    discriminative buckets survive."""
    rows = ([(i, "the same boilerplate text again and again")
             for i in range(40)]
            + [(100, "a unique document about spark internals"),
               (101, "a unique document about spark internals")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(docs, max_bucket=None).count()
    capped = dedup.minhash_lsh_pairs(docs, max_bucket=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # the 40-doc boilerplate clique (780 pairs) is gone...
    assert uncapped >= 780
    assert all(a >= 100 for a, _ in got)
    # ...but the small near-dup pair is still found
    assert (100, 101) in got


def test_dup_ngram_span_stats_brute_force(spark, small_docs):
    """Interval-merge coverage == naive position-set expansion, on
    real corpus text plus crafted overlap/self-repeat/short docs."""
    n = 3
    crafted = spark.createDataFrame(
        [(900001, "a b c x y z"),          # cross-doc dup with next
         (900002, "q a b c r s"),
         (900003, "p q r p q r p q r"),    # self-repeating template
         (900004, "totally fresh words appear once"),
         (900005, "hi there")],            # shorter than one n-gram
        "doc_id long, text string")
    docs = small_docs.unionByName(crafted)

    # brute force in python over the SQL-portable tokenizer
    import re
    toks = {r["doc_id"]:
            [t.lower() for t in re.split(r"[^a-zA-Z0-9]+", r["text"])
             if t]
            for r in docs.collect()}
    grams: dict[int, list[str]] = {
        d: [" ".join(t[i:i + n]) for i in range(len(t) - n + 1)]
        for d, t in toks.items()}
    from collections import Counter
    occ = Counter(g for gs in grams.values() for g in gs)
    want = {}
    for d, t in toks.items():
        covered: set[int] = set()
        dup_positions = [i for i, g in enumerate(grams[d])
                         if occ[g] >= 2]
        for i in dup_positions:
            covered.update(range(i, i + n))
        frac = round(len(covered) / max(len(t), 1), 6)
        want[d] = (len(t), len(dup_positions), len(covered), frac)

    got = {r["doc_id"]: (r["n_tokens"], r["dup_grams"],
                         r["covered_tokens"], r["dup_span_frac"])
           for r in dedup.dup_ngram_span_stats(docs, n=n).collect()}
    assert got == want
    # the crafted cases hit every branch: cross-doc dup, full
    # coverage via overlapping intervals, zero-dup, sub-n-gram doc
    assert got[900003] == (9, 7, 9, 1.0)
    assert got[900005] == (2, 0, 0, 0.0)


def test_remove_dup_spans_brute_force(spark, small_docs):
    """remove_dup_spans == pure-Python 'remove all but the first
    occurrence' twin, on real corpus text plus crafted cases."""
    n = 3
    crafted = spark.createDataFrame(
        [(900001, "a b c x y z"),          # first occurrence: kept
         (900002, "q a b c r s"),          # later occurrence: cut
         (900003, "p q r p q r p q r"),    # self-repeat: first kept
         (900004, "totally fresh words appear once"),
         (900005, "hi there"),             # shorter than one n-gram
         (900006, "")],                    # empty doc
        "doc_id long, text string")
    docs = small_docs.unionByName(crafted)

    import re
    from collections import defaultdict
    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    toks = {d: [t for t in re.split(r"[^a-zA-Z0-9]+", t) if t]
            for d, t in rows}
    occ = defaultdict(list)
    for d in sorted(toks):
        low = [t.lower() for t in toks[d]]
        for p in range(len(low) - n + 1):
            occ[tuple(low[p:p + n])].append((d, p))
    starts = defaultdict(set)
    for lst in occ.values():
        if len(lst) >= 2:
            for d, p in lst[1:]:  # built in (doc_id, pos) order
                starts[d].add(p)
    want = {}
    for d, ts in toks.items():
        cov = set()
        for s in starts.get(d, ()):
            cov.update(range(s, s + n))
        kept = [w for i, w in enumerate(ts) if i not in cov]
        want[d] = (len(ts), len(kept), " ".join(kept))

    got = {r["doc_id"]: (r["n_tokens"], r["kept_tokens"],
                         r["clean_text"])
           for r in dedup.remove_dup_spans(docs, n=n).collect()}
    assert got == want
    # first occurrence of the cross-doc gram survives, the later is cut
    assert got[900001][2] == "a b c x y z"
    assert "a b c" not in got[900002][2]
    # self-repeating template keeps exactly its first copy
    assert got[900003] == (9, 3, "p q r")
    # clean docs pass through byte-identical
    assert got[900004][2] == "totally fresh words appear once"
    assert got[900005] == (2, 2, "hi there")
    assert got[900006] == (0, 0, "")


def test_remove_dup_spans_partitioning_invariant(spark, small_docs):
    a = sorted(tuple(r) for r in
               dedup.remove_dup_spans(small_docs, n=5).collect())
    b = sorted(tuple(r) for r in
               dedup.remove_dup_spans(
                   small_docs.repartition(13), n=5).collect())
    assert a == b


# ---- incremental cross-batch dedup --------------------------------


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_incremental_pairs_equal_full_selfjoin_filtered(
        spark, small_docs, tmp_path):
    """Store+broadcast-probe == minhash_lsh_pairs(store ∪ batch)
    restricted to pairs with ≥1 batch member — the operator's
    defining identity, uncapped and with the hot-bucket guard."""
    store_docs = small_docs.where(F.col("doc_id") % 4 != 0)
    batch_docs = small_docs.where(F.col("doc_id") % 4 == 0)
    store = str(tmp_path / "sigstore")
    dedup.write_signature_store(spark, store_docs, store)

    for cap in (None, 3):
        full = _pairs(dedup.minhash_lsh_pairs(small_docs,
                                              max_bucket=cap))
        want = {(a, b) for a, b in full if a % 4 == 0 or b % 4 == 0}
        got = _pairs(dedup.incremental_lsh_pairs(
            spark, batch_docs, store, max_bucket=cap))
        assert got == want, f"cap={cap}"
        # and the batch genuinely pairs with STORE docs, not just
        # itself (otherwise the test proves nothing)
        if cap is None:
            assert any(a % 4 != 0 or b % 4 != 0 for a, b in got)


def test_incremental_store_append_grows_coverage(spark, tmp_path):
    """Day-2 batch appended to the store pairs with day-1 docs on a
    later probe; probe results never mutate the store."""
    day0 = spark.createDataFrame(
        [(1, "spark shuffle partitions and broadcast joins at scale"),
         (2, "an unrelated page about gardening tulips in spring")],
        "doc_id long, text string")
    day1 = spark.createDataFrame(
        [(10, "spark shuffle partitions and broadcast joins at scale")],
        "doc_id long, text string")
    day2 = spark.createDataFrame(
        [(20, "spark shuffle partitions and broadcast joins at scale"),
         (21, "an unrelated page about gardening tulips in spring")],
        "doc_id long, text string")
    store = str(tmp_path / "store")
    dedup.write_signature_store(spark, day0, store)

    got1 = _pairs(dedup.incremental_lsh_pairs(spark, day1, store))
    assert got1 == {(1, 10)}
    dedup.write_signature_store(spark, day1, store, append=True)

    got2 = _pairs(dedup.incremental_lsh_pairs(spark, day2, store))
    assert got2 == {(1, 20), (10, 20), (2, 21)}


def test_incremental_probe_broadcasts_batch_only(spark, small_docs,
                                                 tmp_path):
    """The probe plan broadcasts the BATCH band rows; the store scan
    is never the build side of a broadcast (an unbounded store
    broadcast would OOM executors at 100 TB)."""
    store = str(tmp_path / "sigstore")
    dedup.write_signature_store(
        spark, small_docs.where(F.col("doc_id") % 4 != 0), store)
    # max_bucket=None isolates the probe join: the ONLY broadcast in
    # the plan must be the batch band rows (the guard's hot-list
    # broadcast legitimately reads the store, but it is an
    # aggregated, cap-bounded relation)
    plan = (dedup.incremental_lsh_pairs(
        spark, small_docs.where(F.col("doc_id") % 4 == 0), store,
        max_bucket=None)
        ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan

    # the store scan is the one FileScan whose ReadSchema carries
    # band_hash (paths are truncated in plan strings; the batch side
    # scans documents.parquet and derives its band rows)
    def is_store_scan(line: str) -> bool:
        return "FileScan" in line and "band_hash" in line

    lines = plan.splitlines()
    assert any(is_store_scan(ln) for ln in lines)  # it IS scanned...

    def indent(line: str) -> int:
        return len(line) - len(line.lstrip(" :+-*(0123456789)"))

    for i, line in enumerate(lines):  # ...but never under a broadcast
        if "BroadcastExchange" not in line:
            continue
        d = indent(line)
        j = i + 1
        while j < len(lines) and indent(lines[j]) > d:
            assert not is_store_scan(lines[j]), lines[j]
            j += 1


def test_remove_dup_spans_rejects_noop_min_count(spark, small_docs):
    """min_count < 2 cannot change the output (first occurrences are
    always kept) — rejected loudly instead of silently acting as 2."""
    import pytest

    with pytest.raises(ValueError, match="min_count"):
        dedup.remove_dup_spans(small_docs, n=4, min_count=1)
