"""Positional sidecar index + phrase queries.

The reference engine has no phrase operator — its query splitter
keeps only letters and digits (vector_query.go:14-16), so a quoted
phrase cannot even be expressed — and layout v4 postings
deliberately store no positions (weights are recomputed from
(tf, dl) varints).  Phrase search at web scale needs positions
*somewhere*: verifying phrases by re-fetching and re-tokenizing
candidate documents is O(candidate text) per query, which for a
two-hot-word phrase over a 10^12-doc corpus means reading terabytes
of text.  The classic answer (Lucene's positional postings) is a
positions plane keyed exactly like the postings.  This module
builds it as an independent SIDECAR table so the v4 postings layout
— and every byte pinned by its codec/resume tests — is untouched,
and indexes that never serve phrase queries never pay for positions
(they dominate any positional index: one varint per surviving token
occurrence, i.e. roughly the token stream itself).

Layout: parquet partitioned by ``bucket`` (same ``term_bucket``
hash as the postings, so a phrase lookup prunes partitions
identically) and ``salt`` (doc-id range shard, like the postings'
chunk salt).  One row per (term, salt):

* ``doc_bytes`` — doc ids, delta + varint (first absolute);
* ``cnt_bytes`` — per-doc position counts, varint;
* ``pos_bytes`` — per-doc positions, delta + varint (first of each
  doc absolute), concatenated in doc order.

Positions are indices into the RAW token stream (pre stopword /
len<3 filter), so in engine-tokenizer mode a dropped stopword still
advances the position counter: "state of the art" does NOT phrase-
match "state art" even though "of"/"the" have no postings of their
own — the same convention as Lucene's position-increment-on-removal.

Scale shape: the build is one map pass over the corpus (positions
delta+varint-encoded INSIDE the tokenize kernel, so the single wide
exchange moves compact bytes, not int64 position lists) into a
(bucket, salt)-grouped Arrow pack — the postings build's proven
shape.  Query evaluation is per-salt (disjoint doc-id ranges), so
position data never shuffles at query time; per-shard work is
O(postings of the rarest-pruned phrase terms).
"""

from __future__ import annotations

import json
import os
import re

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import codec
from ..functions.tokenizer import (
    STOPWORDS, make_index_token_mapper, raw_tokens,
)
from .index_build import _KERNEL_DOC_SLICE, term_bucket

# SQL-portable tokenizer (textstats.SQL_TOKEN_SPLIT twin): phrase
# semantics under this mode are expressible in ANSI SQL, which is
# what the driver's DuckDB oracle checks.
_SQL_SPLIT_RE = re.compile("[^a-zA-Z0-9]+")

POSITIONS_META = "positions_meta.json"


def _positions_kernel(tokenizer: str, stopwords: frozenset[str],
                      stem: bool):
    """mapInPandas kernel: (doc_id, text) → one row per (doc, term)
    with that doc's positions already delta+varint packed.

    Vectorized like the postings build's tokenize kernel
    (index_build._batch_token_stats): per doc-slice, the split is one
    C pass per doc, term resolution is ONE factorize over the flat
    raw-token stream with the Python stop/len/stem chain run only per
    UNIQUE raw token (worker-lifetime memo, Zipf hit rate ~100%), raw
    positions fall out of arange arithmetic, and the varint encode is
    ONE `encode_varints_ex` over the slice's whole kept-position
    stream, sliced per (doc, term) group by byte offsets.  Replaces a
    per-doc/per-token Python loop that ran ~5x slower at sf0.1."""
    if tokenizer == "engine":
        mapped = make_index_token_mapper(stopwords, stem)

        def split(text):
            return raw_tokens(text or "")

        def map_one(tok):
            r = mapped([tok])
            return r[0] if r else None
    elif tokenizer == "sql":
        def split(text):
            return [t for t in _SQL_SPLIT_RE.split(text or "") if t]

        map_one = None  # identity: every raw token is kept as-is
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")

    def _slice(doc_ids, texts):
        import pandas as pd
        raws = [split(t) for t in texts]
        ndocs = len(raws)
        n_raw = np.fromiter((len(r) for r in raws), np.int64, ndocs)
        flat: list = []
        for r in raws:
            flat.extend(r)
        if not flat:
            return None
        doc_arr = np.repeat(np.arange(ndocs, dtype=np.int64), n_raw)
        starts = np.concatenate(([0], np.cumsum(n_raw)[:-1]))
        pos_arr = (np.arange(len(flat), dtype=np.int64)
                   - np.repeat(starts, n_raw))
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object),
                                      sort=False)
        if map_one is None:
            final = uniques if isinstance(uniques, np.ndarray) \
                else uniques.to_numpy()
            tcode = codes.astype(np.int64)
        else:
            final_terms: list[str] = []
            fmap: dict[str, int] = {}
            lut = np.empty(len(uniques), dtype=np.int64)
            for i, tok in enumerate(uniques.tolist()):
                term = map_one(tok)
                if term is None:
                    lut[i] = -1
                    continue
                j = fmap.get(term)
                if j is None:
                    j = fmap[term] = len(final_terms)
                    final_terms.append(term)
                lut[i] = j
            if not final_terms:
                return None
            final = np.asarray(final_terms, dtype=object)
            tcode = lut[codes]
            keep = tcode >= 0
            if not keep.all():
                doc_arr, tcode, pos_arr = (doc_arr[keep], tcode[keep],
                                           pos_arr[keep])
            if doc_arr.size == 0:
                return None
        # stable doc-major, term-grouped, position-ascending:
        # np.lexsort's last key is primary; positions are already
        # ascending within (doc, term) because the scan is L→R
        order = np.lexsort((pos_arr, tcode, doc_arr))
        d, c, p = doc_arr[order], tcode[order], pos_arr[order]
        grp = np.flatnonzero(np.diff(d * len(final) + c, prepend=-1))
        # delta-encode positions within groups (group-first stays
        # absolute), one varint encode for the whole slice
        deltas = np.empty_like(p)
        deltas[1:] = p[1:] - p[:-1]
        deltas[grp] = p[grp]
        buf, ends = codec.encode_varints_ex(deltas)
        grp_end = np.append(grp[1:], p.size)  # exclusive ends
        byte_lo = np.where(grp == 0, 0, ends[grp - 1])
        byte_hi = ends[grp_end - 1]
        return pd.DataFrame({
            "term": final[c[grp]],
            "doc_id": doc_ids[d[grp]],
            "n_pos": (grp_end - grp).astype(np.int64),
            "pos_bytes": [buf[lo:hi] for lo, hi in
                          zip(byte_lo, byte_hi)],
        })

    def fn(batches):
        for pdf in batches:
            doc_ids = pdf["doc_id"].to_numpy()
            texts = pdf["text"].tolist()
            for lo in range(0, len(texts), _KERNEL_DOC_SLICE):
                out = _slice(doc_ids[lo:lo + _KERNEL_DOC_SLICE],
                             texts[lo:lo + _KERNEL_DOC_SLICE])
                if out is not None:
                    yield out

    return fn


def _pack_kernel():
    """applyInPandas kernel over one (bucket, salt) group → one row
    per term: doc ids delta+varint, counts varint, position payloads
    concatenated in doc order.  Term boundaries are numpy slices on
    the sorted group (the postings pack's lesson: never one Python
    round-trip per term)."""

    def fn(key, pdf):
        import pandas as pd
        bucket, salt = int(key[0]), int(key[1])
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        codes, uniques = pd.factorize(terms, sort=True)
        order = np.lexsort((doc_ids, codes))
        c, d = codes[order], doc_ids[order]
        n_pos = pdf["n_pos"].to_numpy()[order].astype(np.int64)
        payloads = pdf["pos_bytes"].to_numpy()[order]
        grp = np.flatnonzero(np.diff(c, prepend=-1))
        grp_end = np.append(grp[1:], c.size)
        # doc ids: delta within term (term-first absolute), ONE
        # varint encode for the whole group, sliced by byte offsets
        # (the postings pack's lesson: never one encode per term)
        dd = np.empty_like(d)
        dd[1:] = d[1:] - d[:-1]
        dd[grp] = d[grp]
        doc_buf, doc_ends = codec.encode_varints_ex(dd)
        doc_lo = np.where(grp == 0, 0, doc_ends[grp - 1])
        doc_hi = doc_ends[grp_end - 1]
        cnt_buf, cnt_ends = codec.encode_varints_ex(n_pos)
        cnt_lo = np.where(grp == 0, 0, cnt_ends[grp - 1])
        cnt_hi = cnt_ends[grp_end - 1]
        # position payloads are already per-(doc, term) varint bytes;
        # concatenating per term is pure memcpy via one flat buffer
        sizes = np.fromiter((len(b) for b in payloads), np.int64,
                            payloads.size)
        flat = np.empty(int(sizes.sum()), dtype=np.uint8)
        pos_ends = np.cumsum(sizes)
        off = 0
        for b in payloads:
            flat[off:off + len(b)] = np.frombuffer(b, dtype=np.uint8)
            off += len(b)
        pos_lo = np.where(grp == 0, 0, pos_ends[grp - 1])
        pos_hi = pos_ends[grp_end - 1]
        return pd.DataFrame({
            "term": uniques[c[grp]],
            "df_part": (grp_end - grp).astype(np.int64),
            "doc_bytes": [doc_buf[lo:hi] for lo, hi in
                          zip(doc_lo, doc_hi)],
            "cnt_bytes": [cnt_buf[lo:hi] for lo, hi in
                          zip(cnt_lo, cnt_hi)],
            "pos_bytes": [flat[lo:hi].tobytes() for lo, hi in
                          zip(pos_lo, pos_hi)],
            "bucket": np.full(grp.size, bucket, np.int32),
            "salt": np.full(grp.size, salt, np.int32),
        })

    return fn


_PACK_SCHEMA = ("term string, df_part long, doc_bytes binary, "
                "cnt_bytes binary, pos_bytes binary, bucket int, "
                "salt int")


def build_positions(spark: SparkSession, docs: DataFrame, out_dir: str,
                    *, n_buckets: int = 16, n_salts: int = 8,
                    tokenizer: str = "engine",
                    stopwords: frozenset[str] = STOPWORDS,
                    stem: bool = True) -> dict:
    """Build the positional sidecar over (doc_id, text) rows.

    ``salt = pmod(doc_id, n_salts)`` — deterministic from data, so
    the layout is invariant to input partitioning (the same property
    the postings get from doc-id-range chunks), and any doc-id-major
    consumer can co-partition with it."""
    rows = (docs.select("doc_id", "text")
            .mapInPandas(_positions_kernel(tokenizer, stopwords, stem),
                         schema=("term string, doc_id long, "
                                 "n_pos long, pos_bytes binary"))
            .withColumn("bucket", term_bucket(F.col("term"), n_buckets))
            .withColumn("salt", F.pmod(F.col("doc_id"),
                                       F.lit(n_salts)).cast("int")))
    packed = (rows.groupBy("bucket", "salt")
              .applyInPandas(_pack_kernel(), schema=_PACK_SCHEMA))
    table = os.path.join(out_dir, "positions")
    (packed.write.mode("overwrite")
     .partitionBy("bucket", "salt").parquet(table))
    meta = {"n_buckets": n_buckets, "n_salts": n_salts,
            "tokenizer": tokenizer, "stem": stem}
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, POSITIONS_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, POSITIONS_META))
    return meta


def _decode_term_row(doc_bytes: bytes, cnt_bytes: bytes,
                     pos_bytes: bytes, df: int):
    """→ (doc_ids, counts, flat absolute positions, per-doc offsets)."""
    ids = np.cumsum(codec.decode_varints(doc_bytes, df)[0]
                    .astype(np.int64))
    cnt = codec.decode_varints(cnt_bytes, df)[0].astype(np.int64)
    total = int(cnt.sum())
    deltas = codec.decode_varints(pos_bytes, total)[0].astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(cnt)))
    cs = np.cumsum(deltas)
    # doc-first positions are absolute; within a doc abs = cs - base
    starts = offsets[:-1][cnt > 0]
    firsts = deltas[starts]
    base_per_doc = cs[starts] - firsts
    base = np.repeat(base_per_doc, cnt[cnt > 0])
    return ids, cnt, cs - base, offsets


def _phrase_kernel(terms: list[str], dead: np.ndarray | None = None):
    """applyInPandas kernel over one salt shard's sidecar rows for
    the phrase's distinct terms → (doc_id, n_occ).

    Classic positional intersection: docs common to every term, then
    cur = pos(t1); cur = (cur+1) ∩ pos(t_i) left to right; n_occ =
    |cur| (overlap-aware: "a a a" has two occurrences of "a a").
    ``dead``: sorted tombstoned doc ids (operators/delete.py),
    dropped from the candidate set before any position work."""
    order = list(terms)

    def fn(pdf):
        import pandas as pd
        decoded: dict[str, tuple] = {}
        for t, db, cb, pb, df in zip(pdf["term"], pdf["doc_bytes"],
                                     pdf["cnt_bytes"], pdf["pos_bytes"],
                                     pdf["df_part"]):
            decoded[t] = _decode_term_row(bytes(db), bytes(cb),
                                          bytes(pb), int(df))
        empty = pd.DataFrame({"doc_id": np.zeros(0, np.int64),
                              "n_occ": np.zeros(0, np.int64)})
        if any(t not in decoded for t in order):
            return empty
        # candidate docs: intersect sorted doc-id arrays, cheapest
        # pruning first is unnecessary — intersect1d is linear-ish
        common = decoded[order[0]][0]
        for t in order[1:]:
            common = np.intersect1d(common, decoded[t][0],
                                    assume_unique=True)
        if dead is not None and dead.size and common.size:
            common = common[~np.isin(common, dead)]
        if common.size == 0:
            return empty
        idx = {}
        for t in set(order):
            ids = decoded[t][0]
            idx[t] = np.searchsorted(ids, common)
        out_ids, out_n = [], []
        for j, doc in enumerate(common):
            cur = None
            for t in order:
                ids, cnt, pos, off = decoded[t]
                i = int(idx[t][j])
                p = pos[off[i]:off[i + 1]]
                cur = p if cur is None else np.intersect1d(
                    cur + 1, p, assume_unique=True)
                if cur.size == 0:
                    break
            if cur is not None and cur.size:
                out_ids.append(int(doc))
                out_n.append(int(cur.size))
        return pd.DataFrame({"doc_id": np.asarray(out_ids, np.int64),
                             "n_occ": np.asarray(out_n, np.int64)})

    return fn


def _near_kernel(terms: list[str], max_span: int,
                 dead: np.ndarray | None = None):
    """applyInPandas kernel over one salt shard's sidecar rows for a
    NEAR/k query → (doc_id, min_span).

    ``min_span`` is the minimal ``max(pos) - min(pos)`` over one
    occurrence of EACH distinct term (the classic smallest-window-
    covering-all-terms measure, exact via a merged-positions sliding
    window — O(P) per doc after one sort).  Docs with min_span >
    ``max_span`` are dropped shard-side, so only qualifying rows
    cross the shuffle."""
    order = sorted(set(terms))
    need = len(order)

    def fn(pdf):
        import pandas as pd
        decoded: dict[str, tuple] = {}
        for t, db, cb, pb, df in zip(pdf["term"], pdf["doc_bytes"],
                                     pdf["cnt_bytes"], pdf["pos_bytes"],
                                     pdf["df_part"]):
            decoded[t] = _decode_term_row(bytes(db), bytes(cb),
                                          bytes(pb), int(df))
        empty = pd.DataFrame({"doc_id": np.zeros(0, np.int64),
                              "min_span": np.zeros(0, np.int64)})
        if any(t not in decoded for t in order):
            return empty
        common = decoded[order[0]][0]
        for t in order[1:]:
            common = np.intersect1d(common, decoded[t][0],
                                    assume_unique=True)
        if dead is not None and dead.size and common.size:
            common = common[~np.isin(common, dead)]
        if common.size == 0:
            return empty
        idx = {t: np.searchsorted(decoded[t][0], common)
               for t in order}
        ncommon = common.size
        # ragged gather: every candidate doc's positions for every
        # term, labelled, into flat arrays — no per-doc Python
        P_parts, lab_parts, doc_parts = [], [], []
        for ti, t in enumerate(order):
            _ids, _cnt, pos, off = decoded[t]
            di = idx[t]
            starts = off[di].astype(np.int64)
            lens = (off[di + 1] - off[di]).astype(np.int64)
            total = int(lens.sum())
            if total == 0:
                return empty
            csum = np.cumsum(lens)
            flat = (np.arange(total, dtype=np.int64)
                    - np.repeat(csum - lens, lens)
                    + np.repeat(starts, lens))
            P_parts.append(pos[flat].astype(np.int64))
            lab_parts.append(np.full(total, ti, np.int64))
            doc_parts.append(
                np.repeat(np.arange(ncommon, dtype=np.int64), lens))
        P = np.concatenate(P_parts)
        lab = np.concatenate(lab_parts)
        dof = np.concatenate(doc_parts)
        o = np.lexsort((P, dof))
        P, lab, dof = P[o], lab[o], dof[o]
        M = P.size
        ar = np.arange(M, dtype=np.int64)
        new_doc = np.empty(M, bool)
        new_doc[0] = True
        new_doc[1:] = dof[1:] != dof[:-1]
        seg_first = np.maximum.accumulate(np.where(new_doc, ar, 0))
        # the minimal window ending at row r starts at the smallest
        # of each label's LAST occurrence <= r; if that minimum
        # falls before the doc's segment, some label is unseen and
        # no window ends at r
        lefts = np.full(M, np.iinfo(np.int64).max, np.int64)
        for ti in range(need):
            seen = np.maximum.accumulate(np.where(lab == ti, ar, -1))
            lefts = np.minimum(lefts, seen)
        valid = lefts >= seg_first
        sentinel = np.iinfo(np.int64).max
        spans = np.where(valid, P - P[np.where(valid, lefts, 0)],
                         sentinel)
        best = np.minimum.reduceat(spans, ar[new_doc])
        hit = best <= max_span
        return pd.DataFrame(
            {"doc_id": common[hit].astype(np.int64),
             "min_span": best[hit].astype(np.int64)})

    return fn


def near_search(spark: SparkSession, out_dir: str, query: str,
                max_span: int,
                stopwords: frozenset[str] = STOPWORDS) -> DataFrame:
    """NEAR/k proximity retrieval from the positional sidecar alone:
    docs where one occurrence of EVERY query term fits inside a
    token window of width ``max_span`` (min over windows reported as
    ``min_span`` — 0 means adjacent/identical positions).  Unordered
    — the phrase operator is the ordered special case.  Same scale
    shape as :func:`phrase_search`: bucket-pruned sidecar scan, one
    per-salt kernel, no document text read."""
    meta = read_positions_meta(out_dir)
    terms = phrase_terms(query, meta, stopwords)
    if not terms:
        return spark.createDataFrame([], "doc_id long, min_span long")
    distinct = sorted(set(terms))
    buckets = sorted({_bucket_of(t, meta["n_buckets"])
                      for t in distinct})
    table = os.path.join(out_dir, "positions")
    rows = (spark.read.option("basePath", table).parquet(table)
            .where(F.col("bucket").isin(buckets)
                   & F.col("term").isin(distinct)))
    from .delete import read_tombstones
    dead = read_tombstones(out_dir)
    res = (rows.groupBy("salt")
           .applyInPandas(_near_kernel(distinct, max_span,
                                       dead if dead.size else None),
                          schema="doc_id long, min_span long"))
    return res.orderBy("doc_id")


def read_positions_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, POSITIONS_META)) as f:
        return json.load(f)


def phrase_terms(phrase: str, meta: dict,
                 stopwords: frozenset[str] = STOPWORDS) -> list | None:
    """Phrase words → sidecar terms, preserving order/duplicates.

    Engine mode: a phrase containing a filtered word (stopword /
    len<3) has no positional witness in the index — return None
    ("cannot match", by the strict-positions convention above)."""
    if meta["tokenizer"] == "sql":
        return [t for t in _SQL_SPLIT_RE.split(phrase or "") if t]
    mapped = make_index_token_mapper(stopwords, meta.get("stem", True))
    out = []
    for w in raw_tokens(phrase or ""):
        r = mapped([w])
        if not r:
            return None
        out.append(r[0])
    return out


def phrase_search(spark: SparkSession, out_dir: str, phrase: str,
                  stopwords: frozenset[str] = STOPWORDS) -> DataFrame:
    """Exact phrase retrieval from the positional sidecar alone —
    no document text is read.  Returns (doc_id, n_occ) ordered by
    doc_id; n_occ counts overlap-aware phrase occurrences."""
    meta = read_positions_meta(out_dir)
    terms = phrase_terms(phrase, meta, stopwords)
    if not terms:
        return spark.createDataFrame([], "doc_id long, n_occ long")
    distinct = sorted(set(terms))
    buckets = sorted({_bucket_of(t, meta["n_buckets"])
                      for t in distinct})
    table = os.path.join(out_dir, "positions")
    rows = (spark.read.option("basePath", table).parquet(table)
            .where(F.col("bucket").isin(buckets)
                   & F.col("term").isin(distinct)))
    from .delete import read_tombstones
    dead = read_tombstones(out_dir)
    res = (rows.groupBy("salt")
           .applyInPandas(_phrase_kernel(terms,
                                         dead if dead.size else None),
                          schema="doc_id long, n_occ long"))
    return res.orderBy("doc_id")


def _bucket_of(term: str, n_buckets: int) -> int:
    from ..functions.xxhash import spark_term_bucket
    return spark_term_bucket(term, n_buckets)
