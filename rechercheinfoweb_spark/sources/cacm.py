"""Real CACM corpus + query set source (reference data, S1/S4).

Parses the reference's own evaluation assets —
``data/CACM/{cacm.all, common_words, query.text, qrels.text}`` —
into the engine's ``web_pages`` shape and (queries, qrels) dicts, so
the north rule's "rank-identical on the reference query set" is
evidenced on the REAL 64 CACM queries, not only the synthetic set.

Corpus extraction replicates the reference's rune scanner
(cacm.go:148-192) EXACTLY, quirks included:

* only ``.T`` (title), ``.W`` (summary), ``.K`` (keywords) fields are
  indexed (cacm.go:176-180);
* a ``.`` anywhere switches the current field: ``.X`` with X∈[A-Z]
  followed by whitespace is a marker (scanIdentifiant,
  cacm.go:92-103); ANY other ``.`` — a sentence period, ``U.S.`` —
  resets the field to ``other`` because the failed-identifier branch
  still assigns ``identToField(lit)`` (cacm.go:160-163).  Text after
  the first bare period of a field is therefore NOT indexed, and a
  token glued to the period (``system.It``) is consumed as a
  pseudo-identifier and dropped.  We reproduce this faithfully —
  it is the reference's observable extraction behavior;
* tokens are maximal runs of letter/digit/'/-// (scanner.go:7-9);
  other characters are skipped.

Per-doc ``text`` is the indexed-field token sequence joined with
single spaces: re-tokenizing it with the engine's TOKEN_RE yields the
identical token stream, so the standard build pipeline (len>=3 +
common-words filter + Porter2 len>3 — cacm.go:125-144,
document.go:61-64) sees exactly what the reference indexed.

DocIDs: the reference assigns CACM ids 0..3203 in record order
(single scanner goroutine → deterministic; trie.go:40-44).  We set
``url = cacm/<record:04d>`` (zero-padded, record starting at 1), so
the engine's url-ordered ids equal the record ordinals and a qrels
line ``QID DOC`` maps to our doc_id = DOC directly (the file is
1-based; the reference subtracts 1 for its 0-based ids,
precision_recall.go:89-95).

Known reference bug, deliberately NOT reproduced: ``Populate``
appends qrels to a dense array keyed by arrival order, so qid gaps
(34, 35, 41, 46, 47, 50-56 are unjudged) misalign every answer list
after query 33 and index out of range past the 52nd query.  We key
qrels by qid.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession

from .web_pages import WEB_PAGES_SCHEMA

CACM_DIR = "/root/reference/data/CACM"

_EPOCH = _dt.datetime(1958, 1, 1, tzinfo=_dt.timezone.utc)

_INDEXED = {"T", "W", "K"}  # cacm.go:176-180


def _is_member(c: str) -> bool:
    # scanner.go:7-9 tokenMember: IsLetter | IsDigit | ' | - | /
    return c.isalnum() or c in "'-/"


def scan_cacm(data: str) -> list[tuple[int, list[str]]]:
    """Replicate cacm.go Scan: [(record ordinal starting 1,
    indexed-field tokens in order)]."""
    i, n = 0, len(data)
    field = "other"
    tokens: list[str] = []
    rec = 0
    docs: list[tuple[int, list[str]]] = []
    while i < n:
        c = data[i]
        if c.isspace():
            i += 1
            while i < n and data[i].isspace():
                i += 1
        elif c == ".":
            i += 1
            ch = data[i] if i < n else ""
            tmp = data[i + 1] if i + 1 < n else ""
            # tmp at EOF is NOT a marker (Go peek returns rune(0),
            # which IsSpace rejects)
            if "A" <= ch <= "Z" and tmp.isspace():
                # real field marker ".X"
                i += 1
                field = ch if ch in _INDEXED else (
                    "id" if ch == "I" else "other")
            else:
                # failed identifier (cacm.go:92-103): the token right
                # after the dot (if any) is consumed, never indexed,
                # and the field resets to other
                while i < n and _is_member(data[i]):
                    i += 1
                field = "other"
            if field == "id":
                if rec > 0:
                    docs.append((rec, tokens))
                    tokens = []
                rec += 1
        elif _is_member(c):
            j = i
            while j < n and _is_member(data[j]):
                j += 1
            if field in _INDEXED:
                tokens.append(data[i:j])
            i = j
        else:
            i += 1  # non-member, non-space, non-dot: skipped
    if rec > 0:
        docs.append((rec, tokens))
    return docs


def cacm_stopwords(cacm_dir: str = CACM_DIR) -> frozenset[str]:
    """The 429 common words (main.go:34-45)."""
    with open(os.path.join(cacm_dir, "common_words")) as f:
        return frozenset(ln.strip() for ln in f if ln.strip())


def cacm_pages(spark: SparkSession,
               cacm_dir: str = CACM_DIR) -> DataFrame:
    """cacm.all → web_pages DataFrame (3,204 rows).

    ``url = cacm/<record:04d>`` pins url order = record order so the
    engine's deterministic url-ordered ids equal the reference's
    record ordinals (1-based)."""
    with open(os.path.join(cacm_dir, "cacm.all"),
              encoding="utf-8", errors="replace") as f:
        docs = scan_cacm(f.read())
    rows = []
    for rec, tokens in docs:
        text = " ".join(tokens)
        rows.append((f"cacm/{rec:04d}",
                     _EPOCH + _dt.timedelta(seconds=rec),
                     text.encode(), text, "en"))
    return spark.createDataFrame(rows, WEB_PAGES_SCHEMA)


def cacm_queries(cacm_dir: str = CACM_DIR) -> dict[int, str]:
    """query.text → {qid(1-based): text} — line-based .W blocks,
    lines joined with trailing spaces (Populate,
    precision_recall.go:45-77)."""
    queries: dict[int, str] = {}
    qid = 0
    in_w = False
    buf: list[str] = []
    with open(os.path.join(cacm_dir, "query.text")) as f:
        for line in f:
            ln = line.rstrip("\n")
            if ln.startswith(".I"):
                if qid > 0:
                    queries[qid] = "".join(buf)
                    buf = []
                # the qid is the integer ON the .I line, not an
                # arrival counter: a missing or reordered record
                # must not silently shift every later qrels mapping
                # (the reference's own misalignment failure mode)
                qid = int(ln.split()[1])
            elif ln.startswith(".W"):
                in_w = True
            elif ln.startswith("."):
                in_w = False
            elif in_w:
                buf.append(ln + " ")
    if qid > 0:
        queries[qid] = "".join(buf)
    return queries


def cacm_qrels(cacm_dir: str = CACM_DIR) -> dict[int, set[int]]:
    """qrels.text → {qid: {doc_id}} in OUR id space (doc_id = the
    raw 1-based document number in the file, which equals the
    engine's url-ordered id — see module docstring).  Keyed by qid,
    not arrival order (the reference's misalignment bug is not
    reproduced)."""
    qrels: dict[int, set[int]] = {}
    with open(os.path.join(cacm_dir, "qrels.text")) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                qrels.setdefault(int(parts[0]), set()).add(int(parts[1]))
    return qrels
