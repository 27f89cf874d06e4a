"""Boolean query engine — SURVEY.md §2.4 Q1-Q6.

The parser reproduces the reference's shunting-yard grammar exactly
(bool_query.go:178-297), including its quirks, because rank-identity
on the reference query set is the goal:

* the splitter keeps only letters+digits (vector_query.go:14-16), so
  parentheses can never appear as tokens — the reference's paren
  branches are dead code and the effective grammar is paren-free;
* precedence is AND < OR < NOT (bool_query.go:17-24 enum order, the
  shunting-yard pops while ``op < oldOp``) — OR binds *tighter* than
  AND, unlike SQL;
* an implicit AND is inserted between adjacent bare words — the
  comment says OR, the code pushes ``and`` (bool_query.go:228-250);
  note "NOT" is absent from the next-word operator list, so
  "a NOT b" becomes "a AND (NOT b)";
* malformed queries are silently "fixed" by dropping unsatisfiable
  operators (bool_query.go:265-297);
* operator words match case-insensitively; everything else is left
  in original case, stemmed iff len>3, and NOT stopword-filtered
  (bool_query.go:52-58);
* NOT is only ever evaluated against the already-bound left side —
  never a global complement (bool_query.go:38-44,67-72): AND swaps
  its operands so the non-NOT side binds first, and a NOT under OR
  (or at top level) sees an empty bound set → empty result.

Evaluation compiles the AST to DataFrame set algebra: term →
bucket-pruned postings fetch + id unpack; AND → left-semi join; AND
NOT → left-anti join; OR → union+distinct.  Catalyst/AQE picks
broadcast vs shuffle joins per side size — on a 1000-executor
cluster a rare-term side broadcasts, two huge sides sort-merge on
doc_id; no driver-side set materialization anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import codec
from ..functions.tokenizer import QUERY_TOKEN_RE, bool_query_term
from .query_vector import IndexReader

# AST ----------------------------------------------------------------


@dataclass
class Word:
    w: str
    def is_not(self) -> bool: return False


@dataclass
class Not:
    b: object
    def is_not(self) -> bool: return True


@dataclass
class And:
    b1: object
    b2: object
    def is_not(self) -> bool: return False


@dataclass
class Or:
    b1: object
    b2: object
    def is_not(self) -> bool: return False


_AND, _OR, _NOT, _LPAREN = 0, 1, 2, 3  # precedence enum, reference order


def _add_operator(out: list, op: int) -> list:
    """bool_query.go:265-297 addBOperator, silent fixes included."""
    if op == _NOT:
        if len(out) < 1:
            return out
        out[-1] = Not(out[-1])
        return out
    if len(out) < 2:
        return out
    b1 = out.pop()   # right operand first — reference order
    b2 = out.pop()
    if op == _OR:
        out.append(Or(b1, b2))
    elif op == _AND:
        out.append(And(b1, b2))
    # leftParen (dead in practice): operands dropped, like the Go code
    return out


def parse_boolean(query: str):
    """Shunting-yard over letter/digit tokens; returns AST or None."""
    words = QUERY_TOKEN_RE.findall(query)
    out: list = []
    ops: list[int] = []
    opcode = {"OR": _OR, "AND": _AND, "NOT": _NOT}
    for i, word in enumerate(words):
        up = word.upper()
        if up in opcode:
            op = opcode[up]
            while ops:
                old = ops.pop()
                if op < old:
                    out = _add_operator(out, old)
                else:
                    ops.append(old)
                    break
            ops.append(op)
        else:
            out.append(Word(word))
            if i + 1 < len(words) and words[i + 1].upper() not in (
                    "OR", "AND"):
                op = _AND
                while ops:
                    old = ops.pop()
                    if old < op:
                        out = _add_operator(out, old)
                    else:
                        ops.append(old)
                        break
                ops.append(op)
    for op in reversed(ops):
        out = _add_operator(out, op)
    if len(out) != 1:
        return None
    return out[0]


# Evaluation ----------------------------------------------------------


def _unpack_ids_kernel():
    """Blocks store absolute delta-encoded doc_ids, so unpacking
    needs no shard-range mapping."""
    def fn(batches):
        import pandas as pd
        for pdf in batches:
            terms_all, ids_all = [], []
            for term, blocks in zip(pdf["term"], pdf["blocks"]):
                for blk in blocks:
                    deltas, _ = codec.decode_varints(
                        bytes(blk["data"]), int(blk["n"]))
                    ids = np.cumsum(deltas.astype(np.int64))
                    ids_all.append(ids)
                    terms_all.extend([term] * ids.size)
            yield pd.DataFrame({
                "term": terms_all,
                "doc_id": (np.concatenate(ids_all)
                           if ids_all else np.zeros(0, np.int64))})
    return fn


def _collect_words(node, acc: list):
    if isinstance(node, Word):
        acc.append(node.w)
    elif isinstance(node, Not):
        _collect_words(node.b, acc)
    elif isinstance(node, (And, Or)):
        _collect_words(node.b1, acc)
        _collect_words(node.b2, acc)
    return acc


class BooleanEvaluator:
    def __init__(self, reader: IndexReader, ast=None):
        self.reader = reader
        self.spark = reader.spark
        self._empty = self.spark.createDataFrame([], "doc_id long")
        self._prefetched = None
        if ast is not None:
            # one bucket-pruned postings scan + unpack for ALL query
            # terms, cached; per-word sets are filters on it — N
            # words cost one scan, not N
            terms = sorted({bool_query_term(w)
                            for w in _collect_words(ast, [])})
            if terms:
                rows = self.reader.postings_for(terms)
                self._prefetched = rows.select("term", "blocks").mapInPandas(
                    _unpack_ids_kernel(),
                    schema="term string, doc_id long").persist()

    def term_docs(self, word: str) -> DataFrame:
        term = bool_query_term(word)
        if self._prefetched is not None:
            return (self._prefetched.where(F.col("term") == term)
                    .select("doc_id"))
        rows = self.reader.postings_for([term])
        return rows.select(F.lit("").alias("term"), "blocks").mapInPandas(
            _unpack_ids_kernel(),
            schema="term string, doc_id long").select("doc_id")

    def evaluate(self, node, prec: DataFrame | None = None) -> DataFrame:
        if prec is None:
            prec = self._empty
        if isinstance(node, Word):
            return self.term_docs(node.w)
        if isinstance(node, Not):
            inner = self.evaluate(node.b, self._empty)
            return prec.join(inner, "doc_id", "left_anti")
        if isinstance(node, And):
            b1, b2 = node.b1, node.b2
            if b1.is_not() and not b2.is_not():
                b1, b2 = b2, b1
            res1 = self.evaluate(b1, prec)
            res2 = self.evaluate(b2, res1)
            return res1.join(res2, "doc_id", "left_semi")
        if isinstance(node, Or):
            res1 = self.evaluate(node.b1, prec)
            res2 = self.evaluate(node.b2, prec)
            return res1.union(res2).distinct()
        raise TypeError(f"unknown node {node!r}")


def boolean_search(spark: SparkSession, index_dir: str | IndexReader,
                   query: str, with_urls: bool = False) -> DataFrame:
    """Boolean retrieval; result ordered by doc_id asc (the
    reference's posting-list order, search.go:82-85)."""
    reader = (index_dir if isinstance(index_dir, IndexReader)
              else IndexReader(spark, index_dir))
    ast = parse_boolean(query)
    ev = BooleanEvaluator(reader, ast)
    if ast is None:
        res = ev._empty
    else:
        res = ev.evaluate(ast)
    res = res.orderBy("doc_id")
    if with_urls:
        docs = reader.docs().select("doc_id", "url")
        res = (docs.join(F.broadcast(res), "doc_id")
               .orderBy("doc_id"))
    return res
