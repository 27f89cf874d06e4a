"""The vectorized build kernels must be row-identical to the plain
per-doc reference logic (TOKEN_RE.findall → memoized filter/stem →
Counter), which the golden-token tests pin to the Go reference.

The kernels factorize the flat token stream and run Python
stem/stopword only per UNIQUE raw token (operators/index_build.py::
_batch_token_stats); two raw tokens may stem to the same term, so
these tests include collision vocab ("running"/"run", "system's").
No SparkSession — the kernels are plain generators over pandas
frames, so this is the cheap always-on guard; the Spark-side twin is
tests/test_index_build.py (byte-identical index at any parallelism).
"""
from __future__ import annotations

import random
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from rechercheinfoweb_spark.functions.tokenizer import (
    STOPWORDS, TOKEN_RE, make_index_token_mapper,
)
from rechercheinfoweb_spark.operators.index_build import (
    _doc_stats_kernel, _tokenize_counts_kernel,
)


def _corpus(n_docs: int = 300) -> pd.DataFrame:
    rng = random.Random(42)
    vocab = [f"word{i}" for i in range(5000)] + [
        "the", "of", "and", "ab", "x",          # stopwords + len<3
        "running", "run", "runs",               # stem collisions
        "system's", "systems", "system",
        "a/b-test", "état", "naïve",            # charset extras
    ]
    w = [1 / (i + 5) for i in range(len(vocab))]
    texts = [" ".join(rng.choices(vocab, weights=w,
                                  k=rng.randint(0, 300)))
             for _ in range(n_docs)]
    texts[3] = ""                    # empty doc
    texts[4] = "ab x of the"         # everything filtered
    texts[5] = "   \n\t "            # whitespace only
    return pd.DataFrame({
        "doc_id": np.arange(1, n_docs + 1, dtype=np.int64),
        "chunk": (np.arange(n_docs) % 3).astype(np.int32),
        "url": [f"u{i}" for i in range(n_docs)],
        "lang": ["en"] * n_docs,
        "text": texts,
    })


def _reference_rows(pdf: pd.DataFrame, use_stem: bool):
    mapped = make_index_token_mapper(STOPWORDS, use_stem)
    rows, docs = [], []
    for doc_id, chunk, text in zip(pdf.doc_id, pdf.chunk, pdf.text):
        raw = TOKEN_RE.findall(text or "")
        c = Counter(mapped(raw))
        dl = sum(c.values())
        mtf = max(c.values()) if c else 0
        for term, tf in c.items():
            rows.append((doc_id, chunk, term, tf, dl, mtf))
        docs.append((doc_id, dl, mtf, len(raw)))
    rdf = (pd.DataFrame(rows, columns=["doc_id", "chunk", "term",
                                       "tf", "dl", "max_tf"])
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    ddf = pd.DataFrame(docs, columns=["doc_id", "dl", "max_tf",
                                      "n_raw"])
    return rdf, ddf


@pytest.mark.parametrize("use_stem", [True, False])
def test_tokenize_counts_kernel_row_identical(use_stem):
    pdf = _corpus()
    want, _ = _reference_rows(pdf, use_stem)
    got = (pd.concat(list(_tokenize_counts_kernel(
               STOPWORDS, use_stem=use_stem)([pdf])))
           .sort_values(["doc_id", "term"]).reset_index(drop=True))
    assert len(got) == len(want)
    for col in ["doc_id", "chunk", "term", "tf", "dl", "max_tf"]:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col


def test_doc_stats_kernel_row_identical():
    pdf = _corpus()
    _, want = _reference_rows(pdf, True)
    got = pd.concat(list(_doc_stats_kernel(STOPWORDS)([pdf])))
    assert len(got) == len(pdf)          # one row per doc, empties too
    for col in ["dl", "max_tf", "n_raw"]:
        assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
    assert (got["url"].to_numpy() == pdf["url"].to_numpy()).all()


def test_kernel_slice_boundaries_invisible():
    """Row output must not depend on the internal doc-slice size."""
    import rechercheinfoweb_spark.operators.index_build as ib
    pdf = _corpus(150)
    big = pd.concat(list(_tokenize_counts_kernel(STOPWORDS)([pdf])))
    old = ib._KERNEL_DOC_SLICE
    try:
        ib._KERNEL_DOC_SLICE = 7
        small = pd.concat(list(_tokenize_counts_kernel(STOPWORDS)([pdf])))
    finally:
        ib._KERNEL_DOC_SLICE = old
    b = big.sort_values(["doc_id", "term"]).reset_index(drop=True)
    s = small.sort_values(["doc_id", "term"]).reset_index(drop=True)
    assert len(b) == len(s)
    for col in b.columns:
        assert (b[col].to_numpy() == s[col].to_numpy()).all(), col
