"""Scoring formulas — the single spec shared by the Spark build
(finalize pass), the query engine, and the pure-Python oracle.

Reference tf weights (trie.go:46-62, document.go:24-37), all scaled
by idf = ln(N/df) at end of build (trie.go:179-198):

    w_raw  = tf · idf
    w_norm = (1 + ln tf) · idf
    w_half = (0.5 + 0.5 · tf / max_tf(doc)) · idf

BM25 (north-rule addition, absent in the reference; Robertson/
Sparck-Jones with the Lucene +1 idf floor so scores are never
negative):

    idf_bm25 = ln( (N − df + 0.5) / (df + 0.5) + 1 )
    bm25     = idf_bm25 · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

All arithmetic is numpy float64 with a pinned operation order, so the
engine and the oracle produce bit-identical doubles (SURVEY.md §7
"float equality").
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75
SCHEMES = ("raw", "norm", "half", "bm25")


def idf(n_docs: int, df) -> np.ndarray | float:
    return np.log(np.float64(n_docs) / np.asarray(df, dtype=np.float64))


def bm25_idf(n_docs: int, df) -> np.ndarray | float:
    dff = np.asarray(df, dtype=np.float64)
    return np.log((np.float64(n_docs) - dff + 0.5) / (dff + 0.5) + 1.0)


def posting_weights(tf, dl, max_tf, idf_val, bm25_idf_val, avgdl,
                    k1: float = K1, b: float = B) -> np.ndarray:
    """(n,4) float64 weight matrix [w_raw, w_norm, w_half, bm25]."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    max_tf = np.asarray(max_tf, dtype=np.float64)
    out = np.empty((tf.size, 4), dtype=np.float64)
    out[:, 0] = tf * idf_val
    out[:, 1] = (1.0 + np.log(tf)) * idf_val
    out[:, 2] = (0.5 + 0.5 * (tf / max_tf)) * idf_val
    denom = tf + k1 * (1.0 - b + b * (dl / np.float64(avgdl)))
    out[:, 3] = bm25_idf_val * (tf * (k1 + 1.0)) / denom
    return out


def block_upper_bounds(max_tf, min_dl, max_ratio, idf_val,
                       bm25_idf_val, avgdl,
                       k1: float = K1, b: float = B) -> np.ndarray:
    """(n_blocks,4) per-scheme upper bounds on any posting weight in
    each block, from the layout-v4 idf-independent block metadata
    (codec.pack_postings): block max tf, block min dl, block max
    tf/doc-max-tf ratio.

    Exact block maxima for raw/norm (monotonic in tf) and half
    (linear in the ratio); for bm25 — increasing in tf, decreasing
    in dl — pairing max_tf with min_dl gives a bound >= the true
    maximum, so WAND pruning stays exact, merely a touch looser."""
    mtf = np.asarray(max_tf, dtype=np.float64)
    mdl = np.asarray(min_dl, dtype=np.float64)
    mr = np.asarray(max_ratio, dtype=np.float64)
    out = np.empty((mtf.size, 4), dtype=np.float64)
    out[:, 0] = mtf * idf_val
    out[:, 1] = (1.0 + np.log(mtf)) * idf_val
    out[:, 2] = (0.5 + 0.5 * mr) * idf_val
    denom = mtf + k1 * (1.0 - b + b * (mdl / np.float64(avgdl)))
    out[:, 3] = bm25_idf_val * (mtf * (k1 + 1.0)) / denom
    return out
