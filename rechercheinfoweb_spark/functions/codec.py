"""Posting-block codec: docID delta + LEB128 varint compression.

The reference serializes posting lists as delta-encoded docIDs with a
home-grown varint (encoder.go:85-90,133-169) inside a snappy-framed
file (encoder.go:26-33).  We keep the delta+varint idea (it is what
makes skip-pointer blocks cheap) but use standard LEB128 and let
Parquet supply the outer compression (snappy/zstd table codec).

Two block kinds share one struct schema
(``first_doc_id long, n int, max_w_raw/max_w_norm/max_w_half/max_bm25
double, data binary``):

* **segment** blocks (per-chunk, pre-IDF — weights cannot be
  finalized until global df/N/avgdl are known):
      data = LEB128(delta doc_ids) ++ LEB128(tf)
             ++ LEB128(dl) ++ LEB128(max_tf)
  dl (per-doc post-filter length) and max_tf ride along per posting
  so the finalize pass never joins back to the docs table.
* **final** blocks (queryable index):
      data = LEB128(delta doc_ids) ++ LEB128(tf)
             ++ float64[n] w_raw ++ float64[n] w_norm
             ++ float64[n] w_half ++ float64[n] bm25

``first_doc_id`` is the skip pointer; the four block maxima drive
block-max WAND pruning (north rule; absent in the reference, which
full-sorts — templates/archi.html:38-39).  All encode/decode paths
are numpy-vectorized — no per-element Python in the hot loop.

Scale note: four float64 weights per posting mirrors the reference's
3×float64-per-Ref layout (trie.go:56-61) and buys exact engine/oracle
rank-identity; at 10^12 docs you would keep only tf (+ quantized
block maxima) and recompute scores from (idf, dl) at query time — the
segment layout already is that representation.
"""

from __future__ import annotations

import numpy as np

DEFAULT_BLOCK = 128
N_WEIGHTS = 4  # w_raw, w_norm, w_half, bm25
W_RAW, W_NORM, W_HALF, W_BM25 = range(4)


def encode_varints_ex(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array of non-negative ints, vectorized.

    Returns (buffer, byte-end offset per value) — the offsets let a
    block packer slice one whole-list encode into per-block payloads
    instead of re-encoding every block."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= (np.uint64(1) << np.uint64(7 * k))).astype(np.int64)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk.astype(np.uint8) | cont
    return out.tobytes(), ends


def encode_varints(values: np.ndarray) -> bytes:
    return encode_varints_ex(values)[0]


def decode_varints(buf, count: int, offset: int = 0
                   ) -> tuple[np.ndarray, int]:
    """Decode *count* LEB128 varints starting at *offset*.

    Returns (values, next_offset)."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64), offset
    b = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    terminators = np.nonzero((b & 0x80) == 0)[0]
    if terminators.size < count:
        raise ValueError("varint stream truncated")
    ends = terminators[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (
            (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64)
            << np.uint64(7 * j)
        )
    return vals, offset + int(ends[count - 1] + 1)


def _deltas(ids: np.ndarray) -> np.ndarray:
    deltas = np.empty(ids.shape, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:], casting="unsafe")
    return deltas


def pack_segment_block(doc_ids, tfs, dls, max_tfs) -> bytes:
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    return b"".join([
        encode_varints(_deltas(ids)),
        encode_varints(np.asarray(tfs)),
        encode_varints(np.asarray(dls)),
        encode_varints(np.asarray(max_tfs)),
    ])


def unpack_segment_block(data: bytes, n: int):
    """→ (doc_ids, tfs, dls, max_tfs), all int64."""
    deltas, off = decode_varints(data, n)
    ids = np.cumsum(deltas.astype(np.int64))
    tfs, off = decode_varints(data, n, off)
    dls, off = decode_varints(data, n, off)
    mtfs, _ = decode_varints(data, n, off)
    return ids, tfs.astype(np.int64), dls.astype(np.int64), mtfs.astype(np.int64)


def pack_final_block(doc_ids, tfs, weights: np.ndarray) -> bytes:
    ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    assert w.shape == (ids.size, N_WEIGHTS)
    return b"".join([
        encode_varints(_deltas(ids)),
        encode_varints(np.asarray(tfs)),
        w.tobytes(order="F"),
    ])


def unpack_final_block(data: bytes, n: int):
    """→ (doc_ids int64, tfs int64, weights float64[n,4])."""
    deltas, off = decode_varints(data, n)
    ids = np.cumsum(deltas.astype(np.int64))
    tfs, off = decode_varints(data, n, off)
    w = np.frombuffer(data, dtype=np.float64, count=n * N_WEIGHTS,
                      offset=off)
    return ids, tfs.astype(np.int64), w.reshape((n, N_WEIGHTS), order="F")


def _block_rows(ids, tfs, block_size, pack_one, maxes_fn):
    blocks = []
    for lo in range(0, ids.size, block_size):
        hi = min(lo + block_size, ids.size)
        maxes = maxes_fn(lo, hi)
        blocks.append({
            "first_doc_id": int(ids[lo]),
            "n": int(hi - lo),
            "max_w_raw": float(maxes[W_RAW]),
            "max_w_norm": float(maxes[W_NORM]),
            "max_w_half": float(maxes[W_HALF]),
            "max_bm25": float(maxes[W_BM25]),
            "data": pack_one(lo, hi),
        })
    return blocks


def pack_segment_postings(doc_ids, tfs, dls, max_tfs,
                          block_size: int = DEFAULT_BLOCK) -> list[dict]:
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    mtf = np.asarray(max_tfs, dtype=np.int64)
    zero = np.zeros(N_WEIGHTS)
    return _block_rows(
        ids, tf, block_size,
        lambda lo, hi: pack_segment_block(ids[lo:hi], tf[lo:hi],
                                          dl[lo:hi], mtf[lo:hi]),
        lambda lo, hi: zero,
    )


def pack_final_postings(doc_ids, tfs, weights,
                        block_size: int = DEFAULT_BLOCK) -> list[dict]:
    """Vectorized across blocks: one whole-list varint encode per
    section (deltas reset at block starts), per-block payloads are
    byte slices; block maxima via maximum.reduceat.  Byte-identical
    to per-block pack_final_block output."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    w = np.ascontiguousarray(weights, dtype=np.float64)
    n = ids.size
    if n == 0:
        return []
    starts = np.arange(0, n, block_size, dtype=np.int64)
    deltas = _deltas(ids)
    deltas[starts] = ids[starts]  # each block's first id stored raw
    id_buf, id_ends = encode_varints_ex(deltas)
    tf_buf, tf_ends = encode_varints_ex(tf)
    id_b = np.concatenate(([0], id_ends))
    tf_b = np.concatenate(([0], tf_ends))
    maxes = np.maximum.reduceat(w, starts, axis=0)
    blocks = []
    for bi, lo in enumerate(starts):
        hi = min(int(lo) + block_size, n)
        blocks.append({
            "first_doc_id": int(ids[lo]),
            "n": int(hi - lo),
            "max_w_raw": float(maxes[bi, W_RAW]),
            "max_w_norm": float(maxes[bi, W_NORM]),
            "max_w_half": float(maxes[bi, W_HALF]),
            "max_bm25": float(maxes[bi, W_BM25]),
            "data": (id_buf[id_b[lo]:id_b[hi]]
                     + tf_buf[tf_b[lo]:tf_b[hi]]
                     + w[lo:hi].tobytes(order="F")),
        })
    return blocks
