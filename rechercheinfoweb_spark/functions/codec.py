"""Posting-block codec: docID delta + LEB128 varint compression.

The reference serializes posting lists as delta-encoded docIDs with a
home-grown varint (encoder.go:85-90,133-169) inside a snappy-framed
file (encoder.go:26-33).  We keep the delta+varint idea (it is what
makes skip-pointer blocks cheap) but use standard LEB128 and let
Parquet supply the outer compression (snappy/zstd table codec).

Layout v4 — ONE block kind, written once at build time and never
rewritten (the round-1 layout stored four precomputed float64 weight
planes per posting, which forced a full-index decode/re-encode in the
finalize pass whenever global df/avgdl changed; that rewrite was the
dominant serial cost at realistic vocabularies and made every
streaming refresh a full-index rewrite):

    data = LEB128(delta doc_ids, first id of each block stored raw)
        ++ LEB128(tf)  ++ LEB128(dl)  ++ LEB128(max_tf)

tf/dl/max_tf are the *sufficient statistics*: every scheme weight
(w_raw / w_norm / w_half / bm25 — reference trie.go:56-61 plus the
north-rule BM25) is recomputed at query time through the single
``scoring.posting_weights`` spec, so ranks and scores are bit-equal
to a build-time-precomputed design by construction, while the index
is ~4x smaller and global-statistic changes (new chunks appended)
touch no posting bytes.

Per-block metadata is *idf-independent* so it can also be written
once: ``max_tf`` / ``min_dl`` / ``max_ratio`` (= max tf/doc-max-tf).
``scoring.block_upper_bounds`` turns those plus query-time idf into
per-scheme score upper bounds that drive block-max WAND pruning
(north rule; absent in the reference, which full-sorts —
templates/archi.html:38-39).  ``first_doc_id`` is the skip pointer;
each block's delta chain restarts at its first id so blocks decode
independently.

All encode/decode paths are numpy-vectorized — no per-element Python
in the hot loop.
"""

from __future__ import annotations

import numpy as np

DEFAULT_BLOCK = 128


def encode_varints_ex(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode an array of non-negative ints, vectorized.

    Returns (buffer, byte-end offset per value) — the offsets let the
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


def decode_varint_sections(buf, counts, offset: int = 0) -> list[np.ndarray]:
    """Decode several consecutive varint sections in ONE pass.

    ``decode_varints`` scans the whole remaining buffer for
    terminator bytes on every call, so decoding a v4 block's four
    sections one at a time re-scans the tail O(sections²/2) times
    and pays the frombuffer + Python dispatch cost per section.
    This fuses them: one frombuffer, one terminator scan, then a
    value extraction per section — values are bit-identical to
    sequential :func:`decode_varints` calls."""
    total = int(sum(counts))
    if total == 0:
        return [np.zeros(0, dtype=np.uint64) for _ in counts]
    b = np.frombuffer(buf, dtype=np.uint8, offset=offset)
    terminators = np.nonzero((b & 0x80) == 0)[0]
    if terminators.size < total:
        raise ValueError("varint stream truncated")
    ends = terminators[:total]
    starts = np.empty(total, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    vals = np.zeros(total, dtype=np.uint64)
    for j in range(int(lengths.max())):
        mask = lengths > j
        vals[mask] |= (
            (b[starts[mask] + j] & np.uint64(0x7F)).astype(np.uint64)
            << np.uint64(7 * j)
        )
    out, lo = [], 0
    for c in counts:
        out.append(vals[lo:lo + int(c)])
        lo += int(c)
    return out


def _deltas(ids: np.ndarray) -> np.ndarray:
    deltas = np.empty(ids.shape, dtype=np.uint64)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:], casting="unsafe")
    return deltas


def pack_postings(doc_ids, tfs, dls, max_tfs,
                  block_size: int = DEFAULT_BLOCK) -> list[dict]:
    """One posting list (docID-sorted) → list of v4 block rows.

    Vectorized across blocks: one whole-list varint encode per
    section (delta chains reset at block starts so each block decodes
    independently), per-block payloads are byte slices; block
    metadata via maximum/minimum.reduceat."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    mtf = np.asarray(max_tfs, dtype=np.int64)
    n = ids.size
    if n == 0:
        return []
    starts = np.arange(0, n, block_size, dtype=np.int64)
    deltas = _deltas(ids)
    deltas[starts] = ids[starts]  # each block's first id stored raw
    id_buf, id_ends = encode_varints_ex(deltas)
    tf_buf, tf_ends = encode_varints_ex(tf)
    dl_buf, dl_ends = encode_varints_ex(dl)
    mtf_buf, mtf_ends = encode_varints_ex(mtf)
    id_b = np.concatenate(([0], id_ends))
    tf_b = np.concatenate(([0], tf_ends))
    dl_b = np.concatenate(([0], dl_ends))
    mtf_b = np.concatenate(([0], mtf_ends))
    max_tf_blk = np.maximum.reduceat(tf, starts)
    min_dl_blk = np.minimum.reduceat(dl, starts)
    # tf <= max_tf and max_tf >= 1 always, so the ratio is in (0, 1]
    max_ratio_blk = np.maximum.reduceat(tf / mtf, starts)
    blocks = []
    for bi, lo in enumerate(starts):
        hi = min(int(lo) + block_size, n)
        blocks.append({
            "first_doc_id": int(ids[lo]),
            "n": int(hi - lo),
            "max_tf": int(max_tf_blk[bi]),
            "min_dl": int(min_dl_blk[bi]),
            "max_ratio": float(max_ratio_blk[bi]),
            "data": (id_buf[id_b[lo]:id_b[hi]]
                     + tf_buf[tf_b[lo]:tf_b[hi]]
                     + dl_buf[dl_b[lo]:dl_b[hi]]
                     + mtf_buf[mtf_b[lo]:mtf_b[hi]]),
        })
    return blocks


def pack_group_postings(terms: np.ndarray, doc_ids, tfs, dls, max_tfs,
                        block_size: int = DEFAULT_BLOCK):
    """Pack MANY posting lists at once: rows sorted by (term,
    doc_id) → (uniq_terms, df_part, min_doc_id, blocks-per-term).

    Byte-identical to calling :func:`pack_postings` per term, but
    the four varint streams are encoded ONCE over the whole group
    (delta chains reset at every block start, where each term's
    first row is itself a block start) and per-block payloads are
    buffer slices.  A realistic web build packs 10^5-10^6 terms per
    task; per-term pack calls cost ~8 small-array numpy dispatches
    each, which dominated the pack stage — this is the same work in
    ~12 large-array dispatches per task."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    mtf = np.asarray(max_tfs, dtype=np.int64)
    n = ids.size
    uniq, tstarts, counts = np.unique(terms, return_index=True,
                                      return_counts=True)
    if n == 0:
        return uniq, counts, ids, []
    # block starts: every term's start + every block_size-th row
    # within its segment (blocks never span terms because each
    # term start is a block start)
    rel = np.arange(n, dtype=np.int64) - np.repeat(tstarts, counts)
    bstarts = np.nonzero(rel % block_size == 0)[0]
    deltas = _deltas(ids)
    deltas[bstarts] = ids[bstarts]
    id_buf, id_ends = encode_varints_ex(deltas)
    tf_buf, tf_ends = encode_varints_ex(tf)
    dl_buf, dl_ends = encode_varints_ex(dl)
    mtf_buf, mtf_ends = encode_varints_ex(mtf)
    id_b = np.concatenate(([0], id_ends))
    tf_b = np.concatenate(([0], tf_ends))
    dl_b = np.concatenate(([0], dl_ends))
    mtf_b = np.concatenate(([0], mtf_ends))
    bounds = np.append(bstarts, n)
    max_tf_blk = np.maximum.reduceat(tf, bstarts)
    min_dl_blk = np.minimum.reduceat(dl, bstarts)
    max_ratio_blk = np.maximum.reduceat(tf / mtf, bstarts)
    # term index of each block → emit per-term lists in one sweep
    block_term = np.searchsorted(tstarts, bstarts, side="right") - 1
    per_term: list[list[dict]] = [[] for _ in range(uniq.size)]
    first_ids = ids[bstarts]
    for bi in range(bstarts.size):
        lo = int(bounds[bi]); hi = int(bounds[bi + 1])
        per_term[block_term[bi]].append({
            "first_doc_id": int(first_ids[bi]),
            "n": hi - lo,
            "max_tf": int(max_tf_blk[bi]),
            "min_dl": int(min_dl_blk[bi]),
            "max_ratio": float(max_ratio_blk[bi]),
            "data": (id_buf[id_b[lo]:id_b[hi]]
                     + tf_buf[tf_b[lo]:tf_b[hi]]
                     + dl_buf[dl_b[lo]:dl_b[hi]]
                     + mtf_buf[mtf_b[lo]:mtf_b[hi]]),
        })
    return uniq, counts, ids[tstarts], per_term


def pack_group_postings_arrow(terms: np.ndarray, doc_ids, tfs, dls,
                              max_tfs,
                              block_size: int = DEFAULT_BLOCK):
    """:func:`pack_group_postings` with the per-term block lists
    returned as ONE pyarrow ``list<struct>`` array built from flat
    buffers — no per-block Python dicts.

    The dict-emitting variant walks a Python loop over every block
    twice (once to build the dict, once when the Arrow serializer
    re-walks it); a realistic web build packs 10^4-10^5 blocks per
    task and 10^9+ per job, so the pack stage's Python-object churn
    is pure overhead.  Here every struct child is a zero-copy numpy
    buffer and the block payloads land in one contiguous buffer via
    a single ``np.concatenate`` over slice views.  Bytes are
    identical to the dict variant (pinned by tests/test_codec.py).

    Returns (uniq_terms, df_part, min_doc_ids, blocks) where blocks
    is a ``pa.ListArray`` aligned with uniq_terms."""
    import pyarrow as pa

    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dls, dtype=np.int64)
    mtf = np.asarray(max_tfs, dtype=np.int64)
    n = ids.size
    uniq, tstarts, counts = np.unique(terms, return_index=True,
                                      return_counts=True)
    struct_type = pa.struct([
        pa.field("first_doc_id", pa.int64(), False),
        pa.field("n", pa.int32(), False),
        pa.field("max_tf", pa.int64(), False),
        pa.field("min_dl", pa.int64(), False),
        pa.field("max_ratio", pa.float64(), False),
        pa.field("data", pa.binary(), False),
    ])
    if n == 0:
        empty = pa.ListArray.from_arrays(
            pa.array([0], type=pa.int32()),
            pa.array([], type=struct_type))[:0]
        return uniq, counts, ids, empty
    rel = np.arange(n, dtype=np.int64) - np.repeat(tstarts, counts)
    bstarts = np.nonzero(rel % block_size == 0)[0]
    deltas = _deltas(ids)
    deltas[bstarts] = ids[bstarts]
    id_buf, id_ends = encode_varints_ex(deltas)
    tf_buf, tf_ends = encode_varints_ex(tf)
    dl_buf, dl_ends = encode_varints_ex(dl)
    mtf_buf, mtf_ends = encode_varints_ex(mtf)
    id_b = np.concatenate(([0], id_ends))
    tf_b = np.concatenate(([0], tf_ends))
    dl_b = np.concatenate(([0], dl_ends))
    mtf_b = np.concatenate(([0], mtf_ends))
    bounds = np.append(bstarts, n)
    lo, hi = bounds[:-1], bounds[1:]
    nb = bstarts.size
    max_tf_blk = np.maximum.reduceat(tf, bstarts)
    min_dl_blk = np.minimum.reduceat(dl, bstarts)
    max_ratio_blk = np.maximum.reduceat(tf / mtf, bstarts)
    # payload = per block, the 4 streams' row-range slices back to
    # back; views are cheap, the one copy is the concatenate
    v_id = np.frombuffer(id_buf, dtype=np.uint8)
    v_tf = np.frombuffer(tf_buf, dtype=np.uint8)
    v_dl = np.frombuffer(dl_buf, dtype=np.uint8)
    v_mtf = np.frombuffer(mtf_buf, dtype=np.uint8)
    lo_l, hi_l = lo.tolist(), hi.tolist()
    parts = []
    id_bl, tf_bl, dl_bl, mtf_bl = (id_b.tolist(), tf_b.tolist(),
                                   dl_b.tolist(), mtf_b.tolist())
    for i in range(nb):
        l, h = lo_l[i], hi_l[i]
        parts.append(v_id[id_bl[l]:id_bl[h]])
        parts.append(v_tf[tf_bl[l]:tf_bl[h]])
        parts.append(v_dl[dl_bl[l]:dl_bl[h]])
        parts.append(v_mtf[mtf_bl[l]:mtf_bl[h]])
    payload = np.concatenate(parts)
    blk_lens = ((id_b[hi] - id_b[lo]) + (tf_b[hi] - tf_b[lo])
                + (dl_b[hi] - dl_b[lo]) + (mtf_b[hi] - mtf_b[lo]))
    data_off = np.zeros(nb + 1, dtype=np.int32)
    data_off[1:] = np.cumsum(blk_lens).astype(np.int32)
    data_arr = pa.Array.from_buffers(
        pa.binary(), nb,
        [None, pa.py_buffer(data_off.tobytes()),
         pa.py_buffer(payload.tobytes())])
    struct_arr = pa.StructArray.from_arrays(
        [pa.array(ids[bstarts]),
         pa.array((hi - lo).astype(np.int32)),
         pa.array(max_tf_blk.astype(np.int64)),
         pa.array(min_dl_blk.astype(np.int64)),
         pa.array(max_ratio_blk.astype(np.float64)),
         data_arr],
        fields=list(struct_type))
    # blocks are emitted in row order (term-major): term t's blocks
    # are the contiguous run whose start is the first block at or
    # after the term's first row
    term_off = np.searchsorted(
        bstarts, np.concatenate((tstarts, [n]))).astype(np.int32)
    blocks = pa.ListArray.from_arrays(pa.array(term_off), struct_arr)
    return uniq, counts, ids[tstarts], blocks


def unpack_block_ids(data: bytes, n: int) -> np.ndarray:
    """Decode only the docIDs of one block (WAND pass 1 — upper
    bounds come from block metadata, no statistics decode)."""
    deltas, _ = decode_varints(data, n)
    return np.cumsum(deltas.astype(np.int64))


def unpack_block(data: bytes, n: int):
    """→ (doc_ids, tfs, dls, max_tfs), all int64."""
    deltas, tfs, dls, mtfs = decode_varint_sections(data, [n] * 4)
    ids = np.cumsum(deltas.astype(np.int64))
    return (ids, tfs.astype(np.int64), dls.astype(np.int64),
            mtfs.astype(np.int64))


def unpack_block_stats(data: bytes, n: int, offset: int):
    """Decode only the statistics sections (tf, dl, max_tf) of one
    block, starting at *offset* = the byte end of the id section
    (returned by the ids-only decode).  One fused scan."""
    tfs, dls, mtfs = decode_varint_sections(data, [n] * 3, offset)
    return (tfs.astype(np.int64), dls.astype(np.int64),
            mtfs.astype(np.int64))
