"""Codec property tests (mirrors the reference's encoder_test.go:9-55
round-trips, via hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rechercheinfoweb_spark.functions import codec


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=0, max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    buf = codec.encode_varints(np.array(vals, dtype=np.uint64))
    out, off = codec.decode_varints(buf, len(vals))
    assert list(out) == vals
    assert off == len(buf)


@given(st.integers(min_value=0, max_value=2**40))
@settings(max_examples=100, deadline=None)
def test_varint_boundaries(v):
    # 7-bit group boundaries (≤0x7F single byte, etc.)
    for x in (v, 127, 128, 16383, 16384):
        buf = codec.encode_varints(np.array([x], dtype=np.uint64))
        out, _ = codec.decode_varints(buf, 1)
        assert out[0] == x
        if x <= 0x7F:
            assert len(buf) == 1


@st.composite
def posting_list(draw):
    n = draw(st.integers(min_value=1, max_value=400))
    gaps = draw(st.lists(st.integers(min_value=1, max_value=2**33),
                         min_size=n, max_size=n))
    ids = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(draw(st.lists(
        st.integers(min_value=1, max_value=10**6),
        min_size=n, max_size=n)), dtype=np.int64)
    return ids, tfs


@given(st.data())
@settings(max_examples=30, deadline=None)
def test_group_pack_equals_per_term_pack(data):
    """pack_group_postings (one whole-group encode) must be
    byte-identical to pack_postings per term."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    n_terms = data.draw(st.integers(1, 12))
    terms_l, ids_l, tfs_l = [], [], []
    for t in range(n_terms):
        n = int(rng.integers(1, 90))
        ids = np.cumsum(rng.integers(1, 50, size=n))
        terms_l.extend([f"t{t:03d}"] * n)
        ids_l.append(ids)
        tfs_l.append(rng.integers(1, 30, size=n))
    terms = np.array(terms_l)
    ids = np.concatenate(ids_l)
    tfs = np.concatenate(tfs_l)
    dls = tfs + 5
    mtfs = tfs + rng.integers(0, 4, size=tfs.size)
    uniq, dfp, minids, blocks = codec.pack_group_postings(
        terms, ids, tfs, dls, mtfs, block_size=32)
    assert list(uniq) == sorted({t for t in terms})
    off = 0
    for i, term in enumerate(uniq):
        n = int(dfp[i])
        want = codec.pack_postings(ids[off:off + n], tfs[off:off + n],
                                   dls[off:off + n], mtfs[off:off + n],
                                   block_size=32)
        assert blocks[i] == want, term
        assert minids[i] == ids[off]
        off += n


@given(posting_list())
@settings(max_examples=50, deadline=None)
def test_v4_block_roundtrip_and_metadata(pl):
    ids, tfs = pl
    dls = tfs + 7
    mtfs = np.maximum(tfs, 1)  # doc max_tf >= tf by definition
    blocks = codec.pack_postings(ids, tfs, dls, mtfs, block_size=32)
    off = 0
    for b in blocks:
        n = b["n"]
        gids, gtfs, gdls, gmtfs = codec.unpack_block(b["data"], n)
        assert (gids == ids[off:off + n]).all()
        assert (gtfs == tfs[off:off + n]).all()
        assert (gdls == dls[off:off + n]).all()
        assert (gmtfs == mtfs[off:off + n]).all()
        # ids-only fast path (WAND pass 1) agrees
        assert (codec.unpack_block_ids(b["data"], n) == gids).all()
        # blocks decode independently: first id stored raw
        assert b["first_doc_id"] == int(ids[off])
        # idf-independent block metadata is exact
        assert b["max_tf"] == int(tfs[off:off + n].max())
        assert b["min_dl"] == int(dls[off:off + n].min())
        assert b["max_ratio"] == float(
            (tfs[off:off + n] / mtfs[off:off + n]).max())
        off += n
    assert off == ids.size
