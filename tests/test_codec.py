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


@given(posting_list())
@settings(max_examples=50, deadline=None)
def test_segment_block_roundtrip(pl):
    ids, tfs = pl
    dls = tfs + 7
    mtfs = np.maximum(tfs // 2, 1)
    blocks = codec.pack_segment_postings(ids, tfs, dls, mtfs,
                                         block_size=64)
    got = [codec.unpack_segment_block(b["data"], b["n"]) for b in blocks]
    assert (np.concatenate([g[0] for g in got]) == ids).all()
    assert (np.concatenate([g[1] for g in got]) == tfs).all()
    assert (np.concatenate([g[2] for g in got]) == dls).all()
    assert (np.concatenate([g[3] for g in got]) == mtfs).all()
    assert all(b["first_doc_id"] == int(u[0][0])
               for b, u in zip(blocks, got))


@given(posting_list(), st.data())
@settings(max_examples=50, deadline=None)
def test_final_block_roundtrip_and_maxes(pl, data):
    ids, tfs = pl
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    w = rng.standard_normal((ids.size, codec.N_WEIGHTS))
    blocks = codec.pack_final_postings(ids, tfs, w, block_size=32)
    off = 0
    for b in blocks:
        gids, gtfs, gw = codec.unpack_final_block(b["data"], b["n"])
        n = b["n"]
        assert (gids == ids[off:off + n]).all()
        assert (gtfs == tfs[off:off + n]).all()
        assert (gw == w[off:off + n]).all()
        assert b["max_w_raw"] == w[off:off + n, 0].max()
        assert b["max_bm25"] == w[off:off + n, 3].max()
        off += n
    assert off == ids.size
