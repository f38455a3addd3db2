"""Unit tests for the posting-block codec (pure numpy, no Spark)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from escp_spark.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edge_values():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**40, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals), vals.size), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"", 0).size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_property(vals):
    a = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(a), a.size), a)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**50), min_size=1, max_size=400, unique=True
    )
)
def test_delta_roundtrip_property(ids):
    a = np.sort(np.array(ids, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(a)), a)


def test_varint_roundtrip_across_encode_chunks():
    """The encoder processes values in _ENC_CHUNK slices; a stream
    longer than one chunk with mixed widths (1-byte deltas + sparse
    7-byte block-start docids) must stay byte-correct across the
    chunk seams, and the bytes must equal a trivial per-value
    reference encoder."""
    from escp_spark.codec import _ENC_CHUNK

    rng = np.random.default_rng(3)
    n = _ENC_CHUNK + 1017  # crosses one seam, ragged tail
    vals = rng.integers(0, 200, size=n).astype(np.uint64)
    vals[:: BLOCK_SIZE] = np.uint64(1) << np.uint64(46)
    buf = varint_encode(vals)
    assert np.array_equal(varint_decode(buf, n), vals)

    def ref_one(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | 0x80 if v else b)
            if not v:
                return bytes(out)

    probe = np.concatenate([vals[:300], vals[_ENC_CHUNK - 3 : _ENC_CHUNK + 3]])
    assert varint_encode(probe) == b"".join(ref_one(int(v)) for v in probe)


def test_encode_blocks_roundtrip_and_blockmax():
    rng = np.random.default_rng(7)
    n = 1000
    ids = np.sort(rng.choice(10**9, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    dls = rng.integers(1, 5000, size=n).astype(np.uint64)
    blocks = encode_blocks(ids, tfs, dls)
    assert len(blocks) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    got_ids, got_tfs, got_dls = [], [], []
    for b in blocks:
        i, t, d = decode_block(b["doc_ids"], b["tfs"], b["dls"], b["n"])
        assert b["doc_id_lo"] == i[0] and b["doc_id_hi"] == i[-1]
        assert b["max_tf"] == t.max() and b["min_dl"] == d.min()
        assert b["sum_tf"] == t.sum()
        got_ids.append(i)
        got_tfs.append(t)
        got_dls.append(d)
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_tfs), tfs)
    assert np.array_equal(np.concatenate(got_dls), dls)


def test_encode_blocks_single_doc():
    blocks = encode_blocks(
        np.array([42], dtype=np.uint64),
        np.array([3], dtype=np.uint64),
        np.array([10], dtype=np.uint64),
    )
    assert len(blocks) == 1 and blocks[0]["n"] == 1
    i, t, d = decode_block(
        blocks[0]["doc_ids"], blocks[0]["tfs"], blocks[0]["dls"], 1
    )
    assert (i[0], t[0], d[0]) == (42, 3, 10)
