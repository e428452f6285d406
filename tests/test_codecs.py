from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from bobo_spark.codecs import (
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    vb_decode,
    vb_encode,
)


def test_vb_roundtrip_basic():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**31, 2**40], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500, unique=True))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(xs):
    v = np.sort(np.array(xs, dtype=np.int64))
    first, deltas = delta_encode(v)
    assert np.array_equal(delta_decode(first, deltas), v)


def test_block_roundtrip():
    rng = np.random.default_rng(7)
    docs = np.sort(rng.choice(10**7, size=1000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=1000).astype(np.int64)
    contribs = rng.random(1000)
    blocks = list(encode_blocks(docs, tfs, contribs, block_size=128))
    assert len(blocks) == 8
    out_docs, out_tfs = [], []
    for b in blocks:
        d, t = decode_block(b["first_doc"], b["n_docs"], b["doc_bytes"], b["tf_bytes"])
        assert d[0] == b["first_doc"] and d[-1] == b["last_doc"]
        assert len(d) == b["n_docs"]
        out_docs.append(d)
        out_tfs.append(t)
    assert np.array_equal(np.concatenate(out_docs), docs)
    assert np.array_equal(np.concatenate(out_tfs), tfs)
    # block_max is a true upper bound per block
    for i, b in enumerate(blocks):
        assert b["block_max"] >= contribs[i * 128:(i + 1) * 128].max()
