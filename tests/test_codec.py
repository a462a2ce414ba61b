from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smse_backend_ray.config import BM25Params
from smse_backend_ray.functions.bm25 import tfnorm_vec
from smse_backend_ray.functions.codec import (
    decode_block,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**56 + 5], dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=200))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def _random_postings(n, seed=7):
    rng = np.random.default_rng(seed)
    doc_ids = np.sort(rng.choice(10**15, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    dls = rng.integers(1, 5000, size=n).astype(np.int64)
    return doc_ids, tfs, dls


@pytest.mark.parametrize("n,block_size", [(1, 128), (5, 2), (1000, 128), (257, 128)])
def test_postings_roundtrip(n, block_size):
    doc_ids, tfs, dls = _random_postings(n)
    p = BM25Params()
    enc = encode_postings(doc_ids, tfs, dls, avgdl=321.5, params=p, block_size=block_size)
    assert enc["df"] == n
    d, t, l = decode_postings(enc, block_size)
    assert (d == doc_ids).all() and (t == tfs).all() and (l == dls).all()
    # skip pointers
    nblocks = (n + block_size - 1) // block_size
    assert len(enc["block_doc_off"]) == nblocks
    assert enc["block_last"][-1] == doc_ids[-1]
    # block-max is a true upper bound of tfnorm within each block
    tfn = tfnorm_vec(tfs, dls, 321.5, p)
    for i in range(nblocks):
        s, e = i * block_size, min((i + 1) * block_size, n)
        assert enc["block_max"][i] == pytest.approx(tfn[s:e].max())
        assert enc["block_last"][i] == doc_ids[e - 1]


def test_block_independent_decode():
    doc_ids, tfs, dls = _random_postings(300, seed=11)
    enc = encode_postings(doc_ids, tfs, dls, 100.0, BM25Params(), block_size=100)
    for b, (s, e) in enumerate([(0, 100), (100, 200), (200, 300)]):
        d1, t1, l1 = decode_block(enc, b, 100)
        assert (d1 == doc_ids[s:e]).all()
        assert (t1 == tfs[s:e]).all()
        assert (l1 == dls[s:e]).all()


def test_empty_postings():
    enc = encode_postings(np.empty(0), np.empty(0), np.empty(0), 1.0, BM25Params(), 128)
    assert enc["df"] == 0
    d, t, l = decode_postings(enc, 128)
    assert d.size == 0


def test_compression_is_effective():
    # dense ascending ids with small gaps: delta+varint must beat 8B/posting
    doc_ids = np.cumsum(np.random.default_rng(3).integers(1, 20, size=10000)).astype(np.int64)
    tfs = np.ones(10000, dtype=np.int64)
    dls = np.full(10000, 100, dtype=np.int64)
    enc = encode_postings(doc_ids, tfs, dls, 100.0, BM25Params(), 128)
    assert len(enc["docs_bytes"]) < 2 * 10000  # ~1 byte/delta + block resets
    assert len(enc["tfs_bytes"]) == 10000
