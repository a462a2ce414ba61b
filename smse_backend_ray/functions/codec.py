"""Posting-list codec: delta + LEB128-varint compression in independent
blocks with skip pointers and block-max metadata (north_star format).

Reference analog: the index payload the reference keeps in pgvector rows
(smse_backend/models/embedding.py:7-26) — here the payload is a compressed
posting list per (shard, term).

Layout per term (stored as parquet columns in the segment table):

  postings       binary   concatenated blocks; each block is
                          varint(len_docs) varint(len_tfs)
                          <docs bytes> <tfs bytes> <dls bytes>
                          where docs are delta-encoded (first value absolute
                          PER BLOCK, so blocks decode independently = skip)
  block_offsets  list<i64>  byte offset of each block in `postings`
  block_last     list<i64>  last doc_id of each block (skip pointer)
  block_max      list<f64>  max BM25 tf-norm in the block (idf-independent
                            upper bound; multiplied by idf*qtf at query time
                            for block-max WAND pruning)

Encode and decode are numpy-vectorized (no per-posting Python loop).
"""

from __future__ import annotations

import numpy as np

from smse_backend_ray.config import BM25Params
from smse_backend_ray.functions.bm25 import tfnorm_vec


# ---------------------------------------------------------------------------
# vectorized varint (LEB128)
# ---------------------------------------------------------------------------

def varint_encode(values: np.ndarray) -> bytes:
    """Encode a uint array as LEB128 varints (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.ones(v.size, dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        nbytes += tmp > 0
        tmp = tmp >> np.uint64(7)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    for j in range(int(nbytes.max())):
        mask = nbytes > j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = ((nbytes[mask] > j + 1).astype(np.uint8)) << 7
        out[offsets[mask] + j] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode LEB128 varints -> uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(b.size, dtype=np.int64)
    start_of = np.repeat(starts, ends - starts + 1)
    shifts = ((idx - start_of) * 7).astype(np.uint64)
    parts = (b & np.uint8(0x7F)).astype(np.uint64) << shifts
    return np.add.reduceat(parts, starts)


# ---------------------------------------------------------------------------
# posting blocks
# ---------------------------------------------------------------------------

def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    params: BM25Params,
    block_size: int,
) -> dict:
    """doc_ids must be sorted ascending and unique. Returns the segment-row
    payload: postings bytes + block metadata arrays + df."""
    n = len(doc_ids)
    if n == 0:
        return {
            "df": 0,
            "postings": b"",
            "block_offsets": [],
            "block_last": [],
            "block_max": [],
        }
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    tfn = tfnorm_vec(tfs, dls, avgdl, params)

    chunks: list[bytes] = []
    block_offsets: list[int] = []
    block_last: list[int] = []
    block_max: list[float] = []
    off = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = doc_ids[s]  # absolute per block -> independent decode
        deltas[1:] = np.diff(doc_ids[s:e]).astype(np.uint64)
        docs_b = varint_encode(deltas)
        tfs_b = varint_encode(tfs[s:e].astype(np.uint64))
        dls_b = varint_encode(dls[s:e].astype(np.uint64))
        head = varint_encode(np.array([len(docs_b), len(tfs_b)], dtype=np.uint64))
        blk = head + docs_b + tfs_b + dls_b
        block_offsets.append(off)
        block_last.append(int(doc_ids[e - 1]))
        block_max.append(float(tfn[s:e].max()))
        chunks.append(blk)
        off += len(blk)
    return {
        "df": n,
        "postings": b"".join(chunks),
        "block_offsets": block_offsets,
        "block_last": block_last,
        "block_max": block_max,
    }


def _read_head(buf: memoryview, off: int) -> tuple[int, int, int]:
    """Parse the two varint length headers starting at `off`.
    Returns (len_docs, len_tfs, header_end_offset)."""
    vals = []
    pos = off
    for _ in range(2):
        shift = 0
        v = 0
        while True:
            byte = buf[pos]
            v |= (byte & 0x7F) << shift
            pos += 1
            if not byte & 0x80:
                break
            shift += 7
        vals.append(v)
    return vals[0], vals[1], pos


def decode_block(
    postings: bytes, block_offsets: list[int], i: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode block i independently -> (doc_ids, tfs, dls)."""
    buf = memoryview(postings)
    off = block_offsets[i]
    end = block_offsets[i + 1] if i + 1 < len(block_offsets) else len(postings)
    len_docs, len_tfs, pos = _read_head(buf, off)
    docs = varint_decode(buf[pos : pos + len_docs])
    tfs = varint_decode(buf[pos + len_docs : pos + len_docs + len_tfs])
    dls = varint_decode(buf[pos + len_docs + len_tfs : end])
    doc_ids = np.cumsum(docs.astype(np.int64))
    return doc_ids, tfs.astype(np.int64), dls.astype(np.int64)


def decode_postings(
    postings: bytes, block_offsets: list[int]
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode the full posting list -> (doc_ids, tfs, dls), vectorized."""
    nb = len(block_offsets)
    if nb == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    parts = [decode_block(postings, block_offsets, i) for i in range(nb)]
    doc_ids = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    dls = np.concatenate([p[2] for p in parts])
    return doc_ids, tfs, dls
