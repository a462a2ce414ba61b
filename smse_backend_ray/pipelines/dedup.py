"""Deduplication operators over the ``documents`` / ``embeddings`` tables —
the training-data-pipeline additions (exact, n-gram Jaccard, MinHash-LSH,
SimHash, embedding-cosine near-dup).

Reference analog: uniqueness constraints + existence-check-then-insert
(SURVEY.md D2/D3; smse_backend/models/content.py:11, routes/auth.py:28-33) —
generalized to content-level near-dup detection as required for a 100 TB
training-data engine.

Scale notes (the partitioning assumptions each operator relies on):
  - exact: winner-per-fingerprint via groupby(fingerprint) — the shuffle
    carries only (fingerprint, doc_id) pairs, never content.
  - jaccard: exact inverted-index join on shingles; a shingle shared by d
    docs emits d*(d-1)/2 candidate pairs, so this is for verification /
    small scopes. The scale path is minhash_lsh (bounded band buckets).
  - minhash_lsh: shingle -> 64 minhashes -> 16 bands of 4 -> groupby(band
    bucket) -> candidate pairs -> exact-Jaccard verify. Only band-bucket
    collisions shuffle.
  - embedding near-dup: blocked matrix product against a broadcast
    (ray.put) normalized matrix; the scale path replaces the broadcast side
    with IVF buckets (see pipelines/simsearch.py).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from smse_backend_ray.functions.analyzer import split_subtokens
from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import _parallel_blocks

SHINGLE_K = 3
JACCARD_THRESHOLD = 0.5
MINHASH_PERMS = 64
LSH_BANDS = 16  # 16 bands x 4 rows
# the driver's synthetic embeddings max out near cos 0.51; 0.4 yields a
# meaningful (60-ish) deterministic pair set for the correctness gate
EMB_DUP_THRESHOLD = 0.4


def _read_documents(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return ds.repartition(_parallel_blocks())


def doc_shingles(text: str) -> list[str]:
    """Distinct word 3-gram shingles of the raw subtoken stream (sorted)."""
    toks = split_subtokens(text or "")
    return sorted(
        {" ".join(toks[i : i + SHINGLE_K]) for i in range(len(toks) - SHINGLE_K + 1)}
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str) -> pa.Table:
    """Winner (min doc_id) per md5(text) fingerprint -> surviving docs."""

    def fp_batch(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5((x or "").encode()).hexdigest() for x in t["text"].to_pylist()]
        # per-batch partial winner (combiner) before the tiny global groupby
        part = pa.table(
            {"fingerprint": pa.array(fps), "doc_id": t["doc_id"]}
        )
        g = part.group_by("fingerprint").aggregate([("doc_id", "min")])
        # by-name selection (group_by column order varies across pyarrow versions)
        return pa.table({"fingerprint": g["fingerprint"], "doc_id": g["doc_id_min"]})

    from ray.data.aggregate import Min

    winners = (
        _read_documents(sf_dir)
        .map_batches(fp_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fingerprint")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    t = collect_table(winners)
    t = t.select(["doc_id", "fingerprint"])
    return t.take(pc.sort_indices(t["doc_id"]))


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted shingle index)
# ---------------------------------------------------------------------------

def _shingle_rows(t: pa.Table) -> pa.Table:
    ids, shs = [], []
    for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for s in doc_shingles(text):
            ids.append(did)
            shs.append(s)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "shingle": pa.array(shs)}
    )


def jaccard_pairs(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> pa.Table:
    shingles = _read_documents(sf_dir).map_batches(_shingle_rows, batch_format="pyarrow", zero_copy_batch=True)

    # doc shingle-set sizes: tiny table -> broadcast
    from ray.data.aggregate import Count

    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="n"))
    sizes_t = collect_table(sizes_ds)
    sizes = dict(zip(sizes_t["doc_id"].to_pylist(), sizes_t["n"].to_pylist()))
    sizes_ref = ray.put(sizes)

    def emit_pairs(g: pa.Table) -> pa.Table:
        dids = sorted(g["doc_id"].to_pylist())
        a, b = [], []
        for i in range(len(dids)):
            for j in range(i + 1, len(dids)):
                a.append(dids[i])
                b.append(dids[j])
        return pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
        )

    from ray.data.aggregate import Count as Count2

    inter = (
        shingles.groupby("shingle")
        .map_groups(emit_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count2(alias_name="inter"))
    )

    def score(t: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        it = t["inter"].to_numpy().astype(np.float64)
        na = np.array([sz[x] for x in a.tolist()], dtype=np.float64)
        nb = np.array([sz[x] for x in b.tolist()], dtype=np.float64)
        j = it / (na + nb - it)
        m = j >= threshold
        return pa.table(
            {
                "a": pa.array(a[m], type=pa.int64()),
                "b": pa.array(b[m], type=pa.int64()),
                "jaccard": pa.array(round_half_away(j[m], 4), type=pa.float64()),
            }
        )

    out = inter.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    t = collect_table(out)
    return t.take(pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")]))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (scale path; verified against exact Jaccard)
# ---------------------------------------------------------------------------

def _minhash_sig(shingles: list[str]) -> np.ndarray | None:
    if not shingles:
        return None
    # deterministic hash per (perm, shingle): md5(perm || shingle) first 8B
    sig = np.full(MINHASH_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    base = np.array(
        [
            struct.unpack("<Q", hashlib.md5(s.encode()).digest()[:8])[0]
            for s in shingles
        ],
        dtype=np.uint64,
    )
    # 64 cheap xor-multiply permutations of the base hash (splitmix-style)
    for p in range(MINHASH_PERMS):
        x = base ^ np.uint64(0x9E3779B97F4A7C15 * (p + 1) & 0xFFFFFFFFFFFFFFFF)
        x = (x * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(31)
        sig[p] = x.min()
    return sig


def minhash_lsh_pairs(sf_dir: str, threshold: float = JACCARD_THRESHOLD) -> pa.Table:
    """LSH candidate generation + exact-Jaccard verification. Output schema
    == jaccard_pairs (pairs it found; high recall, verified precision)."""

    def band_rows(t: pa.Table) -> pa.Table:
        dids, bands, keys = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sig = _minhash_sig(doc_shingles(text))
            if sig is None:
                continue
            r = MINHASH_PERMS // LSH_BANDS
            for b in range(LSH_BANDS):
                h = hashlib.md5(sig[b * r : (b + 1) * r].tobytes()).hexdigest()[:16]
                dids.append(did)
                bands.append(b)
                keys.append(h)
        return pa.table(
            {
                "doc_id": pa.array(dids, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "key": pa.array(keys, type=pa.string()),
            }
        )

    def emit_pairs(g: pa.Table) -> pa.Table:
        dids = sorted(set(g["doc_id"].to_pylist()))
        a, b = [], []
        for i in range(len(dids)):
            for j in range(i + 1, len(dids)):
                a.append(dids[i])
                b.append(dids[j])
        return pa.table(
            {"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())}
        )

    cands_ds = (
        _read_documents(sf_dir)
        .map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["band", "key"])
        .map_groups(emit_pairs, batch_format="pyarrow")
    )
    cands_t = collect_table(cands_ds)
    if cands_t.num_rows == 0:
        return pa.table(
            {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}
        )
    pairs = sorted({(a, b) for a, b in zip(cands_t["a"].to_pylist(), cands_t["b"].to_pylist())})

    # exact verification of the (small) candidate set: read ONLY the
    # candidate docs (predicate pushdown — never materialize the corpus)
    import pyarrow.dataset as pads

    need = {d for p in pairs for d in p}
    docs = pads.dataset(os.path.join(sf_dir, "documents.parquet")).to_table(
        columns=["doc_id", "text"],
        filter=pads.field("doc_id").isin(sorted(need)),
    )
    sh = {
        did: set(doc_shingles(text))
        for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
    }
    a_out, b_out, j_out = [], [], []
    for a, b in pairs:
        sa, sb = sh[a], sh[b]
        inter = len(sa & sb)
        if not inter:
            continue
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(round_half_away(j, 4))
    return pa.table(
        {
            "a": pa.array(a_out, type=pa.int64()),
            "b": pa.array(b_out, type=pa.int64()),
            "jaccard": pa.array(j_out, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash fingerprints + near-dup pairs
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    toks = split_subtokens(text or "")
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = struct.unpack("<Q", hashlib.md5(t.encode()).digest()[:8])[0]
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by simhash hamming distance, banded by 16-bit chunks
    (a pair within hamming<=3 must agree on >=1 of 4 chunks)."""

    def sh_batch(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "simhash": pa.array(
                    [simhash64(x) for x in t["text"].to_pylist()], type=pa.uint64()
                ),
            }
        )

    sh_ds = _read_documents(sf_dir).map_batches(sh_batch, batch_format="pyarrow", zero_copy_batch=True)
    t = collect_table(sh_ds)
    dids = np.asarray(t["doc_id"])
    hashes = np.asarray(t["simhash"])
    # band by 16-bit chunks -> candidates -> exact hamming verify
    cand: set[tuple[int, int]] = set()
    for c in range(4):
        chunk = (hashes >> np.uint64(16 * c)) & np.uint64(0xFFFF)
        order = np.argsort(chunk, kind="stable")
        sc = chunk[order]
        bounds = np.flatnonzero(np.diff(sc)) + 1
        for grp in np.split(order, bounds):
            if 1 < len(grp) <= 200:
                g = sorted(dids[grp].tolist())
                for i in range(len(g)):
                    for j in range(i + 1, len(g)):
                        cand.add((g[i], g[j]))
    by_id = dict(zip(dids.tolist(), hashes.tolist()))
    a_o, b_o, d_o = [], [], []
    for a, b in sorted(cand):
        d = bin(by_id[a] ^ by_id[b]).count("1")
        if d <= max_hamming:
            a_o.append(a)
            b_o.append(b)
            d_o.append(d)
    return pa.table(
        {
            "a": pa.array(a_o, type=pa.int64()),
            "b": pa.array(b_o, type=pa.int64()),
            "hamming": pa.array(d_o, type=pa.int32()),
        }
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_dup_pairs(sf_dir: str, threshold: float = EMB_DUP_THRESHOLD) -> pa.Table:
    """Pairs (a < b) with cosine >= threshold. Broadcast normalized matrix,
    blocked matmul per batch (float64; SQL twin sums in double too)."""
    import pyarrow.parquet as pq

    full = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = np.asarray(full["vec_id"])
    M = np.array(full["embedding"].to_pylist(), dtype=np.float64)
    norms = np.sqrt((M * M).sum(axis=1))
    ref = ray.put((ids, M, norms))

    def pairs_batch(t: pa.Table) -> pa.Table:
        all_ids, allM, all_norms = ray.get(ref)
        bids = np.asarray(t["vec_id"])
        B = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        bnorms = np.sqrt((B * B).sum(axis=1))
        sims = (B @ allM.T) / np.outer(bnorms, all_norms)
        bi, aj = np.nonzero((sims >= threshold) & (bids[:, None] < all_ids[None, :]))
        return pa.table(
            {
                "a": pa.array(bids[bi], type=pa.int64()),
                "b": pa.array(all_ids[aj], type=pa.int64()),
                "cosine": pa.array(round_half_away(sims[bi, aj], 4), type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).repartition(_parallel_blocks())
    out = ds.map_batches(pairs_batch, batch_format="pyarrow", zero_copy_batch=True)
    t = collect_table(out)
    return t.take(pc.sort_indices(t, sort_keys=[("a", "ascending"), ("b", "ascending")]))
