"""BucketEncoder (whole-bucket vectorized path) must produce byte-identical
segments to the per-term reference codec path. Since round 2 the shuffle
payload itself is varint-compressed (encode_runs/decode_runs), so the raw
runs tables here route through encode_runs first — exercising the
compressed map->reduce path end to end."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.functions.codec import decode_postings, encode_postings
from smse_backend_ray.stages.ingest import BucketEncoder, decode_runs, encode_runs


def _runs_table(rng, n_terms=40, n_runs=200, max_run=60):
    terms = [f"t{j:03d}" for j in range(n_terms)]
    rows = {"term": [], "doc_ids": [], "tfs": [], "dls": []}
    used: dict[str, set] = {t: set() for t in terms}
    for _ in range(n_runs):
        t = terms[int(rng.integers(0, n_terms))]
        k = int(rng.integers(1, max_run))
        cand = rng.choice(10**12, size=k * 3, replace=False)
        ids = [int(c) for c in cand if int(c) not in used[t]][:k]
        if not ids:
            continue
        used[t].update(ids)
        rows["term"].append(t)
        rows["doc_ids"].append(ids)
        rows["tfs"].append(rng.integers(1, 30, size=len(ids)).tolist())
        rows["dls"].append(rng.integers(1, 900, size=len(ids)).tolist())
    encoded = encode_runs(
        pa.array(rows["term"]),
        pa.array(rows["doc_ids"], type=pa.list_(pa.int64())),
        pa.array(rows["tfs"], type=pa.list_(pa.int32())),
        pa.array(rows["dls"], type=pa.list_(pa.int32())),
        n_buckets=64,
    )
    return rows, encoded


def test_encode_decode_runs_roundtrip():
    rng = np.random.default_rng(11)
    terms = ["alpha", "beta", "alpha"]
    ids = [sorted(rng.choice(10**12, size=5, replace=False).tolist()), [7], [1, 10**14]]
    tfs = [[1, 2, 3, 4, 5], [9], [2, 2]]
    dls = [[10, 20, 30, 40, 50], [7], [100, 200]]
    runs = encode_runs(
        pa.array(terms),
        pa.array(ids, type=pa.list_(pa.int64())),
        pa.array(tfs, type=pa.list_(pa.int32())),
        pa.array(dls, type=pa.list_(pa.int32())),
        n_buckets=8,
    )
    r_terms, r_lens, f_ids, f_tfs, f_dls = decode_runs(runs)
    assert r_terms == terms
    assert r_lens.tolist() == [5, 1, 2]
    off = 0
    for i in range(3):
        sl = slice(off, off + len(ids[i]))
        order = np.argsort(np.array(ids[i], dtype=np.int64), kind="stable")
        assert f_ids[sl].tolist() == np.array(ids[i])[order].tolist()
        assert f_tfs[sl].tolist() == np.array(tfs[i])[order].tolist()
        assert f_dls[sl].tolist() == np.array(dls[i])[order].tolist()
        off += len(ids[i])


@pytest.mark.parametrize("block_size", [4, 128])
def test_vectorized_equals_per_term(block_size):
    rng = np.random.default_rng(5)
    cfg = EngineConfig(n_shards=4, block_size=block_size)
    avgdl = 123.75
    raw, group = _runs_table(rng)
    out = BucketEncoder(avgdl, cfg)(group)

    # reference: gather + per-(term, shard) codec encode, from the RAW runs
    gathered: dict[str, dict[int, list]] = {}
    for term, ids_l, tfs_l, dls_l in zip(
        raw["term"], raw["doc_ids"], raw["tfs"], raw["dls"]
    ):
        g = gathered.setdefault(term, {})
        for d, tf, dl in zip(ids_l, tfs_l, dls_l):
            g[d] = [tf, dl]
    expected = {}
    for term, posts in gathered.items():
        ids = np.array(sorted(posts), dtype=np.int64)
        tfs = np.array([posts[d][0] for d in ids], dtype=np.int64)
        dls = np.array([posts[d][1] for d in ids], dtype=np.int64)
        shards = ids % cfg.n_shards
        for s in np.unique(shards):
            m = shards == s
            expected[(term, int(s))] = (
                encode_postings(ids[m], tfs[m], dls[m], avgdl, cfg.bm25, block_size),
                len(ids),
            )

    got_rows = out.to_pylist()
    assert len(got_rows) == len(expected)
    for row in got_rows:
        enc, df_global = expected[(row["term"], row["shard_id"])]
        assert row["df"] == df_global
        assert row["df_shard"] == enc["df"]
        assert row["enc_avgdl"] == avgdl  # WAND bound-rescale anchor
        for k in ("docs_bytes", "tfs_bytes", "dls_bytes"):
            assert row[k] == enc[k], (row["term"], k)
        for k in ("block_doc_off", "block_tf_off", "block_dl_off", "block_last", "block_max"):
            assert row[k] == enc[k], (row["term"], k)
        # and decodes losslessly
        ids, tfs, dls = decode_postings(row, block_size)
        ids2, tfs2, dls2 = decode_postings(enc, block_size)
        assert (ids == ids2).all() and (tfs == tfs2).all() and (dls == dls2).all()


def test_empty_group():
    cfg = EngineConfig(n_shards=4)
    empty = encode_runs(
        pa.array([], type=pa.string()),
        pa.array([], type=pa.list_(pa.int64())),
        pa.array([], type=pa.list_(pa.int32())),
        pa.array([], type=pa.list_(pa.int32())),
        n_buckets=64,
    )
    out = BucketEncoder(100.0, cfg)(empty)
    assert out.num_rows == 0


def test_cfg_buckets_scales_with_data():
    """Bucket count tracks corpus size: small builds don't over-fragment,
    huge builds keep per-reduce-task heap bounded, and the encoder's bucket
    column always uses the count it was constructed with."""
    from smse_backend_ray.stages.ingest import cfg_buckets

    cfg = EngineConfig(n_shards=8)
    cpu_scaled = cfg_buckets(cfg)  # no n_docs -> legacy CPU-scaled count
    assert cpu_scaled >= 64
    # tiny corpus: ~1k docs/bucket, never below n_shards
    assert cfg_buckets(cfg, n_docs=500) == cfg.n_shards
    assert cfg_buckets(cfg, n_docs=20_000) == max(cfg.n_shards, min(cpu_scaled, 20))
    # medium corpus: capped by the CPU-scaled count (unless the ~50k
    # docs/bucket heap floor already exceeds it)
    assert cfg_buckets(cfg, n_docs=10_000_000) == max(cpu_scaled, 200)
    # huge corpus: heap floor kicks in past 50k docs/bucket
    huge = cfg_buckets(cfg, n_docs=1_000_000_000)
    assert huge == max(cpu_scaled, 20_000)
    # encoder honors an explicit count regardless of session CPUs
    assert BucketEncoder(100.0, cfg, n_buckets=7).n_buckets == 7
