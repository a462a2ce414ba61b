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
            expected[(term, int(s))] = encode_postings(
                ids[m], tfs[m], dls[m], avgdl, cfg.bm25, block_size
            )

    got_rows = out.to_pylist()
    assert len(got_rows) == len(expected)
    for row in got_rows:
        enc = expected[(row["term"], row["shard_id"])]
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
    """Term-bucket count tracks corpus size: the shuffle key is
    (bucket, shard), so cfg_buckets returns ceil(target_groups / n_shards)
    — small builds don't over-fragment, huge builds keep per-reduce-task
    heap bounded."""
    from smse_backend_ray.stages.ingest import cfg_buckets

    cfg = EngineConfig(n_shards=8)
    ns = cfg.n_shards

    def ceil_div(a, b):
        return -(-a // b)

    cpu_groups = cfg_buckets(cfg) * ns  # no n_docs -> CPU-scaled group count
    assert cpu_groups >= 64
    # tiny corpus: ~1k docs/group target collapses to n_shards groups
    # (1 term bucket) — never fewer
    assert cfg_buckets(cfg, n_docs=500) == 1
    assert cfg_buckets(cfg, n_docs=20_000) == ceil_div(
        max(ns, min(cpu_groups, 20)), ns
    )
    # medium corpus: capped by the CPU-scaled group count (unless the ~50k
    # docs/group heap floor already exceeds it)
    assert cfg_buckets(cfg, n_docs=10_000_000) == ceil_div(max(cpu_groups, 200), ns)
    # huge corpus: heap floor kicks in past 50k docs/group
    assert cfg_buckets(cfg, n_docs=1_000_000_000) == ceil_div(
        max(cpu_groups, 20_000), ns
    )


def test_hot_term_shuffle_key_is_shard_aware():
    """SURVEY §4 skew mandate: a term present in EVERY doc must spread its
    shuffle rows over n_shards distinct reduce keys, so the hottest term's
    reduce group is bounded at O(docs/shard) — never O(global df)."""
    from smse_backend_ray.stages.ingest import explode_preagg_batch, term_bucket

    cfg = EngineConfig(n_shards=4)
    n_docs, nb = 64, 3
    doc_ids = np.arange(1000, 1000 + n_docs, dtype=np.int64)
    batch = pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "dl": pa.array([2] * n_docs, type=pa.int64()),
            "terms": pa.array(
                [["hotterm", f"rare{i:03d}"] for i in range(n_docs)],
                type=pa.list_(pa.string()),
            ),
            "tfs": pa.array([[1, 1]] * n_docs, type=pa.list_(pa.int32())),
        }
    )
    runs = explode_preagg_batch(batch, n_buckets=nb, n_shards=cfg.n_shards)
    hot = runs.filter(pa.compute.equal(runs["term"], "hotterm"))
    skeys = sorted(set(hot["skey"].to_pylist()))
    hb = term_bucket("hotterm", nb)
    # one run per (hotterm, shard), each under its own shuffle key
    assert hot.num_rows == cfg.n_shards
    assert skeys == [hb * cfg.n_shards + s for s in range(cfg.n_shards)]
    # each run carries only its shard's postings (~n_docs/n_shards)
    assert sorted(hot["n"].to_pylist()) == [16, 16, 16, 16]
    # rare terms: exactly one run each, keyed consistently
    rare = runs.filter(pa.compute.equal(runs["term"], "rare007"))
    assert rare.num_rows == 1
    sk = rare["skey"][0].as_py()
    assert sk == term_bucket("rare007", nb) * cfg.n_shards + int(doc_ids[7] % 4)
    # and the whole-batch merge of these runs still encodes correctly
    out = BucketEncoder(2.0, cfg)(runs.drop_columns(["skey"]))
    hot_rows = out.filter(pa.compute.equal(out["term"], "hotterm"))
    assert sorted(hot_rows["df_shard"].to_pylist()) == [16, 16, 16, 16]
