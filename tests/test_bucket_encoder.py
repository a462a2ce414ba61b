"""BucketEncoder (whole-bucket vectorized path) must produce byte-identical
segments to the per-term reference codec path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.functions.codec import decode_postings, encode_postings
from smse_backend_ray.stages.ingest import BucketEncoder


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
    return pa.table(
        {
            "term": pa.array(rows["term"]),
            "doc_ids": pa.array(rows["doc_ids"], type=pa.list_(pa.int64())),
            "tfs": pa.array(rows["tfs"], type=pa.list_(pa.int32())),
            "dls": pa.array(rows["dls"], type=pa.list_(pa.int32())),
        }
    )


@pytest.mark.parametrize("block_size", [4, 128])
def test_vectorized_equals_per_term(block_size):
    rng = np.random.default_rng(5)
    cfg = EngineConfig(n_shards=4, block_size=block_size)
    avgdl = 123.75
    group = _runs_table(rng)
    out = BucketEncoder(avgdl, cfg)(group)

    # reference: gather + per-(term, shard) codec encode
    gathered: dict[str, dict[int, list]] = {}
    for row in group.to_pylist():
        g = gathered.setdefault(row["term"], {})
        for d, tf, dl in zip(row["doc_ids"], row["tfs"], row["dls"]):
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
    empty = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "doc_ids": pa.array([], type=pa.list_(pa.int64())),
            "tfs": pa.array([], type=pa.list_(pa.int32())),
            "dls": pa.array([], type=pa.list_(pa.int32())),
        }
    )
    out = BucketEncoder(100.0, cfg)(empty)
    assert out.num_rows == 0
