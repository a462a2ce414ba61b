"""Bulk (Dataset-streaming) search path must match the oracle bitwise, like
the serving path."""

from __future__ import annotations

import shutil

import pytest

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.oracle import build_oracle_index, oracle_search
from smse_backend_ray.pipelines.build import build_index
from smse_backend_ray.pipelines.bulk_search import bulk_search
from smse_backend_ray.queryset import BASE_QUERIES, MULTIPART_QUERIES
from smse_backend_ray.sources.corpus import (
    corpus_from_documents,
    corpus_table_from_documents,
)

IDX = "/tmp/smse_test_bulk_idx"


@pytest.fixture(scope="module")
def bulk_idx(ray_session, sf_dir):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(
        corpus=corpus_from_documents(sf_dir), index_dir=IDX, cfg=EngineConfig(n_shards=4)
    )
    return build_oracle_index(corpus_table_from_documents(sf_dir))


def test_bulk_search_matches_oracle(bulk_idx):
    oidx = bulk_idx
    queries = BASE_QUERIES + MULTIPART_QUERIES  # unscoped set
    got = bulk_search(IDX, queries)
    rows = got.to_pylist()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    n_checked = 0
    for qs in queries:
        exp = oracle_search(oidx, list(qs.parts), limit=qs.limit)
        mine = by_q.get(qs.query_id, [])
        assert len(mine) == len(exp), qs.query_id
        for g, e in zip(mine, exp):
            assert g["doc_id"] == e["doc_id"]
            assert g["rank"] == e["rank"]
            assert g["exact_score"] == e["score"]  # bitwise
            n_checked += 1
    assert n_checked > 50


def test_bulk_search_no_hit(bulk_idx):
    from smse_backend_ray.queryset import QuerySpec

    out = bulk_search(IDX, [QuerySpec(999, ("qqzzquux nohitterm",))])
    assert out.num_rows == 0
    assert out.schema.names == ["query_id", "rank", "doc_id", "score", "exact_score"]


def test_bulk_search_parquet_sink_matches_collect(bulk_idx, tmp_path):
    """out_dir mode writes qbucket-partitioned parquet whose rows equal the
    collected path exactly; the returned manifest counts per bucket."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    want = bulk_search(IDX, BASE_QUERIES)
    out_dir = str(tmp_path / "bulk_out")
    manifest = bulk_search(IDX, BASE_QUERIES, out_dir=out_dir)
    assert int(pa.compute.sum(manifest["n_rows"]).as_py()) == want.num_rows

    got = pads.dataset(out_dir, partitioning="hive").to_table(
        columns=["query_id", "rank", "doc_id", "score", "exact_score"]
    )
    got = got.take(
        pa.compute.sort_indices(
            got, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )
    assert got.to_pydict() == want.to_pydict()
