"""Bulk (offline) search as a pure Ray Data pipeline.

The serving path (pipelines/search.py) holds decoded shards in an actor pool
— right for interactive top-k. For OFFLINE workloads (score a million mined
queries against the index once), the better shape is to stream the INDEX:

  read segments parquet, predicate-pushdown ``term IN (all query terms)``
  -> map_batches decode + per-(query, term) contribution arrays
  -> groupby(query_id).map_groups: term-ordered exact accumulation + top-k

Only the posting lists of queried terms leave storage (the segments table is
term-sorted within files via the bucket layout, so row-group pruning works),
nothing is pinned in memory, and the shuffle moves per-query candidate
contributions once. Scores are bitwise-identical to the oracle/serving path:
the per-query group accumulates contributions term-ascending with disjoint
per-shard doc sets (see stages/scorer._accumulate).

Scope filtering and metadata enrichment are not part of this path (bulk
output is (query_id, rank, doc_id, score); join doc meta downstream if
needed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from smse_backend_ray.config import DEFAULT_TOP_K, SCORE_DECIMALS, BM25Params
from smse_backend_ray.functions.bm25 import idf as idf_fn
from smse_backend_ray.functions.bm25 import tfnorm_vec
from smse_backend_ray.functions.codec import decode_postings
from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.fusion import fuse_parts
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.state.catalog import Catalog

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("exact_score", pa.float64()),
    ]
)


def bulk_search(index_dir: str, queries, limit: int = DEFAULT_TOP_K) -> pa.Table:
    """``queries``: sequence of queryset.QuerySpec (parts + limit are used;
    scope/threshold are serving-path features). Returns RESULT_SCHEMA rows
    sorted by (query_id, rank)."""
    cat = Catalog(index_dir)
    ifs = cat.ifs
    stats = cat.get_stats()
    cfg = cat.get_config()
    n_docs = stats["n_docs"]
    avgdl = stats["avgdl"]
    block_size = cfg["block_size"]
    params = BM25Params(**cfg["bm25"])

    # driver-side query analysis (tiny) + per-term fan-out map
    import pyarrow.dataset as pads

    df_ds = ifs.pads_dataset("df")
    term_queries: dict[str, list[tuple[int, float]]] = {}
    limits: dict[int, int] = {}
    for qs in queries:
        qtf, _ = fuse_parts(list(qs.parts))
        terms = sorted(qtf)
        tbl = df_ds.to_table(columns=["term", "df"], filter=pads.field("term").isin(terms))
        dfm = dict(zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()))
        limits[qs.query_id] = getattr(qs, "limit", limit) or limit
        for t in terms:
            d = dfm.get(t)
            if d:
                term_queries.setdefault(t, []).append(
                    (qs.query_id, qtf[t] * idf_fn(n_docs, d))
                )
    if not term_queries:
        return RESULT_SCHEMA.empty_table()

    needed = sorted(term_queries)
    fanout_ref = ray.put((term_queries, avgdl, block_size, params))

    seg = ifs.ray_read_parquet(
        "segments",
        filter=pc.field("term").isin(needed),  # row-group pushdown
    )

    def contribs(batch: pa.Table) -> pa.Table:
        tq, a_avgdl, a_bs, a_params = ray.get(fanout_ref)
        out = {"query_id": [], "term": [], "doc_ids": [], "contrib": []}
        for row in batch.to_pylist():
            ids, tfs, dls = decode_postings(row, a_bs)
            tfn = tfnorm_vec(tfs, dls, a_avgdl, a_params)
            for qid, w in tq.get(row["term"], ()):
                out["query_id"].append(qid)
                out["term"].append(row["term"])
                out["doc_ids"].append(ids.tolist())
                out["contrib"].append((w * tfn).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "term": pa.array(out["term"], type=pa.string()),
                "doc_ids": pa.array(out["doc_ids"], type=pa.list_(pa.int64())),
                "contrib": pa.array(out["contrib"], type=pa.list_(pa.float64())),
            }
        )

    limits_ref = ray.put(limits)

    def per_query_topk(g: pa.Table) -> pa.Table:
        lims = ray.get(limits_ref)
        qid = g["query_id"][0].as_py()
        # term-ascending row order; per-shard doc sets of one term are
        # disjoint, so row order within a term cannot change any sum
        order = pc.sort_indices(g["term"])
        g = g.take(order)
        doc_col = g["doc_ids"].combine_chunks()
        flat_ids = np.asarray(doc_col.values, dtype=np.int64)
        offs = np.asarray(doc_col.offsets, dtype=np.int64)
        flat_c = np.asarray(g["contrib"].combine_chunks().values, dtype=np.float64)
        uniq = np.unique(flat_ids)
        scores = np.zeros(uniq.size, dtype=np.float64)
        for i in range(g.num_rows):
            ids = flat_ids[offs[i] : offs[i + 1]]
            scores[np.searchsorted(uniq, ids)] += flat_c[offs[i] : offs[i + 1]]
        rscore = round_half_away(scores, SCORE_DECIMALS)
        k = lims.get(qid, DEFAULT_TOP_K)
        top = np.lexsort((uniq, -rscore))[:k]
        n = len(top)
        return pa.table(
            {
                "query_id": pa.array([qid] * n, type=pa.int64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
                "doc_id": pa.array(uniq[top], type=pa.int64()),
                "score": pa.array(rscore[top], type=pa.float64()),
                "exact_score": pa.array(scores[top], type=pa.float64()),
            }
        )

    results = (
        seg.map_batches(contribs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("query_id")
        .map_groups(per_query_topk, batch_format="pyarrow")
    )
    t = collect_table(results, empty_schema=RESULT_SCHEMA)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("query_id", "ascending"), ("rank", "ascending")]
        )
    )
