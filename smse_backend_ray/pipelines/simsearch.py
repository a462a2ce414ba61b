"""Similarity search over the ``embeddings`` table (list<float> column):
brute-force cosine top-k as the exact baseline, and an IVF (inverted-file)
variant as the scale path.

Pattern (SURVEY.md ST4 analog): the query matrix is broadcast once via
``ray.put`` and every batch does one blocked float64 matmul against it —
never a per-row Python loop, never a shuffle. The IVF variant trains k-means
centroids with deterministic seeding (first-k init, fixed iterations) and
restricts search to the ``nprobe`` nearest clusters; with nprobe = n_clusters
it is exactly the brute-force result (that configuration is the driver-gated
oracle; recall at lower nprobe is covered by tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import _parallel_blocks

N_QUERIES = 5   # frozen: query vectors are vec_id < 5
TOP_K = 10
IVF_CLUSTERS = 16
IVF_ITERS = 10


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def _load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.dataset as pads

    t = pads.dataset(_emb_path(sf_dir)).to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < N_QUERIES
    )
    ids = np.asarray(t["vec_id"])
    Q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, Q


def _topk_merge(parts: list[pa.Table], k: int) -> pa.Table:
    """Global top-k per query from per-batch candidates; rank by
    (round(cos,4) DESC, vec_id ASC) — the SQL oracle's exact rule."""
    t = pa.concat_tables(parts)
    qids = np.asarray(t["query_vec_id"])
    vids = np.asarray(t["vec_id"])
    sims = np.asarray(t["cosine"])
    out = {"query_vec_id": [], "rank": [], "vec_id": [], "cosine": []}
    for q in np.unique(qids):
        m = qids == q
        v, s = vids[m], sims[m]
        order = np.lexsort((v, -s))[:k]
        n = len(order)
        out["query_vec_id"].extend([int(q)] * n)
        out["rank"].extend(range(1, n + 1))
        out["vec_id"].extend(v[order].tolist())
        out["cosine"].extend(s[order].tolist())
    return pa.table(
        {
            "query_vec_id": pa.array(out["query_vec_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int32()),
            "vec_id": pa.array(out["vec_id"], type=pa.int64()),
            "cosine": pa.array(out["cosine"], type=pa.float64()),
        }
    )


def knn_bruteforce(sf_dir: str, k: int = TOP_K) -> pa.Table:
    qids, Q = _load_queries(sf_dir)
    qnorms = np.sqrt((Q * Q).sum(axis=1))
    ref = ray.put((qids, Q, qnorms))

    def batch_topk(t: pa.Table) -> pa.Table:
        q_ids, Qm, q_n = ray.get(ref)
        vids = np.asarray(t["vec_id"])
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        vn = np.sqrt((V * V).sum(axis=1))
        sims = round_half_away((Qm @ V.T) / np.outer(q_n, vn), 4)
        out = {"query_vec_id": [], "vec_id": [], "cosine": []}
        kk = min(k, len(vids))
        for qi in range(len(q_ids)):
            s = sims[qi]
            order = np.lexsort((vids, -s))[:kk]  # per-batch partial top-k
            out["query_vec_id"].extend([int(q_ids[qi])] * len(order))
            out["vec_id"].extend(vids[order].tolist())
            out["cosine"].extend(s[order].tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out["query_vec_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "cosine": pa.array(out["cosine"], type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    ).repartition(_parallel_blocks())
    cands = collect_table(ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True))
    return _topk_merge([cands], k)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def train_centroids(sf_dir: str, n_clusters: int = IVF_CLUSTERS, iters: int = IVF_ITERS) -> np.ndarray:
    """Deterministic distributed k-means: init = first n_clusters vectors by
    vec_id; each iteration broadcasts centroids and reduces per-batch partial
    (sum, count) — one small aggregation per iteration, no shuffle."""
    t = pq.read_table(_emb_path(sf_dir), columns=["vec_id", "embedding"])
    order = pc.sort_indices(t["vec_id"])
    M0 = np.array(t.take(order[:n_clusters])["embedding"].to_pylist(), dtype=np.float64)
    cents = M0.copy()

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["embedding"]
    ).repartition(_parallel_blocks()).materialize()

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(tb: pa.Table) -> pa.Table:
            C = ray.get(ref)
            V = np.array(tb["embedding"].to_pylist(), dtype=np.float64)
            d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, assign, V)
            counts = np.bincount(assign, minlength=len(C)).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(range(len(C)), type=pa.int32()),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "count": pa.array(counts, type=pa.int64()),
                }
            )

        parts = collect_table(
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        )
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents), dtype=np.int64)
        cl = np.asarray(parts["cluster"])
        ss = np.array(parts["sum"].to_pylist(), dtype=np.float64)
        cc = np.asarray(parts["count"])
        np.add.at(sums, cl, ss)
        np.add.at(counts, cl, cc)
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    return cents


def knn_ivf(sf_dir: str, k: int = TOP_K, nprobe: int = IVF_CLUSTERS) -> pa.Table:
    """IVF search: assign vectors to centroids, probe the nprobe nearest
    clusters per query. nprobe == n_clusters reproduces brute force exactly."""
    cents = train_centroids(sf_dir)
    qids, Q = _load_queries(sf_dir)
    qnorms = np.sqrt((Q * Q).sum(axis=1))
    qd = ((Q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]  # per-query clusters
    ref = ray.put((qids, Q, qnorms, cents, probe))

    def batch_topk(t: pa.Table) -> pa.Table:
        q_ids, Qm, q_n, C, prb = ray.get(ref)
        vids = np.asarray(t["vec_id"])
        V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        vn = np.sqrt((V * V).sum(axis=1))
        sims = round_half_away((Qm @ V.T) / np.outer(q_n, vn), 4)
        out = {"query_vec_id": [], "vec_id": [], "cosine": []}
        for qi in range(len(q_ids)):
            m = np.isin(assign, prb[qi])
            if not m.any():
                continue
            v, s = vids[m], sims[qi][m]
            order = np.lexsort((v, -s))[: min(k, len(v))]
            out["query_vec_id"].extend([int(q_ids[qi])] * len(order))
            out["vec_id"].extend(v[order].tolist())
            out["cosine"].extend(s[order].tolist())
        return pa.table(
            {
                "query_vec_id": pa.array(out["query_vec_id"], type=pa.int64()),
                "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                "cosine": pa.array(out["cosine"], type=pa.float64()),
            }
        )

    ds = ray.data.read_parquet(
        _emb_path(sf_dir), columns=["vec_id", "embedding"]
    ).repartition(_parallel_blocks())
    cands = collect_table(ds.map_batches(batch_topk, batch_format="pyarrow", zero_copy_batch=True))
    return _topk_merge([cands], k)
