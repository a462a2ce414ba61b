"""Index build orchestration (SURVEY.md §3.1 re-expression).

One build = staged Ray Data jobs with persisted intermediates and a lineage
manifest (state/catalog.py). Stages:

  docs      corpus -> ingest/analyze map_batches -> docs/ parquet
            (file-mode builds run in waves with per-partition lineage;
             dataset-mode builds are a single stage)
  dedup     exact dedup on doc_id (winner = min content_sha256) — skew-aware:
            only rows of *duplicated* ids are shuffled; unique rows stream
            through untouched (SURVEY.md D2)
  stats     N / sum_dl / avgdl aggregates -> manifest (broadcast later)
  docmeta   compact per-shard doc metadata for scorers + enrichment join
  segments  SPIMI explode + per-batch combine -> groupby(bucket) merge ->
            delta-varint posting blocks (stages/ingest.py, functions/codec.py)
  df        distinct (term, df) table, term-sorted for filter-pushdown reads

Every stage writes to a temp dir and renames on success (idempotent commit);
a restart skips completed stages / partitions via the manifest.
"""

from __future__ import annotations

import functools
import os
import shutil
import time

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.sources.corpus import validate_corpus_schema
from smse_backend_ray.stages.ingest import (
    BucketEncoder,
    cfg_buckets,
    explode_preagg_batch,
    ingest_batch,
)
from smse_backend_ray.state.catalog import Catalog

DOCS_DIR = "docs"
DOCMETA_DIR = "docmeta"
SEGMENTS_DIR = "segments"
DF_DIR = "df"

# stage dependency order: invalidating one invalidates all after it
STAGE_ORDER = ["docs", "dedup", "stats", "docmeta", "segments", "df"]


def _atomic_write(ds: "ray.data.Dataset", out_dir: str, **kwargs) -> None:
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp, **kwargs)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)


def _docs_path(index_dir: str) -> str:
    return os.path.join(index_dir, DOCS_DIR)


# ---------------------------------------------------------------------------
# docs stage
# ---------------------------------------------------------------------------

def _run_docs_from_dataset(corpus: "ray.data.Dataset", index_dir: str, cfg: EngineConfig) -> None:
    validate_corpus_schema(corpus.schema())
    ingest = functools.partial(ingest_batch, cfg=cfg)
    docs = corpus.map_batches(
        ingest, batch_format="pyarrow", batch_size=cfg.batch_size
    )
    _atomic_write(docs, _docs_path(index_dir))


def _run_docs_from_files(
    files: list[str], index_dir: str, cfg: EngineConfig, cat: Catalog
) -> None:
    """Wave-committed file-mode build with per-partition lineage (one input
    file = one partition; reference Task-per-file analog,
    smse_backend/services/embedding.py:18)."""
    docs_root = _docs_path(index_dir)
    os.makedirs(docs_root, exist_ok=True)
    partitions = {i: [f] for i, f in enumerate(sorted(files))}
    pending = cat.plan_partitions(partitions)
    ingest = functools.partial(ingest_batch, cfg=cfg)
    for w in range(0, len(pending), cfg.wave_size):
        wave = pending[w : w + cfg.wave_size]
        t0 = time.time()
        parts = []
        for pid in wave:
            ds = ray.data.read_parquet(partitions[pid])
            ds = ds.map_batches(
                functools.partial(_tag_partition, pid=pid), batch_format="pyarrow"
            )
            parts.append(ds)
        ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        docs = ds.map_batches(ingest, batch_format="pyarrow", batch_size=cfg.batch_size)
        wave_dir = os.path.join(docs_root, f"wave_{wave[0]:06d}")
        _atomic_write(docs, wave_dir)
        # per-partition metrics from the written wave (columnar, cheap)
        stats = (
            ray.data.read_parquet(wave_dir, columns=["partition_id", "n_bytes", "dl"])
            .groupby("partition_id")
            .aggregate(Count(alias_name="rows"), Sum("n_bytes", alias_name="bytes"), Sum("dl", alias_name="tokens"))
            .to_pandas()
        )
        metrics = {
            int(r.partition_id): {
                "rows": int(r.rows),
                "bytes": int(r.bytes),
                "tokens": int(r.tokens),
                "wave_secs": round(time.time() - t0, 3),
            }
            for r in stats.itertuples()
        }
        cat.mark_partitions_done(wave, metrics, wave_dir)


def _tag_partition(batch: pa.Table, pid: int) -> pa.Table:
    return batch.append_column(
        "partition_id", pa.array([pid] * len(batch), type=pa.int32())
    )


# ---------------------------------------------------------------------------
# dedup stage (exact, skew-aware; SURVEY.md D2)
# ---------------------------------------------------------------------------

def _run_dedup(index_dir: str, cfg: EngineConfig) -> dict:
    docs_dir = _docs_path(index_dir)
    # 1. find duplicated doc_ids: per-batch partial counts -> tiny groupby
    def partial_counts(t: pa.Table) -> pa.Table:
        g = pa.table({"doc_id": t["doc_id"]}).group_by("doc_id").aggregate([("doc_id", "count")])
        return pa.table({"doc_id": g["doc_id"], "cnt": pa.compute.cast(g["doc_id_count"], pa.int64())})

    counts = (
        ray.data.read_parquet(docs_dir, columns=["doc_id"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("cnt", alias_name="n"))
    )
    dup_tbl = counts.filter(expr="n > 1").to_pandas()
    if dup_tbl.empty:
        return {"duplicates": 0}
    dup_ids = set(dup_tbl["doc_id"].tolist())

    # 2. split: unique rows stream through; only duplicate-id rows shuffle
    dup_ref = ray.put(dup_ids)

    def split(t: pa.Table, keep_dups: bool) -> pa.Table:
        ids = set(ray.get(dup_ref))
        mask = pa.array([d in ids for d in t["doc_id"].to_pylist()])
        return t.filter(mask if keep_dups else pa.compute.invert(mask))

    def winner(g: pa.Table) -> pa.Table:
        # deterministic first-wins rule: min content_sha256
        # (stay in Arrow — list columns don't round-trip through pandas)
        i = pa.compute.sort_indices(g["content_sha256"])[0].as_py()
        return g.slice(i, 1)

    full = ray.data.read_parquet(docs_dir)
    clean = full.map_batches(functools.partial(split, keep_dups=False), batch_format="pyarrow")
    dups = (
        full.map_batches(functools.partial(split, keep_dups=True), batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(winner, batch_format="pyarrow")
    )
    deduped = clean.union(dups)
    tmp_out = os.path.join(index_dir, DOCS_DIR + "_dedup")
    _atomic_write(deduped, tmp_out)
    shutil.rmtree(docs_dir)
    os.replace(tmp_out, docs_dir)
    return {"duplicates": len(dup_ids)}


# ---------------------------------------------------------------------------
# stats / docmeta / segments / df stages
# ---------------------------------------------------------------------------

def _run_stats(index_dir: str) -> dict:
    ds = ray.data.read_parquet(_docs_path(index_dir), columns=["dl"])
    row = ds.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl"))
    n_docs = int(row["n_docs"])
    sum_dl = int(row["sum_dl"] or 0)
    return {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
    }


def _run_docmeta(index_dir: str) -> None:
    ds = ray.data.read_parquet(
        _docs_path(index_dir),
        columns=["doc_id", "repo", "path", "commit", "lang", "content_sha256", "n_bytes", "dl", "shard_id"],
    )
    _atomic_write(ds, os.path.join(index_dir, DOCMETA_DIR), partition_cols=["shard_id"])


def _run_segments(index_dir: str, cfg: EngineConfig, avgdl: float) -> None:
    nb = cfg_buckets(cfg)
    ds = ray.data.read_parquet(
        _docs_path(index_dir), columns=["doc_id", "dl", "terms", "tfs"]
    )
    runs = ds.map_batches(
        functools.partial(explode_preagg_batch, n_buckets=nb),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    enc = BucketEncoder(avgdl, cfg)

    def encode_bucket(group: pa.Table) -> pa.Table:
        return enc(group)

    seg = runs.groupby("bucket").map_groups(encode_bucket, batch_format="pyarrow")
    _atomic_write(seg, os.path.join(index_dir, SEGMENTS_DIR), partition_cols=["shard_id"])


def _run_df(index_dir: str) -> None:
    ds = ray.data.read_parquet(
        os.path.join(index_dir, SEGMENTS_DIR), columns=["term", "df"]
    )
    df_tbl = ds.groupby("term").aggregate(Max("df", alias_name="df")).sort("term")
    _atomic_write(df_tbl, os.path.join(index_dir, DF_DIR))


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def build_index(
    corpus: "ray.data.Dataset | None" = None,
    index_dir: str = "",
    cfg: EngineConfig | None = None,
    input_files: list[str] | None = None,
    resume: bool = True,
) -> Catalog:
    """Build (or resume) a full index under ``index_dir``.

    Exactly one of ``corpus`` (a Dataset) or ``input_files`` (parquet paths,
    enables per-partition lineage/resume) must be given.
    """
    assert (corpus is None) != (input_files is None), "pass corpus XOR input_files"
    cfg = cfg or EngineConfig()
    cfg.validate()
    cat = Catalog(index_dir)
    if not resume:
        cat.invalidate_from(STAGE_ORDER)

    from dataclasses import asdict

    cat.set_config({**asdict(cfg), "analyzer": "code-v1"})

    if not cat.stage_done("docs"):
        cat.mark_stage("docs", "running")
        if input_files is not None:
            _run_docs_from_files(input_files, index_dir, cfg, cat)
        else:
            _run_docs_from_dataset(corpus, index_dir, cfg)
        cat.mark_stage("docs", "done")

    if not cat.stage_done("dedup"):
        cat.mark_stage("dedup", "running")
        m = _run_dedup(index_dir, cfg) if cfg.dedup else {"duplicates": "skipped"}
        cat.mark_stage("dedup", "done", m)

    if not cat.stage_done("stats"):
        cat.mark_stage("stats", "running")
        stats = _run_stats(index_dir)
        cat.set_stats(stats)
        cat.mark_stage("stats", "done", stats)

    if not cat.stage_done("docmeta"):
        cat.mark_stage("docmeta", "running")
        _run_docmeta(index_dir)
        cat.mark_stage("docmeta", "done")

    if not cat.stage_done("segments"):
        cat.mark_stage("segments", "running")
        _run_segments(index_dir, cfg, cat.get_stats()["avgdl"])
        cat.mark_stage("segments", "done")

    if not cat.stage_done("df"):
        cat.mark_stage("df", "running")
        _run_df(index_dir)
        cat.mark_stage("df", "done")

    return cat
