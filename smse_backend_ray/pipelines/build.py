"""Index build orchestration (SURVEY.md §3.1 re-expression).

One build = staged Ray Data jobs with persisted intermediates and a lineage
manifest (state/catalog.py). Stages:

  docs      corpus -> ingest/analyze map_batches -> docs/ parquet,
            hive-partitioned by shard_id (scorers read their shard dir
            directly; no separate doc-meta table needed). File-mode builds
            run in waves with per-partition lineage; dataset-mode builds are
            a single stage.
  dedup     exact dedup on doc_id (winner = min content_sha256) — skew-aware:
            duplicate detection runs on the projected id column only, and
            only rows of *duplicated* ids are shuffled; unique rows stream
            through untouched (SURVEY.md D2)
  stats     N / sum_dl / avgdl aggregates -> manifest (broadcast later)
  segments  SPIMI explode + per-batch combine -> groupby(bucket) merge ->
            delta-varint posting blocks (stages/ingest.py, functions/codec.py)
  df        distinct (term, df) table, term-sorted for filter-pushdown reads

Every stage writes to a temp dir and renames on success (idempotent commit);
a restart skips completed stages / partitions via the manifest.

Small-data adaptivity: metadata-only reductions (duplicate detection, global
stats, the df rollup) switch between a driver-side pyarrow path (when the
projected columns are under EngineConfig.driver_agg_max_bytes) and the
distributed Ray path — a 100 TB build keeps every reduction distributed,
while a test/bench build does not pay shuffle-job fixed costs for
kilobyte-sized reductions.
"""

from __future__ import annotations

import functools
import glob as globmod
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.stages.ingest import (
    BucketEncoder,
    cfg_buckets,
    explode_preagg_batch,
    ingest_batch,
)
from smse_backend_ray.state.catalog import Catalog

DOCS_DIR = "docs"
SEGMENTS_DIR = "segments"
DF_DIR = "df"

# stage dependency order: invalidating one invalidates all after it
STAGE_ORDER = ["docs", "dedup", "stats", "segments", "df"]


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


def _dir_bytes(path: str, suffix: str = ".parquet") -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(suffix):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _column_bytes(path: str, columns: list[str]) -> int:
    """Approximate on-disk size of a column subset (parquet metadata only)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, fn)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    if col.path_in_schema.split(".")[0] in columns:
                        total += col.total_compressed_size
    return total


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


# ---------------------------------------------------------------------------
# docs stage
# ---------------------------------------------------------------------------

def _run_docs_from_dataset(corpus: "ray.data.Dataset", index_dir: str, cfg: EngineConfig) -> None:
    # schema validation happens inside ingest_batch (corpus.schema() here
    # would trigger a separate partial execution of the upstream pipeline)
    ingest = functools.partial(ingest_batch, cfg=cfg)
    # batch_size=None: per-block batches. An explicit batch_size here makes
    # the fused map+write chain bundle MANY upstream blocks into one task
    # (bundling counts the chain's INPUT rows) and collapses parallelism.
    docs = corpus.map_batches(ingest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # coalesce before the hive-partitioned write: every write task emits one
    # file PER SHARD, so W tasks x S shards files — uncoalesced that is a
    # small-file storm that dominates every downstream read
    docs = docs.repartition(max(8, _cluster_cpus() // 2))
    _atomic_write(docs, _docs_path(index_dir), partition_cols=["shard_id"])


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
        docs = ds.map_batches(ingest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        wave_dir = os.path.join(docs_root, f"wave_{wave[0]:06d}")
        _atomic_write(docs, wave_dir, partition_cols=["shard_id"])
        # per-partition metrics from the written wave (columnar, cheap)
        t = pads.dataset(wave_dir).to_table(columns=["partition_id", "n_bytes", "dl"])
        g = t.group_by("partition_id").aggregate(
            [("partition_id", "count"), ("n_bytes", "sum"), ("dl", "sum")]
        )
        metrics = {
            int(r["partition_id"]): {
                "rows": int(r["partition_id_count"]),
                "bytes": int(r["n_bytes_sum"]),
                "tokens": int(r["dl_sum"]),
                "wave_secs": round(time.time() - t0, 3),
            }
            for r in g.to_pylist()
        }
        cat.mark_partitions_done(wave, metrics, wave_dir)


def _tag_partition(batch: pa.Table, pid: int) -> pa.Table:
    return batch.append_column(
        "partition_id", pa.array([pid] * len(batch), type=pa.int32())
    )


# ---------------------------------------------------------------------------
# dedup stage (exact, skew-aware; SURVEY.md D2)
# ---------------------------------------------------------------------------

_META_CACHE: dict[str, tuple[float, pa.Table]] = {}


def _docs_meta_table(docs_dir: str) -> pa.Table:
    """One driver-side scan of (doc_id, dl) shared by the dedup-detect and
    stats stages (cached per docs dir + manifest-ish mtime)."""
    key = docs_dir
    stamp = max(
        (os.path.getmtime(os.path.join(r, f)) for r, _d, fs in os.walk(docs_dir) for f in fs),
        default=0.0,
    )
    hit = _META_CACHE.get(key)
    if hit and hit[0] == stamp:
        return hit[1]
    t = pads.dataset(docs_dir).to_table(columns=["doc_id", "dl"])
    _META_CACHE[key] = (stamp, t)
    return t


def _find_dup_ids(docs_dir: str, cfg: EngineConfig) -> set[int]:
    if _column_bytes(docs_dir, ["doc_id", "dl"]) <= cfg.driver_agg_max_bytes:
        ids = _docs_meta_table(docs_dir)["doc_id"]
        g = pa.table({"doc_id": ids}).group_by("doc_id").aggregate([("doc_id", "count")])
        dup = g.filter(pc.greater(g["doc_id_count"], 1))
        return set(dup["doc_id"].to_pylist())
    counts = (
        ray.data.read_parquet(docs_dir, columns=["doc_id"])
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
    )
    dup_tbl = counts.filter(expr="n > 1").to_pandas()
    return set() if dup_tbl.empty else set(dup_tbl["doc_id"].tolist())


def _run_dedup(index_dir: str, cfg: EngineConfig) -> dict:
    docs_dir = _docs_path(index_dir)
    dup_ids = _find_dup_ids(docs_dir, cfg)
    if not dup_ids:
        return {"duplicates": 0}

    # only duplicate-id rows shuffle; unique rows stream through
    dup_ref = ray.put(dup_ids)

    def split(t: pa.Table, keep_dups: bool) -> pa.Table:
        ids = ray.get(dup_ref)
        mask = pc.is_in(t["doc_id"], value_set=pa.array(sorted(ids), type=pa.int64()))
        return t.filter(mask if keep_dups else pc.invert(mask))

    def winner(g: pa.Table) -> pa.Table:
        # deterministic first-wins rule: min content_sha256
        # (stay in Arrow — list columns don't round-trip through pandas)
        i = pc.sort_indices(g["content_sha256"])[0].as_py()
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
    _atomic_write(deduped, tmp_out, partition_cols=["shard_id"])
    shutil.rmtree(docs_dir)
    os.replace(tmp_out, docs_dir)
    return {"duplicates": len(dup_ids)}


# ---------------------------------------------------------------------------
# stats / segments / df stages
# ---------------------------------------------------------------------------

def _run_stats(index_dir: str, cfg: EngineConfig) -> dict:
    docs_dir = _docs_path(index_dir)
    if _column_bytes(docs_dir, ["doc_id", "dl"]) <= cfg.driver_agg_max_bytes:
        dl = _docs_meta_table(docs_dir)["dl"]
        n_docs = len(dl)
        sum_dl = int(pc.sum(dl).as_py() or 0)
    else:
        ds = ray.data.read_parquet(docs_dir, columns=["dl"])
        row = ds.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl"))
        n_docs = int(row["n_docs"])
        sum_dl = int(row["sum_dl"] or 0)
    return {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
    }


def _run_segments(index_dir: str, cfg: EngineConfig, avgdl: float) -> None:
    nb = cfg_buckets(cfg)
    ds = ray.data.read_parquet(
        _docs_path(index_dir), columns=["doc_id", "dl", "terms", "tfs"]
    )
    runs = ds.map_batches(
        functools.partial(explode_preagg_batch, n_buckets=nb),
        batch_format="pyarrow",
        zero_copy_batch=True,
        # large batches: each batch emits one run-row per distinct term, so
        # hot terms produce n_batches rows — bigger batches shrink the
        # shuffle volume
        batch_size=max(cfg.batch_size, 8192),
    )
    # coalesce pre-aggregated runs before the wide exchange: fewer map
    # fragments -> far less shuffle fixed cost (M x R block fragments)
    n_coalesce = max(8, min(64, _cluster_cpus()))
    runs = runs.repartition(n_coalesce)
    enc = BucketEncoder(avgdl, cfg)

    def encode_bucket(group: pa.Table) -> pa.Table:
        return enc(group)

    seg = runs.groupby("bucket").map_groups(encode_bucket, batch_format="pyarrow")
    _atomic_write(seg, os.path.join(index_dir, SEGMENTS_DIR), partition_cols=["shard_id"])


def _run_df(index_dir: str, cfg: EngineConfig) -> None:
    seg_dir = os.path.join(index_dir, SEGMENTS_DIR)
    out_dir = os.path.join(index_dir, DF_DIR)
    if _column_bytes(seg_dir, ["term", "df"]) <= cfg.driver_agg_max_bytes:
        t = pads.dataset(seg_dir).to_table(columns=["term", "df"])
        g = t.group_by("term").aggregate([("df", "max")])
        # select by NAME: pyarrow group_by column order has differed across
        # versions; a positional rename would silently swap term/df
        g = pa.table({"term": g["term"], "df": g["df_max"]}).sort_by("term")
        tmp = out_dir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        pq.write_table(g, os.path.join(tmp, "df.parquet"))
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.replace(tmp, out_dir)
        return
    ds = ray.data.read_parquet(seg_dir, columns=["term", "df"])
    df_tbl = ds.groupby("term").aggregate(Max("df", alias_name="df")).sort("term")
    _atomic_write(df_tbl, out_dir)


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
        stats = _run_stats(index_dir, cfg)
        cat.set_stats(stats)
        cat.mark_stage("stats", "done", stats)

    if not cat.stage_done("segments"):
        cat.mark_stage("segments", "running")
        _run_segments(index_dir, cfg, cat.get_stats()["avgdl"])
        cat.mark_stage("segments", "done")

    if not cat.stage_done("df"):
        cat.mark_stage("df", "running")
        _run_df(index_dir, cfg)
        cat.mark_stage("df", "done")

    return cat
