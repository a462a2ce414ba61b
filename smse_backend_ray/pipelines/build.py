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

All index I/O goes through state/fs.IndexFS (pyarrow.fs), so ``index_dir``
may be a local path, a ``file://``/``s3://`` URI, or a (FileSystem, path)
pair — build and serve work against shared/remote storage on a multi-node
cluster (reference StorageBackend contract,
smse_backend/services/file_storage.py:32-73 + S3 impl :220-431).

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
import time

import pyarrow as pa
import pyarrow.compute as pc

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
from smse_backend_ray.state.fs import IndexFS

DOCS_DIR = "docs"
SEGMENTS_DIR = "segments"
DF_DIR = "df"

# stage dependency order: invalidating one invalidates all after it
STAGE_ORDER = ["docs", "dedup", "stats", "segments", "df"]


def _cluster_cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


# ---------------------------------------------------------------------------
# docs stage
# ---------------------------------------------------------------------------

def _run_docs_from_dataset(corpus: "ray.data.Dataset", ifs: IndexFS, cfg: EngineConfig) -> None:
    # schema validation happens inside ingest_batch (corpus.schema() here
    # would trigger a separate partial execution of the upstream pipeline)
    ingest = functools.partial(ingest_batch, cfg=cfg)
    # batch_size=None: per-block batches. An explicit batch_size here makes
    # the fused map+write chain bundle MANY upstream blocks into one task
    # (bundling counts the chain's INPUT rows) and collapses parallelism.
    docs = corpus.map_batches(ingest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    # coalesce before the hive-partitioned write: every write task emits one
    # file PER SHARD, so W tasks x S shards files — uncoalesced that is a
    # small-file storm that dominates every downstream read. Target scales
    # WITH the cluster (cpus, not cpus/2): capping write parallelism below
    # the core count made the docs stage a fixed-cost floor that flattened
    # 4->16 CPU scaling
    docs = docs.repartition(max(8, _cluster_cpus()))
    ifs.atomic_write_dataset(docs, DOCS_DIR, partition_cols=["shard_id"])


def _run_docs_from_files(
    files: list[str], ifs: IndexFS, cfg: EngineConfig, cat: Catalog
) -> None:
    """Wave-committed file-mode build with per-partition lineage (one input
    file = one partition; reference Task-per-file analog,
    smse_backend/services/embedding.py:18)."""
    ifs.mkdirs(DOCS_DIR)
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
        wave_rel = f"{DOCS_DIR}/wave_{wave[0]:06d}"
        ifs.atomic_write_dataset(docs, wave_rel, partition_cols=["shard_id"])
        # per-partition metrics from the written wave (columnar, cheap)
        t = ifs.pads_dataset(wave_rel).to_table(columns=["partition_id", "n_bytes", "dl"])
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
        cat.mark_partitions_done(wave, metrics, ifs.join(wave_rel))


def _tag_partition(batch: pa.Table, pid: int) -> pa.Table:
    return batch.append_column(
        "partition_id", pa.array([pid] * len(batch), type=pa.int32())
    )


# ---------------------------------------------------------------------------
# dedup stage (exact, skew-aware; SURVEY.md D2)
# ---------------------------------------------------------------------------

_META_CACHE: dict[str, tuple[float, pa.Table]] = {}


def _docs_meta_table(ifs: IndexFS) -> pa.Table:
    """One driver-side scan of (doc_id, dl) shared by the dedup-detect and
    stats stages (cached per docs location + newest-file mtime)."""
    key = ifs.join(DOCS_DIR)
    stamp = max(
        (i.mtime.timestamp() if i.mtime else 0.0
         for i in ifs.list_infos(DOCS_DIR, recursive=True) if i.is_file),
        default=0.0,
    )
    hit = _META_CACHE.get(key)
    if hit and hit[0] == stamp:
        return hit[1]
    t = ifs.pads_dataset(DOCS_DIR).to_table(columns=["doc_id", "dl"])
    _META_CACHE[key] = (stamp, t)
    return t


def _find_dup_ids(ifs: IndexFS, cfg: EngineConfig) -> set[int]:
    if ifs.column_bytes(DOCS_DIR, ["doc_id", "dl"]) <= cfg.driver_agg_max_bytes:
        ids = _docs_meta_table(ifs)["doc_id"]
        g = pa.table({"doc_id": ids}).group_by("doc_id").aggregate([("doc_id", "count")])
        dup = g.filter(pc.greater(g["doc_id_count"], 1))
        return set(dup["doc_id"].to_pylist())
    counts = (
        ifs.ray_read_parquet(DOCS_DIR, columns=["doc_id"])
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
    )
    dup_tbl = counts.filter(expr="n > 1").to_pandas()
    return set() if dup_tbl.empty else set(dup_tbl["doc_id"].tolist())


def _run_dedup(ifs: IndexFS, cfg: EngineConfig) -> dict:
    dup_ids = _find_dup_ids(ifs, cfg)
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

    full = ifs.ray_read_parquet(DOCS_DIR)
    clean = full.map_batches(functools.partial(split, keep_dups=False), batch_format="pyarrow")
    dups = (
        full.map_batches(functools.partial(split, keep_dups=True), batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(winner, batch_format="pyarrow")
    )
    deduped = clean.union(dups)
    tmp_rel = DOCS_DIR + "_dedup"
    ifs.atomic_write_dataset(deduped, tmp_rel, partition_cols=["shard_id"])
    ifs.delete_dir(DOCS_DIR)
    ifs.move(tmp_rel, DOCS_DIR)
    return {"duplicates": len(dup_ids)}


# ---------------------------------------------------------------------------
# stats / segments / df stages
# ---------------------------------------------------------------------------

def _run_stats(ifs: IndexFS, cfg: EngineConfig) -> dict:
    if ifs.column_bytes(DOCS_DIR, ["doc_id", "dl"]) <= cfg.driver_agg_max_bytes:
        dl = _docs_meta_table(ifs)["dl"]
        n_docs = len(dl)
        sum_dl = int(pc.sum(dl).as_py() or 0)
    else:
        ds = ifs.ray_read_parquet(DOCS_DIR, columns=["dl"])
        row = ds.aggregate(Count(alias_name="n_docs"), Sum("dl", alias_name="sum_dl"))
        n_docs = int(row["n_docs"])
        sum_dl = int(row["sum_dl"] or 0)
    return {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 0.0,
    }


def _run_segments(ifs: IndexFS, cfg: EngineConfig, stats: dict) -> None:
    avgdl = stats["avgdl"]
    nb = cfg_buckets(cfg, n_docs=int(stats.get("n_docs") or 0) or None)
    ds = ifs.ray_read_parquet(DOCS_DIR, columns=["doc_id", "dl", "terms", "tfs"])
    runs = ds.map_batches(
        functools.partial(explode_preagg_batch, n_buckets=nb),
        batch_format="pyarrow",
        zero_copy_batch=True,
        # large batches: each batch emits one run-row per distinct term, so
        # hot terms produce n_batches rows — bigger batches shrink the
        # shuffle volume
        batch_size=max(cfg.batch_size, 8192),
    )
    # NO coalesce before the exchange: a plain repartition here funnels its
    # reduce through ONE task (822 MB serialized point, measured on the 1M
    # corpus) and leaves the sort-shuffle only a handful of giant map
    # blocks; the raw map fragments parallelize strictly better.
    enc = BucketEncoder(avgdl, cfg, n_buckets=nb)

    def encode_bucket(group: pa.Table) -> pa.Table:
        return enc(group)

    seg = runs.groupby("bucket").map_groups(encode_bucket, batch_format="pyarrow")
    ifs.atomic_write_dataset(seg, SEGMENTS_DIR, partition_cols=["shard_id"])


def _run_df(ifs: IndexFS, cfg: EngineConfig) -> None:
    if ifs.column_bytes(SEGMENTS_DIR, ["term", "df"]) <= cfg.driver_agg_max_bytes:
        t = ifs.pads_dataset(SEGMENTS_DIR).to_table(columns=["term", "df"])
        g = t.group_by("term").aggregate([("df", "max")])
        # select by NAME: pyarrow group_by column order has differed across
        # versions; a positional rename would silently swap term/df
        g = pa.table({"term": g["term"], "df": g["df_max"]}).sort_by("term")
        tmp = DF_DIR + ".tmp"
        if ifs.exists(tmp):
            ifs.delete_dir(tmp)
        ifs.mkdirs(tmp)
        ifs.write_table(g, f"{tmp}/df.parquet")
        if ifs.exists(DF_DIR):
            ifs.delete_dir(DF_DIR)
        ifs.move(tmp, DF_DIR)
        return
    ds = ifs.ray_read_parquet(SEGMENTS_DIR, columns=["term", "df"])
    df_tbl = ds.groupby("term").aggregate(Max("df", alias_name="df")).sort("term")
    ifs.atomic_write_dataset(df_tbl, DF_DIR)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def build_index(
    corpus: "ray.data.Dataset | None" = None,
    index_dir="",
    cfg: EngineConfig | None = None,
    input_files: list[str] | None = None,
    resume: bool = True,
) -> Catalog:
    """Build (or resume) a full index under ``index_dir`` (any IndexFS
    location: local path, URI, or (FileSystem, path) pair).

    Exactly one of ``corpus`` (a Dataset) or ``input_files`` (parquet paths,
    enables per-partition lineage/resume) must be given.
    """
    assert (corpus is None) != (input_files is None), "pass corpus XOR input_files"
    cfg = cfg or EngineConfig()
    cfg.validate()
    cat = Catalog(index_dir)
    ifs = cat.ifs
    if not resume:
        cat.invalidate_from(STAGE_ORDER)

    from dataclasses import asdict

    cat.set_config({**asdict(cfg), "analyzer": "code-v1"})

    if not cat.stage_done("docs"):
        cat.mark_stage("docs", "running")
        if input_files is not None:
            _run_docs_from_files(input_files, ifs, cfg, cat)
        else:
            _run_docs_from_dataset(corpus, ifs, cfg)
        cat.mark_stage("docs", "done")

    if not cat.stage_done("dedup"):
        cat.mark_stage("dedup", "running")
        m = _run_dedup(ifs, cfg) if cfg.dedup else {"duplicates": "skipped"}
        cat.mark_stage("dedup", "done", m)

    if not cat.stage_done("stats"):
        cat.mark_stage("stats", "running")
        stats = _run_stats(ifs, cfg)
        cat.set_stats(stats)
        cat.mark_stage("stats", "done", stats)

    if not cat.stage_done("segments"):
        cat.mark_stage("segments", "running")
        _run_segments(ifs, cfg, cat.get_stats())
        cat.mark_stage("segments", "done")

    if not cat.stage_done("df"):
        cat.mark_stage("df", "running")
        _run_df(ifs, cfg)
        cat.mark_stage("df", "done")

    return cat
