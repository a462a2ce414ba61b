"""Ingest + analysis stages (stateless ``map_batches`` transforms).

Reference analogs:
  - key synthesis + size probe on upload (smse_backend/services/
    file_storage.py:534-570) -> deterministic doc_id + sha256 + n_bytes here
    (uuid naming :499-515 is replaced by a content-derived id: FIXTURES.md
    forbids run-order identity);
  - extension allowlist check (smse_backend/utils/file_extensions.py:49-59)
    -> ``allowed_langs`` filter;
  - text preprocessing before encoding (smse_backend/tasks.py:96-103, applied
    :219) -> the shared code-aware analyzer.

All stages are Arrow-in/Arrow-out and vectorized except the tokenizer itself
(a compiled-regex pass per document, C-speed, embarrassingly parallel).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.functions.analyzer import term_counts
from smse_backend_ray.sources.corpus import doc_id_from_key


def ingest_batch(batch: pa.Table, cfg: EngineConfig) -> pa.Table:
    """corpus batch -> analyzed docs batch.

    Output schema: doc_id, repo, path, commit, lang, content_sha256, n_bytes,
    dl, terms (list<string> sorted asc), tfs (list<int32>), shard_id.
    """
    from smse_backend_ray.sources.corpus import validate_corpus_schema

    validate_corpus_schema(batch.schema)
    repos = batch["repo"].to_pylist()
    paths = batch["path"].to_pylist()
    commits = batch["commit"].to_pylist()
    langs = batch["lang"].to_pylist()
    contents = batch["content"].to_pylist()

    n = len(repos)
    keep = range(n)
    if cfg.allowed_langs is not None:
        allowed = set(cfg.allowed_langs)
        keep = [i for i in range(n) if langs[i] in allowed]

    doc_ids, shas, nbytes, dls, terms_l, tfs_l = [], [], [], [], [], []
    out_repo, out_path, out_commit, out_lang = [], [], [], []
    for i in keep:
        c = contents[i] if contents[i] is not None else ""
        did = doc_id_from_key(repos[i], paths[i], commits[i])
        tcs = term_counts(c)
        doc_ids.append(did)
        shas.append(hashlib.sha256(c.encode()).hexdigest())
        nbytes.append(len(c.encode()))
        dls.append(sum(tf for _, tf in tcs))
        terms_l.append([t for t, _ in tcs])
        tfs_l.append([tf for _, tf in tcs])
        out_repo.append(repos[i])
        out_path.append(paths[i])
        out_commit.append(commits[i])
        out_lang.append(langs[i])

    shard_ids = [d % cfg.n_shards for d in doc_ids]
    extra = {}
    if "partition_id" in batch.column_names:  # file-mode lineage tag
        pid = batch["partition_id"].to_pylist()
        extra["partition_id"] = pa.array([pid[i] for i in keep], type=pa.int32())
    return pa.table(
        {
            **extra,
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "repo": pa.array(out_repo, type=pa.string()),
            "path": pa.array(out_path, type=pa.string()),
            "commit": pa.array(out_commit, type=pa.string()),
            "lang": pa.array(out_lang, type=pa.string()),
            "content_sha256": pa.array(shas, type=pa.string()),
            "n_bytes": pa.array(nbytes, type=pa.int64()),
            "dl": pa.array(dls, type=pa.int64()),
            "terms": pa.array(terms_l, type=pa.list_(pa.string())),
            "tfs": pa.array(tfs_l, type=pa.list_(pa.int32())),
            "shard_id": pa.array(shard_ids, type=pa.int32()),
        }
    )


def term_bucket(term: str, n_buckets: int) -> int:
    """Deterministic term -> shuffle bucket (process-stable, unlike hash())."""
    return zlib.crc32(term.encode()) % n_buckets


def explode_preagg_batch(batch: pa.Table, n_buckets: int) -> pa.Table:
    """Analyzed docs batch -> per-batch pre-aggregated posting runs.

    This is the SPIMI partial / salted pre-aggregation step (SURVEY.md A6):
    within one batch every term contributes ONE row holding list columns of
    its (doc_id, tf, dl) postings, so a hot term ("def", "return", ...)
    produces at most n_batches shuffle rows instead of df(term) rows. The
    shuffle key is a crc32 term bucket, NOT the raw term, so the wide merge
    runs over n_buckets groups (bounded task count, hot terms spread by
    hashing) rather than |vocab| groups.

    Output: bucket:int32, term:string, doc_ids:list<i64>, tfs:list<i32>,
    dls:list<i32>.
    """
    terms = batch["terms"]
    flat_terms = pc.list_flatten(terms)
    parent = pc.list_parent_indices(terms)
    flat = pa.table(
        {
            "term": flat_terms,
            "doc_id": pc.take(batch["doc_id"], parent),
            "tf": pc.cast(pc.list_flatten(batch["tfs"]), pa.int32()),
            "dl": pc.cast(pc.take(batch["dl"], parent), pa.int32()),
        }
    )
    g = flat.group_by("term").aggregate(
        [("doc_id", "list"), ("tf", "list"), ("dl", "list")]
    )
    uterms = g["term"].to_pylist()
    buckets = pa.array(
        [term_bucket(t, n_buckets) for t in uterms], type=pa.int32()
    )
    return pa.table(
        {
            "bucket": buckets,
            "term": g["term"],
            "doc_ids": g["doc_id_list"],
            "tfs": g["tf_list"],
            "dls": g["dl_list"],
        }
    )


class BucketEncoder:
    """Per-bucket merge + encode (the reduce side of the posting shuffle).

    One call receives ALL pre-aggregated runs for the terms hashed into one
    bucket (across all shards and input partitions). For each (term, shard)
    it k-way-merges the runs into one sorted posting list and encodes the
    delta-varint blocks (functions/codec.py); global df(term) is computed
    here too — the bucket holds every shard of a term, so document-frequency
    needs no second shuffle.
    """

    def __init__(self, avgdl: float, cfg: EngineConfig):
        self.avgdl = avgdl
        self.cfg = cfg

    def __call__(self, group: pa.Table) -> pa.Table:
        from smse_backend_ray.functions.codec import encode_postings

        cfg = self.cfg
        terms = group["term"].to_pylist()
        # zero-copy views of the flattened run arrays (never to_pylist a
        # large list column — Python materialization dominates otherwise)
        doc_col = group["doc_ids"].combine_chunks()
        flat_docs = np.asarray(doc_col.values, dtype=np.int64)
        doc_offs = np.asarray(doc_col.offsets)
        tf_col = group["tfs"].combine_chunks()
        flat_tfs = np.asarray(tf_col.values, dtype=np.int64)
        tf_offs = np.asarray(tf_col.offsets)
        dl_col = group["dls"].combine_chunks()
        flat_dls = np.asarray(dl_col.values, dtype=np.int64)
        dl_offs = np.asarray(dl_col.offsets)

        per_term: dict[str, list[int]] = {}
        for i, t in enumerate(terms):
            per_term.setdefault(t, []).append(i)

        out: dict[str, list] = {
            "shard_id": [], "term": [], "bucket": [], "df": [], "df_shard": [],
            "docs_bytes": [], "tfs_bytes": [], "dls_bytes": [],
            "block_doc_off": [], "block_tf_off": [], "block_dl_off": [],
            "block_last": [], "block_max": [],
        }
        nb = cfg_buckets(cfg)
        for term in sorted(per_term):
            runs = per_term[term]
            doc_ids = np.concatenate([flat_docs[doc_offs[i]:doc_offs[i+1]] for i in runs])
            tfs = np.concatenate([flat_tfs[tf_offs[i]:tf_offs[i+1]] for i in runs])
            dls = np.concatenate([flat_dls[dl_offs[i]:dl_offs[i+1]] for i in runs])
            order = np.argsort(doc_ids, kind="stable")
            doc_ids, tfs, dls = doc_ids[order], tfs[order], dls[order]
            df_global = len(doc_ids)
            shards = (doc_ids % cfg.n_shards).astype(np.int64)
            bkt = term_bucket(term, nb)
            for s in np.unique(shards):
                m = shards == s
                enc = encode_postings(
                    doc_ids[m], tfs[m], dls[m], self.avgdl, cfg.bm25, cfg.block_size
                )
                out["shard_id"].append(int(s))
                out["term"].append(term)
                out["bucket"].append(bkt)
                out["df"].append(df_global)
                out["df_shard"].append(enc["df"])
                for k in ("docs_bytes", "tfs_bytes", "dls_bytes",
                          "block_doc_off", "block_tf_off", "block_dl_off",
                          "block_last", "block_max"):
                    out[k].append(enc[k])
        return pa.table(
            {
                "shard_id": pa.array(out["shard_id"], type=pa.int32()),
                "term": pa.array(out["term"], type=pa.string()),
                "bucket": pa.array(out["bucket"], type=pa.int32()),
                "df": pa.array(out["df"], type=pa.int64()),
                "df_shard": pa.array(out["df_shard"], type=pa.int64()),
                "docs_bytes": pa.array(out["docs_bytes"], type=pa.binary()),
                "tfs_bytes": pa.array(out["tfs_bytes"], type=pa.binary()),
                "dls_bytes": pa.array(out["dls_bytes"], type=pa.binary()),
                "block_doc_off": pa.array(out["block_doc_off"], type=pa.list_(pa.int64())),
                "block_tf_off": pa.array(out["block_tf_off"], type=pa.list_(pa.int64())),
                "block_dl_off": pa.array(out["block_dl_off"], type=pa.list_(pa.int64())),
                "block_last": pa.array(out["block_last"], type=pa.list_(pa.int64())),
                "block_max": pa.array(out["block_max"], type=pa.list_(pa.float64())),
            }
        )


def cfg_buckets(cfg: EngineConfig) -> int:
    """Shuffle-bucket count: enough reduce tasks to spread hot terms but
    bounded (SURVEY.md §4 skew row)."""
    return max(64, cfg.n_shards * 8)
