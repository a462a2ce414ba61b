"""Deterministic corpus sampling over the ``documents`` table.

A 100 TB training-data pipeline subsamples constantly (ablation corpora,
per-language rebalancing, eval holdouts). These operators are hash-based
Bernoulli samples — membership depends only on ``doc_id``, never on run
order, partitioning or a seed carried in driver state — so a sample is
reproducible across runs and resumable mid-pipeline (the reference has no
sampling surface, SURVEY.md §2.5 T4; this is a training-data addition like
textstats/dedup).

Scale shape: a stateless ``map_batches`` filter — no shuffle, no driver
collection, nothing materialized; the decision hash is exact uint32 modular
arithmetic so the DuckDB oracle (HUGEINT-widened) reproduces it bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from smse_backend_ray.functions.collect import collect_table
from smse_backend_ray.sources.corpus import _parallel_blocks, _parquet_rows

# Knuth multiplicative hash on the low 32 bits of doc_id; uniform on
# [0, 2^32) for any doc_id distribution (sequential driver ids included).
SAMPLE_MULT = 2654435761
SAMPLE_MOD = 2**32
SAMPLE_PCT = 20
# per-language keep rates (percent): downsample the dominant language,
# keep the tails — the classic corpus-rebalancing move.
STRATA_PCT = {"en": 10, "de": 30, "es": 30, "fr": 30, "zh": 30}
STRATA_DEFAULT_PCT = 20


def sample_key(doc_ids: np.ndarray) -> np.ndarray:
    """uint32 decision key; exact mod-2^32 arithmetic (see module doc)."""
    d = doc_ids.astype(np.uint64)
    return ((d % np.uint64(SAMPLE_MOD)) * np.uint64(SAMPLE_MULT)) % np.uint64(
        SAMPLE_MOD
    )


def _threshold(pct: int) -> int:
    return (SAMPLE_MOD * pct) // 100


def _read_docs(sf_dir: str) -> "ray.data.Dataset":
    path = os.path.join(sf_dir, "documents.parquet")
    ds = ray.data.read_parquet(path, columns=["doc_id", "lang"])
    return ds.repartition(_parallel_blocks(_parquet_rows(path)))


def _key_sql() -> str:
    """SQL twin of ``sample_key`` (HUGEINT-widened exact modular arithmetic)."""
    return (
        f"CAST(((CAST(doc_id % {SAMPLE_MOD} AS HUGEINT) * {SAMPLE_MULT})"
        f" % {SAMPLE_MOD}) AS BIGINT)"
    )


def doc_sample(sf_dir: str, pct: int = SAMPLE_PCT) -> pa.Table:
    """Uniform ``pct``-percent Bernoulli sample of the documents table."""
    thr = _threshold(pct)

    def keep(t: pa.Table) -> pa.Table:
        key = sample_key(t["doc_id"].to_numpy())
        mask = key < thr
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(mask)),
                "lang": t["lang"].filter(pa.array(mask)),
                "sample_key": pa.array(key[mask].astype(np.int64), type=pa.int64()),
            }
        )

    t = collect_table(
        _read_docs(sf_dir).map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )
    return t.take(pa.compute.sort_indices(t["doc_id"]))


def doc_sample_sql(pct: int = SAMPLE_PCT) -> str:
    return f"""
SELECT doc_id, lang, {_key_sql()} AS sample_key
FROM documents
WHERE {_key_sql()} < {_threshold(pct)}
ORDER BY doc_id
"""


def doc_sample_stratified(
    sf_dir: str, rates: dict[str, int] | None = None
) -> pa.Table:
    """Per-language Bernoulli rates (percent); unlisted languages use
    ``STRATA_DEFAULT_PCT``. Same decision key as ``doc_sample`` so strata
    nest: a doc kept at 10% is kept at every higher rate."""
    rates = dict(STRATA_PCT if rates is None else rates)

    def keep(t: pa.Table) -> pa.Table:
        key = sample_key(t["doc_id"].to_numpy())
        langs = t["lang"].to_numpy(zero_copy_only=False)
        thr = np.full(len(langs), _threshold(STRATA_DEFAULT_PCT), dtype=np.uint64)
        for lang, pct in rates.items():  # |rates| branches, each vectorized
            thr[langs == lang] = _threshold(pct)
        mask = key < thr
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(mask)),
                "lang": t["lang"].filter(pa.array(mask)),
            }
        )

    t = collect_table(
        _read_docs(sf_dir).map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    )
    return t.take(pa.compute.sort_indices(t["doc_id"]))


def doc_sample_stratified_sql(rates: dict[str, int] | None = None) -> str:
    rates = dict(STRATA_PCT if rates is None else rates)
    branches = " ".join(
        f"WHEN '{lang}' THEN {_threshold(pct)}" for lang, pct in sorted(rates.items())
    )
    thr = f"(CASE lang {branches} ELSE {_threshold(STRATA_DEFAULT_PCT)} END)"
    return f"""
SELECT doc_id, lang
FROM documents
WHERE {_key_sql()} < {thr}
ORDER BY doc_id
"""
