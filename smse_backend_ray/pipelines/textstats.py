"""Text-analysis operators over the ``documents`` table — the large-scale
training-data additions beyond the reference's surface (quality scoring /
language-ID / token accounting / fingerprinting), built on the same frozen
analyzer so the DuckDB oracles reproduce them exactly.

All stages are stateless ``map_batches`` transforms (Arrow in/out); the only
per-row Python is the compiled-regex tokenizer pass.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

from smse_backend_ray.config import LANG_MARKERS, STOPWORDS
from smse_backend_ray.functions.analyzer import split_subtokens, tokenize
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import _parallel_blocks


def _read_documents(sf_dir: str) -> "ray.data.Dataset":
    import os

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    return ds.repartition(_parallel_blocks())


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc token accounting: raw subtokens, kept tokens, distinct terms,
    mean raw token length (0.0 when empty)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    n_raw, n_tok, n_distinct, mean_len = [], [], [], []
    for t in texts:
        raw = split_subtokens(t or "")
        kept = tokenize(t or "")
        n_raw.append(len(raw))
        n_tok.append(len(kept))
        n_distinct.append(len(set(kept)))
        mean_len.append(
            (sum(len(r) for r in raw) / len(raw)) if raw else 0.0
        )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "n_subtokens": pa.array(n_raw, type=pa.int64()),
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_distinct_terms": pa.array(n_distinct, type=pa.int64()),
            "mean_subtoken_len": pa.array(mean_len, type=pa.float64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Heuristic quality score in [0,1] (frozen formula, SQL twin in sqlgen):

      stop_ratio = stopword hits / raw subtokens   (0 when empty)
      quality    = round(0.3 * stop_ratio + 0.7 * min(n_raw, 100)/100, 4)
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    ratios, quals, n_raws = [], [], []
    for t in texts:
        raw = split_subtokens(t or "")
        n = len(raw)
        sr = (sum(1 for r in raw if r in STOPWORDS) / n) if n else 0.0
        ratios.append(round_half_away(sr, 4))
        quals.append(round_half_away(0.3 * sr + 0.7 * min(n, 100) / 100, 4))
        n_raws.append(n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "n_subtokens": pa.array(n_raws, type=pa.int64()),
            "stop_ratio": pa.array(ratios, type=pa.float64()),
            "quality": pa.array(quals, type=pa.float64()),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language ID: no ASCII subtokens -> 'zh'; zero marker hits
    -> 'unknown'; else argmax marker hits, ties broken by lang ascending."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    marker_sets = {lg: frozenset(ws) for lg, ws in LANG_MARKERS.items()}
    langs_sorted = sorted(marker_sets)
    preds = []
    for t in texts:
        raw = split_subtokens(t or "")
        if not raw:
            preds.append("zh")
            continue
        hits = {lg: sum(1 for r in raw if r in marker_sets[lg]) for lg in langs_sorted}
        best = max(hits.values())
        if best == 0:
            preds.append("unknown")
        else:
            preds.append(next(lg for lg in langs_sorted if hits[lg] == best))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "pred_lang": pa.array(preds, type=pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint (md5 hex; reference uuid/bcrypt analog F11/F12)."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


def _run(sf_dir: str, fn) -> pa.Table:
    t = (
        _read_documents(sf_dir)
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        .to_arrow_refs()
    )
    import ray as _ray

    out = pa.concat_tables(_ray.get(t))
    return out.take(pa.compute.sort_indices(out["doc_id"]))


def token_stats(sf_dir: str) -> pa.Table:
    return _run(sf_dir, token_stats_batch)


def quality(sf_dir: str) -> pa.Table:
    return _run(sf_dir, quality_batch)


def lang_id(sf_dir: str) -> pa.Table:
    return _run(sf_dir, lang_id_batch)


def fingerprint(sf_dir: str) -> pa.Table:
    return _run(sf_dir, fingerprint_batch)
