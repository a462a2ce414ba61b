"""Single-process exact oracle: dict inverted index + BM25 (SURVEY.md §7.3).

This is the conformance target for every distributed stage: same analyzer,
same doc_id assignment, same BM25 variant, same (rounded score DESC, doc_id
ASC) total order, same fixed term-ascending summation order — so the Ray
engine's scores must be *bitwise* equal, not just close.

Reference analogs: the search core (smse_backend/services/search.py:77-222)
and its DB-side top-k (:97-110), collapsed into one in-memory implementation.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pyarrow as pa

from smse_backend_ray.config import (
    DEFAULT_TOP_K,
    SCORE_DECIMALS,
    BM25Params,
)
from smse_backend_ray.functions import bm25
from smse_backend_ray.functions.analyzer import term_counts
from smse_backend_ray.functions.fusion import fuse_parts
from smse_backend_ray.functions.normalize import NORMALIZERS
from smse_backend_ray.functions.rounding import round_half_away
from smse_backend_ray.sources.corpus import doc_id_from_key


@dataclass
class OracleDoc:
    doc_id: int
    repo: str
    path: str
    commit: str
    lang: str
    content_sha256: str
    n_bytes: int
    dl: int


@dataclass
class OracleIndex:
    params: BM25Params
    docs: dict[int, OracleDoc] = field(default_factory=dict)
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc_id: tf}
    n_docs: int = 0
    avgdl: float = 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))


def build_oracle_index(
    corpus: pa.Table,
    params: BM25Params | None = None,
    allowed_langs: tuple[str, ...] | None = None,
) -> OracleIndex:
    params = params or BM25Params()
    idx = OracleIndex(params=params)
    rows = corpus.select(["repo", "path", "commit", "lang", "content"]).to_pylist()
    # dedup winner = min content_sha256 per doc_id (sqlgen.DOCS_CTE twin)
    for r in rows:
        if allowed_langs is not None and r["lang"] not in allowed_langs:
            continue
        did = doc_id_from_key(r["repo"], r["path"], r["commit"])
        sha = hashlib.sha256(r["content"].encode()).hexdigest()
        prev = idx.docs.get(did)
        if prev is not None and prev.content_sha256 <= sha:
            continue
        if prev is not None:
            # replace winner: remove previous postings for this doc
            for tfs in idx.postings.values():
                tfs.pop(did, None)
        tcs = term_counts(r["content"])
        dl = sum(tf for _, tf in tcs)
        idx.docs[did] = OracleDoc(
            doc_id=did,
            repo=r["repo"],
            path=r["path"],
            commit=r["commit"],
            lang=r["lang"],
            content_sha256=sha,
            n_bytes=len(r["content"].encode()),
            dl=dl,
        )
        for term, tf in tcs:
            idx.postings.setdefault(term, {})[did] = tf
    idx.n_docs = len(idx.docs)
    idx.avgdl = (
        sum(d.dl for d in idx.docs.values()) / idx.n_docs if idx.n_docs else 0.0
    )
    return idx


def oracle_search(
    idx: OracleIndex,
    parts: list[str],
    scope: str = "",
    limit: int = DEFAULT_TOP_K,
    threshold: float | None = None,
    normalize: str = "none",
) -> list[dict]:
    """Exact BM25 top-k. Returns rows with rank, doc meta, exact + rounded score.

    Order of operations mirrors the reference search core
    (smse_backend/services/search.py:135-222): score -> threshold filter
    (score >= t, the `not <` form :180-184) -> (optional, default-off)
    normalization :190-197 -> global sort -> limit -> projection.
    """
    qtf, _ = fuse_parts(parts)
    scores: dict[int, float] = {}
    for term in sorted(qtf):  # FIXED summation order (term ascending)
        post = idx.postings.get(term)
        if not post:
            continue
        w = qtf[term] * bm25.idf(idx.n_docs, len(post))
        for did, tf in post.items():
            d = idx.docs[did]
            contrib = w * bm25.tfnorm_scalar(tf, d.dl, idx.avgdl, idx.params)
            scores[did] = scores.get(did, 0.0) + contrib
    rows = []
    for did, sc in scores.items():
        d = idx.docs[did]
        if scope and d.repo != scope:
            continue
        rsc = round_half_away(sc, SCORE_DECIMALS)
        if threshold is not None and not rsc >= threshold:
            continue
        rows.append(
            {
                "doc_id": did,
                "path": d.path,
                "repo": d.repo,
                "lang": d.lang,
                "score": sc,
                "rscore": rsc,
            }
        )
    rows.sort(key=lambda r: (-r["rscore"], r["doc_id"]))
    rows = rows[:limit]
    norm = NORMALIZERS[normalize]
    if norm is not None and rows:
        import numpy as np

        normed = norm(np.array([r["rscore"] for r in rows]))
        for r, v in zip(rows, normed):
            r["norm_score"] = float(v)
    for i, r in enumerate(rows):
        r["rank"] = i + 1
    return rows
