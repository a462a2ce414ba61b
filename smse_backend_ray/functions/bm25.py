"""BM25 scoring math — shared by the distributed scorer and the oracle.

Reference analog: the similarity function of the search core
(cosine ``1 - (vector <=> q)``, smse_backend/services/search.py:101,107).
Our engine's scalar is Lucene-standard BM25:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over q's terms (sorted ascending):  qtf * idf * tfnorm

The summation order over query terms is FIXED (term-ascending) on every code
path so distributed scores are bitwise equal to the single-process oracle
(SURVEY.md §4 float-determinism requirement).
"""

from __future__ import annotations

import math

import numpy as np

from smse_backend_ray.config import BM25Params


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tfnorm_scalar(tf: float, dl: float, avgdl: float, p: BM25Params) -> float:
    return tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))


def tfnorm_vec(tf: np.ndarray, dl: np.ndarray, avgdl: float, p: BM25Params) -> np.ndarray:
    """Vectorized tfnorm in float64 (same expression tree as the scalar)."""
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (p.k1 + 1.0) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))
