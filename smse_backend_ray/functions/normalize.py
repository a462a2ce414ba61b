"""Score normalizers — defined but OFF by default, exactly like the reference.

Reference: softmax (smse_backend/services/search.py:28-51) and min-max
(:54-74) are both implemented there but the search path assigns
``normalized_scores = scores`` (:193), i.e. raw scores flow through. Our
engine defaults to raw BM25 scores for rank-identity and exposes these as
opt-in post-ops with the reference's exact edge-case semantics.
"""

from __future__ import annotations

import numpy as np


def softmax(scores: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax (shift by max; services/search.py:42-44)."""
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    e = np.exp(s - s.max())
    return e / e.sum()


def min_max_normalize(scores: np.ndarray) -> np.ndarray:
    """Min-max scale to [0, 1]; all-equal input -> all 1.0
    (services/search.py:54-74 edge case)."""
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    lo, hi = s.min(), s.max()
    if hi == lo:
        return np.ones_like(s)
    return (s - lo) / (hi - lo)


NORMALIZERS = {"none": None, "softmax": softmax, "minmax": min_max_normalize}
