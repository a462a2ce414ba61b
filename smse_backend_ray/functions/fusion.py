"""Multi-part query fusion.

Reference analog: multipart search fuses N query-part embeddings by
element-wise mean + majority modality (smse_backend/services/embedding.py:
56-98; mean :84, majority :87-92), with empty input -> None (:64-66) and the
API rejecting requests with no valid parts (smse_backend/routes/search.py:
107-118). The BM25 analog (SURVEY.md A1/A2): the fused query is the term
MULTISET UNION of the analyzed parts (score contributions add), and the
majority ``lang`` hint of the parts plays the majority-modality role
(first-wins on ties, matching Python ``max`` over insertion order at
services/embedding.py:87-92).
"""

from __future__ import annotations

from collections import Counter

from smse_backend_ray.functions.analyzer import analyze_query


def fuse_parts(parts: list[str], langs: list[str] | None = None):
    """-> (term -> qtf dict, majority_lang | None). Raises on no valid parts.

    A part that analyzes to zero terms contributes nothing; if *all* parts are
    empty/stop-only the fused query is invalid (reference's 400 on no valid
    query parts, routes/search.py:107-118).
    """
    if not parts:
        raise ValueError("no query parts provided")
    fused: Counter[str] = Counter()
    for p in parts:
        fused.update(analyze_query(p))
    if not fused:
        raise ValueError("no valid query parts after analysis")
    majority = None
    if langs:
        counts: Counter[str] = Counter()
        for lg in langs:
            counts[lg] += 1
        # first-wins tie behavior: max() over first-insertion order
        majority = max(counts, key=lambda k: counts[k])
    return dict(fused), majority
