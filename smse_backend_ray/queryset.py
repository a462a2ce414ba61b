"""Frozen reference query set (FIXTURES.md §2).

Derived from the string literals the reference's own search tests exercise
(tests/test_routes/test_search.py:119 "sample query",
tests/test_routes/test_multimodal_search.py:90,112 "test query",
tests/test_routes/test_multipart_search.py:130,168 multi-part text), plus
seeded queries that hit the driver corpus vocabulary, camelCase/snake_case
identifier queries, a keyword-only (fully stopped-out) query and a no-hit
query. Frozen: the DuckDB oracle SQL inlines the same literals.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class QuerySpec:
    query_id: int
    parts: tuple[str, ...]            # 1..N query parts (multiset-union fused)
    scope: str = ""                   # repo filter; "" = all (reference user_id analog)
    limit: int = 10
    threshold: float | None = None

    @property
    def text(self) -> str:
        return " ".join(self.parts)


# Single-part, unscoped queries — the flagship bm25_topk set.
BASE_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(0, ("sample query",)),
    QuerySpec(1, ("test query",)),
    QuerySpec(2, ("sample text query",)),
    QuerySpec(3, ("hash join table",)),
    QuerySpec(4, ("sort merge batch value",)),
    QuerySpec(5, ("fast scan row",)),
    QuerySpec(6, ("parseHttpRequest",)),          # camelCase identifier path
    QuerySpec(7, ("window_agg_key",)),            # snake_case identifier path
    QuerySpec(8, ("spark line part",)),
    QuerySpec(9, ("qqzzquux nohitterm",)),        # no-hit query
)

# Scoped / thresholded queries (scope = reference's user_id filter,
# smse_backend/services/search.py:104; threshold = M9 score floor).
SCOPED_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(100, ("table value",), scope="src3", limit=5),
    QuerySpec(101, ("hash key row",), scope="src7", limit=10, threshold=0.5),
    QuerySpec(102, ("merge sort",), scope="src0", limit=10, threshold=0.0),
)

# Multi-part fusion queries (term multiset union across parts; reference
# analog smse_backend/routes/search.py:36-127 + services/embedding.py:56-98).
MULTIPART_QUERIES: tuple[QuerySpec, ...] = (
    QuerySpec(200, ("hash table", "hash value")),     # overlapping parts: qtf(hash)=2
    QuerySpec(201, ("sort merge", "batch", "window table")),
    QuerySpec(202, ("fast slow", "scan")),
)

ALL_QUERIES: tuple[QuerySpec, ...] = BASE_QUERIES + SCOPED_QUERIES + MULTIPART_QUERIES


def query_parts_rows(queries: tuple[QuerySpec, ...]) -> list[tuple[int, str]]:
    """(query_id, part) rows for the SQL VALUES list."""
    return [(q.query_id, p) for q in queries for p in q.parts]
