"""Cross-validate the single-process Python oracle against the DuckDB SQL
oracle on the driver corpus. Both derive from the same frozen constants; if
these agree, the SQL the driver runs is a true mirror of the Python reference
the distributed engine is tested against."""

from __future__ import annotations

import pytest

from smse_backend_ray.config import SCORE_DECIMALS, BM25Params
from smse_backend_ray.functions.sqlgen import bm25_topk_sql, with_corpus_docs
from smse_backend_ray.oracle import build_oracle_index, oracle_search
from smse_backend_ray.queryset import ALL_QUERIES
from smse_backend_ray.sources.corpus import corpus_table_from_documents


@pytest.fixture(scope="module")
def oidx(sf_dir):
    return build_oracle_index(corpus_table_from_documents(sf_dir))


def test_oracle_stats_vs_sql(duck, oidx):
    sql = with_corpus_docs(
        """
, toks AS (SELECT src.doc_id, t.term FROM docs AS src,
    unnest(string_split(lower(regexp_replace(regexp_replace(regexp_replace(src.content,
      '[^A-Za-z0-9]+', ' ', 'g'), '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
      '([a-z0-9])([A-Z])', '\\1 \\2', 'g')), ' ')) AS t(term)
    WHERE t.term <> '' AND length(t.term) BETWEEN 2 AND 30
      AND NOT regexp_full_match(t.term, '[0-9]+')
      AND t.term NOT IN (SELECT unnest([]::VARCHAR[]))),
dl AS (SELECT d.doc_id, COALESCE(x.dl,0) AS dl FROM docs d
       LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x USING (doc_id))
SELECT count(*) AS n_docs FROM docs
"""
    )
    n_docs = duck.sql(sql).fetchone()[0]
    assert n_docs == oidx.n_docs


def test_oracle_doc_ids_vs_sql(duck, oidx):
    sql = with_corpus_docs("SELECT doc_id, path, content_sha256 FROM docs ORDER BY doc_id")
    rows = duck.sql(sql).fetchall()
    assert len(rows) == oidx.n_docs
    mine = sorted(oidx.docs)
    for (did, path, sha), my_id in zip(rows, mine):
        assert did == my_id
        assert oidx.docs[my_id].path == path
        assert oidx.docs[my_id].content_sha256 == sha


def _rows_for(qs, res):
    return [
        (
            qs.query_id,
            r["rank"],
            r["doc_id"],
            r["path"],
            r["repo"],
            r["lang"],
            r["rscore"],
        )
        for r in res
    ]


def test_oracle_topk_vs_sql(duck, oidx):
    """ALL_QUERIES spans three twin families now (or / and / exclude); each
    family compares against ITS OWN SQL twin — the shared guard
    (sqlgen._check_specs) rejects cross-family use loudly, which
    test_sql_twins_reject_foreign_specs pins."""
    from smse_backend_ray.functions.sqlgen import (
        bm25_conj_topk_sql,
        bm25_exclude_topk_sql,
    )
    from smse_backend_ray.oracle import oracle_conj_search

    or_q = tuple(
        q for q in ALL_QUERIES if q.mode == "or" and not q.exclude
    )
    conj_q = tuple(q for q in ALL_QUERIES if q.mode == "and")
    ex_q = tuple(q for q in ALL_QUERIES if q.mode == "or" and q.exclude)
    assert or_q and conj_q and ex_q  # the flagship set carries all three
    cases = [
        (bm25_topk_sql(or_q, BM25Params()), or_q, {}),
        (bm25_conj_topk_sql(conj_q, BM25Params()), conj_q, {"conj": True}),
        (bm25_exclude_topk_sql(ex_q, BM25Params()), ex_q, {}),
    ]
    for sql, queries, opt in cases:
        sql_rows = duck.sql(sql).fetchall()
        mine = []
        for qs in queries:
            fn = oracle_conj_search if opt.get("conj") else oracle_search
            res = fn(
                oidx,
                list(qs.parts),
                scope=qs.scope,
                limit=qs.limit,
                threshold=qs.threshold,
                **({"exclude": qs.exclude} if qs.exclude else {}),
            )
            mine.extend(_rows_for(qs, res))
        assert len(sql_rows) == len(mine)
        for got, exp in zip(sql_rows, mine):
            assert got[:6] == exp[:6]
            assert got[6] == pytest.approx(exp[6], abs=10**-SCORE_DECIMALS / 2)


def test_sql_twins_reject_foreign_specs():
    from smse_backend_ray.functions.sqlgen import bm25_conj_topk_sql

    conj_q = tuple(q for q in ALL_QUERIES if q.mode == "and")
    ex_q = tuple(q for q in ALL_QUERIES if q.exclude)
    with pytest.raises(ValueError, match="mode"):
        bm25_topk_sql(conj_q, BM25Params())
    with pytest.raises(ValueError, match="exclude"):
        bm25_topk_sql(ex_q, BM25Params())
    with pytest.raises(ValueError, match="mode"):
        bm25_conj_topk_sql(ex_q, BM25Params())


def test_no_hit_query_empty(oidx):
    assert oracle_search(oidx, ["qqzzquux nohitterm"]) == []


def test_all_stopword_query_rejected(oidx):
    with pytest.raises(ValueError):
        oracle_search(oidx, ["the def return"])
