"""Analyzer unit tests + exhaustive DuckDB parity (SURVEY.md §7.2: everything
downstream depends on byte-identical analysis between Python and SQL)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smse_backend_ray.config import STOPWORDS
from smse_backend_ray.functions.analyzer import (
    analyze_query,
    split_subtokens,
    term_counts,
    tokenize,
)
from smse_backend_ray.functions.sqlgen import subtoken_expr, token_filter_sql

TRICKY = [
    "getHTTPResponse2Go_fooBar",
    "parseHttpRequest parse_http_request PARSE HTTP",
    "camelCase snake_case SCREAMING_SNAKE XMLHttpRequest",
    "a ab abc the def return x1 1x 42 007",
    "  leading trailing  ",
    "",
    "éclair naïve 北京 привет mixedÉcase",
    "foo.bar(baz, qux); if (x>=2) { return None }",
    "x" * 31 + " " + "y" * 30 + " zz",
    "HTML5Parser v2Engine A1B2c3",
    "don't can't it's",
    "__init__ __main__ self.value",
    "tab\tnewline\nmixed\r\nspace",
]


def test_basic_camel_snake():
    assert tokenize("parseHttpRequest") == ["parse", "http", "request"]
    assert tokenize("parse_http_request") == ["parse", "http", "request"]
    assert tokenize("XMLHttpRequest") == ["xml", "http", "request"]


def test_stopword_and_keyword_filtering():
    assert tokenize("the def return table") == ["table"]
    assert "def" in STOPWORDS and "the" in STOPWORDS


def test_length_and_digit_filters():
    assert tokenize("a ab 42 x1") == ["ab", "x1"]
    assert tokenize("x" * 31) == []
    assert tokenize("x" * 30) == ["x" * 30]


def test_non_ascii_dropped():
    assert tokenize("北京 привет") == []
    # accented chars act as separators; ASCII runs survive
    # ("case" would be dropped as a code keyword)
    assert tokenize("mixedÉwords") == ["mixed", "words"]


def test_term_counts_sorted():
    tc = term_counts("beta alpha beta gamma alpha beta")
    assert tc == [("alpha", 2), ("beta", 3), ("gamma", 1)]


def test_analyze_query_symmetric_with_ingest():
    text = "getHTTPResponse2Go hash hashJoin"
    assert analyze_query(text) == dict(term_counts(text))


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _sql_tokens(con, text: str) -> list[str]:
    rows = con.execute(
        f"SELECT t.term FROM (SELECT ? AS s) src, "
        f"unnest({subtoken_expr('src.s')}) AS t(term) "
        f"WHERE {token_filter_sql('t.term')}",
        [text],
    ).fetchall()
    return [r[0] for r in rows]


def _sql_subtokens(con, text: str) -> list[str]:
    rows = con.execute(
        f"SELECT t.term FROM (SELECT ? AS s) src, "
        f"unnest({subtoken_expr('src.s')}) AS t(term) WHERE t.term <> ''",
        [text],
    ).fetchall()
    return [r[0] for r in rows]


@pytest.mark.parametrize("text", TRICKY)
def test_duckdb_parity_tricky(con, text):
    assert _sql_tokens(con, text) == tokenize(text)
    assert _sql_subtokens(con, text) == split_subtokens(text)


def test_duckdb_parity_documents_corpus(con):
    """Every document in the sf0.001 driver table tokenizes identically."""
    texts = [
        r[0]
        for r in con.sql(
            "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    ]
    assert len(texts) > 0
    for t in texts:
        assert _sql_tokens(con, t) == tokenize(t)


@settings(max_examples=120, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=80,
        ),
        max_size=8,
    )
)
def test_term_counts_batch_matches_scalar(texts):
    """The vectorized Arrow tokenizer is bitwise-equal to the frozen scalar
    reference on arbitrary unicode input (RE2 vs Python-re equivalence for
    the three analyzer regexes is load-bearing — the ingest hot path runs
    the batch twin)."""
    import pyarrow as pa

    from smse_backend_ray.functions.analyzer import term_counts, term_counts_batch

    col = pa.chunked_array([pa.array(texts, type=pa.string())])
    terms, tfs = term_counts_batch(col)
    for i, txt in enumerate(texts):
        got = list(zip(terms[i].as_py(), tfs[i].as_py()))
        assert got == term_counts(txt)


def test_term_counts_batch_empty_and_nulls():
    import pyarrow as pa

    from smse_backend_ray.functions.analyzer import term_counts_batch

    terms, tfs = term_counts_batch(pa.array([], type=pa.string()))
    assert len(terms) == 0
    terms, tfs = term_counts_batch(pa.array([None, "hashJoin table"], type=pa.string()))
    assert terms[0].as_py() == []
    assert terms[1].as_py() == ["hash", "join", "table"]


@settings(max_examples=120, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=80,
        ),
        max_size=8,
    )
)
def test_kept_tokens_batch_matches_scalar(texts):
    """The vectorized kept-token stream (doc_chunks' hot path) is
    bitwise-equal to the frozen scalar tokenize, in stream order."""
    import pyarrow as pa

    from smse_backend_ray.functions.analyzer import kept_tokens_batch, tokenize

    col = pa.chunked_array([pa.array(texts, type=pa.string())])
    toks = kept_tokens_batch(col)
    for i, txt in enumerate(texts):
        assert toks[i].as_py() == tokenize(txt)


def test_kept_tokens_batch_empty_and_nulls():
    import pyarrow as pa

    from smse_backend_ray.functions.analyzer import kept_tokens_batch

    assert len(kept_tokens_batch(pa.array([], type=pa.string()))) == 0
    toks = kept_tokens_batch(pa.array([None, "hashJoin the table"], type=pa.string()))
    assert toks[0].as_py() == []
    assert toks[1].as_py() == ["hash", "join", "table"]
