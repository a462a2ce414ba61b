"""DuckDB SQL generators that mirror the engine's frozen semantics exactly.

Each generated fragment reproduces, in ANSI-ish DuckDB SQL, the same pure
functions the engine runs (functions/analyzer.py tokenizer, doc_id assignment,
BM25 scoring). These are the *oracle* side of the driver's correctness gate;
they share every constant with the engine via config.py so there is a single
source of truth.

Reference parity notes are kept with the engine implementations; this module
is only about SQL equivalence.
"""

from __future__ import annotations

from smse_backend_ray.config import (
    MAX_TOKEN_LEN,
    MIN_TOKEN_LEN,
    SCORE_DECIMALS,
    STOPWORDS,
    BM25Params,
)


def stoplist_sql() -> str:
    """SQL literal list of the frozen stopword/keyword set (sorted)."""
    return ", ".join("'" + w + "'" for w in sorted(STOPWORDS))


def subtoken_expr(text_expr: str) -> str:
    """SQL expr producing the list of raw subtokens (analyzer steps 1-4)."""
    return (
        "string_split(lower(regexp_replace(regexp_replace(regexp_replace("
        f"{text_expr}, "
        "'[^A-Za-z0-9]+', ' ', 'g'), "
        "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
        "'([a-z0-9])([A-Z])', '\\1 \\2', 'g')), ' ')"
    )


def token_filter_sql(term_col: str = "term") -> str:
    """WHERE predicate matching analyzer._keep plus the empty-token drop."""
    return (
        f"{term_col} <> '' "
        f"AND length({term_col}) BETWEEN {MIN_TOKEN_LEN} AND {MAX_TOKEN_LEN} "
        f"AND NOT regexp_full_match({term_col}, '[0-9]+') "
        f"AND {term_col} NOT IN ({stoplist_sql()})"
    )


def tokens_cte(src: str, id_cols: str, text_col: str) -> str:
    """SELECT producing one row per kept token: (<id_cols>, term)."""
    return (
        f"SELECT {id_cols}, t.term AS term "
        f"FROM {src} AS src, unnest({subtoken_expr('src.' + text_col)}) AS t(term) "
        f"WHERE {token_filter_sql('t.term')}"
    )


def raw_tokens_cte(src: str, id_cols: str, text_col: str) -> str:
    """Same but unfiltered (analyzer.split_subtokens): used by quality ops."""
    return (
        f"SELECT {id_cols}, t.term AS term "
        f"FROM {src} AS src, unnest({subtoken_expr('src.' + text_col)}) AS t(term) "
        f"WHERE t.term <> ''"
    )


# ---------------------------------------------------------------------------
# Corpus derivation from the driver's `documents` table
# ---------------------------------------------------------------------------
# The engine's input shape is fixed by BASELINE.json input_hint:
# (repo, path, commit, lang, content). For driver-comparable queries we derive
# that corpus deterministically from the `documents` table
# (doc_id, text, lang, source, n_chars) — see sources/corpus.py for the
# Python twin of this mapping.

CORPUS_CTE = (
    "SELECT source AS repo, "
    "'docs/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS path, "
    "md5('c' || CAST(doc_id AS VARCHAR)) AS commit, "
    "lang AS lang, text AS content "
    "FROM documents"
)


def doc_id_expr(repo: str = "repo", path: str = "path", commit: str = "commit") -> str:
    """Deterministic doc_id: first 15 decimal digits of sha256(key) hex.

    (DuckDB 1.0 cannot cast hex->BIGINT, so both sides strip the hex letters
    and parse the leading 15 digits — deterministic and collision-safe at
    sandbox scale; the manifest records the scheme so a production build can
    swap in a 128-bit key.)
    """
    key = f"{repo} || chr(10) || {path} || chr(10) || {commit}"
    return (
        f"CAST(substr(regexp_replace(sha256({key}), '[a-f]', '', 'g'), 1, 15) AS BIGINT)"
    )


DOCS_CTE = (
    f"SELECT repo, path, commit, lang, content, "
    f"{doc_id_expr()} AS doc_id, "
    f"sha256(content) AS content_sha256, "
    f"CAST(octet_length(encode(content)) AS BIGINT) AS n_bytes "
    f"FROM corpus "
    f"QUALIFY row_number() OVER (PARTITION BY {doc_id_expr()} ORDER BY sha256(content)) = 1"
)


def with_corpus_docs(body: str) -> str:
    """Wrap an oracle query body with the corpus+docs CTE prologue."""
    return f"WITH corpus AS ({CORPUS_CTE}), docs AS ({DOCS_CTE}) {body}"


# ---------------------------------------------------------------------------
# ingest / stats / df oracles (SURVEY.md S6, A5, A6 correctness gates)
# ---------------------------------------------------------------------------

_TOKS_CTE = (
    "SELECT src.doc_id AS doc_id, t.term AS term FROM docs AS src, "
    "unnest({expr}) AS t(term) WHERE {filt}"
)


def _toks() -> str:
    return _TOKS_CTE.format(expr=subtoken_expr("src.content"), filt=token_filter_sql("t.term"))


def _dl_cte() -> str:
    return (
        "SELECT d.doc_id, COALESCE(x.dl, 0) AS dl FROM docs d LEFT JOIN "
        "(SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id) x USING (doc_id)"
    )


def ingest_docs_sql() -> str:
    """Deduped docs table with analysis length (ingest stage oracle)."""
    return with_corpus_docs(
        f", toks AS ({_toks()}), dl AS ({_dl_cte()}) "
        "SELECT d.doc_id, d.repo, d.path, d.commit, d.lang, d.content_sha256, "
        "d.n_bytes, dl.dl AS dl "
        "FROM docs d JOIN dl USING (doc_id) ORDER BY d.doc_id"
    )


def corpus_stats_sql() -> str:
    return with_corpus_docs(
        f", toks AS ({_toks()}), dl AS ({_dl_cte()}) "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(dl) AS BIGINT) AS sum_dl, "
        "CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl"
    )


def term_df_sql() -> str:
    return with_corpus_docs(
        f", toks AS ({_toks()}) "
        "SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM toks GROUP BY term ORDER BY term"
    )


def postings_sql() -> str:
    """Uncompressed posting triples — decode-the-index oracle (A6)."""
    return with_corpus_docs(
        f", toks AS ({_toks()}) "
        "SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf "
        "FROM toks GROUP BY term, doc_id ORDER BY term, doc_id"
    )


def lang_counts_sql() -> str:
    """Count-by-lang (majority-modality analog A2)."""
    return with_corpus_docs(
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM docs "
        "GROUP BY lang ORDER BY lang"
    )


# ---------------------------------------------------------------------------
# BM25 oracle
# ---------------------------------------------------------------------------

def bm25_scored_ctes(params: BM25Params) -> str:
    """CTE chain (after corpus/docs/queries CTEs) computing BM25 scores.

    Expects a CTE named `queries(query_id, part)` with one row per query part
    (multi-part fusion = the term multiset union across parts; reference
    analog: mean-pool fusion in smse_backend/services/embedding.py:56-98).
    Produces CTE `scored(query_id, doc_id, score)`.
    """
    k1, b = params.k1, params.b
    return f"""
toks AS ({tokens_cte('docs', 'src.doc_id', 'content')}),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, term),
dl AS (
  SELECT d.doc_id, COALESCE(x.dl, 0) AS dl
  FROM docs d LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id) x USING (doc_id)
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
qtok AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS qtf
  FROM ({tokens_cte('queries', 'src.query_id', 'part')})
  GROUP BY query_id, term
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         SUM(qt.qtf
             * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({k1} + 1)
               / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM qtok qt
  JOIN tf ON tf.term = qt.term
  JOIN df ON df.term = qt.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY qt.query_id, tf.doc_id
)"""


def bm25_topk_sql(queries, params: BM25Params) -> str:
    """Full oracle for the flagship pipeline: top-k BM25 per QuerySpec.

    ``queries`` is a sequence of queryset.QuerySpec (per-query parts, scope,
    limit, threshold). Ranking uses (round(score, SCORE_DECIMALS) DESC,
    doc_id ASC) — identical to the engine — so near-ties order
    deterministically on both sides. The threshold keeps rounded score >=
    threshold (the reference's `not <` form, smse_backend/services/
    search.py:180-184) and applies BEFORE ranking/limit, like the reference
    (filter inside search_by_modality results, then global sort+limit:
    smse_backend/services/search.py:171-205). Scope '' = unscoped (the
    user_id filter analog, services/search.py:104).
    """

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    part_vals = ", ".join(
        f"({qs.query_id}, {q(p)})" for qs in queries for p in qs.parts
    )
    meta_vals = ", ".join(
        f"({qs.query_id}, {q(qs.scope)}, {qs.limit}, "
        + ("CAST(NULL AS DOUBLE)" if qs.threshold is None else str(qs.threshold))
        + ")"
        for qs in queries
    )
    return with_corpus_docs(
        f"""
, queries(query_id, part) AS (VALUES {part_vals}),
qmeta(query_id, scope, lim, threshold) AS (VALUES {meta_vals}),
{bm25_scored_ctes(params).lstrip()},
ranked AS (
  SELECT sc.query_id, sc.doc_id, round(sc.score, {SCORE_DECIMALS}) AS rscore,
         d.path, d.repo, d.lang, m.lim
  FROM scored sc
  JOIN docs d ON d.doc_id = sc.doc_id
  JOIN qmeta m ON m.query_id = sc.query_id
  WHERE (m.scope = '' OR d.repo = m.scope)
    AND (m.threshold IS NULL OR round(sc.score, {SCORE_DECIMALS}) >= m.threshold)
),
topk AS (
  SELECT query_id, doc_id, rscore, path, repo, lang, lim,
         row_number() OVER (PARTITION BY query_id ORDER BY rscore DESC, doc_id ASC) AS rnk
  FROM ranked
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS INT) AS rank,
       doc_id, path, repo, lang, rscore AS score
FROM topk WHERE rnk <= lim
ORDER BY query_id, rank
"""
    )
