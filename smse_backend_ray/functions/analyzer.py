"""Code-aware tokenizer — the single analyzer shared by ingest and query paths.

Reference analog: the text preprocessing pipeline applied before encoding
(smse_backend/tasks.py:96-103 — ``TextPipeline(chunk_size=240, chunk_overlap=10,
SimpleTokenizer(bpe))``) applied identically on the ingest path (tasks.py:219)
and the query path (tasks.py:250). The hard requirement inherited from that
design is *symmetric analysis*: the exact same pure function of the text runs
at index time and at query time.

The tokenizer is deliberately restricted to operations that DuckDB can
reproduce exactly (see functions/sqlgen.py), so the driver's SQL oracle is a
true end-to-end check:

  1. replace every run of non-ASCII-alphanumeric chars with a single space
  2. split ACRONYMTail boundaries:   ``([A-Z]+)([A-Z][a-z])`` -> ``\\1 \\2``
  3. split camelCase boundaries:     ``([a-z0-9])([A-Z])``    -> ``\\1 \\2``
  4. lowercase
  5. split on spaces; keep tokens with 2 <= len <= 30 that are not pure
     digits and not in the frozen stopword/keyword list

Step 1 runs *first* so lowercasing only ever sees ASCII (unicode case-folding
differences between Python and DuckDB can never leak into tokens).
"""

from __future__ import annotations

import re
from collections import Counter

from smse_backend_ray.config import (
    MAX_TOKEN_LEN,
    MIN_TOKEN_LEN,
    STOPWORDS,
)

_NON_ALNUM = re.compile(r"[^A-Za-z0-9]+")
_ACRONYM = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL = re.compile(r"([a-z0-9])([A-Z])")
_PURE_DIGITS = re.compile(r"[0-9]+")


def split_subtokens(text: str) -> list[str]:
    """Raw subtoken stream: steps 1-4 + split, before any filtering.

    Used by quality/statistics operators that need the unfiltered stream.
    """
    s = _NON_ALNUM.sub(" ", text)
    s = _ACRONYM.sub(r"\1 \2", s)
    s = _CAMEL.sub(r"\1 \2", s)
    s = s.lower()
    return [t for t in s.split(" ") if t]


def _keep(tok: str) -> bool:
    return (
        MIN_TOKEN_LEN <= len(tok) <= MAX_TOKEN_LEN
        and not _PURE_DIGITS.fullmatch(tok)
        and tok not in STOPWORDS
    )


def tokenize(text: str) -> list[str]:
    """Full analysis chain: ordered token stream (dl = len of this list)."""
    return [t for t in split_subtokens(text) if _keep(t)]


def term_counts(text: str) -> list[tuple[str, int]]:
    """(term, tf) pairs sorted by term ascending. dl = sum of tfs."""
    c = Counter(tokenize(text))
    return sorted(c.items())


def analyze_query(text: str) -> dict[str, int]:
    """Query-side analysis: term -> query-term-frequency (qtf).

    Must be the same function of text as the ingest side (symmetry
    requirement; reference runs the same pipeline on both paths,
    smse_backend/tasks.py:219 vs :250).
    """
    return dict(Counter(tokenize(text)))
