"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the BASELINE.json input_hint shape (repo, path, commit, lang,
content) with code-like content: a Zipfian keyword head (the hot-term skew
the salted pre-aggregation exists for), camelCase/snake_case identifiers
from a seeded vocabulary, a controlled fraction of exact duplicates, empty
files, and disallowed-lang rows.

Determinism: every row is a pure function of its index (per-row Philox
streams keyed by index) — no global RNG state, no wall clock, no uuids
(FIXTURES.md: identity derives from content, not run order). Safe to
generate distributed in any partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

_WORDS = (
    "get set make build parse read write open close run exec load store "
    "map list dict node tree graph hash index query plan scan sort merge "
    "join filter group agg window batch stream buffer cache pool file path "
    "token term doc score rank search match count sum min max avg head tail "
    "key value row col table block page seg shard part split chunk span"
).split()

_KEYWORDS = (
    "def return if else for while class import from try except with as "
    "lambda yield pass raise assert global del not and or in is"
).split()

_LANGS = ("py", "js", "go", "java", "rs", "txt", "md")
_BAD_LANGS = ("bin", "exe")

DUP_EVERY = 100      # rows idx%DUP_EVERY==1 duplicate the content of idx-1
EMPTY_EVERY = 500    # rows idx%EMPTY_EVERY==7 have empty content
BADLANG_EVERY = 400  # rows idx%BADLANG_EVERY==3 get a disallowed lang


def _identifier(rng: np.random.Generator) -> str:
    r = rng.random()
    if r < 0.3:
        # numeric-suffixed unique-ish identifier: survives subtoken
        # splitting whole, so the corpus vocabulary is realistically large
        # (~30k terms) instead of collapsing back to the base word list
        w = _WORDS[int(rng.integers(0, len(_WORDS)))]
        return f"{w}{int(rng.integers(0, 500))}v"
    k = int(rng.integers(2, 4))
    ws = [
        _WORDS[int(i)] for i in rng.integers(0, len(_WORDS), size=k)
    ]
    if r < 0.65:  # snake_case
        return "_".join(ws)
    return ws[0] + "".join(w.capitalize() for w in ws[1:])  # camelCase


def _content(idx: int, n_tokens: int) -> str:
    rng = np.random.Generator(np.random.Philox(key=idx))
    out = []
    zipf_cut = len(_KEYWORDS)
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.45:  # Zipfian keyword head (hot terms)
            z = min(int(rng.zipf(1.5)) - 1, zipf_cut - 1)
            out.append(_KEYWORDS[z])
        elif r < 0.85:
            out.append(_WORDS[int(rng.integers(0, len(_WORDS)))])
        else:
            out.append(_identifier(rng))
        if rng.random() < 0.12:
            out.append("\n")
    return " ".join(out)


def synth_row(idx: int, tokens_per_doc: int = 256) -> dict:
    h = hashlib.md5(f"synthrow{idx}".encode()).hexdigest()
    repo = f"org{int(h[:2], 16) % 8}/repo{int(h[2:4], 16) % 4}"
    path = f"src/m{idx // 1000:04d}/f_{idx:08d}.{_LANGS[int(h[4:6], 16) % len(_LANGS)]}"
    lang = path.rsplit(".", 1)[1]
    if idx % BADLANG_EVERY == 3:
        lang = _BAD_LANGS[idx % len(_BAD_LANGS)]
    if idx % EMPTY_EVERY == 7:
        content = ""
    elif idx % DUP_EVERY == 1 and idx > 0:
        content = _content(idx - 1, tokens_per_doc)  # exact duplicate content
    else:
        content = _content(idx, tokens_per_doc)
    return {
        "repo": repo,
        "path": path,
        "commit": h,
        "lang": lang,
        "content": content,
    }


def synth_batch(batch: pa.Table, tokens_per_doc: int = 256) -> pa.Table:
    idxs = batch["id"].to_pylist()
    rows = [synth_row(i, tokens_per_doc) for i in idxs]
    return pa.table(
        {
            c: pa.array([r[c] for r in rows], type=pa.string())
            for c in ("repo", "path", "commit", "lang", "content")
        }
    )


def synth_corpus(
    n_docs: int, tokens_per_doc: int = 256, num_blocks: int | None = None
) -> "ray.data.Dataset":
    """Distributed deterministic corpus of ``n_docs`` code-like files."""
    import functools

    from smse_backend_ray.sources.corpus import _parallel_blocks

    nb = num_blocks or _parallel_blocks()
    ds = ray.data.range(n_docs, override_num_blocks=nb)
    return ds.map_batches(
        functools.partial(synth_batch, tokens_per_doc=tokens_per_doc),
        batch_format="pyarrow",
    )


def synth_corpus_table(n_docs: int, tokens_per_doc: int = 256) -> pa.Table:
    """Driver-side (no Ray) variant for tests."""
    rows = [synth_row(i, tokens_per_doc) for i in range(n_docs)]
    return pa.table(
        {
            c: pa.array([r[c] for r in rows], type=pa.string())
            for c in ("repo", "path", "commit", "lang", "content")
        }
    )
