"""Fuzzy term suggestion (pipelines/suggest.py): deletion-neighborhood
vectorization parity, bounded-levenshtein correctness, and end-to-end
equivalence with brute-force lev<=1 over the vocabulary."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from smse_backend_ray.pipelines.suggest import (
    _explode_deletes,
    _lev_le1,
    build_suggest,
    deletion_keys,
    suggest,
)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcx", max_size=6), st.text(alphabet="abcx", max_size=6))
def test_lev_le1_matches_reference(a, b):
    ref = _ref_lev(a, b)
    got = _lev_le1(a, b)
    assert got == (ref if ref <= 1 else None)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abxy", min_size=1, max_size=8), min_size=1, max_size=20))
def test_explode_deletes_matches_scalar(terms):
    t = pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "df": pa.array(range(1, len(terms) + 1), type=pa.int64()),
        }
    )
    out = _explode_deletes(t)
    got = set(zip(out["dkey"].to_pylist(), out["term"].to_pylist()))
    exp = {(k, term) for term in set(terms) for k in deletion_keys(term)}
    # duplicate terms keep one row per (dkey, term)
    assert got == exp


@pytest.fixture(scope="module")
def suggest_idx(ray_session, tmp_path_factory):
    import numpy as np
    import ray.data

    from smse_backend_ray.config import EngineConfig
    from smse_backend_ray.pipelines.build import build_index

    rng = np.random.default_rng(5)
    vocab = ["hash", "hashes", "cash", "dash", "table", "tables", "cable",
             "merge", "merges", "verge", "sort", "sorts", "fort", "alpha"]
    rows = [
        {
            "repo": f"src{i % 3}",
            "path": f"d/{i:04d}.txt",
            "commit": f"c{i}",
            "lang": "en",
            "content": " ".join(rng.choice(vocab, size=int(rng.integers(3, 25)))),
        }
        for i in range(80)
    ]
    idx = str(tmp_path_factory.mktemp("suggestidx"))
    build_index(
        corpus=ray.data.from_arrow(pa.Table.from_pylist(rows)),
        index_dir=idx,
        cfg=EngineConfig(n_shards=2),
    )
    build_suggest(idx)
    return idx


def test_suggest_equals_bruteforce(suggest_idx):
    import pyarrow.dataset as pads

    from smse_backend_ray.config import SUGGEST_TOP

    df_t = pads.dataset(f"{suggest_idx}/df").to_table(columns=["term", "df"])
    vocab = dict(zip(df_t["term"].to_pylist(), df_t["df"].to_pylist()))
    queries = [(0, "hash"), (1, "hasj"), (2, "tabel"), (3, "mergee"),
               (4, "ort"), (5, "zzz"), (6, "ASH")]
    got = suggest(suggest_idx, queries)
    rows = got.to_pylist()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in queries:
        exp = sorted(
            (lev, -d, t)
            for t, d in vocab.items()
            for lev in [_ref_lev(q.lower(), t)]
            if lev <= 1
        )[:SUGGEST_TOP]
        g = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [(r["lev"], -r["df"], r["term"]) for r in g] == exp, (qid, q)
        assert [r["rank"] for r in g] == list(range(1, len(exp) + 1))
