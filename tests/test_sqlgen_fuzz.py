"""Adversarial-input parity fuzz for the round-3 engine<->SQL twins.

The driver gate runs the twins over the fixed testdata corpus only; these
tests feed ADVERSARIAL documents (unicode, empty/whitespace text, embedded
quotes, single tokens, heavy repetition) through both sides. Each case
writes a temp documents.parquet, points the engine pipelines at it, and
registers the same file as the DuckDB `documents` view."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from smse_backend_ray.functions import sqlgen
from smse_backend_ray.pipelines import dedup, textstats

ADVERSARIAL_TEXTS = [
    "",                                     # empty -> no tokens
    "   \t  ",                              # whitespace only
    "one",                                  # single token: no bigram/shingle
    "two words",                            # one bigram, no 3-shingle
    "a b c a b c a b c a b c",              # heavy bigram repetition
    "naïve café über straße 東京 données",   # unicode: non-ASCII stripped
    "it's \"quoted\" o'brien said",         # quote handling
    "CamelCaseSplit snake_case_split x9y",  # analyzer edge paths
    "hash join table hash join table",      # collides with the query set
    "zzz " * 40,                            # one token repeated
    "0 1 2 33 444 5555",                    # digit runs
    "sample query sample query extra",      # decontamination hit
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_docs")
    t = pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), type=pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, type=pa.string()),
            "lang": pa.array(["en"] * len(ADVERSARIAL_TEXTS), type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.fixture()
def adv_duck(adv_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(adv_dir, 'documents.parquet')}')"
    )
    yield con
    con.close()


def test_repetition_adversarial(ray_session, adv_dir, adv_duck):
    t = textstats.repetition(adv_dir)
    want = adv_duck.sql(sqlgen.repetition_sql(textstats.REP_GRAM_K)).arrow()
    assert t.to_pylist() == want.to_pylist()


def test_decontaminate_adversarial(ray_session, adv_dir, adv_duck):
    from smse_backend_ray.queryset import ALL_QUERIES

    t = textstats.decontaminate(adv_dir)
    want = adv_duck.sql(
        sqlgen.decontaminate_sql(
            [p for q in ALL_QUERIES for p in q.parts], textstats.REP_GRAM_K
        )
    ).arrow()
    assert t.to_pylist() == want.to_pylist()
    assert t.num_rows >= 2  # the planted collisions hit


def test_simhash_adversarial(ray_session, adv_dir, adv_duck):
    t = dedup.simhash_pairs(adv_dir)
    want = adv_duck.sql(sqlgen.simhash_pairs_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()


def test_jaccard_and_minhash_adversarial(ray_session, adv_dir, adv_duck):
    exact = dedup.jaccard_pairs(adv_dir)
    want = adv_duck.sql(
        sqlgen.jaccard_pairs_sql(dedup.JACCARD_THRESHOLD, dedup.SHINGLE_K)
    ).arrow()
    assert exact.to_pylist() == want.to_pylist()
    lsh = dedup.minhash_lsh_pairs(adv_dir)
    want = adv_duck.sql(
        sqlgen.minhash_lsh_pairs_sql(
            dedup.JACCARD_THRESHOLD, dedup.SHINGLE_K,
            dedup.JACCARD_SHINGLE_DF_CAP, dedup.MINHASH_PERMS, dedup.LSH_BANDS,
        )
    ).arrow()
    assert lsh.to_pylist() == want.to_pylist()
