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
    # two docs sharing an 8-token run -> cross-doc 6-gram duplication signal
    "alpha beta gamma delta epsilon zeta eta theta repeated",
    "prefix alpha beta gamma delta epsilon zeta eta theta suffix",
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


# -- events twins under adversarial timestamps ------------------------------

def _adv_events_dir(tmp_path_factory):
    """Events with EQUAL timestamps (the asof tie-break path), same-instant
    left/right pairs (gap == 0), exact-window-boundary gaps, null values,
    and a user with only one stream."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    W = 300  # RANGE_JOIN_WINDOW_S
    rows = [
        # user 1: two clicks at the SAME ts before an error (tie-break by
        # event_id), plus a click exactly at the error ts (gap 0)
        (0, base, 1, "click", 1.0),
        (1, base, 1, "click", 2.0),
        (2, base + dt.timedelta(seconds=10), 1, "click", None),
        (3, base + dt.timedelta(seconds=10), 1, "error", 3.0),
        # user 2: click exactly window_s before the error (boundary gap)
        (4, base, 2, "click", 0.5),
        (5, base + dt.timedelta(seconds=W), 2, "error", 0.5),
        # user 3: error with NO prior click (dropped by inner asof)
        (6, base, 3, "error", 9.9),
        (7, base + dt.timedelta(seconds=1), 3, "click", 1.1),
        # user 4: clicks only
        (8, base, 4, "click", 4.0),
        # cross-user range pair: user 4 click near user 3 error
        (9, base + dt.timedelta(seconds=W + 1), 4, "error", 1.0),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("adv_events")
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[3] for r in rows], type=pa.string()),
            "value": pa.array([r[4] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    return str(d)


def test_events_joins_adversarial_ts(ray_session, tmp_path_factory):
    from smse_backend_ray.pipelines import events

    d = _adv_events_dir(tmp_path_factory)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'events.parquet')}')"
    )
    got = events.asof_join(d)
    want = con.sql(events.asof_join_sql()).arrow()
    assert got.to_pylist() == want.to_pylist()
    # the equal-ts tie resolved to the LARGER event_id (1, not 0)... unless
    # the same-instant click (gap 0) wins, which sorts later still
    by_left = {r["event_id"]: r for r in got.to_pylist()}
    assert by_left[3]["match_event_id"] == 2  # same-instant click wins
    got = events.range_join(d)
    want = con.sql(events.range_join_sql()).arrow()
    assert got.to_pylist() == want.to_pylist()
    pairs = {(r["event_id"], r["match_event_id"]): r["gap_us"] for r in got.to_pylist()}
    assert pairs[(5, 4)] == 300 * 1_000_000  # exact window boundary kept
    got = events.sliding_window_agg(d)
    want = con.sql(events.sliding_window_agg_sql()).arrow()
    assert got.to_pylist() == want.to_pylist()
    con.close()


def test_simhash_oversized_bucket_cap(ray_session, tmp_path_factory):
    """250 identical docs blow the SIMHASH_BUCKET_CAP in every chunk bucket:
    the pairs are dropped WITH a logged marker (never silently), matching
    the SQL twin which excludes oversized buckets entirely."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from smse_backend_ray.functions import sqlgen
    from smse_backend_ray.pipelines import dedup

    n = 250
    d = tmp_path_factory.mktemp("cap_docs")
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(["identical text body here"] * n),
            "lang": pa.array(["en"] * n),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    got = dedup.simhash_pairs(str(d))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}')"
    )
    want = con.sql(sqlgen.simhash_pairs_sql()).arrow()
    assert got.to_pylist() == want.to_pylist() == []
    con.close()


def test_substring_dup_adversarial(ray_session, adv_dir, adv_duck):
    t = dedup.substring_dup_stats(adv_dir)
    want = adv_duck.sql(
        sqlgen.substring_dup_sql(dedup.SUBSTR_DUP_K, dedup.SUBSTR_DUP_MIN_DF)
    ).arrow()
    assert t.to_pylist() == want.to_pylist()
    # the planted shared 8-token run produces real cross-doc 6-gram dups
    assert sum(t["n_dup"].to_pylist()) > 0
    # short/empty docs emit the (0, 0, 0.0) row, not a missing row
    by_id = {r["doc_id"]: r for r in t.to_pylist()}
    assert by_id[0] == {"doc_id": 0, "n_grams": 0, "n_dup": 0, "dup_frac": 0.0}


def test_dedup_survivors_adversarial(ray_session, adv_dir, adv_duck):
    t = dedup.dedup_survivors(adv_dir)
    want = adv_duck.sql(
        sqlgen.dedup_survivors_sql(
            dedup.JACCARD_THRESHOLD, dedup.SHINGLE_K, dedup.JACCARD_SHINGLE_DF_CAP
        )
    ).arrow()
    assert t.to_pylist() == want.to_pylist()


def test_pack_bins_adversarial(ray_session, adv_dir, adv_duck):
    from smse_backend_ray.pipelines import packing

    t = packing.pack_bins(adv_dir)
    want = adv_duck.sql(packing.pack_bins_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    # zero-token docs occupy zero width: next offset equals theirs
    rows = t.to_pylist()
    for a, b in zip(rows, rows[1:]):
        assert b["start_offset"] == a["start_offset"] + a["n_tokens"]


def test_unigram_logprob_adversarial(ray_session, adv_dir, adv_duck):
    t = textstats.unigram_logprob(adv_dir)
    want = adv_duck.sql(sqlgen.unigram_logprob_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    by_id = {r["doc_id"]: r for r in t.to_pylist()}
    assert by_id[0] == {"doc_id": 0, "dl": 0, "avg_logprob": 0.0}  # empty doc


def test_cooc_pmi_adversarial(ray_session, adv_dir, adv_duck):
    t = textstats.term_cooc_pmi(adv_dir)
    want = adv_duck.sql(sqlgen.cooc_pmi_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()


def test_doc_keywords_adversarial(ray_session, adv_dir, adv_duck):
    t = textstats.doc_keywords(adv_dir)
    want = adv_duck.sql(sqlgen.keywords_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    # empty/whitespace-only docs yield no keyword rows
    ids = {r["doc_id"] for r in t.to_pylist()}
    assert 0 not in ids and 1 not in ids


def test_dl_quantiles_adversarial(ray_session, adv_dir, adv_duck):
    t = textstats.doc_length_quantiles(adv_dir)
    want = adv_duck.sql(sqlgen.dl_quantiles_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    # single lang; empty docs hold the p25 down to a real 0-containing lerp
    assert t.num_rows == 1 and t["n_docs"][0].as_py() == len(ADVERSARIAL_TEXTS)


def test_kmv_distinct_adversarial(ray_session, adv_dir, adv_duck):
    """KMV on adversarial docs: fewer distinct grams than KMV_K, so the
    sketch is exhaustive and est_distinct is the exact distinct-hash
    count — twin-exact including the short-corpus CASE branch."""
    t = textstats.kmv_distinct(adv_dir)
    want = adv_duck.sql(textstats.kmv_distinct_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    row = t.to_pylist()[0]
    assert row["n_sketch"] == row["est_distinct"] > 0


def test_doc_sample_balanced_adversarial(ray_session, adv_dir, adv_duck):
    """Balanced sample on the single-lang adversarial corpus: cap above
    the corpus size keeps everything, ranks follow the frozen
    (sample_key, doc_id) order — twin-exact."""
    from smse_backend_ray.pipelines import sampling

    t = sampling.doc_sample_balanced(adv_dir)
    want = adv_duck.sql(sampling.doc_sample_balanced_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    assert t.num_rows == len(ADVERSARIAL_TEXTS)  # cap 50 > corpus


def test_doc_rollup_counts_adversarial(ray_session, tmp_path_factory):
    """GROUPING-SETS rollup twin-exact on adversarial text (unicode chars
    count as CHARACTERS on both sides, empties count 0) with multiple
    sources/langs; grand total equals corpus size; subtotal sentinel rows
    sort deterministically among real labels."""
    d = tmp_path_factory.mktemp("rollup_docs")
    srcs = ["s1", "s2"] * (len(ADVERSARIAL_TEXTS) // 2)
    langs = (["en", "de", "zh"] * len(ADVERSARIAL_TEXTS))[: len(ADVERSARIAL_TEXTS)]
    t_in = pa.table(
        {
            "doc_id": pa.array(range(len(ADVERSARIAL_TEXTS)), type=pa.int64()),
            "text": pa.array(ADVERSARIAL_TEXTS, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(srcs, type=pa.string()),
        }
    )
    pq.write_table(t_in, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}')"
    )
    t = textstats.doc_rollup_counts(str(d))
    want = con.sql(textstats.doc_rollup_counts_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    grand = [r for r in t.to_pylist() if r["source"] == "__ALL__"]
    assert len(grand) == 1 and grand[0]["n"] == len(ADVERSARIAL_TEXTS)


# ---------------------------------------------------------------------------
# randomized warehouse cross-checks: hypothesis generates SMALL random
# corpora/event logs and the engine must stay twin-exact on each — a
# randomized driver_sim for the round-5 operators whose tie/sentinel/
# threshold paths depend on the data distribution, not the text content.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    langs=st.lists(
        st.sampled_from(["en", "de", "es", "zh", None]), min_size=1, max_size=40
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_sampling_twins_random_corpora(ray_session, tmp_path_factory, langs, seed):
    """doc_sample_balanced / doc_sample_temperature / doc_rollup_counts stay
    twin-exact on random lang distributions (incl. NULL langs and sparse
    non-contiguous doc_ids)."""
    import numpy as np

    from smse_backend_ray.pipelines import sampling as smp
    from smse_backend_ray.pipelines import textstats as ts

    rng = np.random.RandomState(seed % (2**31))
    n = len(langs)
    ids = sorted(rng.choice(10**7, size=n, replace=False).tolist())
    d = tmp_path_factory.mktemp("rand_docs")
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([f"word{i} common text" for i in range(n)]),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}')"
    )
    for fn, sql in [
        (smp.doc_sample_balanced, smp.doc_sample_balanced_sql()),
        (smp.doc_sample_temperature, smp.doc_sample_temperature_sql()),
        (ts.doc_rollup_counts, ts.doc_rollup_counts_sql()),
    ]:
        got = fn(str(d))
        want = con.sql(sql).arrow()
        assert got.to_pylist() == want.to_pylist(), fn.__name__
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),          # user
            st.integers(min_value=0, max_value=50),         # ts seconds
            st.floats(min_value=-5, max_value=5, allow_nan=False) | st.none(),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_running_totals_twin_random_events(ray_session, tmp_path_factory, rows):
    """user_running_totals stays twin-exact on random event logs with
    clustered ts ties, NULL values, and negative values."""
    import datetime

    from smse_backend_ray.pipelines import events

    t0 = datetime.datetime(2024, 1, 1)
    d = tmp_path_factory.mktemp("rand_events")
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [t0 + datetime.timedelta(seconds=r[1]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array(["x"] * len(rows)),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'events.parquet')}')"
    )
    got = events.user_running_totals(str(d))
    want = con.sql(events.user_running_totals_sql()).arrow()
    assert got.to_pylist() == want.to_pylist()
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),           # user
            st.integers(min_value=0, max_value=40 * 86400),  # ts seconds
            st.sampled_from(["a", "b", "c"]),                # event_type
        ),
        min_size=1,
        max_size=40,
    )
)
def test_session9_event_twins_random_logs(ray_session, tmp_path_factory, rows):
    """user_activity_histogram / weekly_active_users / event_gap_quantiles
    stay twin-exact on random event logs with clustered ts ties, week
    boundaries, and multi-type interleaving."""
    import datetime

    from smse_backend_ray.pipelines import events

    t0 = datetime.datetime(2024, 1, 1)
    d = tmp_path_factory.mktemp("rand_events9")
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [t0 + datetime.timedelta(seconds=r[1]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows), type=pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(d, "events.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'events.parquet')}')"
    )
    for fn, sql in [
        (events.user_activity_histogram, events.user_activity_histogram_sql()),
        (events.event_gap_quantiles, events.event_gap_quantiles_sql()),
    ]:
        got = fn(str(d))
        want = con.sql(sql).arrow()
        assert got.to_pylist() == want.to_pylist(), fn.__name__
    got = events.weekly_active_users(str(d))
    want = con.sql(events.weekly_active_users_sql()).arrow().cast(got.schema)
    assert got.to_pylist() == want.to_pylist(), "weekly_active_users"
    con.close()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(
            alphabet="ab corn the and 0123 \n\t.",
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_session9_doc_twins_random_corpora(
    ray_session, tmp_path_factory, texts, seed
):
    """lang_confusion / quality_by_source / quality_zscore /
    bigram_logprob stay twin-exact on adversarial short texts (digits,
    stopwords, whitespace runs, empty docs, sparse doc_ids)."""
    import numpy as np

    from smse_backend_ray.functions import sqlgen
    from smse_backend_ray.pipelines import textstats as ts

    rng = np.random.RandomState(seed % (2**31))
    n = len(texts)
    ids = sorted(rng.choice(10**7, size=n, replace=False).tolist())
    d = tmp_path_factory.mktemp("rand_docs9")
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([["en", "de", "zh"][i % 3] for i in range(n)]),
            "source": pa.array([f"s{i % 3}" for i in range(n)]),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(d, 'documents.parquet')}')"
    )
    for fn, sql in [
        (ts.lang_confusion, sqlgen.lang_confusion_sql()),
        (ts.quality_by_source, sqlgen.quality_by_source_sql()),
        (ts.quality_zscore, sqlgen.quality_zscore_sql()),
        (ts.bigram_logprob, sqlgen.bigram_logprob_sql()),
    ]:
        got = fn(str(d))
        want = con.sql(sql).arrow()
        assert got.to_pylist() == want.to_pylist(), fn.__name__
    con.close()
