"""Product-quantization ANN (simsearch.py PQ family): codebook determinism,
encode/decode geometry, and the recall gate vs exact brute force."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_codebooks_deterministic_and_shaped(ray_session):
    from smse_backend_ray.pipelines.simsearch import PQ_K, PQ_M, train_pq_codebooks

    b1 = train_pq_codebooks(SF)
    b2 = train_pq_codebooks(SF)
    assert b1.shape == (PQ_M, PQ_K, 64 // PQ_M)
    assert np.array_equal(b1, b2)


def test_encode_layout(ray_session):
    from smse_backend_ray.functions.collect import collect_table
    from smse_backend_ray.pipelines.simsearch import (
        PQ_M,
        pq_encode,
        train_pq_codebooks,
    )

    books = train_pq_codebooks(SF)
    t = collect_table(pq_encode(SF, books))
    assert t.num_rows == 500
    codes = np.asarray(t["codes"].combine_chunks().values).reshape(-1, PQ_M)
    assert codes.dtype == np.uint8 and codes.shape == (500, PQ_M)
    assert (np.asarray(t["norm"]) > 0).all()


def test_pq_recall_and_rerank_exactness(ray_session):
    from smse_backend_ray.pipelines.simsearch import (
        PQ_RECALL_FLOOR,
        knn_bruteforce,
        knn_pq,
        knn_pq_checked,
    )

    approx = knn_pq(SF)
    exact = knn_bruteforce(SF)
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_vec_id"], {})[r["vec_id"]] = r["cosine"]
    hits = 0
    total = 0
    for r in approx.to_pylist():
        q = r["query_vec_id"]
        total += 1
        if r["vec_id"] in ex[q]:
            hits += 1
            # rerank rescores EXACTLY: returned cosine == brute-force cosine
            assert r["cosine"] == ex[q][r["vec_id"]]
    assert hits / total >= PQ_RECALL_FLOOR
    knn_pq_checked(SF)  # the in-entry gate passes


def test_pq_rejects_bad_dim(ray_session):
    from smse_backend_ray.pipelines.simsearch import train_pq_codebooks

    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(SF, m=7)


def test_ivfpq_recall_and_full_probe(ray_session):
    from smse_backend_ray.pipelines.simsearch import (
        IVF_CLUSTERS,
        IVFPQ_RECALL_FLOOR,
        knn_bruteforce,
        knn_ivfpq,
        knn_ivfpq_checked,
    )

    exact = knn_bruteforce(SF)
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_vec_id"], set()).add(r["vec_id"])

    def recall(t):
        got = {}
        for r in t.to_pylist():
            got.setdefault(r["query_vec_id"], set()).add(r["vec_id"])
        return sum(len(got.get(q, set()) & ex[q]) / len(ex[q]) for q in ex) / len(ex)

    assert recall(knn_ivfpq(SF)) >= IVFPQ_RECALL_FLOOR
    # probing every cluster removes the IVF miss channel; only the PQ
    # shortlist can still drop a true hit
    assert recall(knn_ivfpq(SF, nprobe=IVF_CLUSTERS)) >= 0.9
    knn_ivfpq_checked(SF)


def test_pq_codes_persisted_no_reencode(ray_session, monkeypatch, tmp_path):
    """The flat-PQ code table is an index artifact: built once via the
    IndexFS atomic protocol, then knn_pq serves from the stored codes —
    a later call must neither retrain codebooks nor re-encode the corpus
    (both are poisoned here and the search still succeeds)."""
    import numpy as np

    import smse_backend_ray.pipelines.simsearch as ss

    out = str(tmp_path / "pqcodes")
    fs1, books1 = ss.build_pq_codes(SF, out_dir=out)
    assert fs1.exists()

    def boom(*a, **k):
        raise AssertionError("corpus re-encode / retrain on a warm code table")

    monkeypatch.setattr(ss, "pq_encode", boom)
    monkeypatch.setattr(ss, "train_pq_codebooks", boom)
    fs2, books2 = ss.build_pq_codes(SF, out_dir=out)
    assert np.array_equal(books1, books2)
    # and the codes themselves round-trip through the sidecar resume path
    files = sorted(fs2.list_files("", recursive=True, suffix=".parquet"))
    assert files


def test_default_cache_dirs_carry_corpus_identity(tmp_path):
    """Two corpora that share a directory BASENAME must resolve to distinct
    default cache dirs for every ANN layout (the silent-stale-codes alias
    found in review): _corpus_tag hashes the full normalized path."""
    import smse_backend_ray.pipelines.simsearch as ss

    a = str(tmp_path / "a" / "corpus")
    b = str(tmp_path / "b" / "corpus")
    ta, tb = ss._corpus_tag(a), ss._corpus_tag(b)
    assert ta != tb
    assert ta.startswith("corpus-") and tb.startswith("corpus-")
    # stable across trailing-slash spelling of the same corpus
    assert ss._corpus_tag(a + "/") == ta


def test_seed_vectors_sparse_and_too_small(ray_session, tmp_path):
    """Seeding falls back to the k smallest vec_ids for sparse id spaces
    and raises a descriptive error when fewer than k vectors exist."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    import smse_backend_ray.pipelines.simsearch as ss

    d = 8
    sparse = str(tmp_path / "sparse")
    import os

    os.makedirs(sparse)
    ids = [5, 100, 2000, 30000, 400000]  # none below k -> fast path empty
    emb = [list(np.full(d, float(i))) for i in range(len(ids))]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(emb, type=pa.list_(pa.float32())),
            }
        ),
        os.path.join(sparse, "embeddings.parquet"),
    )
    V = ss._seed_vectors(sparse, 3)
    assert V.shape == (3, d)
    assert V[0, 0] == 0.0 and V[2, 0] == 2.0  # the 3 smallest ids, sorted
    with pytest.raises(ValueError, match="at least 9 vectors"):
        ss._seed_vectors(sparse, 9)
