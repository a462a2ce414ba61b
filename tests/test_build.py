"""Build-stage semantics on a planted corpus: exact dedup (winner rule),
lang allowlist, empty content, and file-mode lineage/resume."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

import ray.data

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.pipelines.build import build_index
from smse_backend_ray.pipelines.search import SearchEngine
from smse_backend_ray.sources.corpus import doc_id_from_key
from smse_backend_ray.state.catalog import Catalog


def planted_corpus() -> pa.Table:
    rows = [
        # (repo, path, commit, lang, content)
        ("org/a", "src/main.py", "c1", "py", "def main(): hashMap lookup fastScan"),
        ("org/a", "src/util.py", "c1", "py", "utility helpers for hashMap and sorting"),
        # exact key duplicate with DIFFERENT content: winner = min sha
        ("org/a", "src/dup.py", "c1", "py", "zzz content B"),
        ("org/a", "src/dup.py", "c1", "py", "aaa content A"),
        # identical full row duplicate
        ("org/b", "src/same.py", "c2", "py", "identical twin row"),
        ("org/b", "src/same.py", "c2", "py", "identical twin row"),
        # disallowed lang
        ("org/b", "src/readme.xyz", "c2", "xyz", "should be filtered out"),
        # empty content (kept: dl = 0)
        ("org/b", "src/empty.py", "c2", "py", ""),
    ]
    cols = list(zip(*rows))
    return pa.table(
        {
            "repo": pa.array(cols[0]),
            "path": pa.array(cols[1]),
            "commit": pa.array(cols[2]),
            "lang": pa.array(cols[3]),
            "content": pa.array(cols[4]),
        }
    )


@pytest.fixture(scope="module")
def planted_index(ray_session):
    idx_dir = "/tmp/smse_test_planted"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = EngineConfig(n_shards=2, allowed_langs=("py", "go"))
    build_index(
        corpus=ray.data.from_arrow(planted_corpus()), index_dir=idx_dir, cfg=cfg
    )
    return idx_dir


def test_dedup_and_allowlist(planted_index):
    docs = pads.dataset(os.path.join(planted_index, "docs")).to_table()
    by_path = {(r["repo"], r["path"]): r for r in docs.to_pylist()}
    # 8 planted - 1 lang-filtered - 2 dups removed = 5 docs
    assert docs.num_rows == 5
    assert ("org/b", "src/readme.xyz") not in by_path
    # key-dup winner: min content_sha256 -> "aaa content A" hashes lower? The
    # rule is lexicographic min of sha, so just assert determinism: rebuilding
    # picks the same winner and only one row survives.
    import hashlib

    sha_a = hashlib.sha256(b"aaa content A").hexdigest()
    sha_b = hashlib.sha256(b"zzz content B").hexdigest()
    assert by_path[("org/a", "src/dup.py")]["content_sha256"] == min(sha_a, sha_b)
    # empty content kept with dl=0
    assert by_path[("org/b", "src/empty.py")]["dl"] == 0


def test_dedup_metrics_recorded(planted_index):
    cat = Catalog(planted_index)
    assert cat._state["stages"]["dedup"]["metrics"]["duplicates"] == 2


def test_search_planted(planted_index):
    with SearchEngine(planted_index) as eng:
        t = eng.search(["hashMap"], limit=10)
        paths = t["path"].to_pylist()
        assert set(paths) == {"src/main.py", "src/util.py"}


# ---------------------------------------------------------------------------
# file-mode build: per-partition lineage + resume without recomputation
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_files")
    t = planted_corpus()
    files = []
    for i in range(4):
        f = str(d / f"part_{i}.parquet")
        # vary path per file so rows are distinct docs
        part = t.set_column(
            1, "path", pa.array([f"f{i}/" + p for p in t["path"].to_pylist()])
        )
        pq.write_table(part, f)
        files.append(f)
    return files


def test_file_build_resume_skips_done(ray_session, corpus_files):
    idx_dir = "/tmp/smse_test_filebuild"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = EngineConfig(n_shards=2, wave_size=2)
    build_index(input_files=corpus_files, index_dir=idx_dir, cfg=cfg)
    cat = Catalog(idx_dir)
    assert cat.completed_partitions() == [0, 1, 2, 3]
    for pid, rec in cat._state["partitions"].items():
        assert rec["metrics"]["rows"] > 0
    wave_files = sorted(glob.glob(os.path.join(idx_dir, "docs", "wave_*", "*.parquet")))
    mtimes = {f: os.path.getmtime(f) for f in wave_files}

    # resume: nothing recomputed, wave outputs untouched
    build_index(input_files=corpus_files, index_dir=idx_dir, cfg=cfg)
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, "completed wave was rewritten on resume"

    # docs-stage partition planning is also resumable mid-build: simulate a
    # crash after the docs stage by invalidating later stages only
    cat2 = Catalog(idx_dir)
    cat2.invalidate_from(["stats", "docmeta", "segments", "df"])
    build_index(input_files=corpus_files, index_dir=idx_dir, cfg=cfg)
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m


def test_file_build_searchable(ray_session, corpus_files):
    with SearchEngine("/tmp/smse_test_filebuild") as eng:
        t = eng.search(["hashMap lookup"], limit=20)
        assert t.num_rows == 8  # 2 hit docs x 4 file partitions


def test_crash_mid_build_resumes_without_recompute(ray_session, corpus_files, monkeypatch):
    """Kill-and-resume (SURVEY.md §7.7): crash after the first wave commit;
    the restart must not recompute the finished wave and must produce an
    index identical to an uninterrupted build."""
    import smse_backend_ray.state.catalog as catmod

    idx_dir = "/tmp/smse_test_crashbuild"
    shutil.rmtree(idx_dir, ignore_errors=True)
    cfg = EngineConfig(n_shards=2, wave_size=2)

    real_mark = catmod.Catalog.mark_partitions_done
    calls = {"n": 0}

    def crashing_mark(self, *a, **kw):
        real_mark(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after wave 1 commit")

    monkeypatch.setattr(catmod.Catalog, "mark_partitions_done", crashing_mark)
    with pytest.raises(RuntimeError, match="injected crash"):
        build_index(input_files=corpus_files, index_dir=idx_dir, cfg=cfg)
    monkeypatch.setattr(catmod.Catalog, "mark_partitions_done", real_mark)

    cat = Catalog(idx_dir)
    done_after_crash = cat.completed_partitions()
    assert done_after_crash == [0, 1]  # first wave committed, rest pending
    # (dedup later rewrites docs/, so the no-recompute evidence is the
    # partition lineage: completed records must be byte-identical after
    # resume — same timestamps, same metrics, not re-processed)
    recs_before = {
        pid: dict(cat._state["partitions"][str(pid)]) for pid in done_after_crash
    }

    build_index(input_files=corpus_files, index_dir=idx_dir, cfg=cfg)  # resume
    cat2 = Catalog(idx_dir)
    assert cat2.completed_partitions() == [0, 1, 2, 3]
    for pid, rec in recs_before.items():
        assert cat2._state["partitions"][str(pid)] == rec, (
            "completed partition was re-processed on resume"
        )

    # resumed index answers identically to the uninterrupted build
    with SearchEngine(idx_dir) as eng:
        a = eng.search(["hashMap lookup"], limit=20).to_pylist()
    with SearchEngine("/tmp/smse_test_filebuild") as eng:
        b = eng.search(["hashMap lookup"], limit=20).to_pylist()
    assert a == b


def test_corpus_from_files_csv_jsonl_parquet_equivalent(ray_session, tmp_path):
    """The same corpus ingested from CSV, JSONL, and parquet builds
    BITWISE-identical indexes: identical docs tables and identical BM25
    results (source format must never leak into doc identity or scores)."""
    import csv as csvmod
    import json

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import ray.data

    from smse_backend_ray.config import EngineConfig
    from smse_backend_ray.pipelines.build import build_index
    from smse_backend_ray.pipelines.search import SearchEngine
    from smse_backend_ray.sources.corpus import (
        corpus_from_files,
        corpus_table_from_documents,
    )

    t = corpus_table_from_documents("/root/testdata/sf0.001")
    t = t.slice(0, 120)
    rows = t.to_pylist()
    pq.write_table(t, str(tmp_path / "corpus.parquet"))
    with open(tmp_path / "corpus.csv", "w", newline="") as f:
        w = csvmod.DictWriter(f, fieldnames=t.column_names)
        w.writeheader()
        w.writerows(rows)
    with open(tmp_path / "corpus.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    results = {}
    docs_tables = {}
    for fmt, fname in [
        ("parquet", "corpus.parquet"),
        ("csv", "corpus.csv"),
        ("jsonl", "corpus.jsonl"),
    ]:
        idx = str(tmp_path / f"idx_{fmt}")
        build_index(
            corpus=corpus_from_files(str(tmp_path / fname), format=fmt),
            index_dir=idx,
            cfg=EngineConfig(n_shards=2),
        )
        d = pads.dataset(f"{idx}/docs", partitioning="hive").to_table(
            columns=["doc_id", "repo", "path", "content_sha256", "dl"]
        )
        docs_tables[fmt] = d.take(pa.compute.sort_indices(d["doc_id"])).to_pydict()
        with SearchEngine(idx) as eng:
            r = eng.search("hash join table", limit=10)
            results[fmt] = r.select(["rank", "doc_id", "score"]).to_pydict()

    assert docs_tables["csv"] == docs_tables["parquet"]
    assert docs_tables["jsonl"] == docs_tables["parquet"]
    assert results["csv"] == results["parquet"]
    assert results["jsonl"] == results["parquet"]

    # missing column fails loudly at the first executed batch
    with open(tmp_path / "bad.csv", "w", newline="") as f:
        w = csvmod.DictWriter(f, fieldnames=[c for c in t.column_names if c != "commit"])
        w.writeheader()
        w.writerows([{k: v for k, v in r.items() if k != "commit"} for r in rows[:3]])
    with pytest.raises(Exception, match="commit"):
        corpus_from_files(str(tmp_path / "bad.csv"), format="csv").take_batch(1)
    with pytest.raises(ValueError, match="unsupported"):
        corpus_from_files(str(tmp_path / "corpus.csv"), format="xml")


def test_corpus_from_files_numeric_looking_strings_survive(ray_session, tmp_path):
    """utf8 is forced at parse time: numeric-looking commit/repo values
    ('00123', '42') must round-trip byte-identically through CSV and JSONL
    — inference + cast-back would render them as integers ('123') and
    silently change the derived doc_id."""
    import csv as csvmod
    import json

    from smse_backend_ray.sources.corpus import corpus_from_files

    rows = [
        {"repo": "42", "path": "a/b.txt", "commit": "00123",
         "lang": "en", "content": "007 true"},
        {"repo": "42", "path": "a/c.txt", "commit": "0456",
         "lang": "en", "content": "99999999999999999999"},
    ]
    with open(tmp_path / "n.csv", "w", newline="") as f:
        w = csvmod.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    with open(tmp_path / "n.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    from smse_backend_ray.functions.collect import collect_table

    for fmt, fname in [("csv", "n.csv"), ("jsonl", "n.jsonl")]:
        t = collect_table(corpus_from_files(str(tmp_path / fname), format=fmt))
        got = sorted(t.to_pylist(), key=lambda r: r["path"])
        assert [r["commit"] for r in got] == ["00123", "0456"], fmt
        assert [r["repo"] for r in got] == ["42", "42"], fmt
        assert got[1]["content"] == "99999999999999999999", fmt
