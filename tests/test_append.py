"""Incremental append (segment generations, pipelines/build.py append_index)
must be indistinguishable from a full rebuild over the union corpus:
bitwise-equal search results (exact AND block-max WAND), identical df table
and stats. Also covers D3 existence-check first-wins on re-appended docs,
crashed-generation rollback, and WAND bound-rescaling when appends shift the
global avgdl."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pytest

from smse_backend_ray.config import EngineConfig
from smse_backend_ray.pipelines.build import append_index, build_index
from smse_backend_ray.pipelines.search import SearchEngine
from smse_backend_ray.queryset import ALL_QUERIES
from smse_backend_ray.sources.corpus import corpus_table_from_documents
from smse_backend_ray.state.catalog import Catalog

IDX_FULL = "/tmp/smse_test_append_full"
IDX_INC = "/tmp/smse_test_append_inc"


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


@pytest.fixture(scope="module")
def split_corpus(ray_session, sf_dir):
    t = corpus_table_from_documents(sf_dir)
    idx = pa.array(range(len(t)))
    even = t.filter(pa.compute.equal(pa.compute.bit_wise_and(idx, 1), 0))
    odd = t.filter(pa.compute.equal(pa.compute.bit_wise_and(idx, 1), 1))
    return t, even, odd


@pytest.fixture(scope="module")
def indexes(split_corpus):
    full_t, even, odd = split_corpus
    cfg = EngineConfig(n_shards=4)
    shutil.rmtree(IDX_FULL, ignore_errors=True)
    shutil.rmtree(IDX_INC, ignore_errors=True)
    build_index(corpus=_ds(full_t), index_dir=IDX_FULL, cfg=cfg)
    build_index(corpus=_ds(even), index_dir=IDX_INC, cfg=cfg)
    append_index(_ds(odd), IDX_INC)  # config comes from the manifest
    return IDX_FULL, IDX_INC


def test_stats_and_generations(indexes):
    full, inc = Catalog(indexes[0]), Catalog(indexes[1])
    assert full.get_stats() == inc.get_stats()  # ints + identical avgdl division
    gens = inc.generations()
    assert list(gens) == ["1"] and gens["1"]["status"] == "done"
    assert gens["1"]["dropped_existing"] == 0


def test_df_table_identical(indexes):
    import pyarrow.dataset as pads

    a = pads.dataset(f"{indexes[0]}/df").to_table().sort_by("term")
    b = pads.dataset(f"{indexes[1]}/df").to_table().sort_by("term")
    assert a.equals(b)


@pytest.mark.parametrize("strategy", ["exact", "wand"])
def test_search_bitwise_parity(indexes, strategy):
    with SearchEngine(indexes[0], strategy=strategy) as full, SearchEngine(
        indexes[1], strategy=strategy
    ) as inc:
        a = full.search_batch(ALL_QUERIES).to_pylist()
        b = inc.search_batch(ALL_QUERIES).to_pylist()
    assert a == b  # includes exact float equality on score columns


def test_reappend_is_noop(indexes, split_corpus):
    """D3 existence-check first-wins: re-appending already-indexed docs drops
    every row and commits no new generation."""
    _, _, odd = split_corpus
    cat = append_index(_ds(odd), indexes[1])
    assert cat.get_stats()["n_docs"] == Catalog(indexes[0]).get_stats()["n_docs"]
    assert list(cat.generations()) == ["1"]


def _mk_corpus(rows: list[tuple[str, str, str]]) -> pa.Table:
    return pa.table(
        {
            "repo": pa.array([r[0] for r in rows], type=pa.string()),
            "path": pa.array([r[1] for r in rows], type=pa.string()),
            "commit": pa.array(["c0"] * len(rows), type=pa.string()),
            "lang": pa.array(["python"] * len(rows), type=pa.string()),
            "content": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )


def test_wand_rescale_after_avgdl_shift(ray_session):
    """Append LONG docs to a short-doc base: global avgdl grows, so the base
    generation's encode-time block_max values underestimate current tf-norms.
    The scorer's max(1, avgdl_now/enc_avgdl) rescale must keep WAND exactly
    equal to exhaustive scoring."""
    idx = "/tmp/smse_test_append_wand"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus(
        [("r0", f"a/{i}.py", f"alphatok beta{i % 7} " * (1 + i % 3)) for i in range(160)]
    )
    longdocs = _mk_corpus(
        [
            ("r1", f"b/{i}.py", ("alphatok " + f"gamma{i % 5} filler{i} " * 40))
            for i in range(160)
        ]
    )
    cfg = EngineConfig(n_shards=2, block_size=16)
    build_index(corpus=_ds(base), index_dir=idx, cfg=cfg)
    append_index(_ds(longdocs), idx)

    full_idx = "/tmp/smse_test_append_wand_full"
    shutil.rmtree(full_idx, ignore_errors=True)
    build_index(
        corpus=_ds(pa.concat_tables([base, longdocs])), index_dir=full_idx, cfg=cfg
    )

    with SearchEngine(idx, strategy="exact") as exact_eng, SearchEngine(
        idx, strategy="wand"
    ) as wand_eng, SearchEngine(full_idx, strategy="wand") as full_eng:
        for q in ("alphatok", "alphatok gamma2", "beta3 alphatok filler7"):
            a = exact_eng.search(q, limit=10).to_pylist()
            b = wand_eng.search(q, limit=10).to_pylist()
            c = full_eng.search(q, limit=10).to_pylist()
            assert a == b == c, q


def test_crashed_generation_rolls_back(ray_session):
    idx = "/tmp/smse_test_append_crash"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus([("r0", f"x/{i}.py", f"delta{i} common tok") for i in range(40)])
    cfg = EngineConfig(n_shards=2)
    cat = build_index(corpus=_ds(base), index_dir=idx, cfg=cfg)

    # plant a half-committed generation: manifest record + stray gen files
    cat.set_generation(7, {"status": "committing", "n_docs": 1})
    ifs = cat.ifs
    ifs.mkdirs("docs/gen_000007/shard_id=0")
    with ifs.open_output("docs/gen_000007/shard_id=0/junk.parquet") as f:
        f.write(b"not parquet")
    with ifs.open_output("segments/shard_id=0/gen000007_junk.parquet") as f:
        f.write(b"not parquet")

    extra = _mk_corpus([("r1", f"y/{i}.py", f"epsilon{i} common tok") for i in range(40)])
    cat2 = append_index(_ds(extra), idx)
    gens = cat2.generations()
    assert "7" not in gens and gens["8" if "8" in gens else "1"]["status"] == "done"
    assert not ifs.exists("docs/gen_000007")
    assert "gen000007_junk.parquet" not in " ".join(
        ifs.list_files("segments", recursive=True)
    )
    # index still searches and sees both halves
    with SearchEngine(idx) as eng:
        got = eng.search("common", limit=80)
        assert got.num_rows == 80


def test_append_recovers_parked_doc_store(ray_session):
    """A compaction that died between parking docs/ at docs.bak and moving
    the new store in must be recovered by the NEXT append — before it
    creates docs/gen_* (which would make docs/ exist again and strand the
    .bak, the only copy of the base corpus' doc metadata, forever)."""
    idx = "/tmp/smse_test_append_bak"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus([("r0", f"x/{i}.py", f"zeta{i} common tok") for i in range(40)])
    cat = build_index(corpus=_ds(base), index_dir=idx, cfg=EngineConfig(n_shards=2))
    ifs = cat.ifs
    ifs.move("docs", "docs.bak")  # simulate the crash window
    extra = _mk_corpus([("r1", f"y/{i}.py", f"eta{i} common tok") for i in range(40)])
    append_index(_ds(extra), idx)
    assert ifs.exists("docs") and not ifs.exists("docs.bak")
    with SearchEngine(idx) as eng:
        assert eng.search("common", limit=80).num_rows == 80


def test_append_fails_loudly_on_ambiguous_bak(ray_session):
    """docs.bak beside a LIVE docs/ is ambiguous (stale backup vs stranded
    base corpus) — append must refuse rather than silently proceed."""
    idx = "/tmp/smse_test_append_bak2"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus([("r0", f"x/{i}.py", f"theta{i} tok") for i in range(20)])
    cat = build_index(corpus=_ds(base), index_dir=idx, cfg=EngineConfig(n_shards=2))
    cat.ifs.mkdirs("docs.bak")
    extra = _mk_corpus([("r1", "y/0.py", "iota tok")])
    with pytest.raises(RuntimeError, match="docs.bak"):
        append_index(_ds(extra), idx)


def test_engine_open_recovers_parked_doc_store(ray_session):
    """SearchEngine open after a mid-swap compaction crash restores docs/
    from docs.bak before any shard actor loads metadata."""
    idx = "/tmp/smse_test_engine_bak"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus([("r0", f"x/{i}.py", f"kappa{i} common tok") for i in range(40)])
    cat = build_index(corpus=_ds(base), index_dir=idx, cfg=EngineConfig(n_shards=2))
    cat.ifs.move("docs", "docs.bak")
    with SearchEngine(idx) as eng:
        assert eng.search("common", limit=40).num_rows == 40
    assert cat.ifs.exists("docs") and not cat.ifs.exists("docs.bak")


def test_append_refuses_legacy_segments(ray_session):
    """Segment files lacking enc_avgdl (pre-append-era indexes) cannot be
    appended to: the scorer's legacy fallback assumes avgdl is unchanged
    since encode, which an append would break (silent WAND under-bounds)."""
    import glob

    import pyarrow.parquet as pq

    idx = "/tmp/smse_test_append_legacy"
    shutil.rmtree(idx, ignore_errors=True)
    base = _mk_corpus([("r0", f"x/{i}.py", f"lam{i} tok") for i in range(20)])
    build_index(corpus=_ds(base), index_dir=idx, cfg=EngineConfig(n_shards=2))
    for f in glob.glob(f"{idx}/segments/shard_id=*/*.parquet"):
        pq.write_table(pq.read_table(f).drop_columns(["enc_avgdl"]), f)
    extra = _mk_corpus([("r1", "y/0.py", "mu tok")])
    with pytest.raises(RuntimeError, match="enc_avgdl"):
        append_index(_ds(extra), idx)
