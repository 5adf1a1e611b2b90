"""Physical index build + query tests: rank-identity of both scorers
vs the numpy oracle, salted-merge correctness under forced skew,
resume-from-manifest, and posting-count lineage consistency."""

from __future__ import annotations

import numpy as np
import pytest

from logsentinelai_spark.corpus import gen_pages_df, gen_queries
from logsentinelai_spark.functions.tokenizer import tokens
from logsentinelai_spark.index.bm25 import bm25_oracle_topk
from logsentinelai_spark.index.build import IndexConfig, build_index
from logsentinelai_spark.index.query import topk, topk_local
from logsentinelai_spark.index.reader import IndexReader

N_DOCS = 1200
CFG = IndexConfig(
    shard_size=256,
    wave_shards=2,   # 512 docs/wave -> 3 waves
    n_buckets=4,
    block_size=32,   # force multi-block postings (exercises skipping)
)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("index") / "db")
    pages = gen_pages_df(spark, N_DOCS, partitions=8)
    summary = build_index(spark, pages, idx, CFG)
    # local oracle corpus with url-rank doc ids
    rows = pages.select("url", "text").collect()
    by_url = sorted((r.url, r.text) for r in rows)
    doc_tokens = {i: tokens(t) for i, (_, t) in enumerate(by_url)}
    urls = {i: u for i, (u, _) in enumerate(by_url)}
    return dict(idx=idx, summary=summary, doc_tokens=doc_tokens, urls=urls)


def test_build_summary_and_manifests(spark, built):
    r = IndexReader(spark, built["idx"])
    assert built["summary"]["n_docs"] == N_DOCS
    assert sorted(r.waves) == [0, 1, 2]
    N, avgdl = r.global_stats()
    assert N == N_DOCS
    want_avg = np.mean([len(t) for t in built["doc_tokens"].values()])
    assert abs(avgdl - want_avg) < 1e-9
    # lineage: total postings across partitions == distinct (doc,term) pairs
    total = sum(p["postings"] for p in r.partition_metrics())
    want = sum(len(set(t)) for t in built["doc_tokens"].values())
    assert total == want
    # per-partition elapsed is recorded (north_rule lineage fields)
    assert all(p["elapsed_ms"] >= 0 for p in r.partition_metrics())
    for m in r.waves.values():
        assert set(m["stage_elapsed_sec"]) >= {"stage2_salted_merge", "commit_metrics"}


@pytest.mark.parametrize("mode", ["acc", "wand"])
def test_topk_rank_identical_to_oracle(spark, built, mode):
    r = IndexReader(spark, built["idx"])
    queries = gen_queries()
    sel = list(queries.head(8).itertuples()) + list(queries.iloc[20:26].itertuples()) + list(queries.iloc[40:46].itertuples())
    for q in sel:
        want = bm25_oracle_topk(built["doc_tokens"], tokens(q.query_text), k=q.k)
        got = topk(r, q.query_text, k=q.k, mode=mode)
        assert [d for d, _ in got] == [d for d, _ in want], f"{mode} q{q.query_id}: {q.query_text}"
        for (wd, ws), (gd, gs) in zip(want, got):
            assert abs(ws - gs) <= 1e-6


def test_topk_with_urls(spark, built):
    r = IndexReader(spark, built["idx"])
    got = topk(r, "the data index", k=5, with_urls=True)
    assert len(got) == 5
    for d, s, u in got:
        assert u == built["urls"][d]


@pytest.mark.parametrize("mode", ["acc", "wand"])
def test_topk_local_rank_identical_to_oracle(spark, built, mode):
    """Driver-local (pyarrow, no Spark job) serving path: same pruning,
    same scorers, rank-identical to the oracle and the Spark path."""
    r = IndexReader(spark, built["idx"])
    queries = gen_queries()
    sel = list(queries.head(8).itertuples()) + list(queries.iloc[20:26].itertuples())
    for q in sel:
        want = bm25_oracle_topk(built["doc_tokens"], tokens(q.query_text), k=q.k)
        got = topk_local(r, q.query_text, k=q.k, mode=mode)
        assert [d for d, _ in got] == [d for d, _ in want], f"local/{mode} q{q.query_id}"
        for (wd, ws), (gd, gs) in zip(want, got):
            assert abs(ws - gs) <= 1e-6


def test_topk_local_with_urls(spark, built):
    r = IndexReader(spark, built["idx"])
    got = topk_local(r, "the data index", k=5, with_urls=True)
    assert len(got) == 5
    for d, s, u in got:
        assert u == built["urls"][d]


def test_extend_index_new_snapshot(spark, built, tmp_path):
    """Incremental epoch: build on the first 800 docs, extend with the
    full 1200-doc snapshot; results must be rank-identical to the
    oracle over the UNION corpus (with the extended id mapping —
    epoch-2 ids start at the next shard boundary)."""
    from logsentinelai_spark.index.build import extend_index

    idx = str(tmp_path / "db_inc")
    pages_all = gen_pages_df(spark, N_DOCS, partitions=8)
    # first snapshot = 800 docs (deterministic subset by url rank)
    urls_sorted = sorted(r.url for r in pages_all.select("url").collect())
    first = set(urls_sorted[:800])
    pages_v1 = pages_all.filter(pages_all.url.isin(list(first)))
    build_index(spark, pages_v1, idx, CFG)
    s = extend_index(spark, pages_all, idx)
    assert s["new_docs"] == N_DOCS - 800

    r = IndexReader(spark, idx)
    N, _ = r.global_stats()
    assert N == N_DOCS
    # oracle with the extended id mapping (ids read back from doc_stats)
    text_by_url = {u: t for u, t in ((row.url, row.text) for row in pages_all.select("url", "text").collect())}
    id_url = {row.doc_id: row.url for row in r.doc_stats_df().select("doc_id", "url").collect()}
    assert len(id_url) == N_DOCS
    doc_tokens = {d: tokens(text_by_url[u]) for d, u in id_url.items()}
    queries = gen_queries()
    for q in list(queries.head(6).itertuples()):
        want = bm25_oracle_topk(doc_tokens, tokens(q.query_text), k=q.k)
        got = topk_local(r, q.query_text, k=q.k, mode="acc")
        assert [d for d, _ in got] == [d for d, _ in want], f"inc q{q.query_id}"
        for (wd, ws), (gd, gs) in zip(want, got):
            assert abs(ws - gs) <= 1e-6


def test_resume_identical_to_uninterrupted(spark, built, tmp_path):
    idx2 = str(tmp_path / "db2")
    pages = gen_pages_df(spark, N_DOCS, partitions=8)
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, pages, idx2, CFG, fail_after_wave=0)
    # resume: wave 0 must be skipped, waves 1-2 built
    summary = build_index(spark, pages, idx2, CFG)
    assert summary["skipped_waves"] == [0]
    assert summary["built_waves"] == [1, 2]
    r2 = IndexReader(spark, idx2)
    queries = gen_queries()
    for q in list(queries.head(4).itertuples()):
        a = topk(IndexReader(spark, built["idx"]), q.query_text, k=q.k)
        b = topk(r2, q.query_text, k=q.k)
        assert a == b


def test_build_with_null_text_rows(spark, tmp_path):
    """use_text_col=True must tolerate null text (tokenized as an empty
    doc) — a null list from the tokenizer would NaN-poison the
    value_lengths -> np.repeat path in stage 1."""
    from pyspark.sql import functions as F

    from logsentinelai_spark.corpus import gen_pages_df

    pages = gen_pages_df(spark, 64, partitions=4).withColumn(
        "text", F.when(F.col("url").endswith("7"), F.lit(None)).otherwise(F.col("text"))
    )
    n_null = pages.filter(F.col("text").isNull()).count()
    assert n_null > 0
    idx = str(tmp_path / "nulltext_idx")
    cfg = IndexConfig(shard_size=32, wave_shards=2, n_buckets=2, block_size=16,
                      use_text_col=True)
    summary = build_index(spark, pages, idx, cfg)
    r = IndexReader(spark, idx)
    ds = r.doc_stats_df()
    assert ds.count() == 64
    assert ds.filter("dl = 0").count() >= n_null  # null docs indexed as empty


def test_cluster_master_requires_shared_fs_flag(spark, tmp_path):
    """_assert_segment_fs: direct executor segment writes are gated to
    local mode unless the caller attests a shared POSIX filesystem."""
    from logsentinelai_spark.index.build import _assert_segment_fs

    class FakeSC:
        master = "spark://cluster:7077"

    class FakeSpark:
        sparkContext = FakeSC()

    with pytest.raises(RuntimeError, match="shared POSIX filesystem"):
        _assert_segment_fs(FakeSpark(), IndexConfig())
    _assert_segment_fs(FakeSpark(), IndexConfig(executor_shared_fs=True))  # no raise
    _assert_segment_fs(spark, IndexConfig())  # local mode: no raise


def test_idmap_h64_collision_resolves_exactly(tmp_path):
    """_resolve_doc_ids' rare path: two map urls sharing an xxhash64
    value must resolve via the url column (exact), and absent urls in a
    collision run must be dropped — forced by writing a synthetic idmap
    with duplicate h values."""
    import numpy as np
    import pyarrow as pa

    from logsentinelai_spark.index.build import _IDMAP_CACHE, _resolve_doc_ids

    idmap = tmp_path / "idmap"
    idmap.mkdir()
    tbl = pa.table({
        "h": pa.array([5, 5, 9], type=pa.int64()),
        "h2": pa.array([100, 100, 7], type=pa.int32()),
        "doc_id": pa.array([11, 22, 33], type=pa.int64()),
        "url": pa.array(["u-a", "u-b", "u-c"]),
    })
    with pa.OSFile(str(idmap / "part-0.arrow"), "wb") as f:
        with pa.ipc.new_file(f, tbl.schema) as w:
            w.write_table(tbl)
    _IDMAP_CACHE.clear()
    rb = pa.record_batch({
        "url_h": pa.array([5, 5, 9, 5, 6], type=pa.int64()),
        "url_h2": pa.array([100, 100, 7, 100, 1], type=pa.int32()),
        "url": pa.array(["u-b", "u-a", "u-c", "u-zz", "u-q"]),
    })
    ids, ok = _resolve_doc_ids(rb, str(idmap))
    assert ok.tolist() == [True, True, True, False, False]
    assert ids[ok].tolist() == [22, 11, 33]
    _IDMAP_CACHE.clear()
