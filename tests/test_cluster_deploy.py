"""Multi-executor deployment rehearsal (S8 / north_rule spark-submit
shape): build on ``local-cluster[2,2,1024]`` — Spark's real cluster
scheduler with SEPARATE executor JVMs on one box — and verify the
committed segment transport end-to-end: transport auto-resolves to
"committed" (local-cluster is not in-process local mode), segments land
through Spark's task-commit protocol, and the result is rank-identical
to the in-process oracle."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_local_cluster_committed_build_and_query(spark, tmp_path):
    from logsentinelai_spark.corpus import gen_pages_df, gen_queries
    from logsentinelai_spark.functions.tokenizer import tokens
    from logsentinelai_spark.index.bm25 import bm25_oracle_topk
    from logsentinelai_spark.index.query import topk_local
    from logsentinelai_spark.index.reader import IndexReader

    idx = str(tmp_path / "lc_idx")
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_index.py"),
         "--synthetic", "2000", "--out", idx,
         "--shard-size", "512", "--wave-shards", "2",
         "--master", "local-cluster[2,2,1024]", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_docs"] == 2000

    # committed layout: Spark-committer-named files under the hive
    # dirs (never the direct writer's part-0.parquet), _SUCCESS marker
    seg_files = list(Path(idx, "postings").rglob("part-*.parquet"))
    assert seg_files
    assert all(".c000." in p.name for p in seg_files), seg_files[:3]
    assert any(p.name == "_SUCCESS" for w in Path(idx, "postings").iterdir()
               for p in w.iterdir() if p.is_file())

    # rank-identity vs the numpy oracle over the same deterministic corpus
    rows = gen_pages_df(spark, 2000, partitions=4).select("url", "text").collect()
    by_url = sorted((row.url, row.text) for row in rows)
    doc_tokens = {i: tokens(t) for i, (_, t) in enumerate(by_url)}
    reader = IndexReader(spark, idx)
    assert reader.global_stats()[0] == 2000
    for q in list(gen_queries().head(4).itertuples()):
        want = bm25_oracle_topk(doc_tokens, tokens(q.query_text), k=q.k)
        got = topk_local(reader, q.query_text, k=q.k, mode="acc")
        assert [d for d, _ in got] == [d for d, _ in want], f"lc q{q.query_id}"
        for (wd, ws), (gd, gs) in zip(want, got):
            assert abs(ws - gs) <= 1e-6


def test_local_cluster_ann_build(spark, tmp_path):
    """The ANN build ships the same way (spark-submit shape on separate
    executor JVMs): artifacts land through the DataFrame writer's
    task-commit protocol and are value-identical to an in-process
    build."""
    from logsentinelai_spark.index import ann
    from logsentinelai_spark.operators import similarity as sim

    out = str(tmp_path / "lc_ann")
    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_ann.py"),
         "--embeddings", emb_path, "--out", out,
         "--master", "local-cluster[2,2,1024]", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["n_vectors"] == 500

    # committed layout: Spark-committer-named files + _SUCCESS (per
    # epoch dir since the transactional-extend change — each epoch is
    # its own overwrite-idempotent commit unit)
    files = list(Path(out, "ivfpq_lists").rglob("part-*.parquet"))
    assert files and all(".c000." in p.name for p in files), files[:3]
    assert (Path(out) / "ivfpq_lists" / "epoch=0" / "_SUCCESS").exists()

    # value identity vs an in-process build on the same fixture
    emb = spark.read.parquet(emb_path).select("vec_id", "embedding")
    d_local = str(tmp_path / "ip_ann")
    ann.build_ann(spark, emb, d_local,
                  sim._centroid_rows_from(emb), sim._pq_codebooks_from(emb))
    cols = ["vec_id"] + [f"code{m}" for m in range(sim.M_SUB)]
    assert sorted(map(tuple, ann.read_pq_codes(spark, out).select(*cols).collect())) == \
        sorted(map(tuple, ann.read_pq_codes(spark, d_local).select(*cols).collect()))
    assert sorted(map(tuple, ann.read_ivfpq_lists(spark, out)
                      .select("vec_id", "list_id", "code0").collect())) == \
        sorted(map(tuple, ann.read_ivfpq_lists(spark, d_local)
                   .select("vec_id", "list_id", "code0").collect()))


def test_local_cluster_compaction(spark, tmp_path):
    """Compaction ships the same way (separate executor JVMs, segment
    rows through the task-commit writer): build on local-cluster,
    compact on local-cluster (4x re-shard), then verify the flipped
    generation is rank-identical to the numpy oracle and the old
    layout is gone from the serving path."""
    from logsentinelai_spark.corpus import gen_pages_df, gen_queries
    from logsentinelai_spark.functions.tokenizer import tokens
    from logsentinelai_spark.index.bm25 import bm25_oracle_topk
    from logsentinelai_spark.index.query import topk_local
    from logsentinelai_spark.index.reader import IndexReader

    idx = str(tmp_path / "lc_cidx")
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "build_index.py"),
         "--synthetic", "2000", "--out", idx,
         "--shard-size", "256", "--wave-shards", "2",
         "--master", "local-cluster[2,2,1024]", "--cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    r2 = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "maintain_index.py"),
         "--index", idx, "--master", "local-cluster[2,2,1024]",
         "--cpus", "4", "compact"],
        capture_output=True, text=True, timeout=300, cwd=str(REPO),
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["generation"] == 1
    assert summary["shard_size"] == 1024
    assert summary["files_after"] < summary["files_before"]
    assert (Path(idx) / "_generation.json").exists()

    rows = gen_pages_df(spark, 2000, partitions=4).select("url", "text").collect()
    by_url = sorted((row.url, row.text) for row in rows)
    doc_tokens = {i: tokens(t) for i, (_, t) in enumerate(by_url)}
    reader = IndexReader(spark, idx)
    assert str(reader.dir).endswith("gen_1")
    assert reader.global_stats()[0] == 2000
    for q in list(gen_queries().head(4).itertuples()):
        want = bm25_oracle_topk(doc_tokens, tokens(q.query_text), k=q.k)
        got = topk_local(reader, q.query_text, k=q.k, mode="acc")
        assert [d for d, _ in got] == [d for d, _ in want], f"lcc q{q.query_id}"
