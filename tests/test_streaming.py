"""Structured Streaming tests — SURVEY.md §2.9: incremental index
maintenance via foreachBatch (idempotent epochs) and the severity
alert side-output, both with availableNow triggers + checkpoints."""

from __future__ import annotations


from logsentinelai_spark.corpus import gen_pages_df, gen_queries
from logsentinelai_spark.functions.tokenizer import tokens
from logsentinelai_spark.index.bm25 import bm25_oracle_topk
from logsentinelai_spark.index.build import IndexConfig
from logsentinelai_spark.index.query import topk_local
from logsentinelai_spark.index.reader import IndexReader
from logsentinelai_spark.streaming import alert_stream, incremental_index_stream

CFG = IndexConfig(shard_size=256, wave_shards=2, n_buckets=4, block_size=32)


def test_incremental_index_stream(spark, tmp_path):
    landing = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")
    all_pages = gen_pages_df(spark, 900, partitions=4)
    urls = sorted(r.url for r in all_pages.select("url").collect())
    first, second = set(urls[:600]), set(urls[600:])

    # batch 1 lands -> stream builds the initial epoch
    all_pages.filter(all_pages.url.isin(list(first))).write.mode("append").parquet(landing)
    q = incremental_index_stream(spark, landing, idx, CFG, max_files_per_trigger=100)
    q.awaitTermination(300)
    r1 = IndexReader(spark, idx)
    assert r1.global_stats()[0] == 600

    # batch 2 lands -> a new stream run (same checkpoint) extends
    all_pages.filter(all_pages.url.isin(list(second))).write.mode("append").parquet(landing)
    q = incremental_index_stream(spark, landing, idx, CFG, max_files_per_trigger=100)
    q.awaitTermination(300)
    r2 = IndexReader(spark, idx)
    assert r2.global_stats()[0] == 900

    # queries over the streamed index are rank-identical to the oracle
    # under the streamed id mapping
    text_by_url = {row.url: row.text for row in all_pages.select("url", "text").collect()}
    id_url = {row.doc_id: row.url for row in r2.doc_stats_df().select("doc_id", "url").collect()}
    doc_tokens = {d: tokens(text_by_url[u]) for d, u in id_url.items()}
    for qq in list(gen_queries().head(4).itertuples()):
        want = bm25_oracle_topk(doc_tokens, tokens(qq.query_text), k=qq.k)
        got = topk_local(r2, qq.query_text, k=qq.k, mode="acc")
        assert [d for d, _ in got] == [d for d, _ in want]


def test_alert_stream(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    alerts_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("append").parquet(events_dir)
    q = alert_stream(spark, events_dir, alerts_dir, ckpt, max_files_per_trigger=100)
    q.awaitTermination(200)
    alerts = spark.read.parquet(alerts_dir)
    want = ev.filter(ev.event_type.isin(["error", "purchase"])).count()
    assert alerts.count() == want
    assert set(alerts.select("severity").distinct().toPandas()["severity"]) <= {"CRITICAL", "HIGH"}
