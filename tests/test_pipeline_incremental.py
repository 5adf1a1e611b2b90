"""End-to-end incremental training-data pipeline (round-3 item #7):

  snapshot v1 -> build_index -> snapshot v2 (new urls, some of which
  duplicate epoch-1 content byte-for-byte) -> extend_index (anti-join
  epochs, new wave) -> grown corpus -> q_corpus_filter + q_dedup_exact

asserting the dup keeper stays the MIN doc_id ACROSS epochs: epoch-1
ids are always lower (epoch-2 ids start at the next shard boundary
above the high-water mark), so the epoch-1 original survives and every
epoch-2 re-crawl of the same content is dropped as `duplicate`.
"""

from __future__ import annotations

import hashlib

from logsentinelai_spark.corpus import gen_pages_df
from logsentinelai_spark.index.build import IndexConfig, build_index, extend_index
from logsentinelai_spark.index.reader import IndexReader
from logsentinelai_spark.operators.dedup import q_dedup_exact
from logsentinelai_spark.operators.textstats import q_corpus_filter

N_V1, N_EXTRA, N_DUP = 300, 100, 20
SHARD = 128
EPOCH2_BASE = -(-N_V1 // SHARD) * SHARD  # 384: next shard boundary


def test_incremental_snapshot_then_corpus_filter_dedup(spark, tmp_path):
    pages_all = gen_pages_df(spark, N_V1 + N_EXTRA, partitions=4)
    rows = sorted(pages_all.collect(), key=lambda r: r.url)
    v1_rows, extra = rows[:N_V1], rows[N_V1:]
    # the first N_DUP new urls re-crawl epoch-1 content byte-for-byte
    # (html AND text copied from the donor, so extract(html) == text
    # still holds and the index sees the duplicate content too)
    recs = []
    for j, r in enumerate(extra):
        d = v1_rows[j] if j < N_DUP else r
        recs.append((r.url, r.warc_ts, d.html, d.text, d.lang))
    pages_v1 = spark.createDataFrame(
        [(r.url, r.warc_ts, r.html, r.text, r.lang) for r in v1_rows],
        pages_all.schema)
    pages_v2 = pages_v1.unionByName(
        spark.createDataFrame(recs, pages_all.schema))

    idx = str(tmp_path / "idx")
    cfg = IndexConfig(shard_size=SHARD, wave_shards=2, n_buckets=4, block_size=32)
    build_index(spark, pages_v1, idx, cfg)
    s = extend_index(spark, pages_v2, idx)
    assert s["new_docs"] == N_EXTRA

    r = IndexReader(spark, idx)
    assert r.global_stats()[0] == N_V1 + N_EXTRA
    # grown corpus = the index's OWN doc ids + the snapshot's text/lang
    text_lang = {rec[0]: (rec[3], rec[4]) for rec in recs}
    for rr in v1_rows:
        text_lang[rr.url] = (rr.text, rr.lang)
    docs = [(int(row.doc_id), *text_lang[row.url])
            for row in r.doc_stats_df().select("doc_id", "url").collect()]
    assert len(docs) == N_V1 + N_EXTRA
    corp = str(tmp_path / "corp")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string"
    ).write.parquet(f"{corp}/documents.parquet")

    dup_texts = {v1_rows[j].text for j in range(N_DUP)}
    by_text: dict[str, list[int]] = {}
    for doc_id, text, _ in docs:
        if text in dup_texts:
            by_text.setdefault(text, []).append(doc_id)

    # ---- dedup_exact over the grown corpus: every cross-epoch group's
    # keeper is the epoch-1 (min) id
    groups = {row.text_md5: row for row in q_dedup_exact(spark, corp).collect()}
    for text in dup_texts:
        m = hashlib.md5(text.lower().encode("utf-8")).hexdigest()
        assert m in groups, "cross-epoch duplicate group missing"
        g = groups[m]
        assert g.n_dups >= 2
        assert g.keeper_doc_id == min(by_text[text])
        assert g.keeper_doc_id < EPOCH2_BASE  # keeper lives in epoch 1

    # ---- corpus_filter over the grown corpus: epoch-2 re-crawls drop
    # as `duplicate`; the epoch-1 original is never dropped for that
    cf = {row.doc_id: row for row in q_corpus_filter(spark, corp).collect()}
    for text, ids in by_text.items():
        ids.sort()
        keeper, copies = ids[0], ids[1:]
        assert keeper < EPOCH2_BASE and copies
        assert all(c >= EPOCH2_BASE for c in copies)
        for c in copies:
            assert cf[c].drop_reason == "duplicate" and not cf[c].keep
        assert cf[keeper].drop_reason != "duplicate"
