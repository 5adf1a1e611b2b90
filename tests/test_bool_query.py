"""ES ``bool`` query (Lucene BooleanQuery semantics) tests.

Pins: (1) gating semantics on a handcrafted corpus — a doc missing
any must term never matches, a doc containing a must_not term never
matches even with a perfect must score, should terms change ranking
but never matching; (2) rank identity across all three paths
(distributed bool_topk == driver-local bool_topk_local == a numpy
oracle over the raw texts); (3) edge cases — should-only queries
degrade to plain BM25 (bool gate off), a must term absent from the
corpus matches nothing, must ∩ must_not matches nothing.

Reference behavior: the reference's backend answers exactly this
query shape over its indices (Elasticsearch bool query; Lucene
BooleanQuery scoring — see reference INSTALL-and-USAGE.md's Kibana
search examples over logsentinelai-analysis-*).
"""

from __future__ import annotations

import math

import numpy as np

from logsentinelai_spark.functions.tokenizer import tokens
from logsentinelai_spark.index.bm25 import B, K1
from logsentinelai_spark.index.build import IndexConfig, build_index
from logsentinelai_spark.index.query import bool_topk, bool_topk_local, topk_local
from logsentinelai_spark.index.reader import IndexReader

# handcrafted corpus exercising every gate branch at block_size=4
# (multi-block postings for the dense terms):
#   a: both musts, one should            -> match
#   b: both musts + forbidden term       -> EXCLUDED by must_not
#   c: one must only                     -> excluded by must gate
#   d: both musts, both shoulds          -> match, should-lifted
#   e: shoulds only                      -> excluded by must gate
#   f: both musts, high tf               -> match
#   g: unrelated                         -> no scoring terms at all
_TEXTS = {
    "a": "alpha beta query alpha",
    "b": "alpha beta bad alpha beta",
    "c": "alpha alpha alpha",
    "d": "alpha beta query vector beta",
    "e": "query vector query vector",
    "f": "alpha beta " * 6,
    "g": "other words entirely",
}
_MUST, _SHOULD, _NOT = "alpha beta", "query vector", "bad"
_CFG = IndexConfig(shard_size=3, wave_shards=1, n_buckets=2, block_size=4,
                   use_text_col=True, positions=False)


def _pages(spark, texts):
    return spark.createDataFrame(
        [(u, t) for u, t in texts.items()], "url string, text string")


def _numpy_bool_oracle(texts, must, should, must_not, k=10):
    """Plain-Python BM25 bool query over the raw texts (doc = url rank)."""
    toks = {i: tokens(texts[u]) for i, u in enumerate(sorted(texts))}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    mset, sset, nset = set(must.split()), set(should.split()), set(must_not.split())
    scoring = sorted((mset | sset) - nset)
    dfs = {t: sum(1 for tk in toks.values() if t in tk) for t in scoring}
    out = []
    for d, tk in toks.items():
        if any(t not in tk for t in mset) or any(t in tk for t in nset):
            continue
        s = 0.0
        for t in scoring:
            tf = tk.count(t)
            if not tf or not dfs[t]:
                continue
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += idf * tf / (tf + K1 * (1 - B + B * len(tk) / avgdl))
        out.append((d, s))
    return sorted(out, key=lambda p: (-p[1], p[0]))[:k]


def _build(spark, tmp_path, texts=_TEXTS):
    idx = str(tmp_path / "idx")
    build_index(spark, _pages(spark, texts), idx, _CFG)
    return IndexReader(spark, idx)


def test_bool_semantics_and_rank_identity(spark, tmp_path):
    reader = _build(spark, tmp_path)
    want = _numpy_bool_oracle(_TEXTS, _MUST, _SHOULD, _NOT)
    got_local = bool_topk_local(reader, _MUST, _SHOULD, _NOT)
    got_dist = bool_topk(reader, _MUST, _SHOULD, _NOT)
    assert [d for d, _ in got_local] == [d for d, _ in want]
    assert [d for d, _ in got_dist] == [d for d, _ in want]
    np.testing.assert_allclose(
        [s for _, s in got_local], [s for _, s in want], rtol=1e-12)
    np.testing.assert_allclose(
        [s for _, s in got_dist], [s for _, s in want], rtol=1e-12)
    matched = {d for d, _ in got_local}
    # b (doc 1) excluded by must_not despite containing both musts;
    # c (doc 2) and e (doc 4) fail the must gate; a/d/f match
    assert matched == {0, 3, 5}


def test_bool_should_changes_rank_not_match(spark, tmp_path):
    reader = _build(spark, tmp_path)
    with_should = bool_topk_local(reader, _MUST, _SHOULD, _NOT)
    without = bool_topk_local(reader, _MUST, "", _NOT)
    assert {d for d, _ in with_should} == {d for d, _ in without}
    # d carries both should terms: its score must strictly rise
    lift = dict(with_should)[3] - dict(without)[3]
    assert lift > 0


def test_bool_should_only_is_plain_bm25(spark, tmp_path):
    reader = _build(spark, tmp_path)
    got = bool_topk_local(reader, "", _SHOULD, "")
    plain = topk_local(reader, _SHOULD, mode="acc")
    assert got == plain


def test_bool_empty_edges(spark, tmp_path):
    reader = _build(spark, tmp_path)
    # a required term absent from the corpus matches nothing
    assert bool_topk_local(reader, "alpha zzznope", _SHOULD, _NOT) == []
    # required and forbidden at once matches nothing
    assert bool_topk_local(reader, "alpha", "", "alpha") == []
    # no scoring terms at all
    assert bool_topk_local(reader, "", "", _NOT) == []
