"""Naive (pure-Catalyst) BM25 pipeline — SURVEY.md §7 step 3.

This is the permanent rank-identity fallback scorer and the flagship
`entry(spark)` query: everything is built-in DataFrame ops, so Catalyst
gets predicate pushdown / partial aggregation / broadcast joins /
TakeOrderedAndProject distributed top-k for free.

Pipeline (all lazily declared):
  tokenized(doc_id, tokens)
    -> postings  = explode -> groupBy(doc_id, term).count()      [tf]
    -> doc_stats = (doc_id, dl = size(tokens))
    -> term_stats= groupBy(term).count()                         [df]
    -> global    = (N, avgdl)
  query: filter postings to query terms (pushdown), broadcast-join
  term_stats (tiny), join doc_stats on doc_id for dl, score with the
  Lucene BM25 expression, groupBy(doc_id).sum, orderBy desc limit k
  (tie-break ascending doc_id).

At 100 TB: tf/df are classic partial+final aggregations (map-side
combine); the query-side joins are broadcasts (query terms ≤ dozens);
the only wide shuffle is the tf groupBy, which the salted physical
index build (index/build.py) replaces for the materialized path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens as tokenize
from .bm25 import B, K1


def tokenized_postings(tok_df: DataFrame, doc_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    """(doc_id, term, tf) from a tokenized DataFrame."""
    return (
        tok_df.select(F.col(doc_col).alias("doc_id"), F.explode(tokens_col).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def doc_stats(tok_df: DataFrame, doc_col: str = "doc_id", tokens_col: str = "tokens") -> DataFrame:
    return tok_df.select(F.col(doc_col).alias("doc_id"), F.size(tokens_col).cast("long").alias("dl"))


def term_stats(postings: DataFrame) -> DataFrame:
    return postings.groupBy("term").agg(F.count("*").alias("df"))


def global_stats(doc_stats_df: DataFrame) -> DataFrame:
    return doc_stats_df.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def bm25_score_expr(n_docs_col: str = "n_docs", avgdl_col: str = "avgdl"):
    """The BM25 per-(doc,term) contribution as a Catalyst expression."""
    idf = F.log(
        F.lit(1.0)
        + (F.col(n_docs_col) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = F.col("tf") / (
        F.col("tf") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col(avgdl_col))
    )
    return idf * tf_norm


def bm25_topk_naive(
    postings: DataFrame,
    doc_stats_df: DataFrame,
    term_stats_df: DataFrame,
    global_stats_df: DataFrame,
    query_text: str,
    k: int = 10,
) -> DataFrame:
    """Top-k (doc_id, score) for one query. Rank-identical to the oracle;
    returns score rounded at render time only (full precision in col)."""
    qterms = sorted(set(tokenize(query_text)))
    if not qterms:
        return postings.sparkSession.createDataFrame([], "doc_id long, score double")
    cand = postings.filter(F.col("term").isin(qterms))
    scored = (
        cand.join(F.broadcast(term_stats_df.filter(F.col("term").isin(qterms))), "term")
        .join(doc_stats_df, "doc_id")
        .crossJoin(F.broadcast(global_stats_df))
        .withColumn("contrib", bm25_score_expr())
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return scored


def build_naive_stats(tok_df: DataFrame):
    """Convenience: all four stats DataFrames from a tokenized corpus."""
    p = tokenized_postings(tok_df)
    d = doc_stats(tok_df)
    return p, d, term_stats(p), global_stats(d)
