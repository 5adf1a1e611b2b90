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


# ------------------------------------------- one-pass naive scorer (round 8)

def onepass_frames(tok_df: DataFrame, terms: list[str],
                   extra_cols: list[str] | None = None):
    """One-pass replacement for the build_naive_stats + join cascade
    when the term set is FIXED (known before planning): per-term tf is
    an in-row ``size(filter(tokens, x -> x = t))``, dl an in-row
    size(), and the single-row global aggregate (N, avgdl, per-term df)
    follows from one scan of that frame. The old shape re-tokenized the
    corpus once per stats table (tf groupBy, dl join, global agg — three
    passes) and shuffled a posting table; this shape tokenizes ONCE and
    shuffles nothing but the 1-row aggregate. Terms come from tokenize()
    output ([a-z0-9]+ alphabet), so inlining them in the lambda is safe.

    Returns (base, g): base = (doc_id, dl, tf_0..tf_{n-1} [, extra]),
    g = 1-row (n_docs, avgdl, df_0..df_{n-1}).

    ``base`` is localCheckpoint'ed (lazily): both consumers — the g
    aggregate and the scorer — would otherwise re-run the scan +
    tokenize, doubling the only expensive pass. The frame is NARROW
    (doc_id, dl, a few tf longs — never text or tokens), so the
    materialization is ~50 bytes/doc of executor storage at any scale,
    and a fresh RDD per call means no cross-run reuse.
    """
    base = tok_df.select(
        "doc_id",
        *(extra_cols or []),
        F.size("tokens").cast("long").alias("dl"),
        *[F.expr(f"size(filter(tokens, x -> x = '{t}'))").cast("long")
          .alias(f"tf_{i}") for i, t in enumerate(terms)],
    ).localCheckpoint(eager=False)
    g = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
          for i in range(len(terms))],
    )
    return base, g


def onepass_contrib(i: int):
    """BM25 contribution of term i over an onepass_frames row (after
    the crossJoin with g) — 0 when the doc lacks the term, exactly like
    the missing posting row in the join formulation."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
        / (F.col(f"df_{i}") + F.lit(0.5)))
    tf_norm = F.col(f"tf_{i}") / (
        F.col(f"tf_{i}")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dl") / F.col("avgdl")))
    return F.when(F.col(f"tf_{i}") > 0, idf * tf_norm).otherwise(F.lit(0.0))


def onepass_scored(tok_df: DataFrame, terms: list[str],
                   extra_cols: list[str] | None = None) -> DataFrame:
    """(doc_id [, extra], dl, tf_i..., s) for docs containing at least
    one of ``terms`` — the same candidate set as the posting join."""
    base, g = onepass_frames(tok_df, terms, extra_cols)
    s = onepass_contrib(0)
    for i in range(1, len(terms)):
        s = s + onepass_contrib(i)
    any_tf = F.col("tf_0") > 0
    for i in range(1, len(terms)):
        any_tf = any_tf | (F.col(f"tf_{i}") > 0)
    return (base.crossJoin(F.broadcast(g))
            .filter(any_tf)
            .withColumn("s", s))


def bm25_topk_naive_onepass(tok_df: DataFrame, query_text: str,
                            k: int = 10) -> DataFrame:
    """Drop-in for bm25_topk_naive over a tokenized corpus with a fixed
    query string: identical rows (same scores to rounding, same
    tie-break), one corpus pass."""
    qterms = sorted(set(tokenize(query_text)))
    if not qterms:
        return tok_df.sparkSession.createDataFrame(
            [], "doc_id long, score double")
    return (
        onepass_scored(tok_df, qterms)
        .select("doc_id", F.col("s").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def matched_postings_scored(tok_df: DataFrame, match_sql: str) -> DataFrame:
    """(doc_id, s): disjunctive BM25 over a DATA-DEPENDENT term set
    (prefix / wildcard / fuzzy expansions) in TWO corpus passes instead
    of four. ``match_sql`` is a boolean SQL expression over the lambda
    variable ``x``. Pass 1 builds the matching-postings rows
    (doc_id, dl, term, tf) with in-row distinct+count (no posting
    groupBy shuffle), localCheckpoint'ed because df-window and scorer
    both consume it; pass 2 is the narrow (n_docs, avgdl) aggregate.
    Identical scores to the build_naive_stats formulation."""
    from pyspark.sql import Window

    ex = (
        tok_df.select(
            "doc_id", F.size("tokens").cast("long").alias("dl"),
            F.explode(F.expr(
                f"transform(array_distinct(filter(tokens, x -> {match_sql})),"
                " t -> struct(t AS term,"
                " size(filter(tokens, x -> x = t)) AS tf))")).alias("p"))
        .select("doc_id", "dl", F.col("p.term").alias("term"),
                F.col("p.tf").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    _, g = onepass_frames(tok_df, [])
    sc = (
        ex.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(g))
        .withColumn("contrib", bm25_score_expr())
    )
    return sc.groupBy("doc_id").agg(F.sum("contrib").alias("s"))
