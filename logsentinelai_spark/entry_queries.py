"""Driver-contract queries: every operator exposed through
``__spark_entry__.queries()`` with a DuckDB oracle in ``oracle_sql()``.

Conventions (driver compares row-count + schema + order-insensitive
value-hash at sf0.01):
  * float outputs rounded to 6 decimals on BOTH sides, same alias
  * deterministic selections only (fixed term lists / fixed query
    strings; LIMIT only after a total ordering with pinned tie-break)
  * tokenization for the ASCII ``documents`` table is the shared SQL
    pattern ``[a-z0-9]+`` on lower(text) — identical semantics in
    Spark (Java regex) and DuckDB (RE2); the engine's Unicode
    tokenizer is exercised by the pages-corpus pytest suite instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .functions.tokenizer import SQL_TOKEN_PATTERN
from .index.bm25 import B, K1
from .index.naive import (
    bm25_topk_naive, bm25_topk_naive_onepass, build_naive_stats)
from .sources.io import fanout_small_scan

FLAGSHIP_QUERY = "data query merge index"
FIXED_TERMS = ["the", "data", "query", "index", "merge", "scan"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` + scan fan-out, for full-table per-row-heavy paths (the
    fixture files are single-row-group parquet — guide §2.5). Point
    lookups keep plain ``load`` so they stay one-task."""
    return fanout_small_scan(load(spark, sf_dir, name), f"{sf_dir}/{name}")


def tokenized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, tokens array<string>) via JVM-side regex
    (whole-stage codegen; no Python in this hot path)."""
    return load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)").alias("tokens"),
    )


_TOK_CTE = (
    "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
    f"'{SQL_TOKEN_PATTERN}')) AS term FROM documents)"
)


def tokenized_documents_mat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``tokenized_documents`` behind a Generate (explode-of-singleton)
    barrier. Without it, filter pushdown + project collapse substitute
    ``tokens`` back to ``regexp_extract_all(lower(text))`` INSIDE the
    per-position higher-order lambdas of the phrase queries, so the
    regex re-runs once per token position per document (measured ~9x
    on rescore_topk / phrase_prefix at sf0.1). A predicate that
    references a generated attribute cannot be pushed below the
    Generate, so the token array is materialized exactly once per row;
    the singleton explode itself is a no-op row-wise. Identical rows
    to ``tokenized_documents`` — use only where a higher-order lambda
    consumes ``tokens`` under a filter."""
    return load_wide(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(F.array(F.expr(
            f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)"
        ))).alias("tokens"),
    )


# ---------------------------------------------------------------- tf / df / stats

def q_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5-analog: per-doc term frequencies for a fixed term set."""
    tok = tokenized_documents(spark, sf_dir)
    # per-term tf computed IN-ROW for the fixed term set, non-zero pairs
    # unpivoted with one explode — no token-stream explode, no shuffle
    pairs = ("filter(array("
             + ", ".join(
                 f"struct('{t}' AS term,"
                 f" size(filter(tokens, x -> x = '{t}')) AS tf)"
                 for t in FIXED_TERMS)
             + "), p -> p.tf > 0)")
    return (
        tok.select("doc_id", F.explode(F.expr(pairs)).alias("p"))
        .select("doc_id", F.col("p.term").alias("term"),
                F.col("p.tf").cast("long").alias("tf"))
    )


def sql_term_tf() -> str:
    terms = ", ".join(f"('{t}')" for t in FIXED_TERMS)
    return f"""
WITH {_TOK_CTE}, q(term) AS (VALUES {terms})
SELECT doc_id, term, count(*) AS tf FROM tok JOIN q USING (term) GROUP BY doc_id, term
"""


def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-analog: document frequency of every term (full vocabulary)."""
    tok = tokenized_documents(spark, sf_dir)
    # per-doc dedup happens IN-ROW (array_distinct) so the only shuffle
    # is the final partial+final term aggregation — the old shape
    # shuffled the full token stream once for distinct() and again for
    # the groupBy
    return (
        tok.select("doc_id",
                   F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def sql_term_df() -> str:
    return f"""
WITH {_TOK_CTE}
SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token length (dl)."""
    tok = tokenized_documents(spark, sf_dir)
    return tok.select("doc_id", F.size("tokens").cast("long").alias("dl"))


def sql_doc_stats() -> str:
    # len() per document (not GROUP BY over exploded tokens) so a
    # zero-token doc yields (doc_id, 0) exactly like Spark's size().
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS BIGINT) AS dl
FROM documents
"""


def q_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level N and avgdl (A1/A9-analog)."""
    d = q_doc_stats(spark, sf_dir)
    return d.agg(
        F.count("*").alias("n_docs"), F.round(F.avg("dl"), 6).alias("avgdl")
    )


def sql_global_stats() -> str:
    # per-doc len() keeps zero-token docs in both N and avgdl,
    # matching the Spark side (see sql_doc_stats).
    return f"""
WITH dl AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS dl
  FROM documents)
SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl
"""


# ---------------------------------------------------------------- BM25 top-k

def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: Lucene-semantics BM25 top-10 for a fixed query over the
    documents table (naive Catalyst scorer; SURVEY.md §2.8 Q8)."""
    tok = tokenized_documents(spark, sf_dir)
    out = bm25_topk_naive_onepass(tok, FLAGSHIP_QUERY, k=10)
    return out.select("doc_id", F.round("score", 6).alias("score"))


def sql_bm25_topk() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    terms = ", ".join(f"('{t}')" for t in qterms)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored ORDER BY s DESC, doc_id LIMIT 10
"""


# --------------------------------------------- analyzed index (analyzer chain)

ANALYZED_QUERY = "a the values data merge"  # 2 stopwords + a plural


def q_analyzed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over an index built WITH the analyzer chain
    (stopwords + S-stemmer, functions/analyzer.py): stopword removal
    happens in the stage-1 Arrow kernel — it shrinks dl, so every
    score differs from the unanalyzed index, not just the term set —
    and the raw query text is analyzed at query time by the SAME
    chain read back from the index meta ("a the values" -> ["value"]:
    ES's search analyzer defaulting to the index analyzer). The twin
    oracle applies the identical chain in SQL and embeds the
    pre-analyzed query terms as literals. Builds a second
    session-scoped fixture index (cost disclosed in bench fts_build)."""
    from .index.query import topk_local
    from .index.reader import IndexReader

    reader = IndexReader(spark, _fixture_index(spark, sf_dir,
                                               analyzed=True))
    res = topk_local(reader, ANALYZED_QUERY, k=10)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_analyzed_topk() -> str:
    sw = ", ".join(f"'{w}'" for w in ANALYZER_STOPWORDS)
    # analyze("a the values data merge", stopwords, "s") by hand:
    terms = ", ".join(f"('{t}')" for t in ("value", "data", "merge"))
    stem = """CASE
    WHEN length(t) > 3 AND t LIKE '%ies'
         AND t NOT LIKE '%eies' AND t NOT LIKE '%aies'
      THEN substr(t, 1, length(t) - 3) || 'y'
    WHEN length(t) > 2 AND t LIKE '%es'
         AND t NOT LIKE '%aes' AND t NOT LIKE '%ees' AND t NOT LIKE '%oes'
      THEN substr(t, 1, length(t) - 1)
    WHEN length(t) > 1 AND t LIKE '%s'
         AND t NOT LIKE '%us' AND t NOT LIKE '%ss'
      THEN substr(t, 1, length(t) - 1)
    ELSE t END"""
    return f"""
WITH tok0 AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                     '{SQL_TOKEN_PATTERN}')) AS t FROM documents),
tok AS (SELECT doc_id, {stem} AS term FROM tok0 WHERE t NOT IN ({sw})),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored ORDER BY s DESC, doc_id LIMIT 10
"""


# --------------------------------------------- search_after (deep pagination)


def q_bm25_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``search_after`` page 2 of the flagship query, naive Catalyst
    twin: ranks 11-20 in (score desc, doc_id asc) order (offset+limit
    over the scored set)."""
    tok = tokenized_documents(spark, sf_dir)
    out = bm25_topk_naive_onepass(tok, FLAGSHIP_QUERY, k=20)
    return (out.orderBy(F.desc("score"), F.asc("doc_id")).offset(10)
            .select("doc_id", F.round("score", 6).alias("score")))


def q_bm25_page2_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME page served the production way: page 1 from the index
    (topk_local), then its last hit becomes the search_after cursor —
    the scorer masks everything at-or-before the cursor BEFORE
    per-shard top-k selection, so no page-1 re-materialization and no
    deep offset (ES's from+size scaling fix). Same DuckDB oracle."""
    from .index.query import topk_local

    reader = _reader_for(spark, sf_dir)
    page1 = topk_local(reader, FLAGSHIP_QUERY, k=10)
    cursor = (page1[-1][1], page1[-1][0]) if page1 else None
    res = topk_local(reader, FLAGSHIP_QUERY, k=10, search_after=cursor)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_bm25_page2() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    terms = ", ".join(f"('{t}')" for t in qterms)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10 OFFSET 10
"""


# ------------------------------------- function_score (field_value_factor)

FS_FACTOR = 0.05  # field_value_factor(field=dl, modifier=log1p, factor)


def q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``function_score``, naive Catalyst twin: the flagship BM25
    score multiplied by ln(1 + 0.05·dl) for EVERY candidate (not a
    window — a doc-field factor reorders globally), then top-10."""
    from .index.naive import onepass_scored

    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    tok = tokenized_documents(spark, sf_dir)
    return (
        onepass_scored(tok, qterms)
        .select("doc_id",
                (F.col("s") * F.log1p(FS_FACTOR * F.col("dl"))).alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_function_score_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME function_score served from the physical index: the
    boost multiplies inside the per-shard accumulator (scatter-max dl
    recovery on arrays the scorer already decoded) — see
    index/query.py::function_score_topk_local. Same DuckDB oracle."""
    from .index.query import function_score_topk_local

    reader = _reader_for(spark, sf_dir)
    res = function_score_topk_local(reader, FLAGSHIP_QUERY, k=10,
                                    factor=FS_FACTOR)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_function_score() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    terms = ", ".join(f"('{t}')" for t in qterms)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) )
           * ln(1 + {FS_FACTOR} * any_value(dl.dl)) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
"""


# ------------------------------------------------------- msearch (batched)

# ES ``_msearch``: N search bodies in ONE request. The index path is
# topk_many_local — one pruned pyarrow read for the UNION of all
# queries' terms, per-term decode shared across queries (bench.py
# measures this batching at 7.6x over a per-query loop); the naive
# twin unions three Catalyst scorers into one job.
MSEARCH_QUERIES = [FLAGSHIP_QUERY, "table value", "query vector merge"]
MSEARCH_K = 5


def q_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_msearch`` analog, naive Catalyst twin: each body's BM25
    top-5 tagged with its position in the request, one unioned job —
    the corpus-side stats build is shared across bodies."""
    from .index.naive import onepass_contrib, onepass_frames

    tok = tokenized_documents(spark, sf_dir)
    # ONE one-pass frame over the UNION of the bodies' terms — the
    # checkpointed base and its stats aggregate are shared by all three
    # body scorers (the per-body loop re-scanned the corpus per body)
    all_terms = sorted({t for q in MSEARCH_QUERIES for t in q.split()})
    idx = {t: i for i, t in enumerate(all_terms)}
    base, g = onepass_frames(tok, all_terms)
    bg = base.crossJoin(F.broadcast(g))
    outs = []
    for qi, q in enumerate(MSEARCH_QUERIES):
        qterms = sorted(set(q.split()))
        s = onepass_contrib(idx[qterms[0]])
        for t in qterms[1:]:
            s = s + onepass_contrib(idx[t])
        any_tf = F.col(f"tf_{idx[qterms[0]]}") > 0
        for t in qterms[1:]:
            any_tf = any_tf | (F.col(f"tf_{idx[t]}") > 0)
        outs.append(
            bg.filter(any_tf)
            .select("doc_id", s.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(MSEARCH_K)
            .select(F.lit(qi).alias("query_id"), "doc_id",
                    F.round("score", 6).alias("score")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def q_msearch_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME _msearch served batched from the physical index
    (topk_many_local: union-of-terms pruned read, shared decode).
    Same DuckDB oracle."""
    from .index.query import topk_many_local

    reader = _reader_for(spark, sf_dir)
    per_q = topk_many_local(reader, MSEARCH_QUERIES, k=MSEARCH_K)
    docs = sorted({d for res in per_q for d, _ in res})
    urls = reader.doc_urls_local(docs)
    rows = [(i, int(urls[d][3:]), round(s, 6))
            for i, res in enumerate(per_q) for d, s in res]
    schema = "query_id int, doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_msearch() -> str:
    blocks = []
    for i, q in enumerate(MSEARCH_QUERIES):
        terms = ", ".join(f"('{t}')" for t in sorted(set(q.split())))
        blocks.append(f"""
(SELECT {i} AS query_id, doc_id, round(s, 6) AS score FROM (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN (VALUES {terms}) q(term) USING (term)
       JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id
) ORDER BY s DESC, doc_id LIMIT {MSEARCH_K})""")
    u = "\nUNION ALL\n".join(blocks)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
{u}
"""


# ----------------------------------------------- collapse (field collapsing)


def q_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``collapse`` (field collapsing): the flagship query's hits
    collapsed on ``lang`` — one best doc per language (score desc,
    doc_id asc), ordered by that representative's score. One window
    rank over the scored set joined to the collapse field."""
    from .index.naive import onepass_scored
    from pyspark.sql import Window

    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    tok_lang = load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.expr(f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)")
        .alias("tokens"))
    sc = onepass_scored(tok_lang, qterms, extra_cols=["lang"])
    w = Window.partitionBy("lang").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .select("lang", "doc_id", F.round("s", 6).alias("score"))
    )


def sql_collapse() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    terms = ", ".join(f"('{t}')" for t in qterms)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id),
ranked AS (
  SELECT d.lang, s.doc_id, s.s,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.s DESC, s.doc_id) AS rn
  FROM scored s JOIN documents d USING (doc_id))
SELECT lang, doc_id, round(s, 6) AS score FROM ranked WHERE rn = 1
"""


# --------------------------------------------------- rescore (ES rescore)

# ES rescore: re-rank the base query's top-`window` with a phrase
# secondary, total = qw*base + rw*phrase. Window 30 of the flagship
# query, phrase "data query" (both terms are base-query terms, so the
# rescorer genuinely reorders the window).
RESCORE_PHRASE = "data query"
RESCORE_WINDOW = 30
RESCORE_QW, RESCORE_RW = 1.0, 2.0


def q_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rescore``, naive Catalyst twin: base BM25 window (top-30)
    left-joined to the in-row phrase pseudo-term score (corpus-wide
    df, as ES scores the rescore query), combined and re-ranked."""
    tok = tokenized_documents(spark, sf_dir)
    from .index.naive import onepass_frames
    win = bm25_topk_naive_onepass(tok, FLAGSHIP_QUERY, k=RESCORE_WINDOW)
    _, gstats = onepass_frames(tok, [])
    # Generate barrier: the ptf lambda must see a MATERIALIZED token
    # array (see tokenized_documents_mat) — otherwise the pushed-down
    # hits filter re-tokenizes per position (was 55 s at sf1.0).
    base = tokenized_documents_mat(spark, sf_dir).select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("dl"))
    # df(pseudo-term) via a single-partition window over the HITS frame
    # (bounded by the phrase's selectivity), not a scalar-agg cross
    # join: the latter re-plans the whole phrase scan for the count
    # consumer — one extra corpus pass (same shape as q_phrase_prefix).
    hits = (
        base.select("doc_id", "dl", F.expr(
            _ptf_expr(RESCORE_PHRASE.split())).alias("ptf"))
        .filter(F.col("ptf") > 0)
        .withColumn("df", F.count("*").over(Window.partitionBy()))
    )
    # (n_docs, avgdl) already exist as gstats from build_naive_stats —
    # recomputing them from `base` would be one more full corpus
    # tokenize pass for two scalars
    g = gstats
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    ph = (
        hits.crossJoin(F.broadcast(g))
        .withColumn("ps", idf * F.col("ptf") / (
            F.col("ptf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))))
        .select("doc_id", "ps")
    )
    return (
        F.broadcast(win).join(ph, "doc_id", "left").na.fill({"ps": 0.0})
        .withColumn("total", RESCORE_QW * F.col("score")
                    + RESCORE_RW * F.col("ps"))
        .orderBy(F.desc("total"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("total", 6).alias("score"))
    )


def q_rescore_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME rescore served from the physical index: plain top-30
    serving call + one positional candidate scan bounded by the
    phrase's selectivity (index/query.py::rescore_topk_local). Same
    DuckDB oracle."""
    from .index.query import rescore_topk_local

    reader = _reader_for(spark, sf_dir)
    res = rescore_topk_local(reader, FLAGSHIP_QUERY, RESCORE_PHRASE,
                             k=10, window=RESCORE_WINDOW,
                             query_weight=RESCORE_QW,
                             rescore_weight=RESCORE_RW)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_rescore_topk() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    terms = ", ".join(f"('{t}')" for t in qterms)
    pterms = RESCORE_PHRASE.split()
    L = len(pterms)
    conds = " AND ".join(
        f"t[i + {j + 1}] = '{w}'" for j, w in enumerate(pterms))
    ptf = (f"len(list_filter(range(greatest(len(t) - {L - 1}, 0)),"
           f" i -> {conds}))")
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id),
win AS (SELECT doc_id, s FROM scored ORDER BY s DESC, doc_id
        LIMIT {RESCORE_WINDOW}),
base AS (SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t
         FROM documents),
ph AS (SELECT doc_id, {ptf} AS ptf, len(t) AS dl FROM base),
phits AS (SELECT * FROM ph WHERE ptf > 0),
pdf AS (SELECT count(*) AS df FROM phits),
pscore AS (
  SELECT p.doc_id,
         ln(1 + (g.n_docs - pdf.df + 0.5) / (pdf.df + 0.5))
           * p.ptf / (p.ptf + {K1} * ({round(1 - B, 2)} + {B} * p.dl / g.avgdl)) AS ps
  FROM phits p CROSS JOIN pdf CROSS JOIN g)
SELECT w.doc_id,
       round({RESCORE_QW} * w.s + {RESCORE_RW} * coalesce(p.ps, 0), 6) AS score
FROM win w LEFT JOIN pscore p USING (doc_id)
ORDER BY {RESCORE_QW} * w.s + {RESCORE_RW} * coalesce(p.ps, 0) DESC, w.doc_id
LIMIT 10
"""


# ------------------------------------------- more_like_this (ES MLT)

# ES more_like_this: rank the seed doc's terms by tf*idf within the
# seed (Lucene interestingTerms), cap at max_query_terms, run the
# disjunctive BM25 query, exclude the seed from the hits. Selection
# uses 8 terms so the cap genuinely selects (docs carry ~25 distinct
# vocabulary terms).
MLT_DOC = 7
MLT_MAX_TERMS = 8


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``more_like_this``, naive Catalyst twin: in-plan term
    selection (tf*idf within the seed doc, top-8, ties term-asc),
    broadcast the selected terms into the standard disjunctive BM25,
    exclude the seed, top-10."""
    from .index.naive import bm25_score_expr, onepass_frames

    tok = tokenized_documents(spark, sf_dir)
    # the full (doc_id, dl, term, tf) posting frame is built in ONE
    # explode pass (in-row distinct+count — no posting groupBy) and
    # localCheckpoint'ed: seed selection, the df window, and the
    # disjunctive scorer all consume the same narrow rows instead of
    # each re-tokenizing the corpus (the old shape cost ~5 passes)
    ex = (
        tok.select(
            "doc_id", F.size("tokens").cast("long").alias("dl"),
            F.explode(F.expr(
                "transform(array_distinct(tokens),"
                " t -> struct(t AS term,"
                " size(filter(tokens, x -> x = t)) AS tf))")).alias("p"))
        .select("doc_id", "dl", F.col("p.term").alias("term"),
                F.col("p.tf").cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    _, gstats = onepass_frames(tok, [])
    with_df = ex.withColumn(
        "df", F.count("*").over(Window.partitionBy("term")))
    seed = (
        with_df.filter(F.col("doc_id") == MLT_DOC)
        .crossJoin(F.broadcast(gstats))
        .withColumn("ti", F.col("tf") * F.log(
            1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .orderBy(F.desc("ti"), F.asc("term"))
        .limit(MLT_MAX_TERMS)
        .select("term")
    )
    sc = (
        with_df.join(F.broadcast(seed), "term")
        .filter(F.col("doc_id") != MLT_DOC)
        .crossJoin(F.broadcast(gstats))
        .withColumn("contrib", bm25_score_expr())
    )
    return (
        sc.groupBy("doc_id").agg(F.sum("contrib").alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_more_like_this_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME MLT served from the physical index: ONE bounded corpus
    lookup fetches the seed text (doc_id pushdown), the df probe reads
    only the seed's own terms' thin block columns, then the
    disjunctive scorer runs bucket-pruned on the selected terms
    (index/query.py::mlt_topk_local). Same DuckDB oracle."""
    from .index.query import mlt_topk_local

    seed_text = (load(spark, sf_dir, "documents")
                 .filter(F.col("doc_id") == MLT_DOC)
                 .select("text").collect()[0].text)
    reader = _reader_for(spark, sf_dir)
    res = mlt_topk_local(reader, seed_text, exclude_doc=MLT_DOC, k=10,
                         max_query_terms=MLT_MAX_TERMS)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_more_like_this() -> str:
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
seed AS (
  SELECT tf.term
  FROM tf JOIN dfs USING (term) CROSS JOIN g
  WHERE tf.doc_id = {MLT_DOC}
  ORDER BY tf.tf * ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5)) DESC,
           tf.term
  LIMIT {MLT_MAX_TERMS}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN seed USING (term) JOIN dfs USING (term)
       JOIN dl USING (doc_id) CROSS JOIN g
  WHERE tf.doc_id != {MLT_DOC}
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------- phrase top-k

# second phrase pins OVERLAP semantics: "batch batch batch" contains
# "batch batch" TWICE under positional-intersection counting (a
# non-overlapping regex scan would say once — the classic phrase bug)
FLAGSHIP_PHRASES = ["hash join", "batch batch"]


def _ptf_expr(terms: list[str]) -> str:
    """In-row phrase term frequency over the ``tokens`` array: count
    start positions i where tokens[i..i+L-1] equals the phrase —
    zero-shuffle whole-stage-codegen'd scan, the naive twin of the
    positional-index intersection (index/query.py::phrase_topk_local)."""
    L = len(terms)
    conds = " AND ".join(
        f"element_at(tokens, CAST(i AS INT) + {j}) = '{t}'"
        for j, t in enumerate(terms))
    return (
        f"CASE WHEN size(tokens) >= {L} THEN"
        f" size(filter(sequence(1, size(tokens) - {L - 1}), i -> {conds}))"
        " ELSE 0 END"
    )


def q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search, BM25-scored (ES match_phrase analog — the
    reference's backend serves phrase queries over its positional
    index; SURVEY §2.8 Q8 extension). The phrase acts as one pseudo-
    term: ptf = count of phrase start positions (overlaps counted),
    df = docs containing the phrase, score = idf * saturated-tf.

    Naive Catalyst twin of the positional-index path: ptf is an
    in-row filtered-sequence scan over the token array (no shuffle),
    stats are one agg + one broadcast-scale join. The DuckDB oracle
    recounts via list_filter over 1-based token arrays — independent
    method, same numbers."""
    base = tokenized_documents(spark, sf_dir).select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("dl"))
    stack_args = ", ".join(
        f"'{p}', {_ptf_expr(p.split())}" for p in FLAGSHIP_PHRASES)
    long = base.select(
        "doc_id", "dl",
        F.expr(f"stack({len(FLAGSHIP_PHRASES)}, {stack_args}) AS (phrase, ptf)"),
    )
    hits = long.filter(F.col("ptf") > 0)
    g = base.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfs = hits.groupBy("phrase").agg(F.count("*").alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("ptf") / (
        F.col("ptf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    w = Window.partitionBy("phrase").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        hits.join(F.broadcast(dfs), "phrase")
        .crossJoin(F.broadcast(g))
        .withColumn("s", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "phrase", "doc_id",
            F.col("ptf").cast("long").alias("phrase_tf"),
            F.round("s", 6).alias("score"),
        )
    )


def sql_phrase_topk() -> str:
    def ptf_sql(terms: list[str]) -> str:
        L = len(terms)
        conds = " AND ".join(
            f"t[i + {j + 1}] = '{t}'" for j, t in enumerate(terms))
        return (f"len(list_filter(range(greatest(len(t) - {L - 1}, 0)),"
                f" i -> {conds}))")

    longs = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, dl, '{p}' AS phrase, {ptf_sql(p.split())} AS ptf FROM base"
        for p in FLAGSHIP_PHRASES)
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t,
         len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS dl
  FROM documents
),
long AS (
{longs}
),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
dfs AS (SELECT phrase, count(*) AS df FROM long WHERE ptf > 0 GROUP BY 1),
scored AS (
  SELECT long.phrase, long.doc_id, long.ptf,
         ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
           * long.ptf / (long.ptf + {K1} * ({round(1 - B, 2)} + {B} * long.dl / g.avgdl)) AS s
  FROM long JOIN dfs USING (phrase) CROSS JOIN g
  WHERE long.ptf > 0
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY phrase ORDER BY s DESC, doc_id) AS rn
  FROM scored
)
SELECT phrase, doc_id, CAST(ptf AS BIGINT) AS phrase_tf, round(s, 6) AS score
FROM ranked WHERE rn <= 10
"""


# ------------------------------------------- phrase top-k (positional index)

_IDX_CACHE: dict[tuple, str] = {}


def _documents_fingerprint(sf_dir: str) -> tuple:
    """Invalidate the session index cache if the fixture changes (same
    discipline as similarity._emb_fingerprint): a Spark-written fixture
    is a DIRECTORY whose own stat does not track content, so fingerprint
    the sorted (name, mtime_ns, size) of its *.parquet parts."""
    import os
    from pathlib import Path

    p = Path(sf_dir) / "documents.parquet"
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    return tuple(
        (str(f), os.stat(f).st_mtime_ns, os.stat(f).st_size) for f in files
    )


def _fixture_shard_size(sf_dir: str) -> int:
    """Scale the fixture index's shard size with the corpus so the
    build always fits ONE wave of ``wave_shards`` shards: at
    shard_size=1024 a 50k-doc fixture needs 7 sequential waves, each
    paying full stage1+merge+commit job overhead (measured 15-24 s vs
    5.0 s single-wave at the sf1.0 replica). Row count comes from
    parquet footers (no Spark job)."""
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(str(f)).metadata.num_rows
            for f, _, _ in _documents_fingerprint(sf_dir))
    return max(1024, -(-n // 8))


_READER_CACHE: dict = {}


def _reader_for(spark: SparkSession, sf_dir: str) -> "IndexReader":
    """Session-scoped open searcher over the fixture index — ES keeps
    its searcher open across requests; re-opening per query would
    re-resolve the generation pointer, re-read meta/manifests and
    re-probe tombstones every call (measured ~0.15 ms each — cheap,
    but needless 94x per gate sweep; the pyarrow file handles the
    reader caches are the bigger win). The fixture index is immutable
    (fingerprint-keyed), so an open reader can never serve stale
    tombstones here; code that mutates an index must open a fresh
    IndexReader, as the lifecycle tests do."""
    from .index.reader import IndexReader

    key = (sf_dir, _documents_fingerprint(sf_dir))
    r = _READER_CACHE.get(key)
    if r is None or r.spark is not spark:
        r = IndexReader(spark, _index_dir_for(spark, sf_dir))
        _READER_CACHE[key] = r
    return r


def _index_dir_for(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped POSITIONAL physical index over the documents
    fixture (built once per (sf_dir, file fingerprint), like the
    materialized ANN artifacts in operators/similarity._ann_dir_for).
    url = doc%012d: zero-padded so the index's url-rank doc ids are
    exactly the fixture doc_ids — candidates map back losslessly."""
    return _fixture_index(spark, sf_dir)


# the analyzed twin's chain: stopwords chosen from the fixture's live
# vocabulary ('a' is a top-15 token) so removal changes dl and scores,
# not just the term set; stemmer="s" exercises QUERY-side analysis
# ("values" -> "value") — the fixture vocabulary itself has no
# s-suffixed tokens (disclosed), so index-side stemming is pinned by
# the crafted-corpus pytests instead
ANALYZER_STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")


def _fixture_index(spark: SparkSession, sf_dir: str,
                   analyzed: bool = False) -> str:
    key = (sf_dir, _documents_fingerprint(sf_dir), analyzed)
    d = _IDX_CACHE.get(key)
    if d is None:
        import atexit
        import shutil
        import tempfile

        from .index.build import IndexConfig, build_index

        d = tempfile.mkdtemp(prefix="fts_an_" if analyzed else "fts_idx_")
        pages = load(spark, sf_dir, "documents").select(
            F.format_string("doc%012d", "doc_id").alias("url"), "text")
        chain = (dict(stopwords=ANALYZER_STOPWORDS, stemmer="s")
                 if analyzed else {})
        build_index(spark, pages, d, IndexConfig(
            shard_size=_fixture_shard_size(sf_dir), n_buckets=4,
            wave_shards=8, use_text_col=True, positions=True, **chain))
        _IDX_CACHE[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def q_phrase_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME match_phrase query served from the physical positional
    index (pos_vb payload — index/query.py::phrase_match_local):
    per-shard positional intersection yields every (doc, phrase_tf,
    dl) candidate; BM25 pseudo-term scoring and the pinned tie-break
    then run as the same Catalyst expressions as q_phrase_topk. The
    gate therefore proves naive Catalyst scan, positional-index
    intersection, and the DuckDB list_filter recount all agree
    hash-exactly. Driver-side candidate lists are bounded by phrase
    selectivity — compounding AND of the phrase terms' dfs — which is
    precisely why a positional index makes phrases cheap at scale.
    N/avgdl come from the index manifests (exact integer sums), not a
    corpus rescan."""
    from .index.query import phrase_match_local

    reader = _reader_for(spark, sf_dir)
    cand_lists = phrase_match_local(reader, FLAGSHIP_PHRASES)
    ids = sorted({d for lst in cand_lists for d, _, _ in lst})
    urls = reader.doc_urls_local(ids)
    rows = [
        (p, int(urls[d][3:]), ptf, dl)
        for p, lst in zip(FLAGSHIP_PHRASES, cand_lists)
        for d, ptf, dl in lst
    ]
    n_docs, avgdl = reader.global_stats()
    schema = "phrase string, doc_id long, ptf long, dl long"
    cdf = spark.createDataFrame(rows, schema) if rows else (
        spark.createDataFrame([], schema))
    dfs = cdf.groupBy("phrase").agg(F.count("*").alias("df"))
    idf = F.log(1 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("ptf") / (
        F.col("ptf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl)))
    w = Window.partitionBy("phrase").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        cdf.join(F.broadcast(dfs), "phrase")
        .withColumn("s", score)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            "phrase", "doc_id",
            F.col("ptf").cast("long").alias("phrase_tf"),
            F.round("s", 6).alias("score"),
        )
    )


# ------------------------------------------------- proximity (span_near analog)

# (term_a, term_b, window): docs where the terms occur within `window`
# token positions of each other, strength = ordered pair count
SPAN_NEAR_PAIRS = [("hash", "join", 3), ("data", "index", 5)]


def q_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES span_near analog served from the positional index
    (index/query.py::span_near_local): for each fixed (term_a, term_b,
    window) pair, every doc where the terms co-occur within the window
    and the pair count |{(p_a, p_b): |p_a - p_b| <= w}| — the
    proximity-strength statistic span scoring builds on. The DuckDB
    oracle recounts via a positions cross-join over list_filter
    subscripts — an independent method on the raw text. Complete
    deterministic result set (no limit), so the hash gate covers every
    matching doc."""
    from .index.query import span_near_local

    reader = _reader_for(spark, sf_dir)
    res = span_near_local(reader, SPAN_NEAR_PAIRS)
    ids = sorted({d for lst in res for d, _ in lst})
    urls = reader.doc_urls_local(ids)
    rows = [
        (f"{a} {b} ~{w}", int(urls[d][3:]), n)
        for (a, b, w), lst in zip(SPAN_NEAR_PAIRS, res)
        for d, n in lst
    ]
    schema = "pair string, doc_id long, n_pairs long"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_span_near() -> str:
    def one(a: str, b: str, w: int) -> str:
        return f"""
  SELECT '{a} {b} ~{w}' AS pair, pa.doc_id, count(*) AS n_pairs
  FROM (SELECT doc_id, unnest(list_filter(range(len(t)), i -> t[i+1] = '{a}')) AS p
        FROM base) pa
  JOIN (SELECT doc_id, unnest(list_filter(range(len(t)), i -> t[i+1] = '{b}')) AS p
        FROM base) pb USING (doc_id)
  WHERE abs(pa.p - pb.p) <= {w}
  GROUP BY 1, 2"""

    unions = "\n  UNION ALL\n".join(one(a, b, w) for a, b, w in SPAN_NEAR_PAIRS)
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t
  FROM documents
)
SELECT pair, doc_id, CAST(n_pairs AS BIGINT) AS n_pairs FROM (
{unions}
)
"""


# ------------------------------------------------------ bool query (ES bool)

# the flagship ES `bool` query: {"bool": {"must": data, merge,
# "should": query, vector, "must_not": dup}} — must gates matching,
# should lifts ranking, must_not excludes (Lucene BooleanQuery
# scoring; the reference's backend serves exactly this query shape)
BOOL_MUST = "data merge"
BOOL_SHOULD = "query vector"
BOOL_MUST_NOT = "dup"


def q_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bool`` query, BM25-scored top-10 (SURVEY §2.8 Q8d): docs
    containing ALL must terms and NO must_not term, scored by the
    BM25 sum over the distinct must+should terms they contain —
    must_not never contributes to the score, should affects only
    ranking. Naive Catalyst twin of the index-served path
    (index/query.py::bool_topk): one postings pass computes
    contributions and the per-doc distinct-must count together; the
    exclusion is a left-anti join against the must_not posting docs.
    Tie-break pinned on doc_id, so the LIMIT is deterministic."""
    from .index.naive import onepass_contrib, onepass_frames

    tok = tokenized_documents(spark, sf_dir)
    must = sorted(set(BOOL_MUST.split()))
    scoring = sorted(set(must) | set(BOOL_SHOULD.split()))
    must_not = sorted(set(BOOL_MUST_NOT.split()))
    # one-pass frame over scoring + must_not terms: the must gate, the
    # exclusion and every contribution are in-row predicates on the
    # same tf columns — no posting shuffle, no anti-join
    base, g = onepass_frames(tok, scoring + must_not)
    s_expr = onepass_contrib(0)
    for i in range(1, len(scoring)):
        s_expr = s_expr + onepass_contrib(i)
    any_scoring = F.col("tf_0") > 0
    for i in range(1, len(scoring)):
        any_scoring = any_scoring | (F.col(f"tf_{i}") > 0)
    gate = any_scoring
    for i, t in enumerate(scoring):
        if t in must:
            gate = gate & (F.col(f"tf_{i}") > 0)
    for j in range(len(scoring), len(scoring) + len(must_not)):
        gate = gate & (F.col(f"tf_{j}") == 0)
    return (
        base.crossJoin(F.broadcast(g))
        .filter(gate)
        .withColumn("s", s_expr)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_bool_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME bool query served from the physical index
    (index/query.py::bool_topk_local): pruned pyarrow block read over
    must+should+must_not terms, per-shard vectorized accumulator with
    the bool gate applied inside the scorer (distinct-must bincount +
    sorted exclusion probe), driver top-k merge. Index doc ids are
    rank(url) over doc%012d urls, so the doc_id tie-break order is
    identical to the fixture's and the gate is hash-exact against the
    same DuckDB oracle as the naive twin."""
    from .index.query import bool_topk_local

    reader = _reader_for(spark, sf_dir)
    res = bool_topk_local(reader, BOOL_MUST, BOOL_SHOULD, BOOL_MUST_NOT, k=10)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_bool_topk() -> str:
    must = sorted(set(BOOL_MUST.split()))
    scoring = sorted(set(must) | set(BOOL_SHOULD.split()))
    terms = ", ".join(f"('{t}')" for t in scoring)
    must_in = ", ".join(f"'{t}'" for t in must)
    not_in = ", ".join(f"'{t}'" for t in BOOL_MUST_NOT.split())
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {terms}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s,
         count(DISTINCT CASE WHEN tf.term IN ({must_in}) THEN tf.term END) AS n_must
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
WHERE n_must = {len(must)}
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tf WHERE term IN ({not_in}))
ORDER BY s DESC, doc_id LIMIT 10
"""


# ------------------------------------------- search + aggs composition (ES _search query+aggs)

# every Kibana panel in the reference issues ONE ES _search with BOTH a
# query (the query bar / filter state) AND aggs — the aggregations run
# over the query's MATCH SET, not the whole index (reference
# INSTALL-and-USAGE.md:451-459 data view + dashboard panels). These
# gates are that composition: a bool filter's full match set feeding a
# date_histogram x terms aggregation.
SEARCH_MUST = "table value"
SEARCH_MUST_NOT = "dup"
# the documents fixture has no timestamp column, so the histogram date
# is synthesized deterministically from doc_id with the SAME expression
# in both engines (precedent: URL_SYNTH_SQL, geo.IP_SYNTH_SQL)
DAY_SYNTH_SPARK = "date_add(DATE'2025-01-01', CAST(doc_id % 90 AS INT))"
DAY_SYNTH_DUCK = "DATE '2025-01-01' + CAST(doc_id % 90 AS INT)"


def _search_aggs(d: DataFrame, matched: DataFrame) -> DataFrame:
    """The aggs half: date_histogram (day) with a terms sub-agg (lang),
    doc count + sum(n_chars) metrics — the canonical stacked-bar
    Kibana panel, computed over the match set only."""
    return (
        d.join(matched, "doc_id")
        .groupBy(F.expr(DAY_SYNTH_SPARK).alias("day"), "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("sum_chars"))
    )


def q_search_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _search composition, naive Catalyst twin: the bool filter's
    match set (ALL matching docs — filter context, no scores, no
    top-k) feeds the aggregations. One token pass computes the
    must-count and must_not flag together."""
    # in-row bool gate over ONE pass of the documents table: every
    # must/must_not predicate is an array_contains on the token array,
    # so no explode, no groupBy, and no join back to the table
    d = load_wide(spark, sf_dir, "documents").withColumn(
        "__toks",
        F.expr(f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)"))
    gate = F.lit(True)
    for t in sorted(set(SEARCH_MUST.split())):
        gate = gate & F.array_contains("__toks", t)
    for t in SEARCH_MUST_NOT.split():
        gate = gate & ~F.array_contains("__toks", t)
    return (
        d.filter(gate)
        .groupBy(F.expr(DAY_SYNTH_SPARK).alias("day"), "lang")
        .agg(F.count("*").alias("n_docs"),
             F.sum("n_chars").alias("sum_chars"))
    )


def q_search_agg_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME composition served from the physical index
    (index/query.py::bool_match_ids): the match set comes from a
    bucket-pruned posting scan with filter-context matching inside the
    per-shard vectorized kernel (gap streams only — no tf/dl decode),
    then joins the documents scan for the aggs. The match set flows
    task-to-task (never through the driver); AQE broadcast-converts
    the join when the filter is selective. Gate = same DuckDB oracle
    as the naive twin — three independent methods agree."""
    from .index.query import bool_match_ids

    reader = _reader_for(spark, sf_dir)
    # index doc ids are rank(url) over doc%012d urls == fixture doc_ids
    matched = bool_match_ids(reader, SEARCH_MUST, "", SEARCH_MUST_NOT)
    return _search_aggs(load(spark, sf_dir, "documents"), matched)


def sql_search_agg() -> str:
    must = sorted(set(SEARCH_MUST.split()))
    must_in = ", ".join(f"'{t}'" for t in must)
    not_in = ", ".join(f"'{t}'" for t in SEARCH_MUST_NOT.split())
    return f"""
WITH {_TOK_CTE},
m AS (
  SELECT doc_id FROM tok GROUP BY doc_id
  HAVING count(DISTINCT CASE WHEN term IN ({must_in}) THEN term END) = {len(must)}
     AND sum(CASE WHEN term IN ({not_in}) THEN 1 ELSE 0 END) = 0)
SELECT {DAY_SYNTH_DUCK} AS day, d.lang,
       count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
FROM documents d JOIN m USING (doc_id)
GROUP BY 1, 2
"""


# ----------------------- composed _search body (the Kibana front door)

# ONE JSON body composing four features — bool query + size +
# highlight + a nested aggs subtree — compiled by index/body.py onto
# the existing primitives. This is the request shape Kibana actually
# sends (reference INSTALL-and-USAGE.md:451-459).
SB_BODY = {
    "query": {"bool": {"must": SEARCH_MUST, "must_not": SEARCH_MUST_NOT}},
    "size": 10,
    "highlight": {"fields": {"text": {}}},
    "aggs": {"by_lang": {"terms": {"field": "lang"},
                         "aggs": {"sum_chars": {"sum": {"field": "n_chars"}}}}},
}


def _sb_assemble(hits_df: DataFrame, aggs_df: DataFrame) -> DataFrame:
    """One frame for the one-body response: hit rows (doc_id, score,
    fragment) + agg bucket rows, section-tagged, disjoint columns
    NULL-typed so the union is schema-stable."""
    hit_part = hits_df.select(
        F.lit("hit").alias("section"), "doc_id", "score", "fragment",
        F.lit(None).cast("string").alias("by_lang"),
        F.lit(None).cast("long").alias("gid"),
        F.lit(None).cast("long").alias("doc_count"),
        F.lit(None).cast("long").alias("sum_chars"))
    agg_part = aggs_df.select(
        F.lit("agg").alias("section"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("score"),
        F.lit(None).cast("string").alias("fragment"),
        "by_lang", F.col("gid").cast("long").alias("gid"),
        "doc_count", F.col("sum_chars").cast("long").alias("sum_chars"))
    return hit_part.unionByName(agg_part)


def q_search_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed ``_search`` body, naive Catalyst twin: the bool
    query's scored matches feed BOTH legs — top-10 hits join the
    codegen fragment projection (highlight), the FULL match set feeds
    the agg subtree via operators/aggtree.agg_tree (one rollup pass,
    grand total = ES's hits.total)."""
    from .index.naive import onepass_contrib, onepass_frames
    from .operators.aggtree import agg_tree

    must = sorted(set(SEARCH_MUST.split()))
    must_not = sorted(set(SEARCH_MUST_NOT.split()))
    # one-pass matched frame: bool gate and score are in-row tf
    # predicates, and the aggs columns (lang, n_chars) ride along so
    # the agg leg needs no join back to the documents table
    d = load_wide(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.expr(f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)")
        .alias("tokens"))
    base, g = onepass_frames(d, must + must_not,
                             extra_cols=["lang", "n_chars"])
    s_expr = onepass_contrib(0)
    for i in range(1, len(must)):
        s_expr = s_expr + onepass_contrib(i)
    gate = F.lit(True)
    for i in range(len(must)):
        gate = gate & (F.col(f"tf_{i}") > 0)
    for j in range(len(must), len(must) + len(must_not)):
        gate = gate & (F.col(f"tf_{j}") == 0)
    matched = (base.crossJoin(F.broadcast(g)).filter(gate)
               .withColumn("s", s_expr))
    hits = (matched.orderBy(F.desc("s"), F.asc("doc_id")).limit(10)
            .select("doc_id", F.round("s", 6).alias("score")))
    _, frag = _hl_exprs(must)
    # fragment rendered AFTER the broadcast hits join -> 10 docs only
    hits_df = (
        load(spark, sf_dir, "documents").join(F.broadcast(hits), "doc_id")
        .withColumn("tokens", F.expr(
            f"regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}', 0)"))
        .select("doc_id", "score", F.expr(frag).alias("fragment")))
    aggs_df = agg_tree(matched.select("doc_id", "lang", "n_chars"),
                       SB_BODY["aggs"])
    return _sb_assemble(hits_df, aggs_df)


def q_search_body_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME body through the compiler (index/body.py::search_body)
    against the physical index: hits served driver-local, match set
    from the bucket-pruned filter-context kernel, aggs as one rollup
    over the url-joined corpus. Same DuckDB oracle — three methods."""
    from .index.body import search_body

    reader = _reader_for(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    corpus = (tokenized_documents(spark, sf_dir)
              .join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
              .withColumn("url", F.format_string("doc%012d", "doc_id")))
    res = search_body(spark, reader, SB_BODY, corpus=corpus)
    rows = [(int(res["urls"][d][3:]), round(s, 6)) for d, s in res["hits"]]
    schema = "doc_id long, score double"
    hits = (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))
    frags = res["fragments"].select(
        F.substring("url", 4, 12).cast("long").alias("doc_id"), "fragment")
    hits_df = hits.join(frags, "doc_id").select("doc_id", "score", "fragment")
    return _sb_assemble(hits_df, res["aggs"])


def sql_search_body() -> str:
    must = sorted(set(SEARCH_MUST.split()))
    must_in = ", ".join(f"'{t}'" for t in must)
    values = ", ".join(f"('{t}')" for t in must)
    not_in = ", ".join(f"'{t}'" for t in SEARCH_MUST_NOT.split())
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {values}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s,
         count(DISTINCT tf.term) AS n_must
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id),
m AS (SELECT doc_id, s FROM scored WHERE n_must = {len(must)}
      AND doc_id NOT IN (SELECT DISTINCT doc_id FROM tok WHERE term IN ({not_in}))),
top AS (SELECT doc_id, round(s, 6) AS score FROM m ORDER BY s DESC, doc_id LIMIT 10),
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t
         FROM documents WHERE doc_id IN (SELECT doc_id FROM top)),
frag AS (SELECT doc_id,
         greatest(0, list_min(list_filter(range(len(t)),
                     i -> t[i+1] IN ({must_in}))) - {HL_BEFORE}) AS st, t
  FROM toks),
hits AS (SELECT top.doc_id, top.score,
       array_to_string(list_transform(list_slice(f.t, f.st + 1, f.st + {HL_LEN}),
           x -> CASE WHEN x IN ({must_in}) THEN '<em>' || x || '</em>'
                     ELSE x END), ' ') AS fragment
  FROM top JOIN frag f USING (doc_id)),
aggs AS (SELECT d.lang AS by_lang, CAST(GROUPING(d.lang) AS BIGINT) AS gid,
         count(*) AS doc_count, CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
  FROM documents d JOIN m USING (doc_id) GROUP BY ROLLUP(d.lang))
SELECT 'hit' AS section, doc_id, score, fragment,
       CAST(NULL AS VARCHAR) AS by_lang, CAST(NULL AS BIGINT) AS gid,
       CAST(NULL AS BIGINT) AS doc_count, CAST(NULL AS BIGINT) AS sum_chars
FROM hits
UNION ALL
SELECT 'agg', NULL, NULL, NULL, by_lang, gid, doc_count, sum_chars FROM aggs
"""


# ------------------------------------------------- prefix query (ES prefix / autocomplete)

PREFIX_Q = "s"  # expands to scan/slow/small/sort/spark/stream on the fixture


def q_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``prefix`` query, naive Catalyst twin: disjunctive BM25 over
    every vocabulary term starting with the prefix (each term scores
    with its own idf — Lucene ``top_terms_N`` blended rewrite), pinned
    tie-break."""
    from .index.naive import matched_postings_scored

    tok = tokenized_documents(spark, sf_dir)
    return (
        matched_postings_scored(tok, f"startswith(x, '{PREFIX_Q}')")
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_prefix_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME prefix query served from the physical index: the
    sorted term-dictionary sidecar (index/termdict.py) expands the
    prefix with one pruned range read, then the existing disjunctive
    scorer runs bucket-pruned on the expanded terms. Same DuckDB
    oracle as the naive twin."""
    from .index.termdict import ensure_term_dict, prefix_topk_local

    reader = _reader_for(spark, sf_dir)
    ensure_term_dict(spark, reader)
    res = prefix_topk_local(reader, PREFIX_Q, k=10)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_prefix_topk() -> str:
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  WHERE tf.term LIKE '{PREFIX_Q}%'
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
"""


# ------------------------------------------------- wildcard query (ES wildcard)

# ES wildcard query: Lucene WildcardQuery automaton over the term
# dictionary. Fixture "s*a*" expands to scan/small/spark/stream on the
# documents vocabulary — a literal-prefix-prunable pattern (the scan
# seeks to 's' first, the honest Lucene shape).
WILDCARD_Q = "s*a*"
_WILDCARD_LIKE = WILDCARD_Q.replace("*", "%").replace("?", "_")


def q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``wildcard`` query, naive Catalyst twin: disjunctive BM25
    over every vocabulary term matching the pattern (SQL LIKE with
    ``*``->``%``, ``?``->``_`` — same language), per-term idf (Lucene
    ``top_terms_N`` blended rewrite), pinned tie-break."""
    from .index.naive import matched_postings_scored

    tok = tokenized_documents(spark, sf_dir)
    return (
        matched_postings_scored(tok, f"x LIKE '{_WILDCARD_LIKE}'")
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_wildcard_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME wildcard query served from the physical index: the
    sorted term dictionary is range-pruned by the pattern's literal
    prefix, the anchored-regex automaton matches the survivors, and
    the existing disjunctive scorer runs bucket-pruned on the
    expansion (index/termdict.py::expand_wildcard). Same DuckDB
    oracle — three independent methods."""
    from .index.termdict import ensure_term_dict, wildcard_topk_local

    reader = _reader_for(spark, sf_dir)
    ensure_term_dict(spark, reader)
    res = wildcard_topk_local(reader, WILDCARD_Q, k=10)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_wildcard_topk() -> str:
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  WHERE tf.term LIKE '{_WILDCARD_LIKE}'
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
"""


# ------------------------------------------------- fuzzy query (ES fuzzy)

# ES fuzzy query: Lucene FuzzyQuery (Levenshtein automaton, fuzziness
# <= 2). Fixture "grup" at fuzziness=2, prefix_length=0 expands to
# group (df 934) and dup (df 29) — two matches with a 30x df contrast,
# so the per-expansion idf blend is actually exercised.
FUZZY_Q = "grup"
FUZZINESS = 2


def q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``fuzzy`` query, naive Catalyst twin: disjunctive BM25 over
    every vocabulary term within ``FUZZINESS`` edits of the query
    (JVM ``levenshtein`` — codegen, no Python), per-term idf, pinned
    tie-break."""
    from .index.naive import matched_postings_scored

    tok = tokenized_documents(spark, sf_dir)
    return (
        matched_postings_scored(tok, f"levenshtein(x, '{FUZZY_Q}') <= {FUZZINESS}")
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_fuzzy_topk_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME fuzzy query served from the physical index: banded
    Levenshtein over the term dictionary (Lucene's automaton walk,
    same result set), then the disjunctive scorer bucket-pruned on the
    expansion (index/termdict.py::expand_fuzzy). Same DuckDB oracle —
    three independent methods."""
    from .index.termdict import ensure_term_dict, fuzzy_topk_local

    reader = _reader_for(spark, sf_dir)
    ensure_term_dict(spark, reader)
    res = fuzzy_topk_local(reader, FUZZY_Q, k=10, fuzziness=FUZZINESS)
    urls = reader.doc_urls_local([d for d, _ in res])
    rows = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_fuzzy_topk() -> str:
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  WHERE levenshtein(tf.term, '{FUZZY_Q}') <= {FUZZINESS}
  GROUP BY tf.doc_id)
SELECT doc_id, round(s, 6) AS score FROM scored
ORDER BY s DESC, doc_id LIMIT 10
"""


# ------------------------------------------------- highlight (ES highlight)

# ES highlight: each hit returns a fragment of the source with the
# matched terms wrapped in <em> tags. Deterministic fragmenter: a
# 7-token window starting 3 tokens before the FIRST occurrence of any
# query term (clamped at the document start; short docs yield short
# fragments), every query-term occurrence inside the window wrapped.
# fragment expressions live in functions/highlight.py (shared with the
# composed _search body compiler); gate-side aliases keep call sites
from .functions.highlight import HL_BEFORE, HL_LEN, hl_exprs as _hl_exprs


def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``highlight`` on the flagship query's top-10: BM25 ranking
    (naive Catalyst twin) joined to a fragment projection computed
    with higher-order array functions (whole-stage codegen)."""
    tok = tokenized_documents(spark, sf_dir)
    top = bm25_topk_naive_onepass(tok, FLAGSHIP_QUERY, k=10).select(
        "doc_id", F.round("score", 6).alias("score"))
    _, frag = _hl_exprs(sorted(set(FLAGSHIP_QUERY.split())))
    # fragment rendered AFTER the broadcast hits join, so the codegen
    # highlight expression runs on the 10 hit docs, not the corpus
    return (tok.join(F.broadcast(top), "doc_id")
            .select("doc_id", "score", F.expr(frag).alias("fragment")))


def q_highlight_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME highlight served the production way: the physical
    index ranks (topk_local), then ONE corpus lookup bounded to the k
    hit doc_ids (isin predicate — pushed to the parquet scan) renders
    the fragments. Same DuckDB oracle as the naive twin."""
    from .index.query import topk_local

    reader = _reader_for(spark, sf_dir)
    res = topk_local(reader, FLAGSHIP_QUERY, k=10)
    urls = reader.doc_urls_local([d for d, _ in res])
    scores = [(int(urls[d][3:]), round(s, 6)) for d, s in res]
    schema = "doc_id long, score double"
    top = (spark.createDataFrame(scores, schema) if scores
           else spark.createDataFrame([], schema))
    ids = [i for i, _ in scores]
    _, frag = _hl_exprs(sorted(set(FLAGSHIP_QUERY.split())))
    frags = (
        tokenized_documents(spark, sf_dir)
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", F.expr(frag).alias("fragment"))
    )
    return top.join(frags, "doc_id").select("doc_id", "score", "fragment")


def sql_highlight() -> str:
    qterms = sorted(set(FLAGSHIP_QUERY.split()))
    in_list = ", ".join(f"'{t}'" for t in qterms)
    values = ", ".join(f"('{t}')" for t in qterms)
    return f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(term) AS (VALUES {values}),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / g.avgdl)) ) AS s
  FROM tf JOIN q USING (term) JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN g
  GROUP BY tf.doc_id),
top AS (SELECT doc_id, round(s, 6) AS score FROM scored
        ORDER BY s DESC, doc_id LIMIT 10),
toks AS (SELECT doc_id,
                regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t
         FROM documents WHERE doc_id IN (SELECT doc_id FROM top)),
frag AS (
  SELECT doc_id,
         greatest(0, list_min(list_filter(range(len(t)),
                     i -> t[i+1] IN ({in_list}))) - {HL_BEFORE}) AS st,
         t
  FROM toks)
SELECT top.doc_id, top.score,
       array_to_string(list_transform(list_slice(f.t, f.st + 1, f.st + {HL_LEN}),
           x -> CASE WHEN x IN ({in_list}) THEN '<em>' || x || '</em>'
                     ELSE x END), ' ') AS fragment
FROM top JOIN frag f USING (doc_id)
"""


# --------------------------------- match_phrase_prefix (phrase autocomplete)

# ES match_phrase_prefix: the LAST token is a prefix (Lucene
# MultiPhraseQuery — fixed positions + a dictionary expansion at the
# final slot). Fixture: "fast s" -> fixed=["fast"], prefix "s"
# (expands to scan/slow/small/sort/spark/stream on the documents table)
MPP_QUERY = "fast s"


def _ptf_prefix_expr(fixed: list[str], prefix: str) -> str:
    """In-row match_phrase_prefix tf: count start positions i where
    tokens[i..i+L-2] equal the fixed terms and tokens[i+L-1] carries
    the prefix — the naive twin of the positional-index MultiPhrase
    intersection (index/query.py::_phrase_prefix_hits_shard)."""
    L = len(fixed) + 1
    conds = " AND ".join(
        f"element_at(tokens, CAST(i AS INT) + {j}) = '{t}'"
        for j, t in enumerate(fixed))
    # substring-equality instead of startswith: measured ~40% cheaper
    # inside the per-position lambda at sf0.1
    conds += (f" AND substring(element_at(tokens, CAST(i AS INT) + {L - 1}),"
              f" 1, {len(prefix)}) = '{prefix}'")
    return (
        f"CASE WHEN size(tokens) >= {L} THEN"
        f" size(filter(sequence(1, size(tokens) - {L - 1}), i -> {conds}))"
        " ELSE 0 END"
    )


def q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """match_phrase_prefix, naive Catalyst twin: pseudo-term scoring
    exactly like q_phrase_topk (tf = start-position count, df = docs
    matching), with the final slot a prefix test instead of an
    equality."""
    toks = MPP_QUERY.split()
    fixed, prefix = toks[:-1], toks[-1]
    # Generate barrier (tokenized_documents_mat): keeps the pushed-down
    # ptf>0 / array_contains filters ABOVE the tokenization so the
    # per-position lambda runs on a materialized array instead of
    # re-running the regex per position (was 25 s at sf1.0).
    base = tokenized_documents_mat(spark, sf_dir).select(
        "doc_id", "tokens", F.size("tokens").cast("long").alias("dl"))
    # df(pseudo-term) via a single-partition window over the HITS frame
    # (bounded by the phrase's selectivity) instead of a scalar-agg
    # cross join — the latter re-plans the expensive ptf scan per
    # consumer (measured 6 documents scans, 5.9 s at sf0.1; this shape
    # scans the ptf lambda once: ~1.3 s)
    cand = base
    for t in fixed:  # cheap necessary conditions gate the lambda
        cand = cand.filter(F.array_contains("tokens", t))
    hits = cand.select(
        "doc_id", "dl",
        F.expr(_ptf_prefix_expr(fixed, prefix)).cast("long").alias("ptf"),
    ).filter(F.col("ptf") > 0).withColumn(
        "df", F.count("*").over(Window.partitionBy()))
    g = base.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("ptf") / (
        F.col("ptf") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl")))
    return (
        hits.crossJoin(F.broadcast(g))
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.col("ptf").alias("phrase_tf"),
                F.round("s", 6).alias("score"))
    )


def q_phrase_prefix_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME match_phrase_prefix served from the physical index:
    term-dictionary expansion of the final slot + positional
    intersection (index/query.py::phrase_prefix_topk_local). Same
    DuckDB oracle as the naive twin — three methods agree."""
    from .index.query import phrase_prefix_topk_local

    reader = _reader_for(spark, sf_dir)
    res = phrase_prefix_topk_local(reader, MPP_QUERY, k=10, max_terms=50)
    urls = reader.doc_urls_local([d for d, _, _ in res])
    rows = [(int(urls[d][3:]), int(p), round(s, 6)) for d, p, s in res]
    schema = "doc_id long, phrase_tf long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def sql_phrase_prefix() -> str:
    toks = MPP_QUERY.split()
    fixed, prefix = toks[:-1], toks[-1]
    L = len(fixed) + 1
    conds = " AND ".join(
        f"t[i + {j + 1}] = '{w}'" for j, w in enumerate(fixed))
    conds += f" AND t[i + {L}] LIKE '{prefix}%'"
    ptf = (f"len(list_filter(range(greatest(len(t) - {L - 1}, 0)),"
           f" i -> {conds}))")
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS t,
         len(regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}')) AS dl
  FROM documents
),
hits AS (SELECT doc_id, dl, {ptf} AS ptf FROM base),
g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM base),
dfs AS (SELECT count(*) AS df FROM hits WHERE ptf > 0)
SELECT doc_id, CAST(ptf AS BIGINT) AS phrase_tf,
       round( ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * ptf / (ptf + {K1} * ({round(1 - B, 2)} + {B} * dl / g.avgdl)), 6) AS score
FROM hits CROSS JOIN g CROSS JOIN dfs
WHERE ptf > 0
ORDER BY score DESC, doc_id LIMIT 10
"""


# -------------------------------------- significant_terms (ES JLH aggregation)

def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``significant_terms``: which terms are unusually frequent in
    the docs matching the dashboard filter (same bool filter as
    search_agg) vs the whole corpus — JLH score (fg% − bg%)·(fg%/bg%),
    terms more frequent in the foreground only, top 10 (jlh desc,
    term asc). Naive Catalyst twin of the index-served aggregation."""
    must = sorted(set(SEARCH_MUST.split()))
    tok = tokenized_documents(spark, sf_dir)
    # one-pass shape: the bool gate is an in-row array_contains over
    # the token array (no flags explode+groupBy), per-doc term dedup is
    # an in-row array_distinct (no distinct() shuffle of the token
    # stream), and fg/bg come from ONE groupBy with a conditional sum —
    # the old shape evaluated the exploded-distinct frame three times
    # across three sequential jobs. localCheckpoint'ed because the
    # n_fg/n_all scalars and the fg/bg aggregate share it; the frame is
    # (doc_id, matched, term) — narrow at any scale.
    gate = F.lit(True)
    for t in must:
        gate = gate & F.array_contains("tokens", t)
    for t in SEARCH_MUST_NOT.split():
        gate = gate & ~F.array_contains("tokens", t)
    ex = (tok.select(
            "doc_id", gate.cast("long").alias("matched"),
            F.explode(F.array_distinct("tokens")).alias("term"))
          .localCheckpoint(eager=False))
    n_fg_df = (ex.select("doc_id", "matched").groupBy("doc_id")
               .agg(F.first("matched").alias("m"))
               .agg(F.sum("m").cast("double").alias("__n_fg")))
    n_all_df = tok.agg(F.count("*").cast("double").alias("__n_all"))
    agg = ex.groupBy("term").agg(
        F.count("*").alias("bg_df"), F.sum("matched").alias("fg_df"))
    fg_pct = F.col("fg_df") / F.col("__n_fg")
    bg_pct = F.col("bg_df") / F.col("__n_all")
    return (
        agg.filter(F.col("fg_df") > 0)
        .crossJoin(F.broadcast(n_fg_df))
        .crossJoin(F.broadcast(n_all_df))
        .withColumn("jlh", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6))
        .filter(fg_pct > bg_pct)
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(10)
        .select("term", "fg_df", "bg_df", "jlh")
    )


def q_significant_terms_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME aggregation served from the physical index
    (index/query.py::significant_terms): the match set comes from
    bool_match_ids and is CO-GROUPED with the posting blocks on the
    shard key — each shard task probes its decoded doc streams against
    its own match slice, only (term, fg_df, df) partials re-aggregate.
    Index doc ids == fixture doc_ids (doc%012d url ranks), so the same
    DuckDB oracle gates all three methods."""
    from .index.query import bool_match_ids, significant_terms

    reader = _reader_for(spark, sf_dir)
    matched = bool_match_ids(reader, SEARCH_MUST, "", SEARCH_MUST_NOT)
    return significant_terms(reader, matched, top_n=10)


def sql_significant_terms() -> str:
    must = sorted(set(SEARCH_MUST.split()))
    must_in = ", ".join(f"'{t}'" for t in must)
    not_in = ", ".join(f"'{t}'" for t in SEARCH_MUST_NOT.split())
    return f"""
WITH {_TOK_CTE},
long AS (SELECT DISTINCT doc_id, term FROM tok),
m AS (
  SELECT doc_id FROM long GROUP BY doc_id
  HAVING count(DISTINCT CASE WHEN term IN ({must_in}) THEN term END) = {len(must)}
     AND sum(CASE WHEN term IN ({not_in}) THEN 1 ELSE 0 END) = 0),
g AS (SELECT (SELECT count(*) FROM m) AS n_fg,
             (SELECT count(*) FROM documents) AS n_all),
fg AS (SELECT term, count(*) AS fg_df FROM long JOIN m USING (doc_id) GROUP BY 1),
bg AS (SELECT term, count(*) AS bg_df FROM long GROUP BY 1)
SELECT term, fg_df, bg_df,
       round((fg_df * 1.0 / g.n_fg - bg_df * 1.0 / g.n_all)
             * ((fg_df * 1.0 / g.n_fg) / (bg_df * 1.0 / g.n_all)), 6) AS jlh
FROM fg JOIN bg USING (term) CROSS JOIN g
WHERE fg_df * 1.0 / g.n_fg > bg_df * 1.0 / g.n_all
ORDER BY jlh DESC, term LIMIT 10
"""


# --------------------------------------------- multi_match (BM25F-lite, ES most_fields)

# field split: title = first 8 tokens, body = rest — deterministic in
# both engines (the fixture text is single-line, so a literal
# first-line split would be the whole doc). ES most_fields scoring:
# per-field BM25 with per-field (df, dl, avgdl), weighted sum.
MM_QUERY = "data merge"
MM_TITLE_LEN = 8
MM_W_TITLE = 2.0
MM_W_BODY = 1.0
# ES best_fields tie_breaker: fraction of the non-best field scores
# added on top of the dis_max winner (0 = pure dis_max)
MM_TIE_BREAKER = 0.3


def _mm_field_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc_id, field) weighted BM25 partials — title^2 + body,
    each field scored as its own BM25 (field-local df/dl/avgdl,
    global N), Lucene's per-field scoring composed exactly. One token
    pass feeds both fields via stack(). Shared by multi_match
    most_fields (sum of fields) and best_fields (dis_max)."""
    qterms = sorted(set(MM_QUERY.split()))
    tok = tokenized_documents(spark, sf_dir)
    # one-pass shape (same rewrite as the single-field naive family):
    # per-(field, term) tf and per-field dl are IN-ROW expressions over
    # the token slices, the narrow frame is localCheckpoint'ed, and the
    # per-field stats (avgdl, df, N) come from its 1-row aggregate —
    # replaces the explode + three-table join cascade (5 corpus passes)
    fslice = {
        "title": f"slice(tokens, 1, {MM_TITLE_LEN})",
        "body": (f"slice(tokens, {MM_TITLE_LEN + 1}, "
                 f"greatest(size(tokens) - {MM_TITLE_LEN}, 0))"),
    }
    fields = list(fslice)
    base = tok.select(
        "doc_id",
        *[F.expr(f"size({fslice[f]})").cast("long").alias(f"dl_{f}")
          for f in fields],
        *[F.expr(f"size(filter({fslice[f]}, x -> x = '{t}'))").cast("long")
          .alias(f"tf_{f}_{i}")
          for f in fields for i, t in enumerate(qterms)],
    ).localCheckpoint(eager=False)
    g = base.agg(
        F.count("*").alias("n_docs"),
        *[F.avg(f"dl_{f}").alias(f"avgdl_{f}") for f in fields],
        *[F.sum((F.col(f"tf_{f}_{i}") > 0).cast("long")).alias(f"df_{f}_{i}")
          for f in fields for i in range(len(qterms))],
    )
    weights = {"title": MM_W_TITLE, "body": MM_W_BODY}

    def _fs(f: str):
        parts = []
        for i in range(len(qterms)):
            idf = F.log(1 + (F.col("n_docs") - F.col(f"df_{f}_{i}") + 0.5)
                        / (F.col(f"df_{f}_{i}") + 0.5))
            tfn = F.col(f"tf_{f}_{i}") / (
                F.col(f"tf_{f}_{i}")
                + K1 * (1 - B + B * F.col(f"dl_{f}") / F.col(f"avgdl_{f}")))
            parts.append(F.when(F.col(f"tf_{f}_{i}") > 0,
                                F.lit(weights[f]) * idf * tfn)
                         .otherwise(F.lit(0.0)))
        s = parts[0]
        for p in parts[1:]:
            s = s + p
        return s

    def _any(f: str):
        cond = F.col(f"tf_{f}_0") > 0
        for i in range(1, len(qterms)):
            cond = cond | (F.col(f"tf_{f}_{i}") > 0)
        return cond

    # (doc_id, field, fs) rows only for fields matching >= 1 term —
    # the same row set the posting join produced
    pairs = F.array(*[
        F.when(_any(f), F.struct(F.lit(f).alias("field"),
                                 _fs(f).alias("fs")))
        for f in fields])
    return (
        base.crossJoin(F.broadcast(g))
        .select("doc_id", F.explode(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", F.col("p.field").alias("field"),
                F.col("p.fs").alias("fs"))
    )


def q_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_match`` mode=most_fields: the per-field BM25 scores
    simply SUM — a doc matching weakly in every field beats a doc
    matching strongly in one."""
    fs = _mm_field_scores(spark, sf_dir)
    return (
        fs.groupBy("doc_id").agg(F.sum("fs").alias("s"))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_multi_match_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``multi_match`` mode=best_fields — the DEFAULT multi_match
    mode, what a Kibana query-bar multi-field search actually runs:
    dis_max over the per-field scores, score = best field +
    tie_breaker · (sum of the other fields). With tie_breaker=0 only
    the best field counts; MM_TIE_BREAKER=0.3 keeps cross-field
    corroboration as a fractional bonus. Same field-score frame as
    most_fields, one extra max aggregate — no new shuffle (max and sum
    ride the same groupBy)."""
    fs = _mm_field_scores(spark, sf_dir)
    s = F.col("mx") + MM_TIE_BREAKER * (F.col("sm") - F.col("mx"))
    return (
        fs.groupBy("doc_id")
        .agg(F.max("fs").alias("mx"), F.sum("fs").alias("sm"))
        .withColumn("s", s)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def _mm_field_index(spark: SparkSession, sf_dir: str, field: str) -> str:
    """Session-scoped PER-FIELD physical index (Lucene's actual
    multi-field layout: one inverted index per field, field-local
    df/dl/avgdl, shared doc space). The field text is reconstructed
    from the same token slices the naive twin scores
    (title = first MM_TITLE_LEN tokens) — joining tokens with spaces
    re-tokenizes to the identical stream ([a-z0-9]+ alphabet), so the
    per-field index stats equal the naive frame's field-local stats
    exactly. Docs whose field is empty still occupy the doc space
    (dl=0), matching the naive avgdl over ALL docs."""
    key = (sf_dir, _documents_fingerprint(sf_dir), f"mm_{field}")
    d = _IDX_CACHE.get(key)
    if d is None:
        import atexit
        import shutil
        import tempfile

        from .index.build import IndexConfig, build_index

        if field == "title":
            ftoks = f"slice(toks, 1, {MM_TITLE_LEN})"
        else:
            ftoks = (f"slice(toks, {MM_TITLE_LEN + 1}, "
                     f"greatest(size(toks) - {MM_TITLE_LEN}, 0))")
        d = tempfile.mkdtemp(prefix=f"fts_mm_{field}_")
        pages = (
            tokenized_documents(spark, sf_dir)
            .withColumnRenamed("tokens", "toks")
            .select(F.format_string("doc%012d", "doc_id").alias("url"),
                    F.array_join(F.expr(ftoks), " ").alias("text")))
        build_index(spark, pages, d, IndexConfig(
            shard_size=_fixture_shard_size(sf_dir), n_buckets=4,
            wave_shards=8, use_text_col=True, positions=False))
        _IDX_CACHE[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def q_multi_match_best_idx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """best_fields served the Lucene way: one physical index PER FIELD
    (field-local stats by construction), each queried once for its
    weighted BM25 scores over the FULL candidate set (dis_max needs
    every field's score for every candidate — ES scores the whole
    disjunction too; per-field the scan is the same WAND-able
    disjunctive read as any match query), then the driver combines
    max + tie_breaker · rest over |candidates| rows — bounded by the
    query terms' df, not the corpus. Same DuckDB oracle as the naive
    twin, so naive Catalyst frame, per-field index serving, and the
    SQL formula must agree hash-exactly."""
    from .index.query import topk_local_terms
    from .index.reader import IndexReader

    # build both per-field fixture indexes CONCURRENTLY (guide §2.6:
    # independent jobs overlap; each build's stage tail backfills with
    # the other's tasks) — first call per session only, the cache makes
    # later calls hit
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(lambda f: _mm_field_index(spark, sf_dir, f),
                      ("title", "body")))

    qterms = sorted(set(MM_QUERY.split()))
    scores: dict[int, dict[str, float]] = {}
    for field, w in (("title", MM_W_TITLE), ("body", MM_W_BODY)):
        reader = IndexReader(spark, _mm_field_index(spark, sf_dir, field))
        for doc, s in topk_local_terms(reader, qterms, k=1 << 30):
            scores.setdefault(doc, {})[field] = w * s
    best = sorted(
        ((d, mx + MM_TIE_BREAKER * (sm - mx))
         for d, v in scores.items()
         for mx, sm in ((max(v.values()), sum(v.values())),)),
        key=lambda t: (-t[1], t[0]))[:10]
    rows = [(int(d), round(s, 6)) for d, s in best]
    schema = "doc_id long, score double"
    return (spark.createDataFrame(rows, schema) if rows
            else spark.createDataFrame([], schema))


def _sql_mm_field_scores() -> str:
    """Shared CTE chain producing per-(doc_id, field) scores `fs`."""
    terms_in = ", ".join(f"'{t}'" for t in sorted(set(MM_QUERY.split())))
    return f"""
WITH base AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{SQL_TOKEN_PATTERN}') AS toks
  FROM documents),
fields AS (
  SELECT doc_id, 'title' AS field, toks[1:{MM_TITLE_LEN}] AS ftoks FROM base
  UNION ALL
  SELECT doc_id, 'body', toks[{MM_TITLE_LEN + 1}:] FROM base),
long AS (SELECT doc_id, field, unnest(ftoks) AS term FROM fields),
dl AS (SELECT doc_id, field, len(ftoks) AS dl FROM fields),
g AS (SELECT count(*) AS n_docs FROM base),
av AS (SELECT field, avg(dl) AS avgdl FROM dl GROUP BY 1),
tf AS (SELECT doc_id, field, term, count(*) AS tf FROM long
       WHERE term IN ({terms_in}) GROUP BY 1, 2, 3),
dfs AS (SELECT field, term, count(DISTINCT doc_id) AS df FROM long
        WHERE term IN ({terms_in}) GROUP BY 1, 2),
fscores AS (
  SELECT tf.doc_id, tf.field,
         sum( (CASE WHEN tf.field = 'title' THEN {MM_W_TITLE} ELSE {MM_W_BODY} END)
              * ln(1 + (g.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {K1} * ({round(1 - B, 2)} + {B} * dl.dl / av.avgdl)) ) AS fs
  FROM tf JOIN dfs USING (field, term) JOIN dl USING (doc_id, field)
  JOIN av USING (field) CROSS JOIN g
  GROUP BY tf.doc_id, tf.field)"""


def sql_multi_match_best() -> str:
    return f"""{_sql_mm_field_scores()}
SELECT doc_id,
       round(max(fs) + {MM_TIE_BREAKER} * (sum(fs) - max(fs)), 6) AS score
FROM fscores GROUP BY doc_id
ORDER BY max(fs) + {MM_TIE_BREAKER} * (sum(fs) - max(fs)) DESC, doc_id
LIMIT 10
"""


def sql_multi_match() -> str:
    return f"""{_sql_mm_field_scores()}
SELECT doc_id, round(sum(fs), 6) AS score
FROM fscores GROUP BY doc_id
ORDER BY sum(fs) DESC, doc_id LIMIT 10
"""


# ---------------------------------------------------------------- dashboard analogs (SURVEY §2.8)

def q_events_terms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 terms agg: count per event_type (complete groups — no limit,
    so the comparison is deterministic)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n"))


def sql_events_terms_topk() -> str:
    return "SELECT event_type, count(*) AS n FROM events GROUP BY event_type"


def q_events_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 date_histogram: hourly tumbling window with count + sum."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def sql_events_date_histogram() -> str:
    return (
        "SELECT date_trunc('hour', ts) AS hour, count(*) AS n, "
        "round(sum(value), 6) AS sum_value FROM events GROUP BY 1"
    )


def q_events_formula(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/Q5/Q6: avg, sum, and the Kibana Lens formula panel
    (avg(value)/avg(elapsed)-style derived metric) per event_type."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.sum("value") / F.count("*"), 6).alias("value_per_event"),
    )


def sql_events_formula() -> str:
    return (
        "SELECT event_type, round(avg(value), 6) AS avg_value, "
        "round(sum(value), 6) AS sum_value, "
        "round(sum(value) / count(*), 6) AS value_per_event "
        "FROM events GROUP BY event_type"
    )


def q_events_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``top_hits`` aggregation analog: per event_type, the top-3
    full event rows by value (tie: event_id asc — pinned). One window
    rank, no per-group collect."""
    from pyspark.sql import Window

    # fanned out: the rank pushdown (WindowGroupLimit Partial) sorts
    # its input BEFORE the exchange, and on the single-row-group
    # fixture scan that sort ran serially on one core (measured 1.6 s
    # at the sf1.0 replica vs 0.4 s spread)
    ev = load_wide(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", F.col("rn").cast("int").alias("rn"),
                "event_id", "user_id", F.round("value", 6).alias("value"))
    )


def sql_events_top_hits() -> str:
    return (
        "SELECT event_type, CAST(rn AS INT) AS rn, event_id, user_id, "
        "round(value, 6) AS value FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) AS rn FROM events) "
        "WHERE rn <= 3"
    )


def q_events_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cardinality`` aggregation analog, exact twin: distinct
    users and distinct active days per event_type. ES serves this from
    HLL++; so does Spark's ``approx_count_distinct`` — same partial+
    final agg plan, swapped in by an argument at 100 TB and
    pytest-bounded against this exact result (tests/test_round6.py)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.date_trunc("day", "ts")).alias("n_days"),
    )


def sql_events_cardinality() -> str:
    return (
        "SELECT event_type, count(DISTINCT user_id) AS n_users, "
        "count(DISTINCT date_trunc('day', ts)) AS n_days "
        "FROM events GROUP BY event_type"
    )


def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``percentiles`` aggregation analog: p50/p95/p99 of value per
    event_type. ES serves these from a TDigest sketch; at gate scale
    we use Spark's EXACT ``percentile`` (R-7 linear interpolation,
    same as DuckDB ``quantile_cont``) so the result is hash-gateable.
    The sketch path for 100 TB is ``percentile_approx`` — same plan
    shape (one partial+final agg), swapped in by an argument, and
    pytest-bounded against the exact result (tests/test_round6.py)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p95"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
    )


def sql_events_percentiles() -> str:
    return (
        "SELECT event_type, "
        "round(quantile_cont(value, 0.5), 6) AS p50, "
        "round(quantile_cont(value, 0.95), 6) AS p95, "
        "round(quantile_cont(value, 0.99), 6) AS p99 "
        "FROM events GROUP BY event_type"
    )


# ES composite aggregation: buckets stream in composite-key order and
# pages resume strictly AFTER a cursor key — the only ES agg that scales
# to unbounded bucket cardinality (terms aggs cap at size). The Spark
# shape is partial agg -> key-tuple filter -> TakeOrderedAndProject:
# no global sort materializes, each page is one bounded top-k.
COMPOSITE_AFTER = ("error", 75)  # pinned page-2 cursor
COMPOSITE_SIZE = 20


def q_events_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``composite`` aggregation analog, page 2: buckets keyed on
    (event_type, user_id) with count + sum(value) metrics, resuming
    strictly after the pinned ``after`` cursor, size 20. Lexicographic
    cursor predicate + orderBy + limit — Catalyst plans the page as
    TakeOrderedAndProject over the partial agg, never a full sort."""
    from .operators.analytics import composite_agg

    ev = load(spark, sf_dir, "events")
    return composite_agg(
        ev, ["event_type", "user_id"],
        [F.count(F.lit(1)).alias("doc_count"),
         F.round(F.sum("value"), 6).alias("sum_value")],
        size=COMPOSITE_SIZE, after=COMPOSITE_AFTER,
    )


def sql_events_composite() -> str:
    at, au = COMPOSITE_AFTER
    return f"""
SELECT event_type, user_id, count(*) AS doc_count,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY event_type, user_id
HAVING (event_type > '{at}') OR (event_type = '{at}' AND user_id > {au})
ORDER BY event_type, user_id
LIMIT {COMPOSITE_SIZE}
"""


def q_events_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``filters`` aggregation analog: named buckets from arbitrary
    predicates, each with doc_count + sum(value), computed in ONE scan
    (conditional aggregation — sum(when(...))) and unpivoted to long
    form. ES evaluates every filter per doc in one pass; so does this
    plan: one partial+final agg row, then a driver-free stack."""
    ev = load(spark, sf_dir, "events")
    buckets = {
        "errors": F.col("event_type") == "error",
        "big_purchases": (F.col("event_type") == "purchase")
        & (F.col("value") > 200),
        "weekend": F.dayofweek("ts").isin(1, 7),
    }
    aggs = []
    for name, pred in buckets.items():
        aggs.append(F.count(F.when(pred, 1)).alias(f"c_{name}"))
        aggs.append(
            F.round(F.coalesce(F.sum(F.when(pred, F.col("value"))),
                               F.lit(0.0)), 6).alias(f"s_{name}"))
    wide = ev.agg(*aggs)
    stack = ", ".join(f"'{n}', c_{n}, s_{n}" for n in buckets)
    return wide.selectExpr(
        f"stack({len(buckets)}, {stack}) AS (bucket, doc_count, sum_value)"
    )


def sql_events_filters_agg() -> str:
    return """
SELECT 'errors' AS bucket, count(*) AS doc_count,
       round(coalesce(sum(value), 0), 6) AS sum_value
FROM events WHERE event_type = 'error'
UNION ALL
SELECT 'big_purchases', count(*), round(coalesce(sum(value), 0), 6)
FROM events WHERE event_type = 'purchase' AND value > 200
UNION ALL
SELECT 'weekend', count(*), round(coalesce(sum(value), 0), 6)
FROM events WHERE dayofweek(ts) IN (0, 6)
"""


HIST_INTERVAL = 50.0


def q_events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES numeric ``histogram`` aggregation (interval=50 on value)
    with ``extended_stats`` metrics per bucket: doc_count, min, max,
    avg, sum, population std — exactly what ES returns (extended_stats
    std_deviation is population, not sample). One partial+final agg;
    the bucket key is computed in the scan projection."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.floor(F.col("value") / HIST_INTERVAL)
             * HIST_INTERVAL).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.min("value"), 6).alias("min_v"),
            F.round(F.max("value"), 6).alias("max_v"),
            F.round(F.avg("value"), 6).alias("avg_v"),
            F.round(F.sum("value"), 6).alias("sum_v"),
            F.round(F.stddev_pop("value"), 6).alias("std_v"),
        )
    )


def sql_events_histogram() -> str:
    return f"""
SELECT floor(value / {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
       count(*) AS doc_count,
       round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
       round(avg(value), 6) AS avg_v, round(sum(value), 6) AS sum_v,
       round(stddev_pop(value), 6) AS std_v
FROM events GROUP BY 1
"""


# ES rare_terms: the long-tail complement of the terms agg — buckets
# whose doc_count is AT MOST a ceiling, doc_count ascending. ES bounds
# memory with a CuckooFilter and accepts false positives; the Spark
# analog is exact (a filter above the partial+final count aggregate —
# the aggregate is the same corpus-wide work the terms agg already
# pays, and the rarity filter prunes AFTER the merge, which is the
# only place an exact answer can exist).
RARE_MAX_DOC_COUNT = 60


def q_events_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rare_terms`` aggregation on user_id: every user with at
    most RARE_MAX_DOC_COUNT events (exact; ES's CuckooFilter variant
    trades exactness for bounded coordinator memory — Spark's
    partial+final aggregate already bounds memory, so exactness is
    free). doc_count ties are real, so the gate output is the full
    unordered bucket set (the driver compare sorts)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") <= RARE_MAX_DOC_COUNT)
    )


def sql_events_rare_terms() -> str:
    return (
        "SELECT user_id, count(*) AS doc_count FROM events "
        f"GROUP BY 1 HAVING count(*) <= {RARE_MAX_DOC_COUNT}"
    )


# ES date_range aggregation: named half-open [from, to) buckets —
# unlike date_histogram the buckets are user-defined and may be
# irregular; events outside every range are dropped. One
# conditional-projection scan + the usual partial+final aggregate.
DATE_RANGES = [
    ("early", None, "2024-01-10 00:00:00"),
    ("mid", "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
    ("late", "2024-01-20 00:00:00", None),
]


def q_events_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_range`` aggregation: three named half-open buckets
    (open-ended first/last, like ES's missing from/to) with doc_count
    + sum(value) metrics. The bucket label is a CASE projection in the
    scan — one pass, one aggregate exchange carrying 3 rows per task."""
    ev = load(spark, sf_dir, "events")
    label = F.lit(None).cast("string")
    for name, lo, hi in reversed(DATE_RANGES):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("ts") >= F.to_timestamp_ntz(F.lit(lo)))
        if hi is not None:
            cond = cond & (F.col("ts") < F.to_timestamp_ntz(F.lit(hi)))
        label = F.when(cond, F.lit(name)).otherwise(label)
    return (
        ev.select(label.alias("range_label"), "value")
        .groupBy("range_label")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def sql_events_date_range() -> str:
    cases = []
    for name, lo, hi in DATE_RANGES:
        conds = []
        if lo is not None:
            conds.append(f"ts >= TIMESTAMP '{lo}'")
        if hi is not None:
            conds.append(f"ts < TIMESTAMP '{hi}'")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{name}'")
    return (
        "SELECT CASE " + " ".join(cases) + " END AS range_label, "
        "count(*) AS doc_count, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1"
    )


# -- ES pipeline aggregations (derivative / cumulative_sum / moving_fn) --
#
# In ES these are parent pipeline aggs attached to a date_histogram;
# the coordinator computes them over the REDUCED bucket list after the
# shards have merged partials.  The Spark analog mirrors that shape
# exactly: the only corpus-wide work is the partial+final hash
# aggregate; the pipeline stage is a window over the aggregated bucket
# table, which is bucket-bounded (days in the time range — 365 rows/yr
# even at 100 TB), never corpus-bounded, so the unpartitioned ordered
# window is a constant-size post-aggregation step by construction.


def q_events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations over a daily ``date_histogram``
    (Kibana TSVB / Lens time-series panels; the reference dashboard's
    NDJSON panels carry exactly these series — reference
    `Kibana-9.0.3-Dashboard-LogSentinelAI.ndjson`): per-day doc count
    + sum(value), then ``derivative`` (delta vs previous bucket, null
    for the first — ES omits it), ``cumulative_sum``, and a trailing
    3-bucket ``moving_fn`` unweighted average (window=3 including the
    current bucket, i.e. ES ``shift=1`` semantics)."""
    ev = load(spark, sf_dir, "events")
    day = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    w = Window.orderBy("day")
    return day.select(
        "day",
        "n",
        "sum_value",
        F.round(F.col("sum_value") - F.lag("sum_value").over(w), 6).alias("deriv"),
        F.round(
            F.sum("sum_value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("cum_sum"),
        F.round(F.avg("n").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg_n"),
    )


def sql_events_pipeline() -> str:
    return """
WITH day AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1
)
SELECT day, n, sum_value,
  round(sum_value - lag(sum_value) OVER (ORDER BY day), 6) AS deriv,
  round(sum(sum_value) OVER (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cum_sum,
  round(avg(n) OVER (ORDER BY day
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg_n
FROM day
"""


# -- ES function_score decay (gauss) -----------------------------------
#
# score = value * exp(ln(decay) * (d / scale)^2),
# d = max(0, |ts - origin| - offset) — ES's gauss decay with the
# sigma^2 substitution already folded in (ES defines
# sigma^2 = -scale^2 / (2 ln decay); exp(-d^2 / (2 sigma^2)) ==
# exp(ln(decay) * d^2 / scale^2)).  Pinned origin/scale/offset/decay;
# time arithmetic is exact int64 microseconds on BOTH engines, and the
# distance is a DIFFERENCE of two values parsed under the same clock
# (the tz-cancellation discipline of analytics.q_user_sessions), so
# there is no session-tz dependence.
DECAY_ORIGIN = "2024-01-15 00:00:00"
DECAY_SCALE_S = 604800.0  # 7 days
DECAY_OFFSET_S = 86400.0  # 1 day
DECAY_LN = -0.6931471805599453  # ln(0.5)


def q_function_score_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``function_score`` with a ``gauss`` date decay multiplied
    into a ``field_value_factor`` (the canonical "recent events score
    higher" ranking; ES `decay function` docs): top-20 events by
    value x gauss(ts), origin pinned mid-range, scale 7 d, offset 1 d,
    decay 0.5.  Plan shape: pure scan projection (unix_micros + exp
    are codegen'd) + TakeOrderedAndProject — no shuffle beyond top-k;
    ordering ties are broken on event_id AFTER rounding so both
    engines sort the same key."""
    ev = load(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    origin_us = F.unix_micros(F.to_timestamp(F.lit(DECAY_ORIGIN)))
    d = F.greatest(
        F.lit(0.0),
        F.abs(ts_us - origin_us) / 1e6 - F.lit(DECAY_OFFSET_S),
    )
    gauss = F.exp(F.lit(DECAY_LN) * F.pow(d / F.lit(DECAY_SCALE_S), F.lit(2.0)))
    scored = ev.select(
        "event_id", F.round(F.col("value") * gauss, 6).alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("event_id")).limit(20)


def sql_function_score_decay() -> str:
    return f"""
WITH scored AS (
  SELECT event_id,
         round(value * exp({DECAY_LN} * pow(
           greatest(0.0, abs(epoch_us(ts)
                    - epoch_us(TIMESTAMP '{DECAY_ORIGIN}')) / 1e6
                    - {DECAY_OFFSET_S}) / {DECAY_SCALE_S}, 2.0)), 6) AS score
  FROM events
)
SELECT event_id, score FROM scored
ORDER BY score DESC, event_id LIMIT 20
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 category breakdown as a true pivot: daily event counts, one
    column per event_type (reference analog: the Kibana category
    breakdown panels, `analyzers/general_log.py:51-84` event_by_type).
    Pivot values are pinned so the output schema is static — at scale
    an unpinned pivot needs an extra distinct-values job."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


def sql_events_pivot() -> str:
    cols = ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    # DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP
    return f"SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, {cols} FROM events GROUP BY 1"


# ES aggs subtree for the generic bucket-tree composer: a three-level
# Kibana panel (terms -> date_histogram -> metrics), compiled by
# operators/aggtree.agg_tree into ONE rollup pass
AGG_TREE_SPEC = {
    "by_type": {"terms": {"field": "event_type"}, "aggs": {
        "by_day": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day"},
                   "aggs": {"sum_v": {"sum": {"field": "value"}},
                            "avg_v": {"avg": {"field": "value"}}}}}},
}


def q_events_agg_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic nested-agg composer (a three-level Kibana panel): the
    whole bucket path runs as ONE rollup aggregate — every prefix
    level's doc_count + metrics, grand total included, in a single
    shuffle (operators/aggtree.py). gid is the grouping bitmask that
    separates a rolled-up level from a genuine NULL key."""
    from .operators.aggtree import agg_tree

    out = agg_tree(load(spark, sf_dir, "events"), AGG_TREE_SPEC)
    return out.select(
        "by_type", F.col("by_day").cast("date").alias("by_day"),
        F.col("gid").cast("long").alias("gid"), "doc_count",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("avg_v", 6).alias("avg_v"))


def sql_events_agg_tree() -> str:
    return """
SELECT event_type AS by_type,
       CAST(date_trunc('day', ts) AS DATE) AS by_day,
       CAST(GROUPING(event_type, date_trunc('day', ts)) AS BIGINT) AS gid,
       count(*) AS doc_count,
       round(sum(value), 6) AS sum_v,
       round(avg(value), 6) AS avg_v
FROM events
GROUP BY ROLLUP(event_type, date_trunc('day', ts))
"""


AGG_FOREST_SPEC = {
    "by_type": {"terms": {"field": "event_type"}, "aggs": {
        "by_day": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day"},
                   "aggs": {"sum_v": {"sum": {"field": "value"}}}}}},
    "by_ubkt": {"histogram": {"field": "user_id", "interval": 1000},
                "aggs": {"max_v": {"max": {"field": "value"}}}},
}


def q_events_agg_forest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIBLING bucket aggs (an ES dashboard panel pair: a nested
    terms -> date_histogram chain NEXT TO a user-id histogram): the
    whole tree — four grouping sets — still runs as ONE grouping-sets
    aggregate (operators/aggtree.py), a single Expand + shuffle; a
    per-node translation would scan the corpus once per panel. gid is
    the bitmask over (by_type, by_day, by_ubkt) pre-order."""
    from .operators.aggtree import agg_tree

    out = agg_tree(load(spark, sf_dir, "events"), AGG_FOREST_SPEC)
    return out.select(
        "by_type", F.col("by_day").cast("date").alias("by_day"),
        F.col("by_ubkt").cast("long").alias("by_ubkt"),
        F.col("gid").cast("long").alias("gid"), "doc_count",
        F.round("sum_v", 6).alias("sum_v"),
        F.round("max_v", 6).alias("max_v"))


def sql_events_agg_forest() -> str:
    return """
SELECT event_type AS by_type,
       CAST(date_trunc('day', ts) AS DATE) AS by_day,
       CAST(floor(user_id / 1000) * 1000 AS BIGINT) AS by_ubkt,
       CAST(GROUPING(event_type, date_trunc('day', ts),
                     floor(user_id / 1000) * 1000) AS BIGINT) AS gid,
       count(*) AS doc_count,
       round(sum(value), 6) AS sum_v,
       round(max(value), 6) AS max_v
FROM events
GROUP BY GROUPING SETS ((), (event_type),
                        (event_type, date_trunc('day', ts)),
                        (floor(user_id / 1000) * 1000))
"""


def q_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 JSON parse: `from_json(props, schema)` materialization —
    reference analog `core/commons.py:163,241` (json.loads + schema
    validation of every LLM response). Declared-schema parse keeps the
    whole expression in codegen; malformed rows yield NULL k (grouped,
    not dropped), mirroring the reference's validate-then-keep step."""
    ev = load_wide(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k BIGINT").getField("k").alias("k"), "value"
    )
    return parsed.groupBy("k").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


def sql_events_props() -> str:
    return (
        "SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, "
        "count(*) AS n, round(sum(value), 6) AS sum_value "
        "FROM events GROUP BY 1"
    )


from .operators import analytics as _an  # noqa: E402
from .operators import dedup as _dd  # noqa: E402
from .operators import geo as _geo  # noqa: E402
from .operators import multimodal as _mm  # noqa: E402
from .operators import similarity as _sim  # noqa: E402
from .operators import textstats as _ts  # noqa: E402

"""Ordering contract: the driver's CORRECTNESS harness gates the FIRST
50 entries of this dict. Rounds 1-6 accumulated green driver rows for
50 keys (CORRECTNESS_r06.json); the 40 keys that had no r6 row — plus
everything NEW this round — are placed FIRST so round 7's driver window
covers exactly the so-far-unverified surface. The r6-green 50 follow,
re-verified by `scripts/check_oracle.py` full sweeps (committed log)."""
QUERIES = {
    # --- window rotation (round 8, VERDICT r7 item 9): the 47 keys
    # below were verified only by the local check_oracle.py sweep in
    # round 7 (the driver's 50-entry CORRECTNESS_r07 window covered
    # the OTHER half) — ordered first so the driver's round-8 window
    # gives every query a driver row in r07 ∪ r08 ---
    # index statistics + BM25 (SURVEY §2.4, §2.8 Q8)
    "term_tf": q_term_tf,
    "term_df": q_term_df,
    "doc_stats": q_doc_stats,
    "global_stats": q_global_stats,
    "bm25_topk": q_bm25_topk,
    "bm25_page2": q_bm25_page2,
    "phrase_topk": q_phrase_topk,
    "phrase_topk_idx": q_phrase_topk_idx,
    "span_near": q_span_near,
    "bool_topk": q_bool_topk,
    "bool_topk_idx": q_bool_topk_idx,
    "search_agg": q_search_agg,
    "prefix_topk": q_prefix_topk,
    "prefix_topk_idx": q_prefix_topk_idx,
    "wildcard_topk": q_wildcard_topk,
    "wildcard_topk_idx": q_wildcard_topk_idx,
    "fuzzy_topk": q_fuzzy_topk,
    "fuzzy_topk_idx": q_fuzzy_topk_idx,
    "highlight": q_highlight,
    "highlight_idx": q_highlight_idx,
    "more_like_this": q_more_like_this,
    "more_like_this_idx": q_more_like_this_idx,
    "rescore_topk": q_rescore_topk,
    "rescore_topk_idx": q_rescore_topk_idx,
    "function_score": q_function_score,
    "function_score_idx": q_function_score_idx,
    "collapse": q_collapse,
    "msearch": q_msearch,
    "msearch_idx": q_msearch_idx,
    "events_composite": q_events_composite,
    "events_filters_agg": q_events_filters_agg,
    "events_histogram": q_events_histogram,
    "events_pipeline": q_events_pipeline,
    "events_rare_terms": q_events_rare_terms,
    "events_date_range": q_events_date_range,
    "function_score_decay": q_function_score_decay,
    "phrase_prefix": q_phrase_prefix,
    "phrase_prefix_idx": q_phrase_prefix_idx,
    "significant_terms": q_significant_terms,
    "significant_terms_idx": q_significant_terms_idx,
    # dashboard analogs (SURVEY §2.8 Q1-Q6)
    "events_terms": q_events_terms_topk,
    "events_date_histogram": q_events_date_histogram,
    "events_formula": q_events_formula,
    "events_percentiles": q_events_percentiles,
    "events_top_hits": q_events_top_hits,
    "events_cardinality": q_events_cardinality,
    "events_props": q_events_props,
    # --- driver-green in CORRECTNESS_r07.json (rechecked locally
    # this round: full 97-key sweep green) ---
    # --- never driver-checked before round 6's local sweep (8) ---
    "geo_distance": _geo.q_geo_distance,
    "geo_bounds": _geo.q_geo_bounds,
    "quality_classify": _ts.q_quality_classify,
    "url_dedup": _ts.q_url_dedup,
    "pack_sequences": _ts.q_pack_sequences,
    "split_assign": _ts.q_split_assign,
    "stratified_sample": _ts.q_stratified_sample,
    "perplexity": _ts.q_perplexity,
    # --- driver-green in r1-r5 but absent from CORRECTNESS_r06 (32) ---
    "events_pivot": q_events_pivot,
    # geo enrichment + map aggregation (SURVEY §2 J1/Q7/F4/F5)
    "geo_enrich": _geo.q_geo_enrich,
    "geo_grid": _geo.q_geo_grid,
    # severity / window / session analytics (SURVEY §2.2, §2.5)
    "severity_rollup": _an.q_severity_rollup,
    "top_event_per_user": _an.q_top_event_per_user,
    "user_sessions": _an.q_user_sessions,
    "alert_feed": _an.q_alert_feed,
    # dedup suite
    "dedup_exact": _dd.q_dedup_exact,
    "dedup_clusters": _dd.q_dedup_clusters,
    "dedup_jaccard": _dd.q_dedup_jaccard,
    "dedup_minhash_lsh": _dd.q_dedup_minhash_lsh,
    "simhash": _dd.q_simhash,
    # similarity search
    "ann_brute": _sim.q_ann_brute,
    "ann_lsh": _sim.q_ann_lsh,
    "ann_ivf": _sim.q_ann_ivf,
    "ann_pq_adc": _sim.q_ann_pq_adc,
    "ann_ivfpq": _sim.q_ann_ivfpq,
    "embedding_neardup": _sim.q_embedding_neardup,
    # text analysis
    "lang_id": _ts.q_lang_id,
    "quality_score": _ts.q_quality_score,
    "corpus_filter": _ts.q_corpus_filter,
    "line_dedup": _ts.q_line_dedup,
    "repetition_signals": _ts.q_repetition_signals,
    "pii_scrub": _ts.q_pii_scrub,
    "span_dedup": _ts.q_span_dedup,
    "decontaminate": _ts.q_decontaminate,
    "domain_stats": _ts.q_domain_stats,
    "token_count": _ts.q_token_count,
    "doc_fingerprint": _ts.q_doc_fingerprint,
    # multimodal plumbing
    "multimodal_meta": _mm.q_multimodal_meta,
    "multimodal_resize": _mm.q_multimodal_resize,
    "frame_sample": _mm.q_frame_sample,
    # --- NEW in round 7 (inserted here as built) ---
    "multi_match_best": q_multi_match_best,
    "events_agg_tree": q_events_agg_tree,
    "events_agg_forest": q_events_agg_forest,
    "analyzed_topk": q_analyzed_topk,
    "multi_match_best_idx": q_multi_match_best_idx,
    "search_body": q_search_body,
    "search_body_idx": q_search_body_idx,
    # --- r6-checked keys touched this round (re-gate in the window) ---
    "bm25_page2_idx": q_bm25_page2_idx,
    "search_agg_idx": q_search_agg_idx,
    "multi_match": q_multi_match,
}

ORACLES = {
    "term_tf": sql_term_tf(),
    "term_df": sql_term_df(),
    "doc_stats": sql_doc_stats(),
    "global_stats": sql_global_stats(),
    "bm25_topk": sql_bm25_topk(),
    "bm25_page2": sql_bm25_page2(),
    # cursor-paginated index path, same oracle — third method
    "bm25_page2_idx": sql_bm25_page2(),
    "phrase_topk": sql_phrase_topk(),
    # the positional-index path must reproduce the naive recount
    # exactly — same oracle, independent third method
    "phrase_topk_idx": sql_phrase_topk(),
    "span_near": sql_span_near(),
    "bool_topk": sql_bool_topk(),
    # index-served path must reproduce the naive bool result exactly —
    # same oracle, independent third method
    "bool_topk_idx": sql_bool_topk(),
    "search_agg": sql_search_agg(),
    # index-served match set, same oracle — third independent method
    "search_agg_idx": sql_search_agg(),
    "prefix_topk": sql_prefix_topk(),
    "prefix_topk_idx": sql_prefix_topk(),
    "wildcard_topk": sql_wildcard_topk(),
    "wildcard_topk_idx": sql_wildcard_topk(),
    "fuzzy_topk": sql_fuzzy_topk(),
    "fuzzy_topk_idx": sql_fuzzy_topk(),
    "highlight": sql_highlight(),
    # index-ranked + bounded corpus lookup, same oracle — third method
    "highlight_idx": sql_highlight(),
    "more_like_this": sql_more_like_this(),
    # seed lookup + df probe + bucket-pruned scorer, same oracle
    "more_like_this_idx": sql_more_like_this(),
    "rescore_topk": sql_rescore_topk(),
    # windowed serving call + positional candidate scan, same oracle
    "rescore_topk_idx": sql_rescore_topk(),
    "function_score": sql_function_score(),
    # boost applied inside the shard accumulator, same oracle
    "function_score_idx": sql_function_score(),
    "collapse": sql_collapse(),
    "msearch": sql_msearch(),
    # batched union-of-terms read, shared decode — same oracle
    "msearch_idx": sql_msearch(),
    "events_composite": sql_events_composite(),
    "events_filters_agg": sql_events_filters_agg(),
    "events_histogram": sql_events_histogram(),
    "events_pipeline": sql_events_pipeline(),
    "events_rare_terms": sql_events_rare_terms(),
    "events_date_range": sql_events_date_range(),
    "function_score_decay": sql_function_score_decay(),
    "phrase_prefix": sql_phrase_prefix(),
    "phrase_prefix_idx": sql_phrase_prefix(),
    "significant_terms": sql_significant_terms(),
    "significant_terms_idx": sql_significant_terms(),
    "multi_match": sql_multi_match(),
    "multi_match_best": sql_multi_match_best(),
    "events_agg_tree": sql_events_agg_tree(),
    "events_agg_forest": sql_events_agg_forest(),
    "analyzed_topk": sql_analyzed_topk(),
    "multi_match_best_idx": sql_multi_match_best(),
    "search_body": sql_search_body(),
    # compiler-served path, same oracle — third independent method
    "search_body_idx": sql_search_body(),
    "events_terms": sql_events_terms_topk(),
    "events_date_histogram": sql_events_date_histogram(),
    "events_formula": sql_events_formula(),
    "events_percentiles": sql_events_percentiles(),
    "events_top_hits": sql_events_top_hits(),
    "events_cardinality": sql_events_cardinality(),
    "events_props": sql_events_props(),
    "events_pivot": sql_events_pivot(),
    "geo_enrich": _geo.SQL_GEO_ENRICH,
    "geo_grid": _geo.SQL_GEO_GRID,
    "geo_distance": _geo.SQL_GEO_DISTANCE,
    "geo_bounds": _geo.SQL_GEO_BOUNDS,
    "severity_rollup": _an.SQL_SEVERITY_ROLLUP,
    "top_event_per_user": _an.SQL_TOP_EVENT_PER_USER,
    "user_sessions": _an.SQL_USER_SESSIONS,
    "alert_feed": _an.SQL_ALERT_FEED,
    "dedup_exact": _dd.SQL_DEDUP_EXACT,
    "dedup_clusters": _dd.SQL_DEDUP_CLUSTERS,
    "dedup_jaccard": _dd.SQL_DEDUP_JACCARD,
    "dedup_minhash_lsh": _dd.SQL_DEDUP_MINHASH,
    "simhash": _dd.SQL_SIMHASH,
    "ann_brute": _sim.SQL_ANN_BRUTE,
    # fully deterministic (fixed seeded hyperplane literals on both
    # sides), so the LSH path is hash-gated like everything else
    "ann_lsh": _sim.SQL_ANN_LSH,
    "ann_ivf": _sim.SQL_ANN_IVF,
    "ann_pq_adc": _sim.SQL_ANN_PQ_ADC,
    "ann_ivfpq": _sim.SQL_ANN_IVFPQ,
    "embedding_neardup": _sim.SQL_EMBEDDING_NEARDUP,
    "lang_id": _ts.SQL_LANG_ID,
    "quality_score": _ts.SQL_QUALITY,
    "quality_classify": _ts.SQL_QUALITY_CLASSIFY,
    "corpus_filter": _ts.SQL_CORPUS_FILTER,
    "line_dedup": _ts.SQL_LINE_DEDUP,
    "url_dedup": _ts.SQL_URL_DEDUP,
    "pack_sequences": _ts.SQL_PACK_SEQUENCES,
    "split_assign": _ts.SQL_SPLIT_ASSIGN,
    "stratified_sample": _ts.SQL_STRATIFIED_SAMPLE,
    "perplexity": _ts.SQL_PERPLEXITY,
    "repetition_signals": _ts.SQL_REPETITION,
    "pii_scrub": _ts.SQL_PII_SCRUB,
    "span_dedup": _ts.SQL_SPAN_DEDUP,
    "decontaminate": _ts.SQL_DECONTAMINATE,
    "domain_stats": _ts.SQL_DOMAIN_STATS,
    "token_count": _ts.SQL_TOKEN_COUNT,
    "doc_fingerprint": _ts.SQL_FINGERPRINT,
    "multimodal_meta": _mm.SQL_MULTIMODAL_META,
    "multimodal_resize": _mm.SQL_MULTIMODAL_RESIZE,
    "frame_sample": _mm.SQL_FRAME_SAMPLE,
}
