"""Deduplication operators for a large-scale training-data pipeline:
exact (hash groupBy), character-shingle Jaccard, MinHash+LSH, SimHash.

Each operator has a Spark implementation and a DuckDB oracle built on
the SAME deterministic constructions (md5-derived 32-bit minhash
inputs, fixed permutation constants), so results hash-match at sf0.01.
The Jaccard set representation is int64 xxhash64 on the Spark side
only (see _shingle_sets — value-identical to string sets absent 64-bit
collisions; the oracle stays on raw strings).

The driver `documents` table has no real duplicates, so operators run
over an AUGMENTED pool with injected dups, constructed identically in
both engines: every doc_id % 7 == 0 gains an exact copy (+200000),
every doc_id % 5 == 0 a near-copy with the first 10 chars dropped
(+100000). This makes the checks non-trivial (non-empty outputs).

Scale notes: exact dedup is a pure groupBy on a hash (map-side
combine); shingle-join pairs are generated only for docs sharing a
shingle (at 100 TB: band/bucket first — that is exactly MinHash LSH,
also here); all joins are equi-joins on short keys, AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.io import fanout_small_scan

# 8 minhash permutations (a, b) over a 32-bit md5-derived hash, mod p.
MINHASH_PERMS: list[tuple[int, int, int]] = [
    (1, 999983, 12345),
    (2, 999979, 54321),
    (3, 999961, 11111),
    (4, 999959, 22222),
    (5, 999953, 33333),
    (6, 999931, 44444),
    (7, 999917, 55555),
    (8, 999907, 66666),
]
MINHASH_P = 1_000_000_007
SHINGLE_LEN = 16
JACCARD_TAU = 0.5
N_BANDS = 4  # 8 perms / 2 rows per band


def _load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load_docs(spark, sf_dir).select("doc_id", F.lower("text").alias("text"))
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.expr("substr(text, 11)").alias("text")
    )
    return d.unionAll(exact).unionAll(near)


AUG_SQL = """
docs_aug AS (
  SELECT doc_id, lower(text) AS text FROM documents
  UNION ALL
  SELECT doc_id + 200000, lower(text) FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 100000, substr(lower(text), 11) FROM documents WHERE doc_id % 5 = 0
)"""

# DuckDB 1.0 forbids lateral column refs in generate_series -> fixed
# range (covers the longest document) + WHERE filter.
SHINGLE_SQL = f"""
shingle AS (
  SELECT DISTINCT doc_id, substr(text, i, {SHINGLE_LEN}) AS sh
  FROM docs_aug, generate_series(1, 10000) g(i)
  WHERE i <= length(text) - {SHINGLE_LEN - 1}
),
scount AS (SELECT doc_id, count(*) AS n_sh FROM shingle GROUP BY doc_id)"""


SHINGLE_PARTITIONS = 64  # spread the (narrow-input, wide-output) shingle
# explode: a small parquet file scans as 1-3 splits, which would serialize
# the ~300x row blowup; at 100 TB inputs arrive pre-split and this
# repartition is a cheap narrow-row shuffle of (doc_id, text)


_SHINGLE_ARRAY = (
    f"transform(sequence(1, length(text) - {SHINGLE_LEN - 1}),"
    f" i -> substr(text, i, {SHINGLE_LEN}))"
)


def _shingles_all(df: DataFrame) -> DataFrame:
    """ALL char-16 shingles per doc (with duplicates) — built as a
    per-row array then exploded, so the ~300x row blowup never carries
    the text column. No post-explode shuffle. The MinHash signature
    path consumes this directly: min() is insensitive to duplicate
    shingles, so no distinct() shuffle is needed there."""
    return (
        df.filter(F.length("text") >= SHINGLE_LEN)
        .repartition(SHINGLE_PARTITIONS)
        .select("doc_id", F.explode(F.expr(_SHINGLE_ARRAY)).alias("sh"))
    )


_SHINGLE_HASH_ARRAY = (
    f"transform(sequence(1, length(text) - {SHINGLE_LEN - 1}),"
    f" i -> xxhash64(substr(text, i, {SHINGLE_LEN})))"
)


def _shingle_sets(df: DataFrame) -> DataFrame:
    """(doc_id, shs sorted array of DISTINCT xxhash64 shingle hashes) —
    a pure per-row expression (transform -> array_distinct ->
    array_sort): ZERO shuffle. Set construction is doc-local work;
    nothing about it needs data motion at any scale.

    Shingles are represented as int64 hashes from here on: every
    downstream pass (corpus-frequency groupBy, prefix join,
    array_intersect verify) runs on fixed-width longs instead of
    16-char strings — measured ~2x cheaper end-to-end. Jaccard over
    distinct hashes equals Jaccard over distinct shingles unless two
    DISTINCT shingles of one comparison collide in 64 bits: for ~10^4
    shingles per doc that is ~10^8/2^64 ≈ 5e-12 per pair — far below
    the oracle's own float rounding; the DuckDB oracle stays on raw
    strings, so any collision would surface as a gate mismatch rather
    than pass silently."""
    return (
        df.filter(F.length("text") >= SHINGLE_LEN)
        .repartition(SHINGLE_PARTITIONS)
        .select(
            "doc_id",
            F.expr(f"array_sort(array_distinct({_SHINGLE_HASH_ARRAY}))").alias("shs"),
        )
    )


# ------------------------------------------------------------------ exact

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: groups of byte-identical texts (md5 key), keeper =
    min doc_id. Reference analog: order-preserving multi-file dedup
    (`core/commons.py:79-104`)."""
    d = augmented_docs(spark, sf_dir)
    return (
        d.groupBy(F.md5(F.encode("text", "utf-8")).alias("text_md5"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


SQL_DEDUP_EXACT = f"""
WITH {AUG_SQL}
SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keeper_doc_id
FROM docs_aug GROUP BY 1 HAVING count(*) > 1
"""


# ------------------------------------------------------------------ shingle jaccard

def _pair_jaccard(cands: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact Jaccard for an EXPLICIT candidate-pair set (doc_a, doc_b)
    over per-doc distinct-shingle arrays ``sets`` (doc_id, shs).

    ``sets`` is first semi-joined to the candidate docs (only docs that
    appear in a pair matter), then BROADCAST into two pair-preserving
    joins; the intersection is ``size(array_intersect(...))`` computed
    IN-STAGE (O(|A|+|B|) hash probe per pair) — the big pair side never
    shuffles its array payloads, there is no shingle self-join, and the
    work is linear in candidates: immune to hot-shingle quadratic
    blowup. At scales where the candidate-doc sets outgrow a broadcast,
    drop the hint and AQE plans a shuffled hash join — the semantics
    and the pair-linear bound are unchanged."""
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    bounded = sets.join(cand_docs, "doc_id", "semi")
    sa = bounded.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa"))
    sb = bounded.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    return (
        cands.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("sa") + F.size("sb") - inter), 6),
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup pairs by exact character-shingle Jaccard >= tau over a
    (doc_id, text) DataFrame, via PREFIX FILTERING (Bayardo, Ma &
    Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007): under
    any consistent global shingle order, a pair with
    |A∩B| >= ceil(tau*|A|) must share an element in the first
    |A| - ceil(tau*|A|) + 1 shingles of BOTH docs (the smallest common
    element lands in both prefixes). Ordering by ascending corpus
    frequency puts rare shingles in the prefix, so the pair-generating
    join never touches hot shingles — the exact result of the naive
    all-pairs join (the oracle) at a fraction of the join volume, and
    scale-safe where all-pairs is quadratic."""
    sets = _shingle_sets(docs).cache()
    pairs = sets.select(
        "doc_id", F.explode("shs").alias("sh"), F.size("shs").alias("n_sh")
    )
    w = Window.partitionBy("doc_id").orderBy(F.asc("df_sh"), F.asc("sh"))
    # cached: the self-join below references prefix twice. df_sh comes
    # from a COUNT WINDOW over sh rather than groupBy+join back — the
    # exploded rows then cross the wire once per keying (sh, then
    # doc_id) instead of paying an extra join-side shuffle of the same
    # 19M rows (measured 6.5 -> 5.5 s for the prefix materialization at
    # the sf1.0 replica).
    # df_sh = 1 rows are dropped AFTER ranking: a corpus-unique shingle
    # can never match another doc, but it still occupies prefix slots
    # (the lemma holds under any total order regardless of what sorts
    # before the smallest common element) — so it prunes join input
    # without costing exactness.
    prefix = (
        pairs.withColumn("df_sh", F.count("*").over(Window.partitionBy("sh")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("n_sh") - F.ceil(F.lit(JACCARD_TAU) * F.col("n_sh")) + 1)
        .filter(F.col("df_sh") >= 2)
        .select("doc_id", "sh", "n_sh", "rn")
    ).cache()
    # size filtering (Arasu et al., VLDB 2006): J(A,B) <= min/max size
    # ratio, so pairs with |A| < tau*|B| can be rejected in the join.
    # Positional filter (PPJoin, Xiao et al., WWW 2008): a match at
    # prefix positions (rn_a, rn_b) can contribute at most
    # 1 + min(|A| - rn_a, |B| - rn_b) common elements, while
    # J >= tau needs |A∩B| >= ceil(tau/(1+tau) * (|A|+|B|)); any pair
    # with J >= tau shares SOME prefix element whose bound passes, so
    # dropping per-match rows that cannot reach alpha is exact — it
    # cut the verify set 14.0M -> 2.47M pairs at sf1.0 (same 23,229
    # result rows; verify stage 40.7 s -> 12.0 s).
    alpha = F.ceil(F.lit(JACCARD_TAU / (1.0 + JACCARD_TAU))
                   * (F.col("a.n_sh") + F.col("b.n_sh")))
    ubound = 1 + F.least(F.col("a.n_sh") - F.col("a.rn"),
                         F.col("b.n_sh") - F.col("b.rn"))
    # AGGREGATED positional bound (PPJoin's running-overlap filter in
    # groupBy form): common prefix elements appear in the SAME relative
    # order in both prefixes (one global order), so for the LAST common
    # prefix element at positions (max rn_a, max rn_b), every common
    # element not already counted sorts after it in both lists — i.e.
    # overlap <= cnt + min(|A| - max(rn_a), |B| - max(rn_b)). This is
    # strictly tighter than the per-match bound above (which keeps a
    # pair if ANY single match could reach alpha) and replaces the
    # .distinct() with the same-shuffle groupBy; the per-match filter
    # stays as a cheap pre-shuffle cut. Exact: both are upper bounds on
    # |A∩B|, so no qualifying pair is dropped.
    agg_bound = (F.col("cnt")
                 + F.least(F.col("n_a") - F.col("max_ra"),
                           F.col("n_b") - F.col("max_rb")))
    agg_alpha = F.ceil(F.lit(JACCARD_TAU / (1.0 + JACCARD_TAU))
                       * (F.col("n_a") + F.col("n_b")))
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"),
              (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id"))
              & (F.col("a.n_sh") >= JACCARD_TAU * F.col("b.n_sh"))
              & (F.col("b.n_sh") >= JACCARD_TAU * F.col("a.n_sh")))
        .filter(ubound >= alpha)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"), F.col("b.n_sh").alias("n_b"))
        .agg(F.count("*").alias("cnt"),
             F.max(F.col("a.rn")).alias("max_ra"),
             F.max(F.col("b.rn")).alias("max_rb"))
        .filter(agg_bound >= agg_alpha)
        .select("doc_a", "doc_b")
    ).cache()
    return _pair_jaccard(cands, sets).filter(F.col("jaccard") >= JACCARD_TAU)


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate entry: prefix-filtered exact Jaccard over the
    augmented documents pool (see jaccard_pairs)."""
    return jaccard_pairs(augmented_docs(spark, sf_dir))


SQL_DEDUP_JACCARD = f"""
WITH {AUG_SQL}, {SHINGLE_SQL},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shingle a JOIN shingle b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter * 1.0 / (ca.n_sh + cb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN scount ca ON ca.doc_id = doc_a
JOIN scount cb ON cb.doc_id = doc_b
WHERE inter * 1.0 / (ca.n_sh + cb.n_sh - inter) >= {JACCARD_TAU}
"""


# ------------------------------------------------------------------ minhash + LSH

def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 perms over md5-32bit shingle hashes) ->
    LSH bands of 2 -> candidate pairs sharing any band, with their true
    Jaccard attached. The scale path: candidates are generated by the
    band equi-join (never all-pairs).

    Shuffle budget at 100 TB: the signature pass is explode ->
    hash-aggregate with map-side combine, so only (doc_id, 8 longs)
    crosses the wire — no distinct-shingle shuffle (min over duplicate
    shingles == min over distinct shingles). Distinct shingles are
    materialized only AFTER the candidate semi-join, bounding the exact
    Jaccard verify to candidate docs."""
    docs = augmented_docs(spark, sf_dir)
    raw = _shingles_all(docs)
    h32 = F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long")
    hashed = raw.select("doc_id", h32.alias("h"))
    # all 8 permutation minima in ONE groupBy pass (8 agg columns) —
    # narrow map + partial agg; band keys come from stack() afterwards
    sigs = hashed.groupBy("doc_id").agg(
        *[F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{p}")
          for p, a, b in MINHASH_PERMS]
    )
    stack_args = ", ".join(
        f"{b}, concat(mh{2 * b + 1}, '_', mh{2 * b + 2})" for b in range(N_BANDS))
    bands = sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) as (band, key)"))
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    ).cache()  # referenced 3x by _pair_jaccard (pair join + cand-doc union)
    # attach exact jaccard — _pair_jaccard restricts the zero-shuffle
    # shingle-set arrays to CANDIDATE docs via a semi-join (the whole
    # point of LSH at 100 TB) and scores in-stage with array_intersect
    # — never a shingle self-join, which would be quadratic on hot
    # shingles.
    return _pair_jaccard(cands, _shingle_sets(docs))


_PERM_VALUES = ", ".join(f"({p}, {a}, {b})" for p, a, b in MINHASH_PERMS)

SQL_DEDUP_MINHASH = f"""
WITH {AUG_SQL}, {SHINGLE_SQL},
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM shingle
),
perms(perm, a, b) AS (VALUES {_PERM_VALUES}),
sigs AS (
  SELECT doc_id, perm, min((a * h + b) % {MINHASH_P}) AS mh
  FROM hashed CROSS JOIN perms GROUP BY 1, 2
),
bands AS (
  SELECT doc_id, (perm - 1) // 2 AS band,
         string_agg(perm || '=' || mh, ':' ORDER BY perm || '=' || mh) AS key
  FROM sigs GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS inter
  FROM shingle x JOIN shingle y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       round(coalesce(i.inter, 0) * 1.0 / (ca.n_sh + cb.n_sh - coalesce(i.inter, 0)), 6) AS jaccard
FROM cands c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN scount ca ON ca.doc_id = c.doc_a
JOIN scount cb ON cb.doc_id = c.doc_b
"""


# ------------------------------------------------------- duplicate clusters

# min-label propagation needs diameter rounds; past this many the graph
# is not a dedup-shaped one (clusters of near-identical docs have
# diameter 1-3) and the O(log^2 n)-round star algorithm takes over
CC_STAR_SWITCH_ROUNDS = 5

# observability for tests/bench: method and round count of the last
# connected_components call (the driver loop is inherently stateful)
LAST_CC_INFO: dict = {}


def connected_components(pairs: DataFrame, method: str = "auto") -> DataFrame:
    """(doc_id, canonical_id) — connected components over an undirected
    pair graph, canonical = min doc_id of the component. The cluster
    step every near-dup pipeline ends with (keep one doc per cluster).

    Two engines behind one signature:

    * ``label`` — min-label propagation: labels start as self; each
      round every node takes the min of its own label and its
      neighbors' (ONE equi-join + ONE groupBy + ONE action per round,
      convergence flag riding in the label job). Rounds = graph
      diameter: optimal for dedup graphs (diameter 1-3).
    * ``star`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC 2014):
      O(log^2 n) rounds on ANY topology, the safety net for
      adversarial long-chain/high-diameter graphs.
    * ``auto`` (default) — run label propagation; if it hasn't
      converged after CC_STAR_SWITCH_ROUNDS (the graph has revealed
      itself as high-diameter), restart on the star algorithm. The
      wasted rounds are bounded and small; the pathological O(n)
      tail is gone.

    Per round only (node, label)/(edge) pairs shuffle, never
    documents; results are lineage-truncated per round."""
    if method not in ("auto", "label", "star"):
        raise ValueError(f"unknown method {method!r}")
    if method == "star":
        return _cc_star(pairs)
    cap = CC_STAR_SWITCH_ROUNDS if method == "auto" else None
    res = _cc_label(pairs, max_rounds=cap)
    if res is None:
        return _cc_star(pairs)
    return res


def _cc_label(pairs: DataFrame, max_rounds: int | None = None) -> DataFrame | None:
    """Min-label propagation (see connected_components). Returns None
    if max_rounds elapse without convergence."""
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    sym = sym.cache()
    labels = (
        sym.select(F.col("src").alias("doc_id")).distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    rounds = 0
    while True:
        neigh = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least("label", F.coalesce("nlabel", "label")).alias("label"),
                # null nlabel (isolated this round) compares as null ->
                # counts as unchanged under the filter below
                (F.col("nlabel") < F.col("label")).alias("__changed"),
            )
            # lazy: materialized (and lineage-truncated) by the count
            # action below — the round's ONLY action
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels.unpersist()
        labels = new_labels
        rounds += 1
        if changed == 0:
            LAST_CC_INFO.update(method="label", rounds=rounds)
            break
        if max_rounds is not None and rounds >= max_rounds:
            sym.unpersist()
            labels.unpersist()
            return None  # high-diameter graph: caller switches to star
    sym.unpersist()
    return labels.select("doc_id", F.col("label").alias("canonical_id"))


def _cc_star(pairs: DataFrame) -> DataFrame:
    """Alternating large-star/small-star components (Kiveris et al.,
    SoCC 2014, §3): per round, large-star connects every neighbor
    LARGER than u to m = min(N(u) ∪ {u}); small-star (on edges
    directed large→small) connects every smaller neighbor and u
    itself to m. Each phase strictly shrinks star heights, converging
    in O(log^2 n) rounds on any topology; at the fixpoint every edge
    is (node → component-min). Per phase: one groupBy + one join over
    8-byte id pairs — the same shuffle shape as one label round."""
    edges = (
        pairs.filter(F.col("doc_a") != F.col("doc_b"))
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
    )
    all_nodes = (
        edges.select(F.col("a").alias("doc_id"))
        .unionAll(edges.select(F.col("b").alias("doc_id")))
        .distinct().cache()
    )
    E = edges.cache()
    prev_sig = None
    rounds = 0
    while True:
        # ---- large-star
        sym = E.unionAll(E.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = (
            sym.groupBy("a").agg(F.min("b").alias("mb"))
            .select("a", F.least("mb", F.col("a")).alias("m"))
        )
        e1 = (
            sym.filter(F.col("b") > F.col("a"))
            .join(m, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # ---- small-star (edges directed large -> small)
        directed = e1.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        m2 = directed.groupBy("a").agg(F.min("b").alias("m"))
        e2 = (
            directed.join(m2, "a")
            .filter(F.col("b") != F.col("m"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionAll(m2.select(F.col("a"), F.col("m").alias("b")))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # one action: materialize the round AND read its signature —
        # the edge set is a fixpoint exactly when (count, hash-sum)
        # repeats (edges are canonical large->small pairs here)
        row = e2.agg(
            F.count("*").alias("n"),
            # decimal(38,0): a plain long sum of 64-bit hashes
            # overflows under ANSI mode
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row.n, row.h)
        E.unpersist()
        E = e2
        rounds += 1
        if sig == prev_sig:
            LAST_CC_INFO.update(method="star", rounds=rounds)
            break
        prev_sig = sig
    # fixpoint: E is (node -> component-min) stars; roots label selves
    star_min = E.groupBy("a").agg(F.min("b").alias("b"))
    labels = (
        all_nodes.join(star_min.withColumnRenamed("a", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("b", F.col("doc_id")).alias("canonical_id"))
    )
    all_nodes.unpersist()
    return labels


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the exact-dup graph: docs sharing a
    byte-identical text are edges (keeper = min id); components give
    each doc its canonical id. Deterministic in both engines (the
    exact-dup pair set is identical by construction)."""
    d = augmented_docs(spark, sf_dir)
    keyed = d.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("k"))
    a = keyed.alias("a")
    b = keyed.alias("b")
    pairs = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("canonical_id").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "canonical_id").select(
        "doc_id", "canonical_id", "cluster_size")


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {AUG_SQL},
keyed AS (SELECT doc_id, md5(text) AS k FROM docs_aug),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(doc, r) AS (
  SELECT DISTINCT src, src FROM sym
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.doc = s.dst
),
comp AS (SELECT doc AS doc_id, min(r) AS canonical_id FROM reach GROUP BY doc)
SELECT c.doc_id, c.canonical_id, s.cluster_size
FROM comp c
JOIN (SELECT canonical_id, count(*) AS cluster_size
      FROM comp GROUP BY 1) s USING (canonical_id)
"""


# ------------------------------------------------------------------ simhash

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash over tf-weighted md5 token hashes.

    Single shuffle: the tf-weighted per-bit sum is linear in tf, so
    summing the +/-1 bit contribution per TOKEN INSTANCE equals the
    per-distinct-term tf-weighted sum — one explode -> one groupBy with
    32 conditional-sum agg columns (map-side combine; the shuffle
    carries one (doc_id, 32 longs) row per doc, never a 32x bit
    explode or a (doc, term) tf pre-aggregation)."""
    # fan the single-row-group scan out before the per-token md5 work
    # (guide §2.5); the shingle paths repartition themselves instead
    d = fanout_small_scan(_load_docs(spark, sf_dir), f"{sf_dir}/documents")
    tok = d.select(
        "doc_id", F.explode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("term")
    )
    h32 = F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("long")
    sums = tok.withColumn("h", h32).groupBy("doc_id").agg(
        *[F.sum(F.expr(f"2 * (shiftright(h, {b}) & 1) - 1")).alias(f"s{b}")
          for b in range(32)]
    )
    bit_terms = " + ".join(
        f"CASE WHEN s{b} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE CAST(0 AS BIGINT) END"
        for b in range(32)
    )
    return sums.select("doc_id", F.expr(bit_terms).alias("simhash"))


SQL_SIMHASH = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
bits AS (
  SELECT doc_id, b.b,
         sum(tf * (2 * ((('0x' || substr(md5(term), 1, 8))::BIGINT >> b.b) & 1) - 1)) AS s
  FROM tf, generate_series(0, 31) b(b)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""
