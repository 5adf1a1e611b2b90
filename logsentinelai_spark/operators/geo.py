"""GeoIP-style enrichment + geo-grid aggregation (SURVEY.md §2 J1/Q7,
predicates F4/F5).

Reference semantics (`/root/reference/src/logsentinelai/core/geoip.py`):
every event IP is classified — invalid strings and out-of-range octets
are dropped (`:101-106`, validity check), private / loopback /
link-local ranges are dropped (`:72-79`, `_is_private_ip`), and the
surviving public IPs are enriched with a
``{country_code, location:{lat,lon}}`` struct via a lookup against a
local GeoLite2 database (`:91-136`). That lookup is longest-prefix over
CIDR *ranges*, not a point hash — which is what this module implements.

Spark mapping (the range-keyed broadcast-join pattern):
  * the GeoLite2 database is a SMALL DIMENSION of CIDR ranges — here a
    deterministic 1088-range table: 1024 /10-sized base blocks
    (deliberately offset by half a block so ~1/4 straddle a /8
    boundary) plus 64 NESTED /14 sub-ranges resolved by longest prefix
    (resolve_longest_prefix flattens them dimension-side into disjoint
    ranges, so nesting costs the fact table nothing). At 100 TB the
    real MMDB is still a broadcast: a few hundred MB, orders of
    magnitude under the fact table.
  * an interval join cannot hash directly, so each range is EXPANDED
    into the coarse /8 prefix buckets it overlaps (`explode(sequence(
    ip_lo>>24, ip_hi>>24))` — 1-2 buckets per range here; the pattern
    generalizes to any range width). The fact side joins on the bucket
    (broadcast HASH equi-join, no fact shuffle) with the
    ``ip_num BETWEEN ip_lo AND ip_hi`` range predicate evaluated as the
    join residual — O(ranges-per-bucket) candidate probes per row,
    never a nested-loop over the whole dimension.
  * the F4/F5 predicates run before the join so dropped IPs never
    reach it.
  * the fixture ``events`` table has no IP column, so a deterministic
    dotted-quad is synthesized from event_id by the SAME SQL
    expression in Spark and DuckDB (exercising every predicate branch:
    non-numeric host strings, out-of-range octets, 10/8, 127/8,
    192.168/16, plus public addresses). The synthesis (and its cache —
    see enriched_events) lives ONLY in the fixture wrapper; the
    production operator ``enrich_ips`` takes a real ip column and
    never caches the fact table.

All expressions are JVM-side (whole-stage codegen); the oracle runs
the identical logic in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

COUNTRIES = [
    "US", "KR", "DE", "FR", "GB", "JP", "CN", "BR",
    "IN", "CA", "AU", "NL", "SE", "SG", "ZA", "MX",
]

# Deterministic per-event IP synthesis — parses identically in Spark
# SQL and DuckDB (|| concat auto-casts ints in both).
IP_SYNTH_SQL = """CASE
  WHEN event_id % 97 = 0 THEN 'host-' || event_id
  WHEN event_id % 23 = 0 THEN '300.' || (event_id % 256) || '.1.2'
  WHEN event_id % 13 = 0 THEN '10.' || (event_id % 256) || '.' || (event_id % 254) || '.1'
  WHEN event_id % 17 = 0 THEN '127.0.0.' || (1 + event_id % 254)
  WHEN event_id % 19 = 0 THEN '192.168.' || (event_id % 256) || '.' || (1 + event_id % 254)
  ELSE (1 + (event_id * 7919) % 223) || '.' || ((event_id * 104729) % 256)
       || '.' || ((event_id * 31) % 256) || '.' || (1 + event_id % 254)
END"""

# F5: syntactic dotted-quad + per-octet range check. The regex admits
# only digit octets, so try_cast below never yields NULL on valid rows.
_OCTET = "try_cast(split_part(ip, '.', {i}) AS INT)"
O1, O2, O3, O4 = (_OCTET.format(i=i) for i in (1, 2, 3, 4))

IP_VALID_RE = r"^\d{1,3}(\.\d{1,3}){3}$"
# Spark SQL string literals treat backslash as an escape; DuckDB's do
# not — double them only on the Spark side so both engines see \d.
_IP_VALID_RE_SPARK = IP_VALID_RE.replace("\\", "\\\\")

VALID_SQL_SPARK = (
    f"ip RLIKE '{_IP_VALID_RE_SPARK}' AND {O1} <= 255 AND {O2} <= 255 "
    f"AND {O3} <= 255 AND {O4} <= 255"
)
VALID_SQL_DUCK = (
    f"regexp_matches(ip, '{IP_VALID_RE}') AND {O1} <= 255 AND {O2} <= 255 "
    f"AND {O3} <= 255 AND {O4} <= 255"
)

# F4: private / loopback / link-local ranges
# (reference `core/geoip.py:72-79` via ipaddress.is_private et al.).
PRIVATE_SQL = (
    f"({O1} = 10 OR {O1} = 127 OR ({O1} = 172 AND {O2} BETWEEN 16 AND 31) "
    f"OR ({O1} = 192 AND {O2} = 168) OR ({O1} = 169 AND {O2} = 254))"
)

# numeric IPv4 (BIGINT — 223.x.y.z exceeds int32)
IP_NUM_SQL = (
    f"CAST({O1} AS BIGINT) * 16777216 + CAST({O2} AS BIGINT) * 65536 "
    f"+ CAST({O3} AS BIGINT) * 256 + CAST({O4} AS BIGINT)"
)

# ---- range dimension: 1024 CIDR-style /10-sized base blocks of 2^22
# ips, offset by 2^21 so every 4th block straddles a /8 boundary (the
# multi-bucket expansion path is exercised, not just the 1:1 case),
# PLUS 64 nested /14-sized sub-ranges (one inside every 16th base
# block, carrying different attributes) — real MaxMind data has nested
# CIDRs resolved by LONGEST PREFIX (reference core/geoip.py:91-136
# delegates that to the mmdb tree); resolve_longest_prefix() implements
# that rule here. Base coverage [2^21, 1024*2^22 + 2^21) ⊇ all public
# IPv4 first-octets 1..223, so after flattening every public ip matches
# EXACTLY one disjoint range.
N_RANGES = 1024
RANGE_SPAN = 1 << 22
RANGE_OFFSET = 1 << 21
N_NESTED = 64            # nested /14s, one per 16th base block
NESTED_SPAN = 1 << 18
NESTED_OFF = 1 << 20     # offset of the nested range inside its block
BASE_PREFIX_LEN = 10     # 32 - log2(RANGE_SPAN)
NESTED_PREFIX_LEN = 14   # 32 - log2(NESTED_SPAN)

_DIM_CC = f"element_at(array({', '.join(repr(c) for c in COUNTRIES)}), CAST(({{j}}) % 16 AS INT) + 1)"
_DIM_CC_DUCK = f"([{', '.join(repr(c) for c in COUNTRIES)}])[CAST(({{j}}) % 16 AS INT) + 1]"
_DIM_LAT = "CAST((({j}) * 37) % 141 - 70 AS DOUBLE) + 0.5"
_DIM_LON = "CAST((({j}) * 73) % 341 - 170 AS DOUBLE) + 0.5"


def geo_dim(spark: SparkSession) -> DataFrame:
    """1088-row nested range dimension (range_id, ip_lo, ip_hi,
    prefix_len, country_code, lat, lon) — the broadcast stand-in for a
    GeoLite2 CIDR database, nested pairs included."""
    base = spark.range(0, N_RANGES).select(
        F.col("id").alias("range_id"),
        (F.col("id") * RANGE_SPAN + RANGE_OFFSET).alias("ip_lo"),
        (F.col("id") * RANGE_SPAN + RANGE_OFFSET + RANGE_SPAN - 1).alias("ip_hi"),
        F.lit(BASE_PREFIX_LEN).alias("prefix_len"),
        F.expr(_DIM_CC.format(j="id")).alias("country_code"),
        F.expr(_DIM_LAT.format(j="id")).alias("lat"),
        F.expr(_DIM_LON.format(j="id")).alias("lon"),
    )
    nested = spark.range(0, N_NESTED).select(
        (F.col("id") + N_RANGES).alias("range_id"),
        (F.col("id") * 16 * RANGE_SPAN + RANGE_OFFSET + NESTED_OFF).alias("ip_lo"),
        (F.col("id") * 16 * RANGE_SPAN + RANGE_OFFSET + NESTED_OFF
         + NESTED_SPAN - 1).alias("ip_hi"),
        F.lit(NESTED_PREFIX_LEN).alias("prefix_len"),
        F.expr(_DIM_CC.format(j=f"id + {N_RANGES}")).alias("country_code"),
        F.expr(_DIM_LAT.format(j=f"id + {N_RANGES}")).alias("lat"),
        F.expr(_DIM_LON.format(j=f"id + {N_RANGES}")).alias("lon"),
    )
    return base.unionByName(nested)


# the fixture dimension is a frozen model per process, so its flattened
# (longest-prefix-resolved) rows are computed once and replayed from the
# driver — enrich_ips construction then costs zero Spark jobs beyond the
# fact plan itself (round-4 ADVICE: resolve_longest_prefix ran an eager
# collect per query construction)
_GEO_FLAT_ROWS: list | None = None


def geo_dim_flat(spark: SparkSession) -> DataFrame:
    """resolve_longest_prefix(geo_dim(spark)), memoized per process.
    Valid because geo_dim is deterministic constants — a real pipeline
    would key this cache by the GeoIP database snapshot id."""
    global _GEO_FLAT_ROWS
    if _GEO_FLAT_ROWS is None:
        _GEO_FLAT_ROWS = _flatten_rows(geo_dim(spark).select(
            "range_id", "ip_lo", "ip_hi", "prefix_len",
            "country_code", "lat", "lon",
        ).collect())
    return spark.createDataFrame(_GEO_FLAT_ROWS, _FLAT_SCHEMA)


def resolve_longest_prefix(dim: DataFrame) -> DataFrame:
    """Flatten a NESTED CIDR-style dimension into DISJOINT ranges under
    longest-prefix-match semantics: each ip maps to the most specific
    (max prefix_len) covering range; ties (impossible for true CIDRs —
    equal-length CIDRs never partially overlap) break to the lower
    range_id.

    Done on the DIMENSION side, driver-resident — a boundary sweep over
    the collected ranges (the dimension is the broadcast-small model,
    same cost class as loading the MMDB tree into memory; 2R elementary
    intervals for R ranges). This is the 100 TB-right shape: nested
    resolution becomes a precomputation on the small side, and the fact
    table keeps the plain disjoint-range bucket equi-join with ZERO
    extra shuffle — the alternative (join all overlapping ranges, then
    max_by(prefix_len) per fact row) re-shuffles or re-windows the
    entire fact table."""
    rows = dim.select(
        "range_id", "ip_lo", "ip_hi", "prefix_len",
        "country_code", "lat", "lon",
    ).collect()
    return dim.sparkSession.createDataFrame(_flatten_rows(rows), _FLAT_SCHEMA)


_FLAT_SCHEMA = (
    "range_id long, ip_lo long, ip_hi long, "
    "country_code string, lat double, lon double"
)


def _flatten_rows(rows: list) -> list[tuple]:
    """Driver-side boundary sweep (see resolve_longest_prefix)."""
    import numpy as np

    lo = np.array([r.ip_lo for r in rows], dtype=np.int64)
    hi = np.array([r.ip_hi for r in rows], dtype=np.int64)
    plen = np.array([r.prefix_len for r in rows], dtype=np.int64)
    rid = np.array([r.range_id for r in rows], dtype=np.int64)
    bounds = np.unique(np.concatenate([lo, hi + 1]))
    starts, ends = bounds[:-1], bounds[1:]          # elementary [start, end)
    winner = np.full(starts.size, -1, dtype=np.int64)
    # most specific first; within a specificity level, lower range_id
    # first — "w[w == -1] = i" then gives every elementary interval its
    # longest-prefix (tie: lowest-id) covering range
    for i in sorted(range(len(rows)), key=lambda i: (-plen[i], rid[i])):
        a = int(np.searchsorted(bounds, lo[i]))
        b = int(np.searchsorted(bounds, hi[i] + 1))
        w = winner[a:b]
        w[w == -1] = i
    # merge adjacent elementary intervals won by the same range
    keep = np.concatenate(([True], winner[1:] != winner[:-1]))
    run_starts = np.flatnonzero(keep)
    run_ends = np.append(run_starts[1:], winner.size)
    out = []
    for a, b in zip(run_starts, run_ends):
        i = int(winner[a])
        if i < 0:
            continue  # gap covered by no range
        r = rows[i]
        out.append((int(r.range_id), int(starts[a]), int(ends[b - 1] - 1),
                    r.country_code, float(r.lat), float(r.lon)))
    return out


def enrich_ips(events_ip: DataFrame, dim: DataFrame) -> DataFrame:
    """PRODUCTION operator: rows with an ``ip`` string column ->
    F5 valid -> F4 drop private -> range-keyed broadcast hash join
    against the CIDR dimension. All input columns are preserved;
    country_code / lat / lon are appended.

    A dimension carrying a ``prefix_len`` column may contain NESTED
    CIDRs; it is first flattened to disjoint ranges under
    longest-prefix-match (resolve_longest_prefix) so the fact-side
    join shape is identical either way.

    No cache, no repartition: at 100 TB the fact side streams through
    one codegen stage (predicates + bucket key) straight into the
    broadcast probe. The dimension is expanded to one row per /8
    bucket it overlaps, so the join is a pure HASH equi-join on the
    bucket with the range check as residual."""
    if "prefix_len" in dim.columns:
        dim = resolve_longest_prefix(dim)
    # internal join-key columns use dunder names so a fact table that
    # already carries e.g. an `octet1` or `ip_num` column is never
    # silently overwritten (they are dropped before returning)
    public = (
        events_ip.filter(F.expr(VALID_SQL_SPARK))
        .filter(~F.expr(PRIVATE_SQL))
        .withColumn("__geo_octet1", F.expr(O1))
        .withColumn("__geo_ip_num", F.expr(IP_NUM_SQL))
        .alias("p")
    )
    dim_b = dim.select(
        F.expr(
            "explode(sequence(CAST(ip_lo DIV 16777216 AS INT),"
            " CAST(ip_hi DIV 16777216 AS INT)))"
        ).alias("__geo_octet1"),
        "ip_lo", "ip_hi", "country_code", "lat", "lon",
    ).alias("d")
    joined = public.join(
        F.broadcast(dim_b),
        (F.col("p.__geo_octet1") == F.col("d.__geo_octet1"))
        & F.col("p.__geo_ip_num").between(F.col("d.ip_lo"), F.col("d.ip_hi")),
    )
    keep = [F.col(f"p.{c}") for c in events_ip.columns]
    return joined.select(*keep, "d.country_code", "d.lat", "d.lon")


def enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURE wrapper: events -> synth ip -> enrich_ips.

    The synthesized ip is MATERIALIZED (repartition + cache) before the
    predicates: Catalyst pushes the filters below the projection and
    inlines the synthesis CASE once per ip reference (~14 evaluations
    per row, measured 4x slower). A real corpus reads ip from storage,
    so the predicates reference a stored column there — the cache
    exists ONLY on this fixture-synthesis path; the production
    operator (enrich_ips) never caches the fact table (plan-pinned by
    test_enrich_ips_production_plan_has_no_cache)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with_ip = (
        ev.repartition(spark.sparkContext.defaultParallelism)
        .select("event_id", "user_id", F.expr(IP_SYNTH_SQL).alias("ip"))
        .cache()
    )
    # pre-flattened, memoized dimension: no prefix_len column, so
    # enrich_ips skips the per-call resolve (round-4 ADVICE)
    return enrich_ips(with_ip, geo_dim_flat(spark))


def q_geo_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + F4/F5: per-event geo enrichment of public IPs."""
    return enriched_events(spark, sf_dir).select(
        "event_id", "ip", "country_code", "lat", "lon"
    )


def q_geo_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: Kibana-map-style grid aggregation — 10-degree cells,
    event count + distinct source IPs per cell."""
    return (
        enriched_events(spark, sf_dir)
        .groupBy(
            (F.expr("CAST(floor(lat / 10) AS BIGINT)") * 10).alias("lat_cell"),
            (F.expr("CAST(floor(lon / 10) AS BIGINT)") * 10).alias("lon_cell"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("ip").alias("n_ips"),
        )
    )


# DuckDB 1.0 forbids lateral column refs in generate_series -> fixed
# 0..255 bucket range + WHERE overlap filter (oracle-side only; the
# Spark side uses the per-range sequence()).
_DIM_CTE = f"""
geo_dim AS (
  SELECT j AS range_id,
         j * {RANGE_SPAN} + {RANGE_OFFSET} AS ip_lo,
         j * {RANGE_SPAN} + {RANGE_OFFSET} + {RANGE_SPAN - 1} AS ip_hi,
         {BASE_PREFIX_LEN} AS prefix_len,
         {_DIM_CC_DUCK.format(j="j")} AS country_code,
         {_DIM_LAT.format(j="j")} AS lat,
         {_DIM_LON.format(j="j")} AS lon
  FROM generate_series(0, {N_RANGES - 1}) g(j)
  UNION ALL
  SELECT {N_RANGES} + j,
         j * {16 * RANGE_SPAN} + {RANGE_OFFSET + NESTED_OFF},
         j * {16 * RANGE_SPAN} + {RANGE_OFFSET + NESTED_OFF + NESTED_SPAN - 1},
         {NESTED_PREFIX_LEN},
         {_DIM_CC_DUCK.format(j=f"j + {N_RANGES}")},
         {_DIM_LAT.format(j=f"j + {N_RANGES}")},
         {_DIM_LON.format(j=f"j + {N_RANGES}")}
  FROM generate_series(0, {N_NESTED - 1}) g(j)
),
geo_dim_b AS (
  SELECT d.*, t.b AS octet1
  FROM geo_dim d, generate_series(0, 255) t(b)
  WHERE t.b BETWEEN ip_lo // 16777216 AND ip_hi // 16777216
)"""

# longest-prefix resolution in the oracle: join ALL overlapping ranges,
# keep the most specific per event (prefix_len DESC, range_id tie-break)
# — semantically identical to the Spark side's dimension-side flatten.
_ENRICH_CTE = f"""
with_ip AS (
  SELECT event_id, user_id, {IP_SYNTH_SQL} AS ip FROM events
),
public AS (
  SELECT event_id, user_id, ip, {O1} AS octet1, {IP_NUM_SQL} AS ip_num
  FROM with_ip
  WHERE ({VALID_SQL_DUCK}) AND NOT {PRIVATE_SQL}
),
enriched AS (
  SELECT event_id, user_id, ip, country_code, lat, lon FROM (
    SELECT p.event_id, p.user_id, p.ip, d.country_code, d.lat, d.lon,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY d.prefix_len DESC, d.range_id) AS rn
    FROM public p JOIN geo_dim_b d
      ON p.octet1 = d.octet1 AND p.ip_num BETWEEN d.ip_lo AND d.ip_hi
  ) WHERE rn = 1
)"""

SQL_GEO_ENRICH = f"""
WITH {_DIM_CTE}, {_ENRICH_CTE}
SELECT event_id, ip, country_code, lat, lon FROM enriched
"""

SQL_GEO_GRID = f"""
WITH {_DIM_CTE}, {_ENRICH_CTE}
SELECT CAST(floor(lat / 10) AS BIGINT) * 10 AS lat_cell,
       CAST(floor(lon / 10) AS BIGINT) * 10 AS lon_cell,
       count(*) AS n_events,
       CAST(count(DISTINCT ip) AS BIGINT) AS n_ips
FROM enriched GROUP BY 1, 2
"""


# ------------------------------------------- geo_distance query + sort

# ES geo_distance query (filter within radius of a point) + ES
# geo-distance sort. The haversine is ONE shared SQL text evaluated by
# both engines (identical op order -> identical doubles up to
# transcendental ulps; distances are rounded to 3 decimals = metre
# precision, far above any ulp drift). Scale shape: the distance is a
# pure codegen projection over the already-enriched rows and the page
# is TakeOrderedAndProject — same bounded-top-k story as every other
# serving page; no distance precomputation or geohash index is needed
# until the radius predicate becomes selective enough to justify a
# grid-cell prefilter (which q_geo_grid's cells would provide).
GEO_POINT = (10.5, 20.5)   # pinned query point (lat, lon)
GEO_RADIUS_KM = 3000.0
GEO_K = 20

HAVERSINE_SQL = (
    "2 * 6371.0 * asin(sqrt("
    "pow(sin((radians(lat) - radians({lat0})) / 2), 2) + "
    "cos(radians({lat0})) * cos(radians(lat)) * "
    "pow(sin((radians(lon) - radians({lon0})) / 2), 2)))"
).format(lat0=GEO_POINT[0], lon0=GEO_POINT[1])


def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_distance`` query + distance sort: enriched events
    within GEO_RADIUS_KM of the pinned point, nearest first, top-20
    with the distance. event_id tiebreak — co-located events (same
    CIDR range => same coordinates) are common, so the sort must not
    leave page membership to engine whim."""
    return (
        enriched_events(spark, sf_dir)
        .withColumn("dist_km", F.expr(HAVERSINE_SQL))
        .filter(F.col("dist_km") <= GEO_RADIUS_KM)
        .orderBy(F.asc("dist_km"), F.asc("event_id"))
        .limit(GEO_K)
        .select("event_id", "country_code",
                F.round("dist_km", 3).alias("dist_km"))
    )


SQL_GEO_DISTANCE = f"""
WITH {_DIM_CTE}, {_ENRICH_CTE},
with_dist AS (
  SELECT event_id, country_code, {HAVERSINE_SQL} AS dist_km
  FROM enriched
)
SELECT event_id, country_code, round(dist_km, 3) AS dist_km
FROM with_dist WHERE dist_km <= {GEO_RADIUS_KM}
ORDER BY dist_km, event_id LIMIT {GEO_K}
"""


def q_geo_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_bounds`` + ``geo_centroid`` aggregations per country
    bucket (the Kibana map sidebar pair): bounding box (min/max
    lat/lon) and unweighted centroid over the enriched events. Plan
    shape: the enrichment BroadcastHashJoin feeds ONE partial+final
    hash aggregate on country_code — bounds and centroid are plain
    min/max/avg, so the shuffle carries one 7-metric row per country
    per map task at any corpus size."""
    return (
        enriched_events(spark, sf_dir)
        .groupBy("country_code")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.min("lat"), 6).alias("lat_min"),
            F.round(F.max("lat"), 6).alias("lat_max"),
            F.round(F.min("lon"), 6).alias("lon_min"),
            F.round(F.max("lon"), 6).alias("lon_max"),
            F.round(F.avg("lat"), 6).alias("centroid_lat"),
            F.round(F.avg("lon"), 6).alias("centroid_lon"),
        )
    )


SQL_GEO_BOUNDS = f"""
WITH {_DIM_CTE}, {_ENRICH_CTE}
SELECT country_code, count(*) AS n_events,
       round(min(lat), 6) AS lat_min, round(max(lat), 6) AS lat_max,
       round(min(lon), 6) AS lon_min, round(max(lon), 6) AS lon_max,
       round(avg(lat), 6) AS centroid_lat,
       round(avg(lon), 6) AS centroid_lon
FROM enriched GROUP BY 1
"""
