"""Event-analytics operators re-expressing the reference's alert /
dashboard semantics over the events table (SURVEY.md §2.2, §2.4, §2.5).

* severity mapping + threshold filter — the reference's alert path maps
  severities to priorities and keeps events at/above a threshold
  (`src/logsentinelai/core/elasticsearch.py:82-113`).
* severity rollup ordered CRITICAL->INFO (`:155-174`).
* top-1 representative event per group (W1, `:185-197`) via
  row_number.
* sessionization — lag-gap windows (the streaming monitor's
  pending-buffer/timeout semantics, `core/monitoring.py:358-438`,
  recast as a batch session window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# event_type -> severity (fixed mapping, mirrors the reference's 5-level
# SeverityLevel enum, `analyzers/httpd_access.py:17-22`)
SEVERITY_CASE = (
    "CASE event_type WHEN 'error' THEN 'CRITICAL' WHEN 'purchase' THEN 'HIGH' "
    "WHEN 'signup' THEN 'MEDIUM' WHEN 'click' THEN 'LOW' ELSE 'INFO' END"
)
PRIORITY_CASE = (
    "CASE event_type WHEN 'error' THEN 1 WHEN 'purchase' THEN 2 "
    "WHEN 'signup' THEN 3 WHEN 'click' THEN 4 ELSE 5 END"
)
THRESHOLD = 3  # keep MEDIUM and above
SESSION_GAP_MIN = 30


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT fanned out (sources/io.fanout_small_scan): these queries are
    # cheap columnar aggregations where the extra exchange of the raw
    # rows costs more than the serial scan it parallelizes (measured
    # severity_rollup 0.29 -> 0.80 s at the sf1.0 replica)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_severity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 + A6: threshold filter then count per severity with the
    priority rank for CRITICAL->INFO ordering."""
    ev = _events(spark, sf_dir).withColumn("severity", F.expr(SEVERITY_CASE)).withColumn(
        "priority", F.expr(PRIORITY_CASE)
    )
    return (
        ev.filter(F.col("priority") <= THRESHOLD)
        .groupBy("severity", "priority")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        # W5: severity-ordered render, CRITICAL first (reference
        # `core/elasticsearch.py:164-169`); <=5 groups, trivial sort
        .orderBy("priority")
    )


SQL_SEVERITY_ROLLUP = f"""
WITH ev AS (
  SELECT *, {SEVERITY_CASE} AS severity, {PRIORITY_CASE} AS priority FROM events
)
SELECT severity, priority, count(*) AS n, round(sum(value), 6) AS sum_value
FROM ev WHERE priority <= {THRESHOLD} GROUP BY severity, priority
"""


def q_top_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: the single highest-value event per user (deterministic
    tie-break by event_id)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 6).alias("value"))
    )


SQL_TOP_EVENT_PER_USER = """
WITH ranked AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, event_type, round(value, 6) AS value
FROM ranked WHERE rn = 1
"""


ALERT_MSG_CAP = 32  # reference caps alert payloads (message[:4000])
_WORST_CASE = "CASE min(priority) WHEN 1 THEN 'CRITICAL' ELSE 'HIGH' END"


def q_alert_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert payload shaping (W2 + C8) — the reference truncates every
    outgoing alert: ``source_ips[:5]``, ``related_logs[:3]``, message
    capped at 4000 chars (`core/elasticsearch.py:210-257,279-280,327`).
    Here: per-user alert doc over HIGH+ events with the related-event
    list sliced to 3 (sort_array for determinism) and the rendered
    message substring-capped."""
    ev = (
        _events(spark, sf_dir)
        .withColumn("severity", F.expr(SEVERITY_CASE))
        .withColumn("priority", F.expr(PRIORITY_CASE))
        .filter(F.col("priority") <= 2)
    )
    agg = ev.groupBy("user_id").agg(
        F.count("*").alias("n_alerts"),
        F.min("priority").alias("priority"),
        F.array_join(
            F.slice(F.sort_array(F.collect_list("event_id")), 1, 3), ","
        ).alias("sample_events"),
    )
    msg = F.concat(
        F.lit("ALERT "), F.expr("CASE priority WHEN 1 THEN 'CRITICAL' ELSE 'HIGH' END"),
        F.lit(" events="), F.col("sample_events"),
    )
    return agg.select(
        "user_id", "n_alerts", "sample_events",
        F.substring(msg, 1, ALERT_MSG_CAP).alias("message"),
    )


SQL_ALERT_FEED = f"""
WITH ev AS (
  SELECT user_id, event_id, {PRIORITY_CASE} AS priority FROM events
),
agg AS (
  SELECT user_id, count(*) AS n_alerts, min(priority) AS priority,
         array_to_string(list_sort(list(event_id))[1:3], ',') AS sample_events
  FROM ev WHERE priority <= 2 GROUP BY user_id
)
SELECT user_id, n_alerts, sample_events,
       substr('ALERT ' || (CASE priority WHEN 1 THEN 'CRITICAL' ELSE 'HIGH' END)
              || ' events=' || sample_events, 1, {ALERT_MSG_CAP}) AS message
FROM agg
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a session break is a gap > 30 min between a
    user's consecutive events; returns per-user session count and the
    length (events) of their longest session."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sessions = (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0))
        .withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    per_sess = sessions.groupBy("user_id", "sess_id").agg(F.count("*").alias("n_events"))
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("n_events").alias("longest_session")
    )


SQL_USER_SESSIONS = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
),
per_sess AS (SELECT user_id, sess_id, count(*) AS n_events FROM s GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions, max(n_events) AS longest_session
FROM per_sess GROUP BY user_id
"""


# ------------------------------------------------- composite aggregation

def composite_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list,
    size: int,
    after: tuple | None = None,
) -> DataFrame:
    """ES ``composite`` aggregation page: buckets keyed on ``keys``
    stream in key order; ``after`` resumes strictly after a cursor
    tuple (the previous page's last key). The one ES aggregation that
    scales to unbounded bucket cardinality — and the Spark plan keeps
    that property: partial+final agg, a lexicographic cursor predicate,
    then ``TakeOrderedAndProject`` (bounded per-partition top-``size``
    + driver merge of size·partitions rows), never a global sort.

    Reference analog: Kibana's paginated data tables / export paths
    issue composite aggs (ES docs: search-aggregations-bucket-composite);
    the LogSentinelAI dashboard's saved searches page the same way.
    """
    g = df.groupBy(*keys).agg(*aggs)
    if after is not None:
        if len(after) != len(keys):
            raise ValueError("after cursor arity != keys arity")
        pred = F.lit(False)
        eq = F.lit(True)
        for k, a in zip(keys, after):
            pred = pred | (eq & (F.col(k) > F.lit(a)))
            eq = eq & (F.col(k) == F.lit(a))
        g = g.filter(pred)
    return g.orderBy(*[F.asc(k) for k in keys]).limit(size)
