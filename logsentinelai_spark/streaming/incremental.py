"""Structured Streaming surface — SURVEY.md §2.9 (reference operators
T1-T8 from `core/monitoring.py` / `core/commons.py`).

The reference's realtime mode tails a log file on a polling interval,
caps lines per poll, tracks byte offsets for exactly-once-ish resume,
and pushes severity alerts (reference `core/monitoring.py:149-438`,
`core/elasticsearch.py:93-302`). The Spark-native mapping:

| reference | here |
|---|---|
| T1 polling trigger (5s sleep)        | ``trigger(processingTime=...)`` / ``availableNow`` |
| T5 rate limit (max lines/poll)       | ``maxFilesPerTrigger`` on the file source |
| T6 offset tracking + carry buffer    | Structured Streaming checkpoint offsets |
| T8 retry + idempotent sink           | ``foreachBatch`` -> :func:`extend_index`, idempotent by url anti-join |
| chunk = unit of processing (T2)      | micro-batch = one id epoch + >=1 waves |
| S9/F2 severity alert sink            | :func:`alert_stream` filter -> alert files |

Event-time/watermarks are deliberately absent — the reference is purely
processing-time (SURVEY.md §2.9 T9), and an index build has no late-data
semantics: a page is indexed when its url first appears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index.build import IndexConfig, build_index, extend_index

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ALERT_SEVERITIES = ("CRITICAL", "HIGH")  # reference default threshold
ALERT_MESSAGE_CAP = 120  # C8: reference caps alert messages (4000 chars)


def incremental_index_stream(
    spark: SparkSession,
    landing_dir: str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 16,
    processing_time: str | None = None,
):
    """Continuous index maintenance: every micro-batch of newly landed
    page files becomes one id epoch (+ its waves) via
    :func:`extend_index`. Replayed batches are no-ops — new urls are
    anti-joined against every committed epoch, so the sink is
    idempotent and the stream is exactly-once end-to-end even though
    the file source is at-least-once after checkpoint recovery.

    Returns the started ``StreamingQuery`` (caller awaits/stops)."""
    cfg = cfg or IndexConfig()

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if len(batch_df.take(1)) == 0:
            return
        from pathlib import Path

        if (Path(index_dir) / "_meta.json").exists():
            extend_index(batch_df.sparkSession, batch_df, index_dir)
        else:
            build_index(batch_df.sparkSession, batch_df, index_dir, cfg)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir or f"{index_dir}/_stream_checkpoint")
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EMB_SCHEMA = "vec_id long, embedding array<float>"


def incremental_ann_stream(
    spark: SparkSession,
    landing_dir: str,
    ann_dir: str,
    centroids,
    codebooks,
    lsh_planes=None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 16,
    processing_time: str | None = None,
):
    """Continuous ANN-index maintenance — the embedding-side twin of
    :func:`incremental_index_stream` for a training-data pipeline
    whose vectors arrive continuously: every micro-batch of newly
    landed embedding files is encoded with the FROZEN models
    (index/ann.py: PQ/IVF/LSH models freeze at build time; re-training
    is a rebuild) and appended to pq_codes / ivf_lists / ivfpq_lists /
    lsh_lists. Replays are no-ops: extend_ann anti-joins arriving
    vec_ids against the committed code table, so the sink is
    idempotent and the stream exactly-once end-to-end.

    ``centroids``/``codebooks``/``lsh_planes`` seed the first batch's
    build; later batches read the frozen models from _ann_meta.json.

    Returns the started ``StreamingQuery`` (caller awaits/stops)."""
    from pathlib import Path

    from ..index.ann import build_ann, extend_ann

    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(landing_dir)
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if len(batch_df.take(1)) == 0:
            return
        if (Path(ann_dir) / "_ann_meta.json").exists():
            extend_ann(batch_df.sparkSession, batch_df, ann_dir)
        else:
            build_ann(batch_df.sparkSession, batch_df, ann_dir,
                      centroids, codebooks, lsh_planes=lsh_planes)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir or f"{ann_dir}/_stream_checkpoint")
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def alert_stream(
    spark: SparkSession,
    events_dir: str,
    alerts_dir: str,
    checkpoint_dir: str,
    severities: tuple[str, ...] = ALERT_SEVERITIES,
    max_files_per_trigger: int = 16,
    processing_time: str | None = None,
):
    """Severity-threshold alert side-output (reference: Telegram alert
    path, `core/elasticsearch.py:93-302`, threshold map `:82-91`):
    filter events at-or-above threshold, keep the alert projection,
    append to an alert table. Rate-limited by maxFilesPerTrigger."""
    from ..operators.analytics import SEVERITY_CASE

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(events_dir)
    )
    # alert payload shaping (W2/C8): the reference truncates every
    # outgoing alert payload — message[:4000], source_ips[:5],
    # related_logs[:3] (`core/elasticsearch.py:210-257,279-280,327`).
    # Here the rendered message is substring-capped; the array-slice
    # analog is the batch q_alert_feed (operators/analytics.py).
    from ..functions.extract import unescape_newlines

    msg = F.concat_ws(" ", F.lit("ALERT"), "severity", "event_type",
                      unescape_newlines(F.col("props")))
    # J2 host-metadata "join": the reference merges @host metadata into
    # every indexed doc (`core/elasticsearch.py:62-77`). A 1-row host
    # dimension is the degenerate broadcast join — Catalyst constant-
    # folds the literal struct straight into the projection (no join
    # operator, no shuffle, free at any scale).
    host_meta = F.struct(
        F.lit(spark.conf.get("spark.app.name", "logsentinelai_spark")).alias("host"),
        F.lit("logsentinelai_spark").alias("engine"),
        F.lit(spark.version).alias("spark_version"),
    )
    alerts = (
        stream.withColumn("severity", F.expr(SEVERITY_CASE))
        .filter(F.col("severity").isin(list(severities)))
        .select("event_id", "ts", "user_id", "event_type", "severity",
                F.substring(msg, 1, ALERT_MESSAGE_CAP).alias("message"),
                host_meta.alias("host_meta"),
                F.current_timestamp().alias("alerted_at"))
    )
    writer = (
        alerts.writeStream.format("parquet")
        .option("path", alerts_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if processing_time:
        writer = writer.trigger(processingTime=processing_time)
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
