"""Generic ES-style nested aggregation trees, compiled to ONE pass.

ES `aggs` nest arbitrarily — a Kibana panel is typically
terms -> date_histogram -> metrics (three levels). The reference
delegates these to Elasticsearch's bucket machinery
(/root/reference/INSTALL-and-USAGE.md:451-459 — every dashboard panel
is one composed `_search` body whose `aggs` subtree nests buckets);
this module re-expresses the nesting Spark-first.

A literal translation would run one groupBy per nesting level (L
corpus shuffles). `agg_tree` instead compiles the whole bucket PATH
into a single ``rollup`` aggregate: Spark's grouping-sets operator
computes every prefix level's buckets — including the grand total, ES's
top-level doc_count — in ONE shuffle with map-side partial aggregation.
That is the shape that survives 100 TB: nesting depth never multiplies
corpus scans, and the exchange moves one row per (deepest) bucket, not
per event. Metrics are computed at every level (a superset of ES's
per-level metric placement — ES reports doc_count at every level and
metrics where declared; computing the declared metrics at each rollup
prefix costs nothing extra in the same pass).

Spec shape (ES `aggs` JSON, single bucket path, metrics at the leaf)::

    {"by_type": {"terms": {"field": "event_type"},
       "aggs": {"by_day": {"date_histogram": {"field": "ts",
                                              "calendar_interval": "day"},
          "aggs": {"sum_v": {"sum": {"field": "value"}},
                   "avg_v": {"avg": {"field": "value"}}}}}}}

Bucket aggs: ``terms``, ``date_histogram`` (calendar_interval
second/minute/hour/day/month/year), ``histogram`` (fixed numeric
``interval``). Metric aggs: ``sum`` / ``avg`` / ``min`` / ``max`` /
``value_count`` / ``cardinality`` (exact countDistinct — the sketch
variant lives in entry_queries.q_events_cardinality).

Output schema: one column per bucket level (named by its agg name),
``gid`` (grouping bitmask — bit set <=> that level is rolled up, so
gid=0 rows are the deepest buckets and gid=2^L-1 is the grand total;
disambiguates a rolled-up NULL from a genuine NULL key), ``doc_count``,
then the metric columns. DuckDB's GROUP BY ROLLUP + GROUPING() emits
the identical frame, which is what the `events_agg_tree` gate pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_BUCKET_KINDS = ("terms", "date_histogram", "histogram")
_METRIC_FNS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "value_count": F.count,
    "cardinality": F.countDistinct,
}

# ES calendar_interval names -> Spark date_trunc units
_CAL_UNITS = {"second": "second", "minute": "minute", "hour": "hour",
              "day": "day", "month": "month", "year": "year"}


def _bucket_col(kind: str, params: dict) -> Column:
    field = params["field"]
    if kind == "terms":
        return F.col(field)
    if kind == "date_histogram":
        unit = _CAL_UNITS[params.get("calendar_interval", "day")]
        return F.date_trunc(unit, F.col(field))
    # histogram: floor(v / interval) * interval, ES bucket key
    iv = float(params["interval"])
    return (F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)).alias(field)


def compile_agg_tree(spec: dict):
    """Walk the ES aggs subtree: returns (bucket (name, Column) pairs
    in path order, metric (name, Column) pairs). Raises on branching
    bucket paths — two sibling bucket aggs need grouping-sets beyond
    rollup; the composed-dashboard case is a single path."""
    buckets: list[tuple[str, Column]] = []
    metrics: list[tuple[str, Column]] = []
    node = spec
    while node:
        bucket_items = [(n, b) for n, b in node.items()
                        if any(k in b for k in _BUCKET_KINDS)]
        metric_items = [(n, b) for n, b in node.items()
                        if not any(k in b for k in _BUCKET_KINDS)]
        if len(bucket_items) > 1:
            raise ValueError(
                "agg_tree compiles a single bucket path; got sibling "
                f"buckets {[n for n, _ in bucket_items]}")
        for name, body in metric_items:
            kinds = [k for k in body if k in _METRIC_FNS]
            if len(kinds) != 1:
                raise ValueError(f"unsupported metric agg {name}: {body}")
            metrics.append(
                (name,
                 _METRIC_FNS[kinds[0]](body[kinds[0]]["field"]).alias(name)))
        if not bucket_items:
            break
        name, body = bucket_items[0]
        kind = next(k for k in _BUCKET_KINDS if k in body)
        buckets.append((name, _bucket_col(kind, body[kind]).alias(name)))
        node = body.get("aggs") or {}
    return buckets, metrics


def agg_tree(df: DataFrame, spec: dict) -> DataFrame:
    """Execute an ES aggs subtree over ``df`` in one rollup pass."""
    buckets, metrics = compile_agg_tree(spec)
    aggs = [F.count("*").alias("doc_count"), *[c for _, c in metrics]]
    if not buckets:
        return df.agg(F.lit(0).alias("gid"), *aggs)
    out = df.rollup(*[c for _, c in buckets]).agg(
        F.grouping_id().alias("gid"), *aggs)
    return out.select(*[n for n, _ in buckets], "gid", "doc_count",
                      *[n for n, _ in metrics])
