"""Generic ES-style nested aggregation trees, compiled to ONE pass.

ES `aggs` nest arbitrarily — a Kibana panel is typically
terms -> date_histogram -> metrics (three levels), and a dashboard
panel may place SIBLING bucket aggs at the same level. The reference
delegates these to Elasticsearch's bucket machinery
(/root/reference/INSTALL-and-USAGE.md:451-459 — every dashboard panel
is one composed `_search` body whose `aggs` subtree nests buckets);
this module re-expresses the nesting Spark-first.

A literal translation would run one groupBy per tree node (N corpus
shuffles). `agg_tree` instead compiles the WHOLE TREE into a single
grouping-sets aggregate: every ES bucket node is exactly one
root-to-node PATH of bucket keys, so the set of grouping sets is
{path(node) for every node} plus the empty set (the grand total,
ES's top-level doc_count). Spark's grouping-sets operator (an Expand
below one partial+final HashAggregate) computes all of them in ONE
shuffle with map-side partial aggregation. A single-path tree
degenerates to the prefix chain — semantically `rollup`. That is the
shape that survives 100 TB: tree size never multiplies corpus scans,
and the exchange moves one row per (node bucket), not per event.
Metrics are computed at every set (a superset of ES's per-node metric
placement — ES reports doc_count at every node and metrics where
declared; computing the declared metrics at each set costs nothing
extra in the same pass).

Spec shape (ES `aggs` JSON; sibling buckets allowed)::

    {"by_type": {"terms": {"field": "event_type"},
       "aggs": {"by_day": {"date_histogram": {"field": "ts",
                                              "calendar_interval": "day"},
          "aggs": {"sum_v": {"sum": {"field": "value"}},
                   "avg_v": {"avg": {"field": "value"}}}}}},
     "by_user": {"terms": {"field": "user_id"},
       "aggs": {"max_v": {"max": {"field": "value"}}}}}

Bucket aggs: ``terms``, ``date_histogram`` (calendar_interval
second/minute/hour/day/month/year), ``histogram`` (fixed numeric
``interval``). Metric aggs: ``sum`` / ``avg`` / ``min`` / ``max`` /
``value_count`` / ``cardinality`` (exact countDistinct — the sketch
variant lives in entry_queries.q_events_cardinality).

Output schema: one column per bucket node (named by its agg name, in
tree pre-order), ``gid`` (grouping bitmask over that order — bit set
<=> the node is NOT part of the row's grouping set, so a row's set is
read off gid directly; disambiguates an absent level from a genuine
NULL key), ``doc_count``, then the metric columns. DuckDB's GROUP BY
GROUPING SETS + GROUPING() emits the identical frame, which is what
the `events_agg_tree` / `events_agg_forest` gates pin.
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
    """Walk the ES aggs tree. Returns ``(buckets, sets, metrics)``:
    bucket ``(name, Column)`` pairs in pre-order, the grouping sets as
    name-lists (one per tree node, plus the [] grand total), and
    metric ``(name, Column)`` pairs gathered from every node. Bucket
    agg names must be unique across the tree (they become columns)."""
    buckets: list[tuple[str, Column]] = []
    metrics: list[tuple[str, Column]] = []
    sets: list[list[str]] = [[]]

    def walk(node: dict, path: list[str]) -> None:
        bucket_items = [(n, b) for n, b in node.items()
                        if any(k in b for k in _BUCKET_KINDS)]
        metric_items = [(n, b) for n, b in node.items()
                        if not any(k in b for k in _BUCKET_KINDS)]
        for name, body in metric_items:
            kinds = [k for k in body if k in _METRIC_FNS]
            if len(kinds) != 1:
                raise ValueError(f"unsupported metric agg {name}: {body}")
            metrics.append(
                (name,
                 _METRIC_FNS[kinds[0]](body[kinds[0]]["field"]).alias(name)))
        for name, body in bucket_items:
            if any(name == n for n, _ in buckets):
                raise ValueError(
                    f"duplicate bucket agg name {name!r}: names become "
                    "output columns and must be unique across the tree")
            kind = next(k for k in _BUCKET_KINDS if k in body)
            buckets.append((name, _bucket_col(kind, body[kind]).alias(name)))
            sets.append(path + [name])
            walk(body.get("aggs") or {}, path + [name])

    walk(spec, [])
    return buckets, sets, metrics


def agg_tree(df: DataFrame, spec: dict) -> DataFrame:
    """Execute an ES aggs tree over ``df`` in one grouping-sets pass.

    Bucket expressions are projected to their agg names FIRST and the
    sets reference the named columns: passing the same alias
    expression object in both the set lists and the grouping-column
    list makes Spark's groupingSets treat each occurrence as a
    distinct grouping column (grouping_id grows extra bits);
    name-based references resolve to one column each — verified
    bit-identical to rollup on the single-path case."""
    buckets, sets, metrics = compile_agg_tree(spec)
    aggs = [F.count("*").alias("doc_count"), *[c for _, c in metrics]]
    if not buckets:
        return df.agg(F.lit(0).alias("gid"), *aggs)
    clash = [n for n, _ in buckets if n in df.columns]
    if clash:
        raise ValueError(
            f"bucket agg names {clash} collide with input columns — "
            "withColumn would shadow the field the metrics read")
    for name, col in buckets:
        df = df.withColumn(name, col)
    out = df.groupingSets(
        [[F.col(n) for n in s] for s in sets],
        *[F.col(n) for n, _ in buckets],
    ).agg(F.grouping_id().alias("gid"), *aggs)
    return out.select(*[n for n, _ in buckets], "gid", "doc_count",
                      *[n for n, _ in metrics])
