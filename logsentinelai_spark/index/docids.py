"""Deterministic doc_int_id assignment — SURVEY.md §4.3 item 6.

Contract: ``doc_id = rank of url in the globally url-sorted snapshot``,
stable across cluster sizes and partition counts (rank-identity killer
if wrong; `monotonically_increasing_id` is explicitly NOT acceptable).

Scalable two-phase assignment (no single-task window):
  1. range-partition + sort by url (unique urls assumed — Iceberg
     snapshot primary key)
  2. one small job collects per-partition row counts -> exclusive
     prefix offsets (len = #partitions, driver-side, tiny)
  3. mapInArrow adds offset[partition_id] + local_row_number

The result is independent of the (sampled) range boundaries because
rank(url) = rows in lower ranges + local index, whatever the split.
For test-sized data a plain window is equivalent; we always use the
scalable path so it is the tested path.
"""

from __future__ import annotations

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def assign_doc_ids_with_count(
    pages_df: DataFrame, url_col: str = "url", partitions: int | None = None
) -> tuple[DataFrame, int]:
    """Like assign_doc_ids but also returns the total row count (known
    for free from the offset pass — saves callers a count() job)."""
    df = assign_doc_ids(pages_df, url_col, partitions)
    return df, df._lsai_n_rows  # type: ignore[attr-defined]


def assign_doc_ids(pages_df: DataFrame, url_col: str = "url", partitions: int | None = None) -> DataFrame:
    sess = pages_df.sparkSession
    nparts = partitions or sess.sparkContext.defaultParallelism
    ranged = pages_df.repartitionByRange(nparts, F.col(url_col)).sortWithinPartitions(url_col)
    ranged = ranged.cache()
    counts = (
        ranged.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(by_pid):
        offsets[pid] = acc
        acc += by_pid[pid]
    boff = sess.sparkContext.broadcast(offsets)

    out_schema = T.StructType(list(pages_df.schema.fields) + [T.StructField("doc_id", T.LongType(), False)])

    def _assign(batches):
        base = boff.value[TaskContext.get().partitionId()]
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = ranged.mapInPandas(_assign, schema=out_schema)
    out._lsai_n_rows = acc  # total rows, known from the offset pass
    return out
