"""Table access layer — SURVEY.md §7 hard-parts list: "keep catalog
behind io.py; parquet fallback must preserve snapshot semantics".

Production input is an Iceberg table (BASELINE.json input_hint); this
sandbox has no iceberg-spark-runtime jar, so the reader is gated:

* ``catalog.db.table`` identifiers (or anything without a '/') go
  through ``spark.read.table`` with optional time travel
  (``VERSION AS OF`` snapshot pinning — Iceberg's native snapshot
  isolation, which is what the reference's snapshot-bounded scan
  becomes, SURVEY §2.1 S2/S3).
* paths read as parquet. Snapshot semantics are preserved by the
  engine's OWN layers instead: immutable corpus dirs + the doc_map
  epoch manifest (docids.py) pin exactly which rows a build covers,
  and wave manifests gate reader visibility (lineage.py).

Either way the build sees one DataFrame of
(url, warc_ts, html, text, lang).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def _is_path(source: str) -> bool:
    import os

    return (
        "/" in source
        or "://" in source
        or os.path.exists(source)
    )


def read_table(spark: SparkSession, source: str, snapshot_id: int | None = None) -> DataFrame:
    """Read a table by Iceberg identifier, or a (possibly relative)
    filesystem/URI path as parquet."""
    if not _is_path(source):
        if snapshot_id is not None:
            return spark.read.option("snapshot-id", str(snapshot_id)).table(source)
        return spark.read.table(source)
    return spark.read.parquet(source)


def read_pages(spark: SparkSession, source: str, snapshot_id: int | None = None) -> DataFrame:
    """Pages table with the contract schema, column-pruned lazily."""
    df = read_table(spark, source, snapshot_id)
    missing = [c for c in PAGES_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"pages source {source!r} missing columns {missing}")
    return df.select(*PAGES_COLUMNS)


def read_snapshot(
    spark: SparkSession, path: str, files: list[str] | None = None
) -> tuple[DataFrame, list[str]]:
    """Parquet-shim snapshot read (S2): pin the table to the FILE LIST
    present at first read and return (df over exactly those files,
    the list). Files appended to the directory afterwards are invisible
    to the returned df — the shim analog of an Iceberg
    ``snapshot-id`` read. Persist the returned list and re-pass it as
    ``files`` to re-pin the same snapshot after a crash/restart.

    Defense in depth: even a caller that resumes over a DIRTY directory
    read is protected by the build's own snapshot gates — the doc_map
    epoch fixes which urls have ids, and stage 1 drops rows whose url
    resolves to no id in the wave id-map
    (test_s2_snapshot_pinned_under_concurrent_append pins both layers).
    """
    if files is None:
        files = sorted(spark.read.parquet(path).inputFiles())
    return spark.read.parquet(*files), files


# -------------------------------------------------- scan fan-out (guide §2.5)

_FANOUT_DECISIONS: dict[tuple[int, str], bool] = {}

# Below this input size the round-robin exchange's fixed cost (~0.1-0.2 s
# of extra stage + shuffle) exceeds the serial per-row work it
# parallelizes — measured at sf0.1 (0.6-1.6 MB tables) where fanout
# regressed ~20 sub-second queries by 0.1-0.6 s each, while at sf1.0
# (6-16 MB) it wins 2-5x. Compressed parquet bytes; a work-size gate,
# not a core-count constant (at real scale inputs exceed it AND arrive
# pre-split, so the partition-count check no-ops first).
FANOUT_MIN_BYTES = 4 << 20


def _input_bytes(key: str) -> int | None:
    """Best-effort on-disk size for a fanout key (a path stem like
    '<dir>/documents' or a real path); None when unresolvable."""
    import os
    from pathlib import Path

    for cand in (key, key + ".parquet"):
        p = Path(cand)
        if p.is_file():
            return p.stat().st_size
        if p.is_dir():
            return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())
    return None


def fanout_small_scan(df: DataFrame, key: str | None = None) -> DataFrame:
    """Spread an under-partitioned scan across every core before per-row
    heavy work (guide §2.5 "input skew: one huge unsplittable file ...
    repartition immediately after the read").

    The driver's fixture tables are SINGLE-row-group parquet files, so a
    scan plans as one task no matter what ``maxPartitionBytes`` says
    (parquet splits at row-group granularity) and every downstream
    per-row expression — regex tokenization, JSON parsing, shingling,
    vector math — runs serially on one core. A round-robin repartition
    of the raw rows (a few MB) unlocks the other N-1 cores.

    Scale-adaptive, not local[32] tuning: when the scan already has at
    least ``defaultParallelism`` partitions (pre-split inputs at real
    scale), this is a no-op and adds nothing to the plan. The per-path
    decision is memoized so repeated queries don't re-plan the probe
    RDD just to count partitions.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    ck = None if key is None else (id(sc), key)
    if ck is not None and ck in _FANOUT_DECISIONS:
        need = _FANOUT_DECISIONS[ck]
    else:
        need = df.rdd.getNumPartitions() < target
        if need and key is not None:
            nbytes = _input_bytes(key)
            if nbytes is not None and nbytes < FANOUT_MIN_BYTES:
                need = False
        if ck is not None:
            _FANOUT_DECISIONS[ck] = need
    return df.repartition(target) if need else df
