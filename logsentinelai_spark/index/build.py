"""Distributed inverted-index build — SURVEY.md §7 steps 4-6.

Spark-first architecture (design notes for the 100 TB case inline):

  stage 0  doc_map: deterministic doc_int_id = rank(url) (docids.py),
           written once; resume reuses it (rank-identity requires ids
           never be re-derived).
  waves    the snapshot is processed in waves of ``wave_shards``
           doc-shards (shard = contiguous doc_id range of shard_size
           docs = contiguous url range, since ids are url ranks). A
           wave is the unit of checkpoint/resume; per-wave manifests
           gate visibility (lineage.py). Each wave:
    stage 1  extract + tokenize + per-doc tf via ONE mapInPandas pass
             (no groupBy for tf — term frequency is intra-document, so
             it is computed inside the Arrow batch; the classic
             tf shuffle disappears). Output rows carry dl denormalized
             so the posting build never joins doc_stats (at 10^12 docs
             that join would shuffle the whole corpus per wave).
             Persisted to stage1/wave=N (spill-to-storage checkpoint;
             read twice: postings + doc_stats).
    stage 2  wave term df agg (map-side combine makes this skew-proof:
             reducers see one row per distinct term, not one per
             posting) -> hot-term set (df > threshold) broadcast.
    stage 3  SALTED PARTIAL BUILD: repartition on (shard, term_bucket,
             salt) where salt = doc_id % n_salts for hot terms else 0;
             applyInPandas encodes doc-sorted varbyte block runs per
             term. Hot terms ("the" ≈ 6% of all postings under Zipf)
             would otherwise pin one reducer per shard-bucket.
    stage 4  MERGE: repartition on (shard, term_bucket); single-salt
             terms pass through WITHOUT decode; multi-salt (hot) terms
             k-way-merge their doc-disjoint runs and re-encode. The
             merge group handles compressed blocks (~1-2 B/posting),
             so the hottest group is ~100x smaller than its raw
             postings — bounded task memory by construction.
    stage 5  doc_stats (doc_id, url, dl) partitioned by shard;
             term_stats (term, df, cf) and global_stats (n_docs,
             sum_dl) per wave (final N/avgdl/df = sums over committed
             waves, applied at query time — see codec.py on why blocks
             never bake avgdl in).
    commit   per-(shard,bucket) postings/bytes/blocks metrics gathered
             from the written segment files, then the wave manifest.

Bucket hash is md5-based so the Python query driver and JVM SQL
compute identical buckets without a Spark round-trip.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from collections.abc import Iterator
from dataclasses import asdict, dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.extract import extract_series
from ..functions.tokenizer import tokens_series
from .codec import encode_blocks, decode_blocks
from .docids import assign_doc_ids
from .lineage import StageTimer, commit_wave, committed_waves


@dataclass
class IndexConfig:
    shard_size: int = 1_000_000      # docs per shard (tests use ~512)
    n_buckets: int = 16              # term buckets per shard
    block_size: int = 128            # postings per block
    n_salts: int = 8                 # salt fan-out for hot terms
    hot_df_threshold: int | None = None  # auto: max(1000, wave_docs // 20)
    wave_shards: int = 64            # shards per wave (checkpoint unit)
    keep_stage1: bool = False        # keep stage1 spill after commit
    use_text_col: bool = False       # skip HTML extraction (pre-extracted corpus)

    @property
    def wave_docs(self) -> int:
        return self.shard_size * self.wave_shards


RUN_SCHEMA = (
    "shard long, term_bucket int, salt int, term string, block_id int, n int, "
    "first_doc long, last_doc long, max_tf long, min_dl long, "
    "gaps_vb binary, tfs_vb binary, dls_vb binary"
)
SEGMENT_SCHEMA = RUN_SCHEMA.replace("salt int, ", "")
STAGE1_SCHEMA = "doc_id long, url string, term string, tf long, dl long"


def term_bucket_py(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def term_bucket_col(col, n_buckets: int):
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


# --------------------------------------------------------------------- stage 1

def stage1_postings(pages_with_ids: DataFrame, cfg: IndexConfig) -> DataFrame:
    """One Arrow pass: html -> text -> tokens -> per-doc (term, tf) rows
    plus one doc marker row (term NULL) carrying url + dl."""
    use_text = cfg.use_text_col

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            text = pdf["text"] if use_text else extract_series(pdf["html"])
            toks = tokens_series(text)
            lens = toks.map(len).to_numpy(dtype=np.int64)
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            urls = pdf["url"].to_numpy()
            # doc marker rows
            yield pd.DataFrame(
                {"doc_id": doc_ids, "url": urls, "term": None, "tf": 0, "dl": lens}
            )
            if lens.sum() == 0:
                continue
            flat_docs = np.repeat(doc_ids, lens)
            flat_dls = np.repeat(lens, lens)
            flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
            tf = (
                pd.DataFrame({"doc_id": flat_docs, "term": flat_terms, "dl": flat_dls})
                .groupby(["doc_id", "term", "dl"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )
            yield pd.DataFrame(
                {
                    "doc_id": tf["doc_id"],
                    "url": None,
                    "term": tf["term"],
                    "tf": tf["tf"].astype(np.int64),
                    "dl": tf["dl"],
                }
            )

    return pages_with_ids.select("doc_id", "url", "html" if not use_text else "text").mapInPandas(
        _gen, schema=STAGE1_SCHEMA
    )


# --------------------------------------------------------------------- stages 3+4

def _build_runs_fn(shard_size: int, block_size: int):
    def _build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard, bucket, salt = (int(k) for k in key)
        base = shard * shard_size
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        docs = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        bounds = np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1])))
        bounds = np.append(bounds, len(terms))
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            for blk in encode_blocks(docs[s:e], tfs[s:e], dls[s:e], base, block_size):
                rows.append(
                    (shard, bucket, salt, terms[s], blk["block_id"], blk["n"],
                     blk["first_doc"], blk["last_doc"], blk["max_tf"], blk["min_dl"],
                     blk["gaps_vb"], blk["tfs_vb"], blk["dls_vb"])
                )
        return pd.DataFrame(
            rows,
            columns=["shard", "term_bucket", "salt", "term", "block_id", "n",
                     "first_doc", "last_doc", "max_tf", "min_dl",
                     "gaps_vb", "tfs_vb", "dls_vb"],
        )

    return _build


def _merge_runs_fn(shard_size: int, block_size: int):
    def _merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard, bucket = (int(k) for k in key)
        base = shard * shard_size
        out_cols = ["shard", "term_bucket", "term", "block_id", "n", "first_doc",
                    "last_doc", "max_tf", "min_dl", "gaps_vb", "tfs_vb", "dls_vb"]
        single = pdf.groupby("term")["salt"].transform("nunique") == 1
        passthrough = pdf[single].drop(columns=["salt"])[out_cols]
        hot = pdf[~single]
        if len(hot) == 0:
            return passthrough
        merged_rows = []
        for term, g in hot.groupby("term", sort=False):
            parts = []
            for _, run in g.groupby("salt", sort=True):
                run = run.sort_values("block_id")
                parts.append(decode_blocks(run.itertuples(), base))
            docs = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            order = np.argsort(docs, kind="mergesort")  # doc-disjoint runs
            for blk in encode_blocks(docs[order], tfs[order], dls[order], base, block_size):
                merged_rows.append(
                    (shard, bucket, term, blk["block_id"], blk["n"], blk["first_doc"],
                     blk["last_doc"], blk["max_tf"], blk["min_dl"],
                     blk["gaps_vb"], blk["tfs_vb"], blk["dls_vb"])
                )
        merged = pd.DataFrame(merged_rows, columns=out_cols)
        return pd.concat([passthrough, merged], ignore_index=True)

    return _merge


# --------------------------------------------------------------------- build driver

def build_index(
    spark: SparkSession,
    pages_df: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    fail_after_wave: int | None = None,
) -> dict:
    """Build (or resume) the full index at index_dir. Returns a summary
    dict. ``fail_after_wave`` injects a crash for resume tests."""
    cfg = cfg or IndexConfig()
    out = Path(index_dir)
    out.mkdir(parents=True, exist_ok=True)
    meta_path = out / "_meta.json"

    # ---- stage 0: doc_map (write-once; ids are never re-derived)
    doc_map_dir = out / "doc_map"
    if meta_path.exists() and (doc_map_dir / "_SUCCESS").exists():
        meta = json.loads(meta_path.read_text())
        assert meta["shard_size"] == cfg.shard_size, "config mismatch vs existing index"
        n_docs = meta["n_docs"]
    else:
        # assign ids over urls only — the rank sort must not shuffle html bytes
        with_ids = assign_doc_ids(pages_df.select("url"))
        with_ids.select("url", "doc_id").write.mode("overwrite").parquet(str(doc_map_dir))
        n_docs = spark.read.parquet(str(doc_map_dir)).count()
        meta = dict(asdict(cfg), n_docs=n_docs, created_at=time.time())
        meta_path.write_text(json.dumps(meta, indent=1))

    doc_map = spark.read.parquet(str(doc_map_dir))
    n_waves = max(1, -(-n_docs // cfg.wave_docs))
    done = committed_waves(index_dir)
    summary = {"n_docs": n_docs, "n_waves": n_waves, "skipped_waves": sorted(done), "built_waves": []}

    for wave in range(n_waves):
        if wave in done:
            continue
        _build_one_wave(spark, pages_df, doc_map, index_dir, cfg, wave, n_docs)
        summary["built_waves"].append(wave)
        if fail_after_wave is not None and wave >= fail_after_wave:
            raise RuntimeError(f"injected failure after wave {wave}")
    return summary


def _build_one_wave(spark, pages_df, doc_map, index_dir, cfg: IndexConfig, wave: int, n_docs: int):
    out = Path(index_dir)
    timer = StageTimer()
    lo, hi = wave * cfg.wave_docs, min((wave + 1) * cfg.wave_docs, n_docs)
    stage1_dir = out / "stage1" / f"wave={wave}"

    if not (stage1_dir / "_SUCCESS").exists():
        with timer.time("stage1_extract_tokenize"):
            dslice = doc_map.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            b = dslice.agg(F.min("url").alias("lo"), F.max("url").alias("hi")).collect()[0]
            # url-range pushdown so each wave scans only its slice of the
            # (url-sorted / min-max-pruned) pages table
            wave_pages = pages_df.filter(F.col("url").between(b.lo, b.hi)).join(dslice, "url")
            stage1_postings(wave_pages, cfg).write.mode("overwrite").parquet(str(stage1_dir))

    s1 = spark.read.parquet(str(stage1_dir))
    postings = s1.filter(F.col("term").isNotNull()).drop("url")
    doc_rows = s1.filter(F.col("term").isNull())

    with timer.time("stage2_hot_terms"):
        wave_docs_actual = hi - lo
        thr = cfg.hot_df_threshold or max(1000, wave_docs_actual // 20)
        hot = (
            postings.groupBy("term").agg(F.count("*").alias("wdf"))
            .filter(F.col("wdf") > thr)
            .select("term")
        )
        hot_list = [r.term for r in hot.collect()]
        hot_df = spark.createDataFrame([(t,) for t in hot_list], "term string") if hot_list else None

    with timer.time("stage3_4_salted_build_merge"):
        p = postings.withColumn("shard", (F.col("doc_id") / cfg.shard_size).cast("long")).withColumn(
            "term_bucket", term_bucket_col(F.col("term"), cfg.n_buckets)
        )
        if hot_df is not None:
            p = p.join(F.broadcast(hot_df.withColumn("_hot", F.lit(1))), "term", "left")
        else:
            p = p.withColumn("_hot", F.lit(None).cast("int"))
        p = p.withColumn(
            "salt",
            F.when(F.col("_hot").isNotNull(), (F.col("doc_id") % cfg.n_salts).cast("int")).otherwise(F.lit(0)),
        ).drop("_hot")
        runs = p.groupBy("shard", "term_bucket", "salt").applyInPandas(
            _build_runs_fn(cfg.shard_size, cfg.block_size), schema=RUN_SCHEMA
        )
        segments = runs.groupBy("shard", "term_bucket").applyInPandas(
            _merge_runs_fn(cfg.shard_size, cfg.block_size), schema=SEGMENT_SCHEMA
        )
        seg_dir = out / "postings" / f"wave={wave}"
        segments.write.mode("overwrite").partitionBy("shard", "term_bucket").parquet(str(seg_dir))

    with timer.time("stage5_stats"):
        (
            doc_rows.select("doc_id", "url", "dl")
            .withColumn("shard", (F.col("doc_id") / cfg.shard_size).cast("long"))
            .write.mode("overwrite").partitionBy("shard")
            .parquet(str(out / "doc_stats" / f"wave={wave}"))
        )
        (
            postings.groupBy("term").agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
            .withColumn("term_bucket", term_bucket_col(F.col("term"), cfg.n_buckets))
            .write.mode("overwrite").partitionBy("term_bucket")
            .parquet(str(out / "term_stats" / f"wave={wave}"))
        )
        doc_rows.agg(
            F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
        ).write.mode("overwrite").parquet(str(out / "global_stats" / f"wave={wave}"))

    with timer.time("commit_metrics"):
        seg = spark.read.parquet(str(out / "postings" / f"wave={wave}"))
        part_metrics = [
            r.asDict()
            for r in seg.groupBy("shard", "term_bucket")
            .agg(
                F.countDistinct("term").alias("n_terms"),
                F.count("*").alias("n_blocks"),
                F.sum("n").alias("postings"),
                F.sum(F.length("gaps_vb") + F.length("tfs_vb") + F.length("dls_vb")).alias("bytes"),
            )
            .collect()
        ]
        g = spark.read.parquet(str(out / "global_stats" / f"wave={wave}")).collect()[0]

    if not cfg.keep_stage1:
        shutil.rmtree(stage1_dir, ignore_errors=True)

    commit_wave(
        index_dir,
        {
            "wave": wave,
            "input_split": {"doc_lo": lo, "doc_hi": hi},
            "input_docs": int(g.n_docs),
            "sum_dl": int(g.sum_dl or 0),
            "hot_terms": len(hot_list),
            "stage_elapsed_sec": timer.stages,
            "partitions": part_metrics,
        },
    )
