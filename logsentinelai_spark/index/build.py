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

    stage 1  PARTIAL RUNS (one fused Arrow pass): html -> text ->
             tokens -> per-doc tf -> per-(shard, term_bucket) varbyte
             block runs, all inside mapInPandas. Term frequency is
             intra-document, so no shuffle computes it; doc length is
             denormalized into the runs so the posting build never
             joins doc_stats (at 10^12 docs that join would shuffle
             the whole corpus). Each Arrow batch emits doc-sorted
             compressed runs keyed by a unique run id ("salt" = source
             partition/batch) — the map-side combine of the classic
             partial+final aggregation, except the partials are
             already in final (compressed block) form. Output spills
             to stage1/wave=N parquet (~10x smaller than raw posting
             rows), which is also the intra-wave resume point.

    stage 2  SALTED MERGE: the ONLY wide shuffle in the build, and it
             moves compressed blocks, not postings. groupBy(shard,
             term_bucket) k-way-merges each term's doc-disjoint salted
             runs into globally doc-sorted, block-max-annotated
             segments; single-run terms pass through without decode.
             Hot-term skew is defeated structurally: a hot term
             ("the" ≈ 6% of postings under Zipf) arrives as many
             small runs salted by source partition, and the merge
             group's size is bounded by compressed bytes of one
             (shard, 1/n_buckets vocabulary slice) — ~100x smaller
             than its raw postings.

    commit   per-(shard, term_bucket) postings/bytes/blocks metrics
             gathered from the written segment files; (n_docs, sum_dl)
             from the doc rows; both land in the wave manifest
             (lineage.py). After commit the kind=1 run partitions are
             deleted; the kind=0 doc rows (doc_id, url, dl) REMAIN —
             they ARE the doc_stats table, shard-partitioned, written
             as a by-product of stage 1 (no separate write job).

Deliberately ABSENT (driver-latency design — a 1000-executor cluster
amortizes task time, but per-ACTION driver latency is serial and
identical at every cluster size, so each wave runs exactly 5 actions:
bounds-agg, stage1 write, merge write, doc agg, metrics agg):
  * no term_stats table — global df(t) = Σ block n over t's block
    rows, computed from the SAME pruned block scan every query already
    performs for scoring;
  * no global_stats table — N and avgdl are manifest sums (driver
    arithmetic at read time);
  * no doc_stats write — see commit above.

Final N/avgdl/df are applied at query time (see codec.py on why
blocks never bake avgdl in). Bucket hash is md5-based so the Python
query driver and JVM SQL compute identical buckets without a Spark
round-trip.
"""

from __future__ import annotations

import hashlib
import json
import shutil
import time
from collections.abc import Iterator
from dataclasses import asdict, dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.extract import extract_series
from ..functions.tokenizer import tokens_series
from .codec import encode_blocks, vb_decode
from .docids import assign_doc_ids_with_count
from .lineage import StageTimer, commit_wave, committed_waves


@dataclass
class IndexConfig:
    shard_size: int = 1_000_000      # docs per shard (tests use ~512)
    n_buckets: int = 16              # term buckets per shard
    block_size: int = 128            # postings per block
    wave_shards: int = 64            # shards per wave (checkpoint unit)
    use_text_col: bool = False       # skip HTML extraction (pre-extracted corpus)

    @property
    def wave_docs(self) -> int:
        return self.shard_size * self.wave_shards


# stage1 union-typed output: kind 0 = doc row (url, dl), kind 1 = run block row
STAGE1_SCHEMA = (
    "kind int, doc_id long, url string, dl long, "
    "shard long, term_bucket int, salt long, term string, block_id int, n int, "
    "first_doc long, last_doc long, max_tf long, min_dl long, sum_tf long, "
    "gaps_vb binary, tfs_vb binary, dls_vb binary"
)
RUN_COLS = ["shard", "term_bucket", "salt", "term", "block_id", "n", "first_doc",
            "last_doc", "max_tf", "min_dl", "sum_tf", "gaps_vb", "tfs_vb", "dls_vb"]
ALL_COLS = ["kind", "doc_id", "url", "dl", *RUN_COLS]
SEGMENT_SCHEMA = (
    "shard long, term_bucket int, term string, block_id int, n int, "
    "first_doc long, last_doc long, max_tf long, min_dl long, sum_tf long, "
    "gaps_vb binary, tfs_vb binary, dls_vb binary"
)


def term_bucket_py(term: str, n_buckets: int) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def term_bucket_col(col, n_buckets: int):
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def _bucket_np(terms: np.ndarray, n_buckets: int) -> np.ndarray:
    return np.fromiter(
        (term_bucket_py(t, n_buckets) for t in terms), dtype=np.int32, count=len(terms)
    )


# --------------------------------------------------------------------- stage 1

def stage1_partial_runs(pages_with_ids: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Fused extract + tokenize + tf + per-batch compressed run build.

    Emits doc marker rows (kind=0: doc_id, url, dl) and run block rows
    (kind=1) in one Arrow pass — no posting-row shuffle ever exists.
    """
    use_text = cfg.use_text_col
    shard_size, n_buckets, block_size = cfg.shard_size, cfg.n_buckets, cfg.block_size

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        for bi, pdf in enumerate(batches):
            if len(pdf) == 0:
                continue
            run_id = pid * 1_000_000 + bi
            text = pdf["text"] if use_text else extract_series(pdf["html"])
            toks = tokens_series(text)
            lens = toks.map(len).to_numpy(dtype=np.int64)
            doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            docs_out = pd.DataFrame(
                {"kind": 0, "doc_id": doc_ids, "url": pdf["url"].to_numpy(), "dl": lens}
            )
            for c in RUN_COLS:
                docs_out[c] = (
                    None if c in ("term", "gaps_vb", "tfs_vb", "dls_vb") else -1
                )
            # doc rows land in kind=0/shard=S dirs: they ARE doc_stats
            docs_out["shard"] = doc_ids // shard_size
            yield docs_out[ALL_COLS]
            if lens.sum() == 0:
                continue
            flat = pd.DataFrame(
                {
                    "doc_id": np.repeat(doc_ids, lens),
                    "dl": np.repeat(lens, lens),
                    "term": np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)]),
                }
            )
            tf = (
                flat.groupby(["doc_id", "term", "dl"], sort=False)
                .size()
                .rename("tf")
                .reset_index()
            )
            terms = tf["term"].to_numpy()
            docs = tf["doc_id"].to_numpy(dtype=np.int64)
            tfs = tf["tf"].to_numpy(dtype=np.int64)
            dls = tf["dl"].to_numpy(dtype=np.int64)
            shards = docs // shard_size
            # encode doc-sorted runs per (shard, term): one lexsort, then
            # contiguous slices per (shard, term) group
            order = np.lexsort((docs, terms, shards))
            terms, docs, tfs, dls, shards = (
                terms[order], docs[order], tfs[order], dls[order], shards[order])
            newgrp = np.concatenate(
                ([True], (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1])))
            bounds = np.append(np.flatnonzero(newgrp), len(terms))
            rows = []
            for s, e in zip(bounds[:-1], bounds[1:]):
                shard = int(shards[s])
                base = shard * shard_size
                for blk in encode_blocks(docs[s:e], tfs[s:e], dls[s:e], base, block_size):
                    rows.append(
                        (shard, term_bucket_py(terms[s], n_buckets), run_id, terms[s],
                         blk["block_id"], blk["n"], blk["first_doc"], blk["last_doc"],
                         blk["max_tf"], blk["min_dl"], int(tfs[s:e].sum()),
                         blk["gaps_vb"], blk["tfs_vb"], blk["dls_vb"])
                    )
            out = pd.DataFrame(rows, columns=RUN_COLS)
            out.insert(0, "kind", 1)
            out.insert(1, "doc_id", -1)
            out.insert(2, "url", None)
            out.insert(3, "dl", -1)
            yield out[ALL_COLS]

    return pages_with_ids.select(
        "doc_id", "url", "text" if use_text else "html"
    ).mapInPandas(_gen, schema=STAGE1_SCHEMA)


# --------------------------------------------------------------------- stage 2

def _merge_runs_fn(shard_size: int, block_size: int):
    """Vectorized run merge. Within a run the per-block gap streams
    chain (block b's first gap is relative to block b-1's last doc), and
    varbyte is self-delimiting — so one run's gaps decode in a SINGLE
    vb_decode over the concatenated blobs: docs = base + cumsum. No
    pandas itertuples / per-block Python anywhere on the hot path."""

    def _merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard, bucket = (int(k) for k in key)
        base = shard * shard_size
        out_cols = ["shard", "term_bucket", "term", "block_id", "n", "first_doc",
                    "last_doc", "max_tf", "min_dl", "sum_tf", "gaps_vb", "tfs_vb", "dls_vb"]
        pdf = pdf.sort_values(["term", "salt", "block_id"], kind="mergesort", ignore_index=True)
        terms = pdf["term"].to_numpy()
        salts = pdf["salt"].to_numpy()
        n_rows = len(terms)
        tb = np.append(
            np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1]))), n_rows)
        gaps_a = pdf["gaps_vb"].to_numpy()
        tfs_a = pdf["tfs_vb"].to_numpy()
        dls_a = pdf["dls_vb"].to_numpy()
        pass_mask = np.zeros(n_rows, dtype=bool)
        merged_rows = []
        for s, e in zip(tb[:-1], tb[1:]):
            if salts[s] == salts[e - 1]:  # rows sorted by salt -> single run
                pass_mask[s:e] = True
                continue
            ssl = salts[s:e]
            rb = np.flatnonzero(np.concatenate(([True], ssl[1:] != ssl[:-1]))) + s
            rb = np.append(rb, e)
            docs_p, tf_p, dl_p = [], [], []
            for rs, re_ in zip(rb[:-1], rb[1:]):
                g = vb_decode(b"".join(gaps_a[rs:re_])).astype(np.int64)
                docs_p.append(np.cumsum(g) + base)
                tf_p.append(vb_decode(b"".join(tfs_a[rs:re_])).astype(np.int64))
                dl_p.append(vb_decode(b"".join(dls_a[rs:re_])).astype(np.int64))
            docs = np.concatenate(docs_p)
            tfs = np.concatenate(tf_p)
            dls = np.concatenate(dl_p)
            order = np.argsort(docs, kind="mergesort")  # doc-disjoint runs
            docs, tfs, dls = docs[order], tfs[order], dls[order]
            sum_tf = int(tfs.sum())
            for blk in encode_blocks(docs, tfs, dls, base, block_size):
                merged_rows.append(
                    (shard, bucket, terms[s], blk["block_id"], blk["n"], blk["first_doc"],
                     blk["last_doc"], blk["max_tf"], blk["min_dl"], sum_tf,
                     blk["gaps_vb"], blk["tfs_vb"], blk["dls_vb"])
                )
        passthrough = pdf.loc[pass_mask, out_cols]
        if not merged_rows:
            return passthrough
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
        # assign ids over urls only — the rank sort must not shuffle html
        # bytes; row count comes from the offset pass (no count() job)
        with_ids, n_docs = assign_doc_ids_with_count(pages_df.select("url"))
        with_ids.select("url", "doc_id").write.mode("overwrite").parquet(str(doc_map_dir))
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
    store_dir = out / "store" / f"wave={wave}"

    # resume-safe: runs (kind=1) are deleted after commit, so an
    # uncommitted wave with a half-gone store is recomputed
    if not ((store_dir / "_SUCCESS").exists() and (store_dir / "kind=1").exists()):
        with timer.time("stage1_partial_runs"):
            dslice = doc_map.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            b = dslice.agg(F.min("url").alias("lo"), F.max("url").alias("hi")).collect()[0]
            # url-range pushdown so each wave scans only its slice of the
            # (url-sorted / min-max-pruned) pages table
            wave_pages = pages_df.filter(F.col("url").between(b.lo, b.hi)).join(dslice, "url")
            (
                stage1_partial_runs(wave_pages, cfg)
                .write.mode("overwrite")
                .partitionBy("kind", "shard", "term_bucket")
                .parquet(str(store_dir))
            )

    s1 = spark.read.parquet(str(store_dir))
    runs = s1.filter(F.col("kind") == 1).drop("kind", "doc_id", "url", "dl")
    doc_rows = s1.filter(F.col("kind") == 0).select("doc_id", "url", "dl")

    with timer.time("stage2_salted_merge"):
        segments = runs.groupBy("shard", "term_bucket").applyInPandas(
            _merge_runs_fn(cfg.shard_size, cfg.block_size), schema=SEGMENT_SCHEMA
        )
        seg_dir = out / "postings" / f"wave={wave}"
        segments.write.mode("overwrite").partitionBy("shard", "term_bucket").parquet(str(seg_dir))

    with timer.time("commit_metrics"):
        g = doc_rows.agg(F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")).collect()[0]
        seg = spark.read.parquet(str(seg_dir))
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

    commit_wave(
        index_dir,
        {
            "wave": wave,
            "input_split": {"doc_lo": lo, "doc_hi": hi},
            "input_docs": int(g.n_docs),
            "sum_dl": int(g.sum_dl or 0),
            "stage_elapsed_sec": timer.stages,
            "partitions": part_metrics,
        },
    )
    # runs served their purpose; doc rows remain as the doc_stats table
    shutil.rmtree(store_dir / "kind=1", ignore_errors=True)
