"""Generation compaction — Lucene segment merge for this index.

``extend_index`` appends per-epoch waves forever; Lucene's core
maintenance loop is the background segment MERGE that rewrites many
small segments into one and physically drops tombstoned documents
(the ES force-merge the reference's index lifecycle relies on —
call518/LogSentinelAI INSTALL-and-USAGE.md:360-386 ILM policy).
:func:`compact_index` is that operation:

  * every committed wave's posting segments are rewritten into ONE new
    generation (``<index>/gen_K/`` — a complete, self-contained index
    dir with a single wave), via the same grouped shuffle shape as the
    build's stage-2 merge: groupBy(shard, term_bucket) →
    applyInArrow → partitioned task-commit write;
  * the generation may RE-SHARD (``shard_size`` = an integer multiple
    of the current one, default 4x): every old shard nests wholly
    inside one new shard, so the regroup is the same one shuffle —
    and since shard = doc_id // shard_size is pure arithmetic, doc ids
    NEVER change (rank identity by construction; Lucene renumbers
    docids on merge, we widen the shard arithmetic instead). This is
    what physically coalesces files: extend-epochs leave partial
    shards at every epoch boundary and one (shard, bucket) segment
    file each — k small shards fold into one;
  * documents tombstoned by deletes.delete_docs are PHYSICALLY dropped:
    postings decoded, masked, re-encoded (positions included); doc rows
    anti-joined out; manifest stats (N, avgdl, df-bearing block ``n``)
    recomputed from the survivors — after compaction deleted docs stop
    affecting BM25 stats, exactly Lucene's post-merge behavior;
  * a same-shard-size, no-tombstone compaction takes a pure copy fast
    path per group (committed segments are already merged and
    doc-sorted — no decode), Lucene's common case: a merge is mostly
    a sequential copy;
  * the cutover is transactional: the generation dir is fully written
    and its wave manifest committed BEFORE the root ``_generation.json``
    pointer flips (atomic rename, the extend_ann discipline). A crash
    at any point leaves the previous generation served. After the flip
    the old generation's ``postings/ store/ manifest/ doc_map*`` at the
    root are dead weight and removable (pytest-pinned).

Scale shape: one wide shuffle moving COMPRESSED blocks (identical to
the build's only wide shuffle), one doc-row rewrite, no driver-sized
state. Shards are doc-disjoint across waves by construction, so the
"merge" never k-ways posting lists across segments — within a new
shard, each term's old-shard runs are doc-disjoint and already
ordered, so re-encoding is one concatenated pass.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

import numpy as np
from pyspark.sql import SparkSession, functions as F

from .build import _segment_rows_arrow_schema
from .codec import (
    decode_stream, encode_blocks_grouped, encode_pos_blocks,
    gather_entry_slices, vb_decode,
)
from .deletes import clear_deletes, read_deletes, shard_slice
from .lineage import StageTimer, commit_wave, committed_waves, resolve_index_dir


def _compact_fn(old_size: int, new_size: int, block_size: int, codec: str,
                positions: bool, dels: np.ndarray | None):
    """Per-(new shard, term_bucket) rewrite body. Pure copy when the
    group needs neither re-sharding nor tombstone drops; otherwise each
    (term, old shard) run decodes, masks, and the term's runs re-encode
    as one concatenated doc-ascending stream (old shards ascend =>
    disjoint ascending doc ranges). Emits the same in-band metrics row
    convention as build._merge_rows_fn (block_id = -1: n=n_terms,
    first_doc=postings, last_doc=bytes, max_tf=elapsed_ms,
    min_dl=n_blocks)."""

    def _fn(key, tbl):
        import pyarrow as pa

        t0 = time.monotonic()
        schema = _segment_rows_arrow_schema()
        shard_new, bucket = (
            int(k.as_py() if hasattr(k, "as_py") else k) for k in key)
        base_new = shard_new * new_size
        pdf = tbl.to_pandas()
        pdf = pdf[pdf["block_id"] >= 0]
        if pdf.empty:
            return schema.empty_table()
        pdf = pdf.sort_values(["term", "shard", "block_id"],
                              kind="mergesort", ignore_index=True)
        excl = shard_slice(dels, base_new, new_size)
        if excl is None and new_size == old_size:
            # copy-merge: already one doc-sorted run per term at the
            # right base — re-emit untouched (the write coalesces files)
            out = pa.table(
                {c: (pa.array(list(pdf[c]), type=pa.binary())
                     if c in ("gaps_vb", "tfs_vb", "dls_vb", "pos_vb")
                     else pa.array(pdf[c].to_numpy(),
                                   type=schema.field(c).type))
                 for c in schema.names}, schema=schema)
            n_terms = int(pdf["term"].nunique())
            postings = int(pdf["n"].sum())
            nb = len(pdf)
            seg_bytes = int(sum(
                pdf[c].map(lambda b: len(b) if b is not None else 0).sum()
                for c in ("gaps_vb", "tfs_vb", "dls_vb", "pos_vb")))
        else:
            terms = pdf["term"].to_numpy()
            shards_old = pdf["shard"].to_numpy()
            gaps_a = pdf["gaps_vb"].to_numpy()
            tfs_a = pdf["tfs_vb"].to_numpy()
            dls_a = pdf["dls_vb"].to_numpy()
            pos_a = pdf["pos_vb"].to_numpy() if positions else None
            # run = maximal (term, old shard) span; gap chains reset there
            new_run = np.concatenate(([True],
                                      (terms[1:] != terms[:-1])
                                      | (shards_old[1:] != shards_old[:-1])))
            bnd = np.append(np.flatnonzero(new_run), len(terms))
            d_parts, t_parts, l_parts, p_parts, ps_parts = [], [], [], [], []
            run_terms, run_sizes = [], []
            for s, e in zip(bnd[:-1], bnd[1:]):
                obase = int(shards_old[s]) * old_size
                gaps = decode_stream(gaps_a[s:e], codec).astype(np.int64)
                docs = np.cumsum(gaps) + obase
                tfs = decode_stream(tfs_a[s:e], codec).astype(np.int64)
                keep = (np.ones(docs.size, dtype=bool) if excl is None
                        else ~np.isin(docs, excl, assume_unique=True))
                if not keep.any():
                    continue
                dls = decode_stream(dls_a[s:e], codec).astype(np.int64)
                if positions:
                    # per-posting self-contained delta streams: dropping
                    # or re-basing entries needs no re-coding (build.py
                    # invariant)
                    deltas = vb_decode(b"".join(
                        b for b in pos_a[s:e] if b is not None
                    )).astype(np.int64)
                    entry_starts = np.cumsum(tfs) - tfs
                    keep_idx = np.flatnonzero(keep)
                    p_parts.append(gather_entry_slices(
                        deltas, entry_starts, tfs, keep_idx))
                    ps_parts.append(tfs[keep_idx])
                d_parts.append(docs[keep])
                t_parts.append(tfs[keep])
                l_parts.append(dls[keep])
                run_terms.append(terms[s])
                run_sizes.append(int(keep.sum()))
            if not d_parts:
                return schema.empty_table()
            docs = np.concatenate(d_parts)
            tfs = np.concatenate(t_parts)
            dls = np.concatenate(l_parts)
            # fold consecutive same-term runs into one group (runs are
            # term-sorted, old-shard ascending => docs already sorted)
            rt = np.asarray(run_terms, dtype=object)
            rs = np.asarray(run_sizes, dtype=np.int64)
            new_term = np.concatenate(([True], rt[1:] != rt[:-1]))
            uniq_terms = rt[new_term]
            run_offsets = np.cumsum(rs) - rs
            group_starts = run_offsets[new_term]
            enc = encode_blocks_grouped(
                docs, tfs, dls, group_starts,
                np.full(group_starts.size, base_new, dtype=np.int64),
                block_size, codec=codec)
            gid = enc["gid"]
            nb = int(gid.size)
            if positions:
                enc["pos_vb"] = encode_pos_blocks(
                    pa, np.concatenate(p_parts), np.concatenate(ps_parts),
                    enc["n"])
            else:
                enc["pos_vb"] = pa.nulls(nb, pa.binary())
            out = pa.table(
                {
                    "shard": pa.array(np.full(nb, shard_new, dtype=np.int64)),
                    "term_bucket": pa.array(
                        np.full(nb, bucket, dtype=np.int32)),
                    "term": pa.array(uniq_terms[gid], type=pa.string()),
                    "block_id": pa.array(enc["block_id"].astype(np.int32)),
                    "n": pa.array(enc["n"].astype(np.int32)),
                    "first_doc": pa.array(enc["first_doc"]),
                    "last_doc": pa.array(enc["last_doc"]),
                    "max_tf": pa.array(enc["max_tf"]),
                    "min_dl": pa.array(enc["min_dl"]),
                    "sum_tf": pa.array(enc["group_sum_tf"][gid]),
                    "gaps_vb": enc["gaps_vb"],
                    "tfs_vb": enc["tfs_vb"],
                    "dls_vb": enc["dls_vb"],
                    "pos_vb": enc["pos_vb"],
                },
                schema=schema)
            n_terms = len(uniq_terms)
            postings = int(enc["n"].sum())
            seg_bytes = sum(
                len(enc[c].buffers()[2])
                for c in ("gaps_vb", "tfs_vb", "dls_vb"))
            if positions:
                seg_bytes += len(enc["pos_vb"].buffers()[2])
        elapsed_ms = int((time.monotonic() - t0) * 1000)
        metrics = pa.table(
            {
                "shard": pa.array([shard_new], type=pa.int64()),
                "term_bucket": pa.array([bucket], type=pa.int32()),
                "term": pa.array([None], type=pa.string()),
                "block_id": pa.array([-1], type=pa.int32()),
                "n": pa.array([n_terms], type=pa.int32()),
                "first_doc": pa.array([postings], type=pa.int64()),
                "last_doc": pa.array([int(seg_bytes)], type=pa.int64()),
                "max_tf": pa.array([elapsed_ms], type=pa.int64()),
                "min_dl": pa.array([int(nb)], type=pa.int64()),
                "sum_tf": pa.array([-1], type=pa.int64()),
                "gaps_vb": pa.array([None], type=pa.binary()),
                "tfs_vb": pa.array([None], type=pa.binary()),
                "dls_vb": pa.array([None], type=pa.binary()),
                "pos_vb": pa.array([None], type=pa.binary()),
            },
            schema=schema)
        return pa.concat_tables([out, metrics])

    return _fn


def _count_parquet_files(root: Path) -> int:
    return sum(1 for _ in root.rglob("*.parquet")) if root.exists() else 0


def compact_index(spark: SparkSession, index_dir: str,
                  shard_size: int | None = None) -> dict:
    """Rewrite the live generation into ``<index_dir>/gen_K`` and flip
    the root pointer. ``shard_size``: the new generation's shard size —
    must be an integer multiple of the current one (doc ids never
    change); default 4x current (the file-coalescing merge). Pass the
    current size to force a layout-preserving rewrite (pure copy fast
    path when no deletes are pending). Returns a summary dict
    (generation, live/dropped docs, file counts before/after)."""
    root = Path(index_dir)
    live = resolve_index_dir(index_dir)
    meta = json.loads((live / "_meta.json").read_text())
    waves = committed_waves(str(live))
    if not waves:
        raise FileNotFoundError(f"no committed waves in {live}")
    old_size = int(meta["shard_size"])
    new_size = int(shard_size) if shard_size else 4 * old_size
    if new_size % old_size != 0:
        raise ValueError(
            f"compacted shard_size {new_size} must be a multiple of the "
            f"current {old_size} (doc ids are shard-arithmetic, they "
            "never change)")
    dels = read_deletes(live)
    dels = dels if dels.size else None
    gen = int(meta.get("generation", 0)) + 1
    gen_dir = root / f"gen_{gen}"
    if gen_dir.exists():
        shutil.rmtree(gen_dir)  # uncommitted leftovers from a crash
    gen_dir.mkdir(parents=True)
    timer = StageTimer()

    codec = meta.get("codec", "varbyte")
    positions = bool(meta.get("positions", False))
    k_fold = new_size // old_size

    # ---- postings rewrite (the one wide shuffle; compressed blocks)
    with timer.time("compact_postings"):
        post_root = live / "postings"
        src = spark.read.option("basePath", str(post_root)).parquet(
            *[str(post_root / f"wave={w}") for w in sorted(waves)])
        cols = [
            F.col("shard").cast("long").alias("shard"),
            F.col("term_bucket").cast("int").alias("term_bucket"),
            "term", "block_id", "n", "first_doc", "last_doc",
            "max_tf", "min_dl", "sum_tf", "gaps_vb", "tfs_vb", "dls_vb",
        ]
        has_pos = "pos_vb" in src.columns
        src = src.select(*cols, *(["pos_vb"] if has_pos else []))
        if not has_pos:
            src = src.withColumn("pos_vb", F.lit(None).cast("binary"))
        src = src.withColumn(
            "shard_new", (F.col("shard") / k_fold).cast("long")
            if k_fold > 1 else F.col("shard"))
        seg_dir = gen_dir / "postings" / "wave=0"
        (
            src.groupBy("shard_new", "term_bucket")
            .applyInArrow(
                _compact_fn(old_size, new_size, int(meta["block_size"]),
                            codec, positions, dels),
                schema=(
                    "shard long, term_bucket int, term string, "
                    "block_id int, n int, first_doc long, last_doc long, "
                    "max_tf long, min_dl long, sum_tf long, "
                    "gaps_vb binary, tfs_vb binary, dls_vb binary, "
                    "pos_vb binary"),
            )
            .write.mode("overwrite")
            .partitionBy("shard", "term_bucket")
            .parquet(str(seg_dir))
        )
        part_metrics = [
            r.asDict()
            for r in spark.read.option("basePath", str(seg_dir))
            .parquet(str(seg_dir))
            .filter(F.col("block_id") == -1)
            .select(
                F.col("shard").cast("long").alias("shard"),
                F.col("term_bucket").cast("int").alias("term_bucket"),
                F.col("n").cast("long").alias("n_terms"),
                F.col("min_dl").alias("n_blocks"),
                F.col("first_doc").alias("postings"),
                F.col("last_doc").alias("bytes"),
                F.col("max_tf").alias("elapsed_ms"),
            )
            .collect()
        ]

    # ---- doc rows rewrite (anti-join drops tombstoned docs; shard
    # recomputed for the new arithmetic)
    with timer.time("compact_store"):
        store_root = live / "store"
        docs = spark.read.parquet(
            *[str(store_root / f"wave={w}" / "kind=0") for w in sorted(waves)]
        ).select("doc_id", "url", "dl",
                 F.expr(f"doc_id DIV {new_size}").alias("shard"))
        if dels is not None:
            del_df = spark.createDataFrame(
                [(int(d),) for d in dels], "doc_id long")
            docs = docs.join(F.broadcast(del_df), "doc_id", "left_anti")
        store_out = gen_dir / "store" / "wave=0" / "kind=0"
        docs.write.mode("overwrite").parquet(str(store_out))
        g = spark.read.parquet(str(store_out)).agg(
            F.count("*").alias("n"), F.sum("dl").alias("sum_dl")).collect()[0]
        live_docs, live_sum_dl = int(g.n), int(g.sum_dl or 0)

    # ---- doc_map epochs: carried into the generation so extend_index's
    # url anti-join keeps working (at deployment scale this is an
    # object-store server-side copy, not a recompute). Deleted urls stay
    # mapped — re-adding a deleted url is a no-op, the url-keyed
    # snapshot contract.
    with timer.time("copy_doc_maps"):
        for ep in meta["epochs"]:
            shutil.copytree(live / ep["dir"], gen_dir / ep["dir"])

    # ---- commit: manifest, then meta, then the root pointer LAST
    commit_wave(str(gen_dir), {
        "wave": 0,
        "input_split": {"doc_lo": 0, "doc_hi": int(meta["id_hw"])},
        "input_docs": live_docs,
        "sum_dl": live_sum_dl,
        "stage_elapsed_sec": timer.stages,
        "partitions": part_metrics,
        "compacted_from_waves": sorted(waves),
        "dropped_docs": int(dels.size) if dels is not None else 0,
    })
    gen_meta = dict(
        meta, generation=gen, shard_size=new_size,
        # wave 0 covers everything up to the compaction point; later
        # extends enumerate fresh waves from wave_base upward, and the
        # next epoch base aligns to the NEW shard arithmetic
        compacted_through=int(meta["id_hw"]),
        wave_base=1,
    )
    (gen_dir / "_meta.json").write_text(json.dumps(gen_meta, indent=1))
    ptmp = root / "._generation.json.tmp"
    ptmp.write_text(json.dumps({"dir": f"gen_{gen}", "generation": gen}))
    os.replace(ptmp, root / "_generation.json")

    # the retired generation's tombstones are now physically applied;
    # drop its pointer + versioned parquet so nothing can resurrect them
    clear_deletes(live)

    return {
        "generation": gen,
        "dir": str(gen_dir),
        "shard_size": new_size,
        "live_docs": live_docs,
        "dropped_docs": int(dels.size) if dels is not None else 0,
        "files_before": _count_parquet_files(live / "postings"),
        "files_after": _count_parquet_files(gen_dir / "postings"),
        "stage_elapsed_sec": timer.stages,
    }
