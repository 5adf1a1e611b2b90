"""Isolate stage-1's Spark-side scaling: same corpus, same level set,
three variants per level — scan-only (JVM), stage1 compute with a
count action (JVM + IPC + Python, no write), and stage1 with the real
parquet store write. Fresh process per (level, variant).

    python scripts/microbench_stage1_spark.py --docs 500000 --levels 2,8
"""

from __future__ import annotations

import argparse
import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

RUN_SRC = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from logsentinelai_spark.session import get_spark
from logsentinelai_spark.index.build import IndexConfig, stage1_partial_runs
spark = get_spark("iso", cpus={cpus})
pages = spark.read.parquet({pages!r})
cfg = IndexConfig(shard_size={shard_size}, wave_shards=16)
variant = {variant!r}
t0 = time.monotonic()
if variant == "scan":
    r = pages.select(F.sum(F.length("html"))).collect()[0][0]
elif variant == "compute":
    df = stage1_partial_runs(pages.withColumn("doc_id", F.monotonically_increasing_id()), cfg)
    r = df.count()
elif variant == "join":
    # replicate _build_one_wave's exact wave_pages plan (doc_map
    # broadcast join) without the store write
    from logsentinelai_spark.index.docids import (
        doc_map_df, read_doc_map_meta, wave_url_bounds, write_doc_map)
    dm_dir = {out!r} + "_docmap"
    t_dm = time.monotonic()
    dm_meta = write_doc_map(pages, dm_dir)
    dm_sec = time.monotonic() - t_dm
    n = dm_meta["n_docs"]
    t0 = time.monotonic()
    dslice = doc_map_df(spark, dm_dir, dm_meta, 0, n)
    url_lo, url_hi = wave_url_bounds(dm_meta, 0, n)
    wave_pages = pages.filter(F.col("url").between(url_lo, url_hi)).join(
        F.broadcast(dslice), "url")
    df = stage1_partial_runs(wave_pages, cfg)
    r = df.count()
    print(json.dumps({{"doc_map_sec": round(dm_sec, 2)}}))
else:
    df = stage1_partial_runs(pages.withColumn("doc_id", F.monotonically_increasing_id()), cfg)
    df.write.mode("overwrite").partitionBy("kind").parquet({out!r})
    r = -1
print(json.dumps({{"wall": round(time.monotonic() - t0, 2), "r": int(r or 0)}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--variants", default="scan,compute,write")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    variants = args.variants.split(",")

    work = tempfile.mkdtemp(prefix="iso_")
    pages_dir = f"{work}/pages"
    gen = subprocess.run(
        [sys.executable, "-c", (
            "import sys; sys.path.insert(0, %r)\n"
            "from logsentinelai_spark.session import get_spark\n"
            "from logsentinelai_spark.corpus import gen_pages_df\n"
            "s = get_spark('gen', cpus=32)\n"
            "gen_pages_df(s, %d, partitions=64).write.mode('overwrite').parquet(%r)\n"
        ) % (str(REPO), args.docs, pages_dir)],
        capture_output=True, text=True, timeout=1800,
    )
    if gen.returncode != 0:
        raise RuntimeError(gen.stderr[-2000:])

    shard_size = max(2500, args.docs // 16)
    try:
        for cpus in levels:
            for variant in variants:
                out = f"{work}/out_{cpus}_{variant}"
                src = RUN_SRC.format(
                    repo=str(REPO), cpus=cpus, pages=pages_dir,
                    shard_size=shard_size, variant=variant, out=out)
                t0 = time.monotonic()
                p = subprocess.run([sys.executable, "-c", src],
                                   capture_output=True, text=True, timeout=1800)
                wall = time.monotonic() - t0
                if p.returncode != 0:
                    raise RuntimeError(p.stderr[-3000:])
                r = json.loads(p.stdout.strip().splitlines()[-1])
                print(json.dumps({
                    "cpus": cpus, "variant": variant,
                    "job_wall": r["wall"], "proc_wall": round(wall, 1),
                }))
                shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
