"""Serve ANN top-k queries against a built ANN index (index/ann.py).

    spark-submit --py-files engine.zip scripts/query_ann.py \
        --ann /data/ann_db --embeddings /data/embeddings_parquet \
        --query-ids 0,1,2 [--method ivfpq|ivf|lsh --k 10 \
         --n-probe 2 --multiprobe 0]

Query vectors are looked up by vec_id from --embeddings (the common
"query by example" case); the underlying API
(``index.ann.ann_search``) accepts arbitrary vectors.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from logsentinelai_spark.index.ann import ann_search  # noqa: E402
from logsentinelai_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True)
    ap.add_argument("--embeddings", required=True)
    ap.add_argument("--query-ids", required=True,
                    help="comma-separated vec_ids to query by example")
    ap.add_argument("--method", default="ivfpq",
                    choices=["ivfpq", "ivf", "lsh"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-probe", type=int, default=2)
    ap.add_argument("--multiprobe", type=int, default=0)
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--master")
    args = ap.parse_args()

    spark = get_spark("query_ann", cpus=args.cpus, master=args.master)
    ids = [int(x) for x in args.query_ids.split(",")]
    rows = (
        spark.read.parquet(args.embeddings)
        .filter(F.col("vec_id").isin(ids))
        .select("vec_id", "embedding")
        .collect()
    )
    queries = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in rows]
    t0 = time.monotonic()
    res = ann_search(
        spark, args.ann, queries, method=args.method, k=args.k,
        n_probe=args.n_probe, multiprobe=args.multiprobe,
        exclude_self=True).collect()
    out = {}
    for r in sorted(res, key=lambda r: (r.query_id, r.rank)):
        out.setdefault(str(r.query_id), []).append(
            {"rank": r.rank, "neighbor_id": r.neighbor_id, "score": r.score})
    print(json.dumps({"method": args.method, "k": args.k,
                      "elapsed_sec": round(time.monotonic() - t0, 3),
                      "results": out}))


if __name__ == "__main__":
    main()
