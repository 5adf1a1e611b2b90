"""Build (or incrementally extend) the materialized ANN index from an
embeddings table — the production ingest-time counterpart of the
session-scoped cache in operators/similarity.py.

    spark-submit --py-files engine.zip scripts/build_ann.py \
        --embeddings /data/embeddings_parquet --out /data/ann_db \
        [--extend] [--cpus 32 --master ...]

Writes pq_codes/, ivf_lists/ (IVFFlat), ivfpq_lists/ (IVFADC) and
_ann_meta.json (see index/ann.py). Models are the deterministic
step-0 seeds by default; pass --lloyd-iters N to Lloyd-refine the IVF
centroids before building (the refined model is frozen into the
meta, as any production ANN build does).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from logsentinelai_spark.index import ann  # noqa: E402
from logsentinelai_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--embeddings", required=True,
                    help="parquet path with (vec_id, embedding) columns")
    ap.add_argument("--out", required=True)
    ap.add_argument("--extend", action="store_true",
                    help="incremental: encode only vec_ids absent from "
                         "the existing index (frozen model)")
    ap.add_argument("--lloyd-iters", type=int, default=0,
                    help="Lloyd iterations to refine the IVF centroids "
                         "before a fresh build (ignored with --extend)")
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--master")
    args = ap.parse_args()

    spark = get_spark("build_ann", cpus=args.cpus, master=args.master)
    emb = spark.read.parquet(args.embeddings).select("vec_id", "embedding")
    t0 = time.monotonic()
    if args.extend:
        summary = ann.extend_ann(spark, emb, args.out)
    else:
        # seed models from the conventional fixture rows; a real corpus
        # would sample/train — the build structure is identical
        from logsentinelai_spark.operators import similarity as sim

        cents = sim._centroid_rows_from(emb)
        cbs = sim._pq_codebooks_from(emb)
        if args.lloyd_iters:
            cents = sim.ivf_train(emb, cents, iters=args.lloyd_iters)
        lsh = [
            [[float(v) for v in plane] for plane in sim.hyperplanes(t)]
            for t in range(sim.N_TABLES)
        ]
        summary = ann.build_ann(spark, emb, args.out, cents, cbs, lsh_planes=lsh)
    print(json.dumps(dict(summary, elapsed_sec=round(time.monotonic() - t0, 3))))


if __name__ == "__main__":
    main()
