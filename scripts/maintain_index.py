"""Index maintenance: tombstone deletes and generation compaction —
the engine's force-merge / delete-by-id surface (ES index lifecycle).

    # tombstone doc ids (served immediately, stats unchanged):
    spark-submit --py-files engine.zip scripts/maintain_index.py \
        --index /data/index_db delete --ids 12,99,105
    # ... or a parquet drop list (e.g. a dedup query's output):
        ... delete --ids-parquet /data/drop_list.parquet

    # physical merge into a new generation (drops tombstones,
    # coalesces files, flips the _generation.json pointer last):
        ... compact

    # term-dictionary sidecar rebuild (prefix queries):
        ... term-dict
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from logsentinelai_spark.index.compact import compact_index  # noqa: E402
from logsentinelai_spark.index.deletes import delete_docs  # noqa: E402
from logsentinelai_spark.index.lineage import resolve_index_dir  # noqa: E402
from logsentinelai_spark.index.termdict import build_term_dict  # noqa: E402
from logsentinelai_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int)
    ap.add_argument("--master", help="Spark master override, e.g. local-cluster[2,2,1024]")
    sub = ap.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("delete")
    d.add_argument("--ids", help="comma-separated doc ids")
    d.add_argument("--ids-parquet", dest="ids_parquet",
                   help="parquet path with a doc_id column")
    sub.add_parser("compact")
    sub.add_parser("term-dict")
    r = sub.add_parser("retire", help="ILM delete-phase tick: retire "
                       "docs older than a cutoff, compact on ratio")
    r.add_argument("--corpus", required=True,
                   help="pages parquet the index was built over "
                        "(the _source analog carrying warc_ts)")
    r.add_argument("--older-than", dest="older_than", required=True,
                   help="ISO timestamp; docs with warc_ts before it retire")
    r.add_argument("--max-tombstone-frac", dest="max_tombstone_frac",
                   type=float, default=0.10)
    ca = sub.add_parser("compact-ann")
    ca.add_argument("--ann-dir", dest="ann_dir", required=True)
    args = ap.parse_args()

    if args.cmd == "delete":
        live = resolve_index_dir(args.index)
        if args.ids_parquet:
            spark = get_spark("maintain_index", cpus=args.cpus, master=args.master)
            out = delete_docs(live, spark.read.parquet(args.ids_parquet))
        elif args.ids:
            out = delete_docs(live, [int(x) for x in args.ids.split(",")])
        else:
            raise SystemExit("delete needs --ids or --ids-parquet")
    elif args.cmd == "compact":
        spark = get_spark("maintain_index", cpus=args.cpus, master=args.master)
        out = compact_index(spark, args.index)
    elif args.cmd == "retire":
        from logsentinelai_spark.index.retention import maintenance_tick

        spark = get_spark("maintain_index", cpus=args.cpus, master=args.master)
        out = maintenance_tick(
            spark, args.index, spark.read.parquet(args.corpus),
            args.older_than, max_tombstone_frac=args.max_tombstone_frac)
    elif args.cmd == "compact-ann":
        from logsentinelai_spark.index.ann import compact_ann

        spark = get_spark("maintain_index", cpus=args.cpus, master=args.master)
        out = compact_ann(spark, args.ann_dir)
    else:
        spark = get_spark("maintain_index", cpus=args.cpus, master=args.master)
        out = build_term_dict(spark, args.index)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
