"""Supplementary per-query benchmark (guide §1.4): times a SELECTED
subset of the declared queries at $SPARK_GRAFT_SF_DIR with the noop sink
(so computation is timed, not the collect), and can dump
.explain('formatted') per query. bench.py stays frozen for the driver;
all numbers quoted in OPTIMIZATION_r08.md from this file are labelled.

Usage:
  python bench_extra.py q1 q2 ...          # time cold+warm, noop sink
  python bench_extra.py --collect q1 ...   # time with .collect() like bench.py
  python bench_extra.py --explain q1 ...   # dump plans to plans/r08/<q>_cur.txt
  python bench_extra.py --all              # every query, one warm pass
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from logsentinelai_spark import entry_queries  # noqa: E402
from logsentinelai_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    collect = "--collect" in args
    run_all = "--all" in args
    repeats = 2
    for a in list(args):
        if a.startswith("--repeats="):
            repeats = int(a.split("=")[1])
            args.remove(a)
    names = [a for a in args if not a.startswith("--")]
    if run_all:
        names = list(entry_queries.QUERIES)

    spark = get_spark("bench_extra", cpus=CPUS)
    sink = (lambda df: df.collect()) if collect else (
        lambda df: df.write.format("noop").mode("overwrite").save())

    for name in names:
        fn = entry_queries.QUERIES[name]
        if explain:
            plan = fn(spark, SF_DIR)._sc_explain() if False else None
            txt = fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
            out = Path("plans/r08") / f"{name}_cur.txt"
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_text(txt)
            print(f"{name}: plan -> {out}")
            continue
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.monotonic()
            sink(fn(spark, SF_DIR))
            runs.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: cold={runs[0]} warm={min(runs[1:]) if runs[1:] else runs[0]} runs={runs}")


if __name__ == "__main__":
    main()
