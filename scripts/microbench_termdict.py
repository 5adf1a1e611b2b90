"""Term-dictionary scale microbench.

The prefix/wildcard/fuzzy family resolves terms through the sorted
term_dict sidecar (index/termdict.py). This benchmark evidences the
scale claim that expansion cost tracks the MATCH SET, not the
vocabulary: it writes synthetic dictionaries of growing vocabulary
size in the exact build_term_dict layout (term-range-partitioned
files, term-sorted within, one file per ~256k terms), then times

  * the pruned pyarrow range read expand_prefix issues
    (term >= p AND term < p + '{'), and
  * a full-dictionary read of the same thin columns,

and counts how many parquet row groups the range's min/max statistics
overlap (the reader skips the rest). Expected shape: pruned latency
and touched row groups stay ~flat as vocabulary grows 16x while the
full-read cost grows with it.

    python scripts/microbench_termdict.py [--sizes 100000,400000,1600000]

Prints one JSON line and appends a rendered table to
BENCH/BASELINE.md is left to the caller (bench session notes).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PREFIX = "qx"  # mid-selectivity: matches 1/676 of the synthetic vocab


def synth_dict(spark, n_terms: int, out: str) -> None:
    """Deterministic vocabulary: base-26 word per id (5+ chars so every
    2-char prefix bucket holds n/676 terms), zipf-ish df. Written with
    build_term_dict's exact stanza: range-partitioned by term, sorted
    within partitions, ~256k terms per file."""
    from pyspark.sql import functions as F

    df = (
        spark.range(n_terms)
        .withColumn(
            "term",
            F.concat(*[
                F.expr(
                    f"chr(97 + CAST(id / {26 ** k} AS INT) % 26)")
                for k in range(0, 5)  # first char fastest-varying, so
                # every 2-char prefix holds ~n/676 of any vocab size
            ]))
        .withColumn("df", (F.lit(10_000_000) / (F.col("id") + 1)).cast("long") + 1)
        .withColumn("term_bucket", F.abs(F.hash("term")) % 64)
        .drop("id")
    )
    n_files = max(1, n_terms // 262_144)
    (
        df.repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(out)
    )


def rg_stats(out: str, prefix: str) -> tuple[int, int]:
    """(row groups whose term min/max overlap [prefix, prefix+'{'),
    total row groups) across all files."""
    import pyarrow.parquet as pq

    lo, hi = prefix, prefix + "{"
    touched = total = 0
    for f in sorted(Path(out).glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        for i in range(md.num_row_groups):
            col = next(
                md.row_group(i).column(j)
                for j in range(md.row_group(i).num_columns)
                if md.row_group(i).column(j).path_in_schema == "term")
            total += 1
            st = col.statistics
            if st is None or (st.min <= hi and st.max >= lo):
                touched += 1
    return touched, total


def timed_read(out: str, pruned: bool, prefix: str) -> tuple[float, int]:
    import pyarrow.dataset as pads

    ds = pads.dataset(out, format="parquet")
    t0 = time.perf_counter()
    if pruned:
        t = ds.to_table(
            filter=(pads.field("term") >= prefix)
            & (pads.field("term") < prefix + "{"),
            columns=["term", "df"])
    else:
        t = ds.to_table(columns=["term", "df"])
    return (time.perf_counter() - t0) * 1000, t.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,400000,1600000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    from logsentinelai_spark.session import get_spark

    spark = get_spark("microbench_termdict", cpus=8)
    rows = []
    tmp = tempfile.mkdtemp(prefix="termdict_bench_")
    try:
        for n in sizes:
            out = f"{tmp}/dict_{n}"
            synth_dict(spark, n, out)
            # warm both paths once (page cache + pyarrow init), then min-of-3
            timed_read(out, True, PREFIX)
            timed_read(out, False, PREFIX)
            pruned_ms, matched = min(
                timed_read(out, True, PREFIX) for _ in range(3))
            full_ms, total_rows = min(
                timed_read(out, False, PREFIX) for _ in range(3))
            touched, total_rg = rg_stats(out, PREFIX)
            rows.append({
                "vocab": n, "matched": matched,
                "pruned_ms": round(pruned_ms, 2),
                "full_ms": round(full_ms, 2),
                "rg_touched": touched, "rg_total": total_rg,
                "files": len(list(Path(out).glob("*.parquet"))),
            })
            print(json.dumps(rows[-1]), file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"metric": "termdict_prefix_expand", "prefix": PREFIX,
                      "rows": rows}))


if __name__ == "__main__":
    main()
