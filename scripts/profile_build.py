"""Profile the index build's per-stage scaling: run the same build at
several parallelism levels and print a per-stage wall breakdown
(doc_map / stage1 / merge / commit / other) from the wave manifests.

Used to find Amdahl serial components that cap eff(N -> 4N).

    python scripts/profile_build.py --docs 1000000 --levels 2,8
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--levels", default="2,8")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    work = tempfile.mkdtemp(prefix="profile_")
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
            out_dir = f"{work}/idx_{cpus}"
            t0 = time.monotonic()
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}",
                sys.executable, str(REPO / "scripts" / "build_index.py"),
                "--pages", pages_dir, "--out", out_dir,
                "--shard-size", str(shard_size), "--wave-shards", "16",
                "--n-buckets", "16", "--cpus", str(cpus),
            ]
            p = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
            wall = time.monotonic() - t0
            if p.returncode != 0:
                raise RuntimeError(p.stderr[-3000:])
            r = json.loads(p.stdout.strip().splitlines()[-1])
            stages: dict[str, float] = {}
            for mp in sorted(Path(out_dir, "manifest").glob("wave_*.json")):
                m = json.loads(mp.read_text())
                for k, v in m["stage_elapsed_sec"].items():
                    stages[k] = stages.get(k, 0.0) + v
            staged = sum(stages.values())
            print(json.dumps({
                "cpus": cpus,
                "build_elapsed": r["elapsed_sec"],
                "proc_wall": round(wall, 1),
                "stages": {k: round(v, 1) for k, v in stages.items()},
                "stage0_doc_map": r.get("stage0_doc_map_sec"),
                "other": round(r["elapsed_sec"] - staged - r.get("stage0_doc_map_sec", 0), 1),
                "startup": round(wall - r["elapsed_sec"], 1),
            }))
            shutil.rmtree(out_dir, ignore_errors=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
