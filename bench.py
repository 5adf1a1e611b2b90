"""Per-round benchmark. Prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers: (a) the oracle-suite headline queries at $SPARK_GRAFT_SF_DIR,
(b) index-build throughput (docs/sec) on the deterministic synthetic
pages corpus, (c) BM25 top-10 latency (wand + acc) over the built index
on the reference query set. Scaling-efficiency evidence (local[8] vs
local[32]) is produced by scripts/bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from logsentinelai_spark import entry_queries  # noqa: E402
from logsentinelai_spark.corpus import gen_pages_df, gen_queries  # noqa: E402
from logsentinelai_spark.index.build import IndexConfig, build_index  # noqa: E402
from logsentinelai_spark.index.query import (  # noqa: E402
    topk, topk_local, topk_many, topk_many_local,
)
from logsentinelai_spark.index.reader import IndexReader  # noqa: E402
from logsentinelai_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "100000"))


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", cpus=CPUS)
    t_all = time.monotonic()

    # (b) index build throughput on synthetic pages. The corpus is
    # materialized to parquet first — the engine's contract input is a
    # table on storage (Iceberg-style), and regenerating rows per scan
    # would charge corpus synthesis to the build.
    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    try:
        cfg = IndexConfig(
            shard_size=max(2500, BENCH_DOCS // 8),
            wave_shards=8,  # one wave; resume is exercised by tests
            n_buckets=16,
            block_size=128,
        )
        t0 = time.monotonic()
        gen_pages_df(spark, BENCH_DOCS, partitions=CPUS * 2).write.mode("overwrite").parquet(pages_dir)
        corpus_prep_sec = time.monotonic() - t0
        pages = spark.read.parquet(pages_dir)
        t0 = time.monotonic()
        build_index(spark, pages, idx_dir, cfg)
        build_sec = time.monotonic() - t0
        docs_per_sec = BENCH_DOCS / build_sec

        # positions (pos_vb, round-5 default) change the build's work
        # per doc — measure a WARM positions-off / positions-on pair on
        # the same corpus so the overhead is attributable in-artifact.
        # Both comparison builds run after the (cold) primary build:
        # the first session build pays ~2x in JIT/page-cache warmup on
        # this VM, so a cold-vs-warm pair would overstate the positions
        # cost by an order of magnitude (measured: warm pair ~5%
        # overhead; cold-first-vs-warm-second read as "107%").
        from dataclasses import replace as _dc_replace
        warm_pair = {}
        for label, pos_flag in (("nopos", False), ("pos", True)):
            d = tempfile.mkdtemp(prefix=f"bench_idx_{label}_")
            try:
                t0 = time.monotonic()
                build_index(spark, pages, d, _dc_replace(cfg, positions=pos_flag))
                warm_pair[label] = time.monotonic() - t0
            finally:
                shutil.rmtree(d, ignore_errors=True)
        nopos_sec = warm_pair["nopos"]

        # (c) query latency over the built index (warm session).
        # Each (query, mode) is timed LAT_REPEATS times so the summary
        # can report spread — a 15% median drift round-over-round is
        # only classifiable as noise vs regression with n and min/max
        # disclosed (round-2 review item).
        reader = IndexReader(spark, idx_dir)
        queries = gen_queries()
        sel = list(queries.head(6).itertuples()) + list(queries.iloc[20:24].itertuples())
        lat: dict[str, list[float]] = {
            "wand": [], "acc": [], "wand_local": [], "acc_local": []}
        LAT_REPEATS = 3
        for mode in ("wand", "acc"):
            for q in sel:
                for _ in range(LAT_REPEATS):
                    t0 = time.monotonic()
                    topk(reader, q.query_text, k=10, mode=mode)
                    lat[mode].append((time.monotonic() - t0) * 1000)
                    t0 = time.monotonic()
                    topk_local(reader, q.query_text, k=10, mode=mode)
                    lat[mode + "_local"].append((time.monotonic() - t0) * 1000)

        # (d) batched serving: one pruned scan for the 10-query set vs
        # the per-query loop (same acc scorer; rank-identity is pytest-
        # pinned, this measures the amortization)
        texts = [q.query_text for q in sel]
        t0 = time.monotonic()
        for q in sel:
            topk(reader, q.query_text, k=10, mode="acc")
        loop_sec = time.monotonic() - t0
        t0 = time.monotonic()
        topk_many(reader, texts, k=10)
        batched_sec = time.monotonic() - t0
        t0 = time.monotonic()
        topk_many_local(reader, texts, k=10)
        batched_local_sec = time.monotonic() - t0
        batched = {
            "n_queries": len(texts),
            "per_query_loop_sec": round(loop_sec, 3),
            "topk_many_sec": round(batched_sec, 3),
            "topk_many_local_sec": round(batched_local_sec, 3),
            "speedup_vs_loop": round(loop_sec / batched_sec, 2),
        }
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(pages_dir, ignore_errors=True)

    # (a) oracle-suite headline queries — two runs each: run 0 pays
    # plan compilation, Python-worker spin-up, and cache population;
    # run 1 is the steady state a resident engine serves. `queries`
    # reports the min (steady state), `queries_cold` the first run.
    # The 5 slowest (by warm time) get a THIRD repeat so round-over-
    # round drift on the expensive queries is classifiable as noise vs
    # regression from the artifact alone (round-3 review item).
    qtimes: dict[str, float] = {}
    qcold: dict[str, float] = {}
    qruns: dict[str, list[float]] = {}

    # fts positional-index build over the documents fixture — the
    # one-off ingest pass phrase_topk_idx amortizes. Timing the cache
    # fill here (instead of letting it land inside the gate's cold
    # run) keeps the gate's cold/warm numbers query-only AND
    # discloses the build's cost explicitly, like ann_build below.
    t0 = time.monotonic()
    entry_queries._index_dir_for(spark, SF_DIR)
    fts_build = {"wall_sec": round(time.monotonic() - t0, 3)}

    for name, fn in entry_queries.QUERIES.items():
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, SF_DIR).collect()
            runs.append(round(time.monotonic() - t0, 3))
        qcold[name] = runs[0]
        qruns[name] = runs
    slow5 = sorted(qruns, key=lambda n: min(qruns[n]), reverse=True)[:5]
    for name in slow5:
        t0 = time.monotonic()
        entry_queries.QUERIES[name](spark, SF_DIR).collect()
        qruns[name].append(round(time.monotonic() - t0, 3))
    for name, runs in qruns.items():
        qtimes[name] = min(runs)

    # (e) ANN artifact build cost — the one-off ingest-time pass the
    # warm ANN queries amortize (codes + IVF/IVFADC lists + LSH
    # tables); disclosed so "warm = scoring-only" has its other half.
    from logsentinelai_spark.index.ann import build_ann
    from logsentinelai_spark.operators import similarity as _sim

    ann_dir = tempfile.mkdtemp(prefix="bench_ann_")
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id", "embedding")
        t0 = time.monotonic()
        s_ann = build_ann(
            spark, emb, ann_dir,
            _sim._centroid_rows_from(emb), _sim._pq_codebooks_from(emb),
            lsh_planes=[
                [[float(v) for v in plane] for plane in _sim.hyperplanes(t)]
                for t in range(_sim.N_TABLES)
            ])
        ann_build_sec = round(time.monotonic() - t0, 3)
        ann_build = {
            "vectors": s_ann["n_vectors"],
            "wall_sec": ann_build_sec,
            "vectors_per_sec": round(s_ann["n_vectors"] / ann_build_sec, 1),
        }
    finally:
        shutil.rmtree(ann_dir, ignore_errors=True)

    total = round(time.monotonic() - t_all, 3)
    lat_stats = {
        m: {
            "median": round(statistics.median(v), 1),
            "p95": round(sorted(v)[int(0.95 * (len(v) - 1))], 1),
            "min": round(min(v), 1),
            "max": round(max(v), 1),
            "n": len(v),
        }
        for m, v in lat.items()
    }
    index_build = {
        "docs": BENCH_DOCS,
        "wall_sec": round(build_sec, 3),
        "docs_per_sec": round(docs_per_sec, 1),
        "corpus_prep_sec": round(corpus_prep_sec, 3),
        "cpus": CPUS,
        "positions": True,
        "warm_nopos_wall_sec": round(warm_pair["nopos"], 3),
        "warm_pos_wall_sec": round(warm_pair["pos"], 3),
        "warm_docs_per_sec": round(BENCH_DOCS / warm_pair["pos"], 1),
        "positions_overhead_pct": round(
            100.0 * (warm_pair["pos"] - nopos_sec) / nopos_sec, 1),
    }

    # full detail -> bench_summary.json (survives any tail-capture
    # truncation of stdout; round-3's BENCH artifact lost its headline
    # to exactly that). Includes the warm-run spread for the slowest
    # queries and a delta vs the previous committed summary.
    repo = Path(__file__).resolve().parent
    prev_path = repo / "BENCH" / "last_bench_summary.json"
    delta = {}
    if prev_path.exists():
        try:
            prev = json.loads(prev_path.read_text())
            # only compare like with like: a smoke run at another sf or
            # cpu count must not pollute the round-over-round deltas
            prev_q = (
                prev.get("queries", {})
                if prev.get("sf") == sf and prev.get("cpus") == CPUS
                else {}
            )
            for name, t in list(qtimes.items()):
                p = prev_q.get(name)
                # both gates: sub-second queries drift 20%+ on this VM
                # (documented burstiness) — only absolute+relative
                # movement is worth a reader's attention
                if p and abs(t - p) >= 0.15 and abs(t - p) / p >= 0.15:
                    # classify in-artifact (round-4 review item): one
                    # more measurement; if the best time stops tripping
                    # both gates the movement was VM noise, otherwise a
                    # genuine regression (or improvement)
                    t0 = time.monotonic()
                    entry_queries.QUERIES[name](spark, SF_DIR).collect()
                    run3 = round(time.monotonic() - t0, 3)
                    best = min(qruns[name] + [run3])
                    # headline qtimes stays the UNIFORM 2-run min for
                    # every query (round-5 ADVICE: asymmetric sampling
                    # depth would bias flagged queries toward 'noise'
                    # and skew next round's prev baseline); the third
                    # run informs only the verdict inside this record
                    still = (abs(best - p) >= 0.15
                             and abs(best - p) / p >= 0.15)
                    delta[name] = {
                        "prev": p, "now": best, "headline": qtimes[name],
                        "runs": qruns[name] + [run3],
                        "pct": round(100.0 * (best - p) / p, 1),
                        "verdict": ("regression" if still and best > p
                                    else "improvement" if still
                                    else "noise"),
                    }
        except (ValueError, KeyError):
            delta = {"error": "unreadable previous summary"}
    summary = {
        "metric": "bench_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cpus": CPUS,
        "queries": qtimes,
        "queries_cold": qcold,
        "slowest5_runs": {n: qruns[n] for n in slow5},
        "delta_vs_prev_warm": delta,
        "index_build": index_build,
        "ann_build": ann_build,
        "fts_build": fts_build,
        "bm25_latency_ms": lat_stats,
        "batched_serving": batched,
        "wand_crossover": _wand_crossover_point(),
    }
    (repo / "bench_summary.json").write_text(json.dumps(summary, indent=1))
    (repo / "BENCH").mkdir(exist_ok=True)
    prev_path.write_text(json.dumps(summary, indent=1))

    # the ONE stdout JSON line, compact separators and essentials only
    # (~2 KB) so the driver's bounded tail capture can always parse it;
    # everything else lives in bench_summary.json.
    out = {
        "metric": "bench_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": qtimes,
        "queries_cold": qcold,
        "index_build": index_build,
        "ann_build": ann_build,
        "fts_build": fts_build,
        "bm25_latency_ms_median": {m: s["median"] for m, s in lat_stats.items()},
        "summary_file": "bench_summary.json",
    }
    print(json.dumps(out, separators=(",", ":")))

    # final ultra-compact line (<500 B): rounds 3 and 4 both lost the
    # full headline's FRONT to the driver's bounded tail capture, so
    # the LAST stdout line is a complete, self-sufficient JSON object
    # any tail window will contain whole.
    slowest3 = sorted(qtimes, key=lambda n: qtimes[n], reverse=True)[:3]
    mini = {
        "metric": "bench_suite_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(qtimes),
        "build_docs_per_sec": index_build["docs_per_sec"],
        "slowest3": {n: qtimes[n] for n in slowest3},
        "summary_file": "bench_summary.json",
    }
    print(json.dumps(mini, separators=(",", ":")))


def _wand_crossover_point() -> dict:
    """One demonstrative point from scripts/bench_wand_crossover.py's
    sweep: a long-list + selective-companions query where WAND beats
    the exhaustive accumulator (both scorers on identical block rows,
    identical rankings asserted) — proving the auto-mode routing
    constants against measurement, not assertion."""
    import importlib

    sys.path.insert(0, str(Path(__file__).resolve().parent / "scripts"))
    bwc = importlib.import_module("bench_wand_crossover")
    from logsentinelai_spark.index.query import (
        AUTO_WAND_MIN_POSTINGS, AUTO_WAND_SELECTIVITY,
        _score_shard_acc, _score_shard_wand,
    )

    pdf, idfs, avgdl, total = bwc.build_frame(
        n_docs=3 * CROSSOVER_DEMO_POSTINGS, long_df=CROSSOVER_DEMO_POSTINGS,
        sel_ratio=CROSSOVER_DEMO_SEL_RATIO)
    t_acc, r_acc = bwc.time_scorer(_score_shard_acc, pdf, idfs, avgdl, 3)
    t_wand, r_wand = bwc.time_scorer(_score_shard_wand, pdf, idfs, avgdl, 3)
    assert [d for d, _ in r_acc] == [d for d, _ in r_wand]
    return {
        "total_postings": total,
        "acc_sec": round(t_acc, 3),
        "wand_sec": round(t_wand, 3),
        "wand_wins": t_wand < t_acc,
        "auto_constants": {
            "min_postings": AUTO_WAND_MIN_POSTINGS,
            "selectivity": AUTO_WAND_SELECTIVITY,
        },
    }


# calibrated by scripts/bench_wand_crossover.py: 3M postings with
# companions at 1/2000 of the long list — wand measured ~3x faster
CROSSOVER_DEMO_POSTINGS = 3_000_000
CROSSOVER_DEMO_SEL_RATIO = 2_000


if __name__ == "__main__":
    main()
