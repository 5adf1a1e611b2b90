"""Codec microbench: varbyte vs packed (frame-of-reference bit
packing) on realistic posting-list shapes — encoded size and decode
throughput (decode is the query-side hot loop; encode happens once at
merge time). Prints one JSON line.

Shapes modeled on the synthetic Zipf corpus (FIXTURES.md): a dense
hot term (tiny gaps, single-digit tfs), a mid-frequency term, and the
long tail of sparse terms (large gaps, single partial block).

Usage: python scripts/microbench_codec.py [n_docs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from logsentinelai_spark.index.codec import decode_stream, encode_blocks  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
REPEATS = 5


def make_term(rng, df: int, n_docs: int, max_tf: int):
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, max_tf + 1, size=df).astype(np.int64)
    dls = rng.integers(20, 400, size=df).astype(np.int64)
    return docs, tfs, dls


def bench_term(docs, tfs, dls):
    out = {}
    for codec in ("varbyte", "packed"):
        rows = encode_blocks(docs, tfs, dls, base=0, block_size=128, codec=codec)
        size = sum(len(r["gaps_vb"]) + len(r["tfs_vb"]) + len(r["dls_vb"]) for r in rows)
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            g = decode_stream([r["gaps_vb"] for r in rows], codec)
            t = decode_stream([r["tfs_vb"] for r in rows], codec)
            d = decode_stream([r["dls_vb"] for r in rows], codec)
            best = min(best, time.perf_counter() - t0)
        assert g.size == t.size == d.size == docs.size
        out[codec] = {
            "bytes": int(size),
            "bytes_per_posting": round(size / docs.size, 3),
            "decode_sec": round(best, 6),
            "postings_per_sec": round(docs.size / best, 0),
        }
    out["size_ratio_packed_vs_varbyte"] = round(
        out["packed"]["bytes"] / out["varbyte"]["bytes"], 3)
    out["decode_speedup_packed"] = round(
        out["varbyte"]["decode_sec"] / out["packed"]["decode_sec"], 2)
    return out


def main():
    rng = np.random.default_rng(20260817)
    shapes = {
        "dense_hot_term": make_term(rng, N_DOCS // 2, N_DOCS, 12),
        "mid_term": make_term(rng, N_DOCS // 100, N_DOCS, 6),
        "sparse_tail_term": make_term(rng, 50, N_DOCS, 3),
    }
    res = {name: bench_term(*arrs) for name, arrs in shapes.items()}
    print(json.dumps({"n_docs": N_DOCS, "block_size": 128, "terms": res}))


if __name__ == "__main__":
    main()
