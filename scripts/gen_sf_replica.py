"""Generate a statistical REPLICA of the driver's synthetic tables at a
larger scale factor, for local performance measurement only (the driver
generates its own sf1.0 at round end; /root/testdata is read-only and
holds only sf<=0.1).

Distributions inferred from /root/testdata/sf0.1 (see OPTIMIZATION_r08.md):
  documents: 50k*sf rows; uniform 30-word vocab, len ~ U[10,100] tokens,
             5%% of rows replaced by a copy of another row + ' dup'
             appended (the near-duplicate structure dedup_* queries see);
             lang en~41%% / es,fr,de,zh ~15%%; source = src{id%%20}.
  events:    1M*sf rows over [2024-01-01, 2024-01-31); user_id U[0,15000*sf);
             event_type uniform 5; value ~ Exp(mean 50) rounded to 2;
             props = '{"k": U[0,99]}'.
  embeddings: 20k*sf unit-norm 64-dim vectors, 10 labels with weak
             cluster structure (matches observed centroid separation).

NOT used for correctness (oracle gates run on the driver's own sf0.01);
purely a timing workload whose shape matches the driver's MEASUREMENT sf.

Usage: python scripts/gen_sf_replica.py <out_dir> [sf]   (default sf=1.0)
"""

import os
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "es", "fr", "de", "zh"]
LANG_P = [0.412, 0.148, 0.148, 0.146, 0.146]


def gen_documents(out, n, rng):
    texts = []
    for _ in range(n):
        L = rng.randrange(10, 101)
        texts.append(" ".join(rng.choice(VOCAB) for _ in range(L)))
    # near-dups: 5% of positions replaced by copy-of-other + ' dup'
    n_dup = int(round(0.05 * n))
    for pos in rng.sample(range(n), n_dup):
        src = rng.randrange(n)
        texts[pos] = texts[src] + " dup"
    langs = rng.choices(LANGS, weights=LANG_P, k=n)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array([f"src{i % 20}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_events(out, n, n_users, rng):
    npr = np.random.default_rng(rng.randrange(2**31))
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(npr.integers(0, span_us, size=n))
    ts = base + offs.astype("timedelta64[us]")
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(npr.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(
            np.array(["click", "view", "purchase", "signup", "error"])[
                npr.integers(0, 5, size=n)]),
        "value": pa.array(np.round(npr.exponential(50.0, size=n), 2)),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in npr.integers(0, 100, size=n)]),
    })
    pq.write_table(tbl, f"{out}/events.parquet")


def gen_embeddings(out, n, rng):
    npr = np.random.default_rng(rng.randrange(2**31))
    labels = npr.integers(0, 10, size=n).astype(np.int32)
    cents = npr.normal(0, 0.0125, size=(10, 64))
    X = npr.normal(0, 0.125, size=(n, 64)) + cents[labels]
    X = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(X), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def main():
    out = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    os.makedirs(out, exist_ok=True)
    rng = random.Random(4242)
    gen_documents(out, int(50_000 * sf), rng)
    gen_events(out, int(1_000_000 * sf), int(15_000 * sf), rng)
    gen_embeddings(out, int(20_000 * sf), rng)
    # remaining star-schema tables are unused by query paths; copy from
    # sf0.1 so loaders that register all tables still find them
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        shutil.copyfile(f"/root/testdata/sf0.1/{t}.parquet",
                        f"{out}/{t}.parquet")
    print("wrote", out)


if __name__ == "__main__":
    main()
