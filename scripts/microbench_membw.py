"""Memory-bandwidth ceiling evidence for BENCH/BASELINE.md.

Two tables: (1) numpy STREAM-triad GB/s per process at 1/2/8/32
concurrent processes — this VM saturates ~1.5 GB/s AGGREGATE (QoS
throttling), so two cores already consume 75% of peak and any purely
data-streaming job is bandwidth-capped at eff(2->8) ~ 0.38 regardless
of code; (2) the stage-1 compute body (Arrow/RE2 extract + tokenize)
on DISTINCT data per process — eff(2->8) ~ 0.91, showing the engine's
hot path itself has no scaling defect.

    python scripts/microbench_membw.py
"""

import multiprocessing as mp, time, json, sys
import numpy as np

def triad(q, _seed=0):
    n = 20_000_000
    a = np.random.default_rng(1).random(n); b = np.random.default_rng(2).random(n); c = np.empty(n)
    t0 = time.monotonic()
    for _ in range(5):
        np.add(a, 2.5 * b, out=c)
    dt = time.monotonic() - t0
    q.put(5 * 3 * 8 * n / dt / 1e9)

def body_distinct(q, seed):
    sys.path.insert(0, "/root/repo")
    import pyarrow as pa
    from logsentinelai_spark.corpus import gen_pages_pandas
    from logsentinelai_spark.functions.extract import extract_arrow
    from logsentinelai_spark.functions.tokenizer import tokens_arrow
    pdf = gen_pages_pandas(6000, seed=seed)
    htmls = pa.array(pdf["html"].tolist(), type=pa.binary())
    t0 = time.monotonic()
    for _ in range(3):
        tokens_arrow(extract_arrow(htmls))
    q.put((time.monotonic() - t0) / 3)

for fn, name in ((triad, "triad_GBps_per_proc"), (body_distinct, "extract_tok_sec_distinct")):
    out = {}
    for k in (1, 2, 8, 32):
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q, 100 + i)) for i in range(k)]
        for p in ps: p.start()
        res = [q.get() for _ in ps]
        for p in ps: p.join()
        out[k] = round(sum(res) / len(res), 3)
    print(json.dumps({name: out}), flush=True)
