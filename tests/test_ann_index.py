"""Materialized ANN index (index/ann.py): build artifacts, plan pins
(codes-only PQ scan, partition-pruned IVF lists), rank-identity vs the
per-run-encode twins, and incremental extend."""

from __future__ import annotations

from pyspark.sql import functions as F

from logsentinelai_spark.index import ann
from logsentinelai_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _planes():
    return [
        [[float(v) for v in plane] for plane in sim.hyperplanes(t)]
        for t in range(sim.N_TABLES)
    ]


def _build(spark, tmp_path):
    d = str(tmp_path / "ann")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    summary = ann.build_ann(
        spark, emb, d,
        sim._centroid_rows(spark, SF), sim._pq_codebooks(spark, SF),
        lsh_planes=_planes())
    return d, emb, summary


def test_build_ann_artifacts_and_codes_match_inline(spark, tmp_path):
    d, emb, summary = _build(spark, tmp_path)
    assert summary["n_vectors"] == emb.count()
    meta = ann.read_ann_meta(d)
    assert (meta["m_sub"], meta["k_pq"], meta["sub_dim"]) == (
        sim.M_SUB, sim.K_PQ, sim.SUB_DIM)
    # materialized codes == per-run encode, row for row
    cbs = sim._pq_codebooks(spark, SF)
    inline = {r.vec_id: tuple(r[f"code{m}"] for m in range(sim.M_SUB))
              for r in emb.select("vec_id", *ann.pq_code_cols(cbs)).collect()}
    stored = {r.vec_id: tuple(r[f"code{m}"] for m in range(sim.M_SUB))
              for r in ann.read_pq_codes(spark, d).collect()}
    assert stored == inline
    # every vector landed in exactly one inverted list, lists complete
    lists = ann.read_ivf_lists(spark, d)
    assert lists.count() == summary["n_vectors"]
    assert lists.select("vec_id").distinct().count() == summary["n_vectors"]


def test_ivf_lists_read_is_partition_pruned(spark, tmp_path):
    """Probing n lists must scan ONLY those lists' files: the
    predicate lands in PartitionFilters (not a post-scan Filter) and
    the scan's partition count equals the probe count."""
    d, _, _ = _build(spark, tmp_path)
    probe = sorted(sim.K_CENTROID_IDS)[:2]
    df = ann.read_ivf_lists(spark, d, probe)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    # all rows read belong to the probed lists (pruning, not filtering,
    # is asserted by the plan line above; this checks correctness)
    got = {r.list_id for r in df.select("list_id").distinct().collect()}
    assert got <= set(probe) and got


def test_q_ann_pq_adc_serves_from_materialized_codes(spark):
    """The gated query's scoring plan must scan the pq_codes artifact
    and must NOT rescan the embeddings table (the 8-bytes-per-vector
    contract); results are rank-identical to the per-run-encode twin."""
    df = sim.q_ann_pq_adc(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pq_codes" in plan
    assert "embeddings.parquet" not in plan
    mat = [(r.query_id, r.rank, r.neighbor_id, r.adc) for r in df.collect()]
    inline = [(r.query_id, r.rank, r.neighbor_id, r.adc)
              for r in sim.q_ann_pq_adc_inline(spark, SF).collect()]
    assert sorted(mat) == sorted(inline)


def test_q_ann_ivf_serves_from_materialized_lists(spark):
    """The gated IVF query must read the materialized inverted lists
    (partition-pruned) instead of re-assigning the corpus, and return
    exactly what the per-run-assignment path returns."""
    df = sim.q_ann_ivf(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ivf_lists" in plan and "PartitionFilters" in plan
    mat = [(r.query_id, r.rank, r.neighbor_id, r.cos) for r in df.collect()]
    inline = [(r.query_id, r.rank, r.neighbor_id, r.cos)
              for r in sim._ivf_search(
                  spark, SF, sim._centroid_rows(spark, SF), sim.N_PROBE).collect()]
    assert sorted(mat) == sorted(inline)


def test_q_ann_ivfpq_serves_from_materialized_code_lists(spark):
    """IVFADC: the scoring plan must scan the partition-pruned
    ivfpq_lists artifact (codes, not embeddings — embeddings are read
    only for the 5 query rows, outside this plan); every neighbor
    comes from the query's probed lists; 5 x TOP_K rows."""
    df = sim.q_ann_ivfpq(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ivfpq_lists" in plan and "PartitionFilters" in plan
    assert "embeddings.parquet" not in plan
    rows = df.collect()
    assert len(rows) == len(sim.QUERY_VEC_IDS) * sim.TOP_K
    for r in rows:
        assert 1 <= r.rank <= sim.TOP_K and r.neighbor_id != r.query_id


def test_ann_ivfpq_recall_vs_brute(spark):
    """Residual-PQ ADC over probed lists must still find a meaningful
    share of the true top-10 (step-0 models, n_probe=2/8 lists): at
    least brute-recall floor measured at fixture scale, and strictly
    better than empty. Floors are deliberately loose — the gate for
    VALUES is the DuckDB hash oracle; this pins algorithmic sanity."""
    brute = {(r.query_id, r.neighbor_id)
             for r in sim.q_ann_brute(spark, SF).collect()}
    ivfpq = {(r.query_id, r.neighbor_id)
             for r in sim.q_ann_ivfpq(spark, SF).collect()}
    recall = len(brute & ivfpq) / len(brute)
    assert recall >= 0.2, f"ivfpq recall collapsed: {recall}"


def test_q_ann_lsh_serves_from_materialized_buckets(spark):
    """The gated LSH query must read the bucket-partitioned tables
    (partition-pruned to the queries' buckets) instead of recomputing
    every vector's sign bits per run, and return exactly what the
    inline per-run path returns."""
    df = sim.q_ann_lsh(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lsh_lists" in plan and "PartitionFilters" in plan
    # ONE scan + ONE hash join covers every hash table (the two-level
    # (table, bucket) hive layout prunes the probe set in one pass)
    assert plan.count("BroadcastHashJoin") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    mat = [(r.query_id, r.rank, r.neighbor_id, r.cos) for r in df.collect()]
    inline = [(r.query_id, r.rank, r.neighbor_id, r.cos)
              for r in sim.q_ann_lsh_inline(spark, SF).collect()]
    assert sorted(mat) == sorted(inline)


def test_ann_search_api_matches_gated_twins(spark, tmp_path):
    """The production serving API (index.ann.ann_search, arbitrary
    query vectors against any built index) returns exactly what the
    fixture-bound gated queries return for the same vectors/models —
    one implementation contract, two entry points."""
    d, emb, _ = _build(spark, tmp_path)
    q = [(int(r.vec_id), [float(x) for x in r.embedding])
         for r in emb.filter(F.col("vec_id").isin(sim.QUERY_VEC_IDS))
         .select("vec_id", "embedding").collect()]
    for method, twin in (
        ("ivfpq", sim.q_ann_ivfpq), ("ivf", sim.q_ann_ivf),
        ("lsh", sim.q_ann_lsh), ("pq", sim.q_ann_pq_adc),
    ):
        got = {(r.query_id, r.rank): (r.neighbor_id, r.score)
               for r in ann.ann_search(
                   spark, d, q, method=method, n_probe=sim.N_PROBE,
                   exclude_self=True).collect()}
        want = {(r.query_id, r.rank): (r.neighbor_id, r[3])
                for r in twin(spark, SF).collect()}
        assert got == want, method


def test_multiprobe_lsh_improves_recall(spark):
    """Multi-probe LSH (Lv et al. VLDB'07): probing Hamming-1
    neighbor buckets must recover recall vs brute force relative to
    single-probe — near-miss sign bits are the dominant LSH false
    negative — without adding hash tables (no extra corpus copies).
    Same scan/join shape, more pruned partitions."""
    brute = {(r.query_id, r.neighbor_id)
             for r in sim.q_ann_brute(spark, SF).collect()}
    single = {(r.query_id, r.neighbor_id)
              for r in sim.q_ann_lsh(spark, SF).collect()}
    multi = {(r.query_id, r.neighbor_id)
             for r in sim.q_ann_lsh(spark, SF, multiprobe=1).collect()}
    multi2 = {(r.query_id, r.neighbor_id)
              for r in sim.q_ann_lsh(spark, SF, multiprobe=2).collect()}
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    r_multi2 = len(brute & multi2) / len(brute)
    assert r_multi2 >= r_multi >= r_single
    assert r_multi > 0.5  # hamming-1 over 2 tables covers most misses


def test_extend_ann_incremental_equals_full_build(spark, tmp_path):
    """Build on half the corpus, extend with the full snapshot: the
    incremental index must equal a from-scratch full build (codes AND
    list assignments), and only the new vectors get encoded."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    d_inc = str(tmp_path / "inc")
    cents = sim._centroid_rows(spark, SF)
    cbs = sim._pq_codebooks(spark, SF)
    s0 = ann.build_ann(spark, half, d_inc, cents, cbs, lsh_planes=_planes())
    s1 = ann.extend_ann(spark, emb, d_inc)
    assert s1["new_vectors"] == emb.count() - s0["n_vectors"]
    assert s1["n_vectors"] == emb.count()
    # idempotent: re-extending with the same snapshot adds nothing
    s2 = ann.extend_ann(spark, emb, d_inc)
    assert s2["new_vectors"] == 0

    d_full = str(tmp_path / "full")
    ann.build_ann(spark, emb, d_full, cents, cbs, lsh_planes=_planes())
    cols = ["vec_id"] + [f"code{m}" for m in range(sim.M_SUB)]
    inc_codes = sorted(map(tuple, ann.read_pq_codes(spark, d_inc).select(*cols).collect()))
    full_codes = sorted(map(tuple, ann.read_pq_codes(spark, d_full).select(*cols).collect()))
    assert inc_codes == full_codes
    inc_assign = sorted(map(tuple, ann.read_ivf_lists(spark, d_inc)
                            .select("vec_id", "list_id").collect()))
    full_assign = sorted(map(tuple, ann.read_ivf_lists(spark, d_full)
                             .select("vec_id", "list_id").collect()))
    assert inc_assign == full_assign
    pq_cols = ["vec_id", "list_id"] + [f"code{m}" for m in range(sim.M_SUB)]
    inc_pq = sorted(map(tuple, ann.read_ivfpq_lists(spark, d_inc)
                        .select(*pq_cols).collect()))
    full_pq = sorted(map(tuple, ann.read_ivfpq_lists(spark, d_full)
                         .select(*pq_cols).collect()))
    assert inc_pq == full_pq
    for t in range(sim.N_TABLES):
        inc_l = sorted(map(tuple, ann.read_lsh_table(spark, d_inc, t)
                           .select("vec_id", "bucket").collect()))
        full_l = sorted(map(tuple, ann.read_lsh_table(spark, d_full, t)
                            .select("vec_id", "bucket").collect()))
        assert inc_l == full_l, f"lsh table {t}"


def test_extend_ann_crash_replay_is_exactly_once(spark, tmp_path):
    """Round-4 ADVICE scenario: a batch crashes AFTER its pq_codes
    land but BEFORE the list/LSH artifacts (and before the meta
    commit). The partial epoch must be (a) invisible to every reader
    and (b) fully re-applied by the retried extend — the old layout
    (anti-join against raw pq_codes) would have made the retry a
    silent no-op, permanently omitting the batch from the lists."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    d = str(tmp_path / "crash")
    cents = sim._centroid_rows(spark, SF)
    cbs = sim._pq_codebooks(spark, SF)
    s0 = ann.build_ann(spark, half, d, cents, cbs, lsh_planes=_planes())

    # simulate the crash: ONLY the new batch's pq_codes epoch dir
    # lands (the first artifact _write_epoch writes); no meta update
    new = emb.join(half.select("vec_id"), "vec_id", "left_anti")
    new.select("vec_id", *ann.pq_code_cols(cbs)).write.mode(
        "overwrite").parquet(f"{d}/pq_codes/epoch=1")

    # (a) invisible: readers serve exactly the committed build
    assert ann.read_pq_codes(spark, d).count() == s0["n_vectors"]
    assert ann.read_ivf_lists(spark, d).count() == s0["n_vectors"]

    # (b) retry re-applies the WHOLE batch (not a no-op)
    s1 = ann.extend_ann(spark, emb, d)
    assert s1["new_vectors"] == emb.count() - s0["n_vectors"]
    assert ann.read_pq_codes(spark, d).count() == emb.count()
    assert ann.read_ivf_lists(spark, d).count() == emb.count()
    assert ann.read_ivfpq_lists(spark, d).count() == emb.count()
    # no duplicates anywhere: overwrite-into-epoch-dir replaced the
    # partial leftovers instead of appending beside them
    pq = ann.read_pq_codes(spark, d)
    assert pq.select("vec_id").distinct().count() == emb.count()


def test_compact_ann_rank_identity_files_and_extend_after(spark, tmp_path):
    """ANN epoch compaction (the extend_ann counterpart of the text
    index's compact_index): build -> extend x2 -> compact_ann ->
    ann_search identical for every method pre/post, per-list files
    coalesce, old root artifacts removable, and a further extend lands
    in the live generation."""
    import shutil
    from pathlib import Path

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    third = emb.filter(F.col("vec_id") % 3 == 0)
    two_thirds = emb.filter(F.col("vec_id") % 3 != 2)
    d = str(tmp_path / "cann")
    cents = sim._centroid_rows(spark, SF)
    cbs = sim._pq_codebooks(spark, SF)
    ann.build_ann(spark, third, d, cents, cbs, lsh_planes=_planes())
    ann.extend_ann(spark, two_thirds, d)
    ann.extend_ann(spark, emb, d)
    qrows = emb.orderBy("vec_id").limit(3).collect()
    queries = [(int(r.vec_id), list(r.embedding)) for r in qrows]

    def _probe():
        out = {}
        for method in ("pq", "ivfpq", "ivf", "lsh"):
            rows = ann.ann_search(spark, d, queries, method=method,
                                  k=5, n_probe=2, multiprobe=1).collect()
            out[method] = sorted(
                (r.query_id, r.rank, r.neighbor_id, round(r.score, 6))
                for r in rows)
        return out

    before = _probe()
    s = ann.compact_ann(spark, d)
    assert s["generation"] == 1
    assert s["n_vectors"] == emb.count()
    assert s["files_after"] < s["files_before"]
    assert _probe() == before
    # old generation removable: the pointer + gen dir serve everything
    for sub in ("pq_codes", "ivf_lists", "ivfpq_lists", "lsh_lists"):
        shutil.rmtree(Path(d) / sub, ignore_errors=True)
    Path(d, "_ann_meta.json").unlink()
    assert _probe() == before
    # extend after compaction: nothing new -> no-op; epochs live in gen
    s2 = ann.extend_ann(spark, emb, d)
    assert s2["new_vectors"] == 0
    assert _probe() == before
