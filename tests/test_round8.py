"""Round-8 optimization pins: scan fan-out behavior and plan shape."""

import pytest
from pyspark.sql import functions as F

from logsentinelai_spark.sources.io import fanout_small_scan


@pytest.fixture(scope="module")
def spark():
    from logsentinelai_spark.session import get_spark

    return get_spark("t_r08", cpus=4)


def test_fanout_spreads_single_partition_scan(tmp_path, spark):
    p = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fanout_small_scan(df)
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    # same rows, just spread
    assert out.count() == 1000
    assert out.agg(F.sum("id")).collect()[0][0] == 999 * 1000 // 2


def test_fanout_noop_on_presplit_input(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 10000, 1, numPartitions=target * 4)
    out = fanout_small_scan(df)
    # already at least as parallel as the session: plan unchanged
    assert out is df


def test_fanout_heavy_expr_runs_above_exchange(tmp_path, spark):
    """The point of the fan-out: the per-row heavy expression must sit
    ABOVE the repartition so it runs on every core, not inside the
    single-task scan stage."""
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "a b c " * 10) for i in range(100)], "doc_id long, text string"
    ).coalesce(1).write.parquet(p)
    df = fanout_small_scan(spark.read.parquet(p)).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # Project(regexp...) above Repartition above the parquet relation
    i_proj = plan.index("regexp_extract_all")
    i_rep = plan.index("Repartition")
    assert i_proj < i_rep, plan


def test_corpus_zipf_draw_matches_choice():
    """The precomputed inverse-CDF Zipf draw must consume the identical
    random stream and produce identical words as Generator.choice(p=)
    did (corpus bytes are pinned by golden fixtures downstream)."""
    import numpy as np

    from logsentinelai_spark import corpus as C

    for i in (0, 1, 7, 123, 4567):
        r_old = np.random.default_rng([C.SEED, i])
        n = 120
        a = r_old.choice(C._VOCAB, size=n, p=C._ZIPF_P)
        r_new = np.random.default_rng([C.SEED, i])
        b = C._VOCAB[C._ZIPF_CDF.searchsorted(r_new.random(n), side="right")]
        assert (a == b).all()
        # stream state advanced identically
        assert r_old.integers(0, 1 << 30) == r_new.integers(0, 1 << 30)
