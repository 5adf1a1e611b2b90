"""logsentinelai_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the capability surface of
call518/LogSentinelAI (see SURVEY.md) on Apache Spark: declarative
schema-first extraction (HTML -> text via vectorized Arrow UDFs),
tokenization, inverted-index construction (posting lists, docID-gap +
varbyte compression, block-max annotations, term-salted merge), BM25
top-k query (naive Catalyst scorer + block-max WAND), dashboard-analog
analytics, dedup / similarity / text-analysis operators, and
checkpoint-resumable builds with per-partition lineage manifests.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the reference repo's observable behavior, and published IR
techniques (BM25: Robertson/Sparck-Jones; WAND: Broder et al., CIKM'03;
block-max WAND: Ding & Suel, SIGIR'11).
"""

__version__ = "0.1.0"
