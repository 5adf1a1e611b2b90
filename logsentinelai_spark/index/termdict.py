"""Sorted term dictionary sidecar + prefix queries.

ES ``prefix`` / ``match_phrase_prefix`` / query-bar autocomplete are
Lucene term-dictionary range scans (the ``.tim`` terms index). Our
posting layout prunes by HASHED ``term_bucket`` (build.py), so a prefix
query cannot prune postings by itself — it first needs the dictionary:

  * :func:`build_term_dict` writes ``<index>/term_dict/`` — one row per
    distinct term ``(term, df, term_bucket)``, GLOBALLY SORTED by term
    (repartitionByRange + sortWithinPartitions), so parquet row-group
    min/max stats serve a dictionary range scan with a pruned read.
    Committed by flipping ``_term_dict.json`` (which pins the wave set
    it was built from) after the data lands — stale sidecars are
    detected and rebuilt, never silently served.
  * :func:`expand_prefix` resolves ``pre*`` to its matching terms with
    one pruned pyarrow range read (``term >= p AND term < p + '{'`` —
    exact for the tokenizer's [a-z0-9]+ alphabet), capped ES-style at
    ``max_terms`` keeping the HIGHEST-df terms (Lucene's ``top_terms_N``
    rewrite; the cap and whether it truncated are returned, never
    silent).
  * :func:`prefix_topk` / :func:`prefix_topk_local` then score the
    expansion as a disjunctive BM25 over the existing machinery — the
    postings read stays bucket-pruned by the EXPANDED terms' hashes,
    identical to a plain multi-term query.

Scale shape: the dictionary is O(vocabulary) — tens of GB at
web-vocabulary scale, parquet-sorted so a prefix touches a handful of
row groups; building it is ONE narrow aggregation over the already
thin (term, term_bucket, n) block columns (no posting decode, no new
scan shape). Reference parity: ES query_string prefix queries in the
reference's Kibana setup (call518/LogSentinelAI INSTALL-and-USAGE.md
dashboard query bar).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import SparkSession, functions as F

from .lineage import resolve_index_dir

_POINTER = "_term_dict.json"


def _pointer(index_dir: Path) -> dict | None:
    p = index_dir / _POINTER
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except json.JSONDecodeError:
        return None


def build_term_dict(spark: SparkSession, index_dir: str,
                    n_files: int | None = None) -> dict:
    """One narrow aggregation over the committed block rows' thin
    columns -> globally term-sorted parquet sidecar. ``n_files``
    controls the range partition count (default: one file per ~256k
    terms is plenty; the fixture scale gets 1)."""
    from .lineage import committed_waves

    live = resolve_index_dir(index_dir)
    waves = committed_waves(str(live))
    if not waves:
        raise FileNotFoundError(f"no committed waves in {live}")
    root = live / "postings"
    blocks = spark.read.option("basePath", str(root)).parquet(
        *[str(root / f"wave={w}") for w in sorted(waves)])
    # column-pruned scan: term, term_bucket, n only (no posting blobs)
    dic = (
        blocks.filter(F.col("block_id") >= 0)
        .groupBy("term")
        .agg(F.sum("n").alias("df"),
             F.first("term_bucket").cast("int").alias("term_bucket"))
    )
    out = live / "term_dict"
    if n_files is None:
        n_terms = dic.count()
        n_files = max(1, n_terms // 262_144)
    (
        dic.repartitionByRange(n_files, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(str(out))
    )
    tmp = live / f".{_POINTER}.tmp"
    tmp.write_text(json.dumps({"waves": sorted(waves)}))
    os.replace(tmp, live / _POINTER)
    return {"dir": str(out), "n_files": n_files}


def ensure_term_dict(spark: SparkSession, reader) -> None:
    """Build (or rebuild) the sidecar iff missing or built from a
    different committed-wave set than the reader serves."""
    ptr = _pointer(reader.dir)
    if ptr is None or sorted(ptr.get("waves", [])) != sorted(reader.waves):
        build_term_dict(spark, str(reader.dir))


def expand_prefix(reader, prefix: str, max_terms: int = 50
                  ) -> tuple[list[str], bool]:
    """Dictionary range scan for ``prefix*``. Returns (terms,
    truncated): terms capped at ``max_terms`` keeping highest-df
    (ties: term asc — deterministic), truncated=True when the cap hit.
    The '{' upper bound is exact for the [a-z0-9]+ token alphabet
    ('{' = 'z' + 1 in ASCII)."""
    import pyarrow.dataset as pads

    if not prefix:
        raise ValueError("empty prefix")
    d = reader.dir / "term_dict"
    if _pointer(reader.dir) is None:
        raise FileNotFoundError(
            f"no committed term_dict in {reader.dir}; run build_term_dict")
    ds = pads.dataset(str(d), format="parquet")
    t = ds.to_table(
        filter=(pads.field("term") >= prefix)
        & (pads.field("term") < prefix + "{"),
        columns=["term", "df"],
    )
    pairs = sorted(zip(t.column("term").to_pylist(),
                       t.column("df").to_pylist()),
                   key=lambda p: (-p[1], p[0]))
    truncated = len(pairs) > max_terms
    return [p[0] for p in pairs[:max_terms]], truncated


def prefix_topk_local(reader, prefix: str, k: int = 10,
                      max_terms: int = 50, mode: str = "auto"):
    """Driver-local ES ``prefix`` query: dictionary expansion + the
    existing disjunctive BM25 scorer (each expanded term scores with
    its own idf — Lucene ``top_terms_N`` blended rewrite). Returns
    [(doc_id, score)]."""
    from .query import topk_local_terms

    terms, _ = expand_prefix(reader, prefix, max_terms)
    return topk_local_terms(reader, terms, k, mode)


def prefix_topk(reader, prefix: str, k: int = 10,
                max_terms: int = 50, mode: str = "auto"):
    """Distributed twin of :func:`prefix_topk_local` — the postings
    scan is bucket-pruned by the EXPANDED terms, so plan shape is
    identical to a plain multi-term query's."""
    from .query import topk_terms

    terms, _ = expand_prefix(reader, prefix, max_terms)
    return topk_terms(reader, terms, k, mode)
