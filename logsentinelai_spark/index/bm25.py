"""BM25 scoring semantics (the golden contract) + single-node numpy oracle.

The reference delegates full-text ranking to Elasticsearch/Lucene with
default similarity (its index template never sets ``similarity`` —
reference `INSTALL-and-USAGE.md:388-429`), i.e. public Lucene BM25:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(t,d)= tf / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q,d)  = sum over distinct query terms of idf * tf_norm
    k1 = 1.2, b = 0.75

Ties are broken by ascending doc_id (pinned — SURVEY.md §4.4; Lucene
breaks ties by internal doc order, which is ingestion order = our
doc_int_id). Every scorer in this repo (naive Catalyst, vectorized
accumulator, block-max WAND, DuckDB oracle SQL) must be rank-identical
to :func:`bm25_oracle_topk` with |Δscore| ≤ 1e-6.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

K1 = 1.2
B = 0.75


def idf(N: int, df: int) -> float:
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_oracle_topk(
    doc_tokens: dict[int, list[str]],
    query_terms: list[str],
    k: int = 10,
) -> list[tuple[int, float]]:
    """Exhaustive single-node oracle. doc_tokens: doc_id -> token list.

    Returns [(doc_id, score)] sorted by (-score, doc_id), length ≤ k,
    only docs with score > 0 (a doc matching no term is not a hit —
    Lucene semantics for a pure disjunction).
    """
    N = len(doc_tokens)
    if N == 0:
        return []
    dls = {d: len(t) for d, t in doc_tokens.items()}
    avgdl = sum(dls.values()) / N
    qts = sorted(set(query_terms))
    # df per query term
    dfs = {t: 0 for t in qts}
    tfs: dict[str, dict[int, int]] = {t: {} for t in qts}
    for d, toks in doc_tokens.items():
        c = Counter(toks)
        for t in qts:
            tf = c.get(t, 0)
            if tf:
                dfs[t] += 1
                tfs[t][d] = tf
    scores: dict[int, float] = {}
    for t in qts:
        if dfs[t] == 0:
            continue
        w = idf(N, dfs[t])
        for d, tf in tfs[t].items():
            dl = dls[d]
            scores[d] = scores.get(d, 0.0) + w * tf / (tf + K1 * (1 - B + B * dl / avgdl))
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def bm25_scores_dense(
    tf_by_term: dict[str, tuple[np.ndarray, np.ndarray]],
    dfs: dict[str, int],
    dls: np.ndarray,
    N: int,
    avgdl: float,
) -> np.ndarray:
    """Vectorized dense score accumulation: for each term, arrays of
    (doc_ids, tfs). Returns a dense float64 score array indexed by
    doc_id (0..N-1). Used by the per-shard accumulator scorer and as a
    second oracle for the compressed index."""
    scores = np.zeros(len(dls), dtype=np.float64)
    for t, (docs, tfs) in tf_by_term.items():
        df_t = dfs.get(t, 0)
        if df_t == 0 or len(docs) == 0:
            continue
        w = idf(N, df_t)
        denom = tfs + K1 * (1 - B + B * dls[docs] / avgdl)
        np.add.at(scores, docs, w * tfs / denom)
    return scores
