"""Query-time BM25 top-k over the physical index.

Two scorers, both rank-identical to the numpy oracle (pinned tie-break:
descending score, ascending doc_id):

  * ``acc``  — vectorized per-shard score accumulation: decode every
    posting block of the query terms, accumulate idf·tf_norm with
    numpy, top-k via lexsort. Simple, exhaustive, fast for short
    posting lists; the correctness baseline for WAND.
  * ``wand`` — block-max WAND (Broder et al. CIKM'03; Ding & Suel
    SIGIR'11): document-at-a-time cursors with a bounded "min-heap"
    (k-best under the tie-break order), term- and block-level upper
    bounds from the (max_tf, min_dl) annotations, skipping whole
    blocks whose UB sum cannot beat the current threshold θ.

Execution shape (SURVEY.md §3.3): ONE pruned scan of the posting
segments -> groupBy(shard).applyInPandas local top-k -> driver merges
the per-shard heaps (shards × k rows — near-driver, no wide shuffle).
Scaling: each shard scores independently; doc-sharding spreads hot
terms evenly, so query work per task is ~|postings(q) ∩ shard|.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..functions.tokenizer import tokens as tokenize
from .bm25 import B, K1, idf as idf_fn


def _qtokens(reader, text: str) -> list[str]:
    """Query-side analysis: tokenize, then mirror the index's analyzer
    chain (ES's search analyzer defaults to the index analyzer —
    functions/analyzer.py). Identity for the default empty chain, so
    every pre-analyzer gate is byte-identical. Order-preserving, so
    phrase queries match the analyzed positional stream (positions are
    assigned over KEPT tokens at build time)."""
    return reader.analyze_terms(tokenize(text))
from .codec import block_upper_bound, decode_single_block, decode_stream
from .deletes import shard_slice
from .reader import IndexReader

_UB_MARGIN = 1.0 + 1e-12  # float-safety margin on upper bounds


def _mask_deleted(uniq: np.ndarray, sums: np.ndarray, excl):
    """Drop tombstoned docs from a scored (uniq docs, sums) pair —
    one sorted-membership probe (deletes.py; same shape as the bool
    query's must_not exclusion). excl is the shard's tombstone slice
    (global ids) or None."""
    if excl is None or not len(uniq):
        return uniq, sums
    m = ~np.isin(uniq, excl, assume_unique=True)
    return uniq[m], sums[m]


def _contrib(tfs: np.ndarray, dls: np.ndarray, w: float, avgdl: float) -> np.ndarray:
    return w * tfs / (tfs + K1 * (1 - B + B * dls / avgdl))


def _topk_merge(pairs: list[tuple[int, float]], k: int) -> list[tuple[int, float]]:
    return sorted(pairs, key=lambda p: (-p[1], p[0]))[:k]


# ----------------------------------------------------------------- shard scorers

def _after_mask(uniq: np.ndarray, sums: np.ndarray, after):
    """ES ``search_after`` cursor: keep only docs STRICTLY after the
    cursor in (score desc, doc_id asc) order. Applied before per-shard
    top-k selection — a shard's page-N hits need not be in its local
    page-1 top-k.

    Score equality against the cursor is RELATIVE-TOLERANCE banded,
    not bit-exact: the cursor score may come from a page 1 served by
    _score_shard_wand (mode auto/wand), which accumulates a doc's
    per-term contributions in cursor-advance order, while this forced
    accumulator sums in term order — for 3+-term matches the
    non-associative float adds can differ by an ulp, which a strict
    ``==`` would turn into a duplicated or dropped hit at the page
    boundary. Within the band the doc_id tiebreak decides, exactly as
    for a true tie; 1e-9 relative is ~1e7 ulps wide yet far below the
    spacing of distinct BM25 sums (distinct (tf, dl) inputs)."""
    if after is None or not len(uniq):
        return uniq, sums
    s_c, d_c = float(after[0]), int(after[1])
    tol = 1e-9 * max(1.0, abs(s_c))
    m = (sums < s_c - tol) | ((np.abs(sums - s_c) <= tol) & (uniq > d_c))
    return uniq[m], sums[m]


def _score_shard_acc(pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float, k: int, base: int, codec: str = "varbyte", excl=None, after=None, boost=None):
    """Whole-run decode per term (one decode_stream over the term's
    blobs — block gap streams chain within a term's segment; varbyte
    decodes the concatenation in one pass, packed batches same-width
    blocks). ``excl``: the shard's tombstone slice, masked before
    top-k selection. ``after``: search_after cursor (score, doc_id),
    masked before top-k selection. ``boost``: function_score hook —
    a callable mapping the per-doc dl array to a multiplier, applied
    to every candidate BEFORE top-k selection (a doc-field factor
    reorders beyond any window, so it cannot be a rescore)."""
    pdf = pdf.sort_values(["term", "block_id"], kind="mergesort", ignore_index=True)
    terms = pdf["term"].to_numpy()
    gaps_a = pdf["gaps_vb"].to_numpy()
    tfs_a = pdf["tfs_vb"].to_numpy()
    dls_a = pdf["dls_vb"].to_numpy()
    tb = np.append(
        np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
    docs_all, contribs, dls_all = [], [], []
    for s, e in zip(tb[:-1], tb[1:]):
        w = idfs[terms[s]]
        g = decode_stream(gaps_a[s:e], codec).astype(np.int64)
        d = np.cumsum(g) + base
        t = decode_stream(tfs_a[s:e], codec).astype(np.float64)
        l = decode_stream(dls_a[s:e], codec).astype(np.float64)
        docs_all.append(d)
        contribs.append(_contrib(t, l, w, avgdl))
        if boost is not None:
            dls_all.append(l)
    if not docs_all:
        return []
    docs = np.concatenate(docs_all)
    con = np.concatenate(contribs)
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.bincount(inv, weights=con)
    if boost is not None:
        # per-doc dl: every posting of a doc carries the same dl, so a
        # scatter-max over the inverse index recovers it exactly
        dlu = np.zeros(len(uniq))
        np.maximum.at(dlu, inv, np.concatenate(dls_all))
        sums = sums * boost(dlu)
    uniq, sums = _mask_deleted(uniq, sums, excl)
    uniq, sums = _after_mask(uniq, sums, after)
    order = np.lexsort((uniq, -sums))[:k]
    return [(int(uniq[i]), float(sums[i])) for i in order]


class _Cursor:
    """Per-term posting cursor with lazy block decode + block skipping."""

    __slots__ = ("rows", "idf", "avgdl", "bi", "docs", "tfs", "dls", "pos", "cur", "term_ub", "block_ubs", "codec")

    def __init__(self, rows: list, idf_t: float, avgdl: float, codec: str = "varbyte"):
        self.rows = rows  # block rows sorted by block_id
        self.idf = idf_t
        self.avgdl = avgdl
        self.codec = codec
        self.block_ubs = np.array(
            [block_upper_bound(r.max_tf, r.min_dl, idf_t, avgdl) for r in rows]
        ) * _UB_MARGIN
        self.term_ub = float(self.block_ubs.max())
        self.bi = -1
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= len(self.rows):
            self.cur = None
            return
        self.bi = bi
        self.docs, self.tfs, self.dls = decode_single_block(self.rows[bi], self.codec)
        self.pos = 0
        self.cur = int(self.docs[0])

    def block_ub(self) -> float:
        return float(self.block_ubs[self.bi])

    def block_last(self) -> int:
        return int(self.rows[self.bi].last_doc)

    def seek(self, target: int) -> None:
        """Advance to first doc >= target, skipping blocks via last_doc."""
        if self.cur is None or self.cur >= target:
            return
        bi = self.bi
        if self.rows[bi].last_doc < target:
            # skip undedcoded blocks by annotation only
            while bi < len(self.rows) and self.rows[bi].last_doc < target:
                bi += 1
            if bi >= len(self.rows):
                self.cur = None
                return
            self._load(bi)
        p = int(np.searchsorted(self.docs, target, side="left"))
        if p >= self.docs.size:
            self._load(self.bi + 1)
        else:
            self.pos = p
            self.cur = int(self.docs[p])

    def next(self) -> None:
        p = self.pos + 1
        if p >= self.docs.size:
            self._load(self.bi + 1)
        else:
            self.pos = p
            self.cur = int(self.docs[p])

    def contrib_at_cur(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * tf / (tf + K1 * (1 - B + B * dl / self.avgdl))

    def slice_window(self, hi: int):
        """(docs, contribs) of this cursor's postings in [cur, hi] —
        all inside the current decoded block (callers guarantee
        hi <= block_last). Vectorized; does not advance the cursor."""
        p_hi = int(np.searchsorted(self.docs, hi, side="right"))
        d = self.docs[self.pos:p_hi]
        t = self.tfs[self.pos:p_hi].astype(np.float64)
        dl = self.dls[self.pos:p_hi].astype(np.float64)
        return d, self.idf * t / (t + K1 * (1 - B + B * dl / self.avgdl))


class _TopK:
    """k-best under ordering (-score, doc) with threshold θ."""

    def __init__(self, k: int):
        self.k = k
        self.items: list[tuple[int, float]] = []

    def push(self, doc: int, score: float) -> None:
        self.items.append((doc, score))
        if len(self.items) > 4 * self.k:
            self._trim()

    def push_many(self, docs, scores) -> None:
        self.items.extend(zip(docs.tolist(), scores.tolist()))
        if len(self.items) > 4 * self.k:
            self._trim()

    def _trim(self) -> None:
        self.items = sorted(self.items, key=lambda p: (-p[1], p[0]))[: self.k]

    def theta(self) -> float:
        if len(self.items) < self.k:
            return -1.0
        self._trim()
        return self.items[-1][1]

    def result(self) -> list[tuple[int, float]]:
        return sorted(self.items, key=lambda p: (-p[1], p[0]))[: self.k]


def _score_shard_wand(pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float, k: int, base: int = 0, codec: str = "varbyte", excl=None):
    """Windowed block-max WAND: classic WAND pivoting (term-UB prefix
    sums over cur-sorted cursors) + block-max pruning, but instead of
    scoring one pivot doc per iteration, every surviving iteration
    fully scores the whole window [pivot_doc, W] vectorized, where
      W = min(block_last of pivot-prefix cursors, next cursor's cur - 1)
    Within that window (a) only the prefix cursors can hold postings
    (every later cursor's cur > W), and (b) each prefix cursor's
    postings lie inside its current decoded block — so the window's
    scores are complete, computed with numpy slices, and docs outside
    any surviving window are exactly those WAND proves cannot beat θ."""
    cursors: list[_Cursor] = []
    for term, g in pdf.groupby("term", sort=False):
        rows = list(g.sort_values("block_id").itertuples())
        cursors.append(_Cursor(rows, idfs[term], avgdl, codec))
    heap = _TopK(k)
    # θ warm-start: the k-th best SINGLE-term contribution of the most
    # selective term is a sound floor for the k-th best final score
    # (those k docs' final scores only grow), so pruning can kick in
    # before the heap fills. One vectorized pass over one term's run.
    theta_floor = -1.0
    seed = max(cursors, key=lambda c: c.term_ub, default=None)
    # with tombstones the warm-start is skipped: the seed's k-th best
    # single-term contribution could come from deleted docs, making the
    # floor exceed the true k-th live score — an UNSOUND prune. Deletes
    # are transient (compaction clears them), so the lost warm-start is
    # the cheap, always-correct choice.
    if excl is not None:
        seed = None
    if seed is not None and sum(r.n for r in seed.rows) >= k:
        tfs = decode_stream([r.tfs_vb for r in seed.rows], codec).astype(np.float64)
        dls = decode_stream([r.dls_vb for r in seed.rows], codec).astype(np.float64)
        con = _contrib(tfs, dls, seed.idf, avgdl)
        theta_floor = float(np.partition(con, con.size - k)[con.size - k]) if con.size >= k else -1.0
    live = [c for c in cursors if c.cur is not None]
    while live:
        live.sort(key=lambda c: c.cur)
        theta = max(heap.theta(), theta_floor)
        # pivot: first prefix whose term-UB sum can beat θ
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(live):
            acc += c.term_ub
            if acc >= theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no prefix can beat θ
        pivot_doc = live[pivot_i].cur
        if live[0].cur < pivot_doc:
            # advance the leading cursors up to pivot_doc
            for c in live[:pivot_i]:
                if c.cur < pivot_doc:
                    c.seek(pivot_doc)
            live = [c for c in live if c.cur is not None]
            continue
        # include all cursors already positioned on pivot_doc
        while pivot_i + 1 < len(live) and live[pivot_i + 1].cur == pivot_doc:
            pivot_i += 1
        prefix = live[: pivot_i + 1]
        w_hi = min(c.block_last() for c in prefix)
        if pivot_i + 1 < len(live):
            w_hi = min(w_hi, live[pivot_i + 1].cur - 1)
        w_hi = max(w_hi, pivot_doc)
        # block-max check: current-block UB sum of the window's cursors
        if sum(c.block_ub() for c in prefix) >= theta:
            parts = [c.slice_window(w_hi) for c in prefix]
            docs = np.concatenate([p[0] for p in parts])
            con = np.concatenate([p[1] for p in parts])
            uniq, inv = np.unique(docs, return_inverse=True)
            uniq, sums = _mask_deleted(
                uniq, np.bincount(inv, weights=con), excl)
            heap.push_many(uniq, sums)
        # advance every window cursor past the (scored or pruned) window
        for c in prefix:
            c.seek(w_hi + 1)
        live = [c for c in live if c.cur is not None]
    return heap.result()


# ----------------------------------------------------------------- distributed top-k

# auto-mode routing, CALIBRATED by scripts/bench_wand_crossover.py
# (synthetic posting lists, identical rankings asserted, min-of-3
# timings). WAND's cost is ~per-window Python iteration (~150-250 us)
# plus the blocks it actually decodes; acc's is ~0.4 us per posting
# for the exhaustive vectorized decode. WAND therefore wins only when
# the query mixes one long list with SELECTIVE companions — iteration
# count ~ (total - max_df) — and loses at ANY size when all terms are
# dense. Measured (3-term query, one long low-tf list + two
# heavy-tail companions; total ≈ long_df):
#   total=10.4M, total-max=400k  (ratio 26):  wand 0.55x acc  -> acc
#   total=10.0M, total-max=40k   (ratio 251): wand 0.79x acc  -> acc
#   total=3.0M,  total-max=3k    (ratio 1e3): wand 3.0x  acc  -> wand
#   total=10.0M, total-max=4k    (ratio 2.5e3): wand 4.4x acc -> wand
#   total=30.0M, total-max=6k    (ratio 5e3): wand 5.7x  acc  -> wand
# Crossover sits near ratio ~400-500 once total > ~2M; below the
# posting floor the fixed cursor setup never amortizes.
AUTO_WAND_MIN_POSTINGS = 2_000_000
AUTO_WAND_SELECTIVITY = 450


def _pick_scorer(mode: str, dfs_values):
    if mode == "auto":
        dfs_values = list(dfs_values)
        total = sum(dfs_values)
        rest = total - max(dfs_values, default=0)
        mode = (
            "wand"
            if total > AUTO_WAND_MIN_POSTINGS
            and rest > 0
            and total > AUTO_WAND_SELECTIVITY * rest
            else "acc"
        )
    return _score_shard_wand if mode == "wand" else _score_shard_acc


def topk(
    reader: IndexReader,
    query_text: str,
    k: int = 10,
    mode: str = "auto",
    with_urls: bool = False,
    search_after: tuple[float, int] | None = None,
) -> list[tuple]:
    """Distributed BM25 top-k. Returns [(doc_id, score[, url])].

    ``mode="auto"`` (default) routes on the MEASURED crossover (see
    _pick_scorer): block-max WAND when the query pairs a long posting
    list with selective companions (>2M candidate postings and
    total > ~450x the non-longest lists — where skipping whole blocks
    beats exhaustive decode by 3-6x), the vectorized accumulator
    everywhere else (dense terms: acc wins at any size).
    ``search_after=(score, doc_id)`` pages past a cursor (see
    topk_terms)."""
    return topk_terms(reader, sorted(set(_qtokens(reader, query_text))), k,
                      mode, with_urls, search_after=search_after)


def topk_terms(
    reader: IndexReader,
    qterms: list[str],
    k: int = 10,
    mode: str = "auto",
    with_urls: bool = False,
    search_after: tuple[float, int] | None = None,
) -> list[tuple]:
    """:func:`topk` over an explicit term list — the disjunctive
    scoring core shared by plain text queries and dictionary-expanded
    prefix queries (termdict.prefix_topk).

    ``search_after=(score, doc_id)``: ES deep pagination — return the
    next k hits STRICTLY after the cursor in (score desc, doc_id asc)
    order. Forces the accumulator scorer (the cursor mask needs every
    candidate's exact score, which block-max skipping doesn't
    produce) — the same trade ES makes when a cursor disables its
    top-score pruning."""
    qterms = sorted(set(qterms))
    if not qterms:
        return []
    # df(t) comes from a driver-local pruned (term, n) read — metadata
    # scale — so the Spark side is ONE job (shard scoring) instead of
    # two sequential ones (df aggregation, then scoring); the former
    # persist of the block scan bridged exactly that double-read and
    # is no longer needed.
    dfs = reader.term_dfs_local(qterms)
    qterms = [t for t in qterms if dfs.get(t)]
    if not qterms:
        return []
    blocks = reader.postings_blocks(qterms)
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, dfs[t]) for t in qterms}
    if search_after is not None:
        after = (float(search_after[0]), int(search_after[1]))
        score_fn = functools.partial(_score_shard_acc, after=after)
    else:
        score_fn = _pick_scorer(mode, (dfs[t] for t in qterms))
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    dels = reader.deletes()

    def _per_shard(key, pdf):
        base = int(key[0]) * shard_size
        res = score_fn(pdf, idfs, avgdl, k, base=base, codec=codec,
                       excl=shard_slice(dels, base, shard_size))
        return pd.DataFrame({"doc_id": [d for d, _ in res], "score": [s for _, s in res]})

    per_shard = blocks.groupBy("shard").applyInPandas(_per_shard, schema="doc_id long, score double")
    pairs = [(r.doc_id, r.score) for r in per_shard.collect()]
    top = _topk_merge(pairs, k)
    if with_urls:
        urls = reader.doc_urls([d for d, _ in top])
        return [(d, s, urls.get(d)) for d, s in top]
    return top


def _score_shard_acc_many(
    pdf: pd.DataFrame,
    qterms_list: list[list[str]],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    base: int,
    codec: str = "varbyte",
    excl=None,
):
    """Batched accumulate scorer: decode every query term's postings
    ONCE per shard, then score all queries against the shared decoded
    arrays. The amortization is exactly why the batched path uses acc
    and not WAND — block skipping is per-query, shared decode is not."""
    pdf = pdf.sort_values(["term", "block_id"], kind="mergesort", ignore_index=True)
    terms = pdf["term"].to_numpy()
    gaps_a = pdf["gaps_vb"].to_numpy()
    tfs_a = pdf["tfs_vb"].to_numpy()
    dls_a = pdf["dls_vb"].to_numpy()
    tb = np.append(
        np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
    per_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for s, e in zip(tb[:-1], tb[1:]):
        t = terms[s]
        w = idfs.get(t)
        if w is None:
            continue
        g = decode_stream(gaps_a[s:e], codec).astype(np.int64)
        d = np.cumsum(g) + base
        tf = decode_stream(tfs_a[s:e], codec).astype(np.float64)
        dl = decode_stream(dls_a[s:e], codec).astype(np.float64)
        per_term[t] = (d, _contrib(tf, dl, w, avgdl))
    out = []
    for qi, qterms in enumerate(qterms_list):
        parts = [per_term[t] for t in qterms if t in per_term]
        if not parts:
            continue
        docs = np.concatenate([p[0] for p in parts])
        con = np.concatenate([p[1] for p in parts])
        uniq, inv = np.unique(docs, return_inverse=True)
        sums = np.bincount(inv, weights=con)
        uniq, sums = _mask_deleted(uniq, sums, excl)
        order = np.lexsort((uniq, -sums))[:k]
        out += [(qi, int(uniq[i]), float(sums[i])) for i in order]
    return out


def topk_many(
    reader: IndexReader,
    query_texts: list[str],
    k: int = 10,
    with_urls: bool = False,
) -> list[list[tuple]]:
    """Batched distributed BM25 top-k: ONE pruned block scan serves the
    whole query set (dashboards' worth of queries in one job instead of
    one Spark job per query). Returns one [(doc_id, score[, url])] list
    per input query, each rank-identical to :func:`topk` with
    mode="acc" (pytest-pinned).

    Plan shape: the scan is pruned to the UNION of the queries' term
    buckets with `term IN (union terms)` pushed down; each shard task
    decodes every term once and accumulates all queries against the
    shared arrays (_score_shard_acc_many); the driver merges
    queries x shards x k rows. Scaling: work per shard is
    |postings(union q) ∩ shard| — the same scan a single worst-case
    query would do, amortized over the whole batch."""
    qterms_list = [sorted(set(_qtokens(reader, q))) for q in query_texts]
    all_terms = sorted({t for qt in qterms_list for t in qt})
    if not all_terms:
        return [[] for _ in query_texts]
    blocks = reader.postings_blocks(all_terms)
    # driver-local metadata read (see topk_terms) — the Spark side
    # is the single batched scoring job
    dfs = reader.term_dfs_local(all_terms)
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, dfs[t]) for t in all_terms if dfs.get(t)}
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    dels = reader.deletes()

    def _per_shard(key, pdf):
        base = int(key[0]) * shard_size
        rows = _score_shard_acc_many(
            pdf, qterms_list, idfs, avgdl, k,
            base=base, codec=codec,
            excl=shard_slice(dels, base, shard_size))
        return pd.DataFrame(
            {"query_id": [q for q, _, _ in rows],
             "doc_id": [d for _, d, _ in rows],
             "score": [s for _, _, s in rows]})

    per_shard = blocks.groupBy("shard").applyInPandas(
        _per_shard, schema="query_id int, doc_id long, score double")
    by_q: dict[int, list[tuple[int, float]]] = {}
    for r in per_shard.collect():
        by_q.setdefault(r.query_id, []).append((r.doc_id, r.score))
    tops = [_topk_merge(by_q.get(qi, []), k) for qi in range(len(query_texts))]
    if with_urls:
        urls = reader.doc_urls(sorted({d for top in tops for d, _ in top}))
        return [[(d, s, urls.get(d)) for d, s in top] for top in tops]
    return tops


def topk_many_local(
    reader: IndexReader,
    query_texts: list[str],
    k: int = 10,
) -> list[list[tuple]]:
    """Driver-local batched serving: one pruned pyarrow read for the
    union of query terms, shared per-term decode, no Spark job — the
    low-latency twin of :func:`topk_many` (see topk_local)."""
    qterms_list = [sorted(set(_qtokens(reader, q))) for q in query_texts]
    all_terms = sorted({t for qt in qterms_list for t in qt})
    if not all_terms:
        return [[] for _ in query_texts]
    pdf = reader.postings_blocks_local(all_terms)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return [[] for _ in query_texts]
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, int(df)) for t, df in dfs.items() if df}
    by_q: dict[int, list[tuple[int, float]]] = {}
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        base = int(shard) * reader.cfg.shard_size
        for qi, d, s in _score_shard_acc_many(
            g, qterms_list, idfs, avgdl, k,
            base=base, codec=reader.codec,
            excl=shard_slice(dels, base, reader.cfg.shard_size),
        ):
            by_q.setdefault(qi, []).append((d, s))
    return [_topk_merge(by_q.get(qi, []), k) for qi in range(len(query_texts))]


def topk_local(
    reader: IndexReader,
    query_text: str,
    k: int = 10,
    mode: str = "auto",
    with_urls: bool = False,
    search_after: tuple[float, int] | None = None,
) -> list[tuple]:
    """Driver-local BM25 top-k: identical pruning (bucket dirs + term
    predicate) and identical scorers as :func:`topk`, but the pruned
    block read goes straight to storage via pyarrow — no Spark job, so
    per-query latency is file-read-bound (ms) instead of
    job-scheduling-bound. This is the query-serving path; the Spark
    path remains for batch query workloads over huge indexes.
    ``search_after=(score, doc_id)`` pages past a cursor (see
    topk_terms)."""
    return topk_local_terms(reader, sorted(set(_qtokens(reader, query_text))),
                            k, mode, with_urls, search_after=search_after)


def topk_local_terms(
    reader: IndexReader,
    qterms: list[str],
    k: int = 10,
    mode: str = "auto",
    with_urls: bool = False,
    search_after: tuple[float, int] | None = None,
) -> list[tuple]:
    """:func:`topk_local` over an explicit term list (see topk_terms;
    ``search_after`` paginates exactly like the distributed path)."""
    qterms = sorted(set(qterms))
    if not qterms:
        return []
    pdf = reader.postings_blocks_local(qterms)
    pdf = pdf[pdf["block_id"] >= 0]  # drop in-band segment-metrics rows
    if pdf.empty:
        return []
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, int(df)) for t, df in dfs.items() if df}
    if search_after is not None:
        after = (float(search_after[0]), int(search_after[1]))
        score_fn = functools.partial(_score_shard_acc, after=after)
    else:
        score_fn = _pick_scorer(mode, (int(v) for v in dfs.values()))
    pairs: list[tuple[int, float]] = []
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        base = int(shard) * reader.cfg.shard_size
        pairs += score_fn(g, idfs, avgdl, k, base=base, codec=reader.codec,
                          excl=shard_slice(dels, base, reader.cfg.shard_size))
    top = _topk_merge(pairs, k)
    if with_urls:
        urls = reader.doc_urls_local([d for d, _ in top])
        return [(d, s, urls.get(d)) for d, s in top]
    return top


# ------------------------------------------------------- function_score

def _fvf_log1p(factor: float):
    """ES field_value_factor(modifier=log1p): value = ln(1 + factor·f).
    The field here is dl (document token length) — the one numeric
    doc field the postings already carry, decoded anyway for BM25."""
    def f(dl: np.ndarray) -> np.ndarray:
        return np.log1p(factor * dl)
    return f


def function_score_topk_local(reader: IndexReader, query_text: str,
                              k: int = 10, factor: float = 0.05
                              ) -> list[tuple[int, float]]:
    """ES ``function_score`` (field_value_factor on doc length,
    modifier=log1p, boost_mode=multiply): every candidate's BM25 sum
    is multiplied by ln(1 + factor·dl) INSIDE the per-shard
    accumulator, before top-k selection — a doc-field factor reorders
    beyond any window, so unlike rescore it cannot be applied to a
    served page. Costs one scatter-max per shard on arrays the scorer
    already decoded."""
    qterms = sorted(set(_qtokens(reader, query_text)))
    if not qterms:
        return []
    pdf = reader.postings_blocks_local(qterms)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return []
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, int(df)) for t, df in dfs.items() if df}
    boost = _fvf_log1p(factor)
    pairs: list[tuple[int, float]] = []
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        base = int(shard) * reader.cfg.shard_size
        pairs += _score_shard_acc(
            g, idfs, avgdl, k, base=base, codec=reader.codec,
            excl=shard_slice(dels, base, reader.cfg.shard_size),
            boost=boost)
    return _topk_merge(pairs, k)


# ------------------------------------------------------------ rescore

def rescore_topk_local(reader: IndexReader, query_text: str,
                       phrase_text: str, k: int = 10, window: int = 50,
                       query_weight: float = 1.0,
                       rescore_weight: float = 1.0,
                       mode: str = "auto") -> list[tuple[int, float]]:
    """ES ``rescore``: re-rank the base query's top ``window`` hits
    with a phrase-proximity secondary query, combined as
    ``query_weight·base + rescore_weight·phrase`` (ES ``total``
    score_mode). The phrase component is the match_phrase pseudo-term
    BM25 (df over the whole index — the rescore query scores
    normally, only its APPLICATION is windowed); window docs without
    the phrase keep their base score. Cost: one plain top-window
    serving call + one positional candidate scan bounded by the
    phrase's selectivity."""
    base = topk_local(reader, query_text, k=window, mode=mode)
    if not base:
        return []
    matches = phrase_match_local(reader, [phrase_text])[0]
    N, avgdl = reader.global_stats()
    w = idf_fn(N, len(matches)) if matches else 0.0
    ph = {d: w * c / (c + K1 * (1 - B + B * l / avgdl))
          for d, c, l in matches}
    combined = [(d, query_weight * s + rescore_weight * ph.get(d, 0.0))
                for d, s in base]
    return sorted(combined, key=lambda p: (-p[1], p[0]))[:k]


# ------------------------------------------------------------ explain

def explain_score(reader: IndexReader, query_text: str, doc_id: int
                  ) -> dict:
    """ES ``_explain`` analog: the per-term BM25 breakdown for one
    (query, document) pair — tf, df, idf, dl, avgdl and each term's
    contribution, summing to exactly the score every scorer returns
    (same decode + float pipeline). Reads only the query terms'
    pruned blocks, like any other serving call."""
    qterms = sorted(set(_qtokens(reader, query_text)))
    out = {"doc_id": int(doc_id), "total": 0.0, "matched": False,
           "terms": {}}
    if not qterms:
        return out
    pdf = reader.postings_blocks_local(qterms)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return out
    N, avgdl = reader.global_stats()
    out["avgdl"] = float(avgdl)
    dels = reader.deletes()
    if dels is not None and int(doc_id) in set(int(x) for x in dels):
        out["deleted"] = True
        return out
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    shard = int(doc_id) // reader.cfg.shard_size
    sub = pdf[pdf["shard"] == shard]
    sub = sub.sort_values(["term", "block_id"], kind="mergesort",
                          ignore_index=True)
    base = shard * reader.cfg.shard_size
    for term, g in sub.groupby("term", sort=False):
        gaps = decode_stream(g["gaps_vb"].to_numpy(), reader.codec)
        docs = np.cumsum(gaps.astype(np.int64)) + base
        hit = np.flatnonzero(docs == int(doc_id))
        if not len(hit):
            continue
        i = int(hit[0])
        tf = float(decode_stream(g["tfs_vb"].to_numpy(), reader.codec)[i])
        dl = float(decode_stream(g["dls_vb"].to_numpy(), reader.codec)[i])
        w = idf_fn(N, int(dfs[term]))
        contrib = float(_contrib(np.array([tf]), np.array([dl]), w,
                                 avgdl)[0])
        out["terms"][term] = {"tf": tf, "df": int(dfs[term]),
                              "idf": float(w), "dl": dl,
                              "contribution": contrib}
        out["total"] += contrib
        out["matched"] = True
    return out


# --------------------------------------------------------- more_like_this

def mlt_select_terms(reader: IndexReader, seed_text: str,
                     max_query_terms: int = 25) -> list[str]:
    """ES ``more_like_this`` term selection: the seed's terms ranked
    by tf·idf WITHIN the seed (Lucene's interestingTerms), capped at
    ``max_query_terms`` (ES default 25), ties broken term-asc. The df
    probe reads only the thin (term, n) block columns for the seed's
    own distinct terms — O(seed vocabulary), no posting decode."""
    from collections import Counter

    tf = Counter(_qtokens(reader, seed_text))
    if not tf:
        return []
    pdf = reader.postings_blocks_local(sorted(tf))
    pdf = pdf[pdf["block_id"] >= 0]
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    N, _ = reader.global_stats()
    scored = sorted(
        ((tf[t] * idf_fn(N, int(df)), t) for t, df in dfs.items() if df),
        key=lambda p: (-p[0], p[1]))
    return [t for _, t in scored[:max_query_terms]]


def mlt_topk_local(reader: IndexReader, seed_text: str,
                   exclude_doc: int | None = None, k: int = 10,
                   max_query_terms: int = 25, mode: str = "auto"
                   ) -> list[tuple]:
    """ES ``more_like_this``, driver-local serving path: select the
    seed's interesting terms, run the existing disjunctive BM25
    scorer bucket-pruned on them, and drop the seed itself from the
    page (ES excludes ``like`` docs from the hits)."""
    terms = mlt_select_terms(reader, seed_text, max_query_terms)
    if not terms:
        return []
    extra = 1 if exclude_doc is not None else 0
    res = topk_local_terms(reader, terms, k + extra, mode)
    return [p for p in res if p[0] != exclude_doc][:k]


def mlt_topk(reader: IndexReader, seed_text: str,
             exclude_doc: int | None = None, k: int = 10,
             max_query_terms: int = 25, mode: str = "auto") -> list[tuple]:
    """Distributed twin of :func:`mlt_topk_local`."""
    terms = mlt_select_terms(reader, seed_text, max_query_terms)
    if not terms:
        return []
    extra = 1 if exclude_doc is not None else 0
    res = topk_terms(reader, terms, k + extra, mode)
    return [p for p in res if p[0] != exclude_doc][:k]


# ----------------------------------------------------------------- phrase search

# local-doc position keys: key = local_doc * 2^32 + token_position.
# Positions are bounded by dl < 2^32 (a single document with 4B+
# tokens is not a document) and local docs by shard_size, so the key
# fits int64 with no overlap — the shard-local twin of the global-id
# discipline everywhere else.
_POS_SHIFT = np.int64(1) << np.int64(32)


def _decode_term_positions(g: pd.DataFrame, codec: str):
    """Decode one shard's posting blocks per distinct term INCLUDING
    the positional payload. Returns {term: (docs, dls, doc_rep, pos)}
    where docs/dls align per posting (shard-local doc ids) and
    doc_rep/pos align per token occurrence (np.repeat(docs, tfs))."""
    from .codec import decode_positions

    g = g.sort_values(["term", "block_id"], kind="mergesort", ignore_index=True)
    terms = g["term"].to_numpy()
    gaps_a = g["gaps_vb"].to_numpy()
    tfs_a = g["tfs_vb"].to_numpy()
    dls_a = g["dls_vb"].to_numpy()
    pos_a = g["pos_vb"].to_numpy()
    tb = np.append(
        np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
    out = {}
    for s, e in zip(tb[:-1], tb[1:]):
        gaps = decode_stream(gaps_a[s:e], codec).astype(np.int64)
        docs = np.cumsum(gaps)
        tfs = decode_stream(tfs_a[s:e], codec).astype(np.int64)
        dls = decode_stream(dls_a[s:e], codec).astype(np.int64)
        pos = decode_positions(pos_a[s:e], tfs)
        out[terms[s]] = (docs, dls, np.repeat(docs, tfs), pos)
    return out


def _phrase_hits_shard(
    decoded: dict, phrase_terms: list[str]
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Positional intersection for ONE phrase in ONE shard: term j
    contributes the sorted-unique key set {doc * 2^32 + (pos - j)};
    the running np.intersect1d leaves exactly the phrase START
    positions, so overlapping occurrences count — match_phrase
    semantics, identical to the naive in-row scan
    (entry_queries._ptf_expr, pytest-pinned). Returns shard-local
    (docs, ptf, dl) or None when any term is absent."""
    keys = None
    for j, t in enumerate(phrase_terms):
        dec = decoded.get(t)
        if dec is None:
            return None
        _, _, doc_rep, pos = dec
        if j == 0:
            kj = doc_rep * _POS_SHIFT + pos
        else:
            m = pos >= j
            kj = doc_rep[m] * _POS_SHIFT + (pos[m] - j)
        keys = kj if keys is None else np.intersect1d(keys, kj, assume_unique=True)
        if keys.size == 0:
            return None
    hit_docs = keys // _POS_SHIFT
    udoc, ptf = np.unique(hit_docs, return_counts=True)
    docs0, dls0, _, _ = decoded[phrase_terms[0]]
    dl = dls0[np.searchsorted(docs0, udoc)]
    return udoc, ptf.astype(np.int64), dl


def phrase_match_local(
    reader: IndexReader, phrase_texts: list[str]
) -> list[list[tuple[int, int, int]]]:
    """Exact-phrase candidate scan over the positional index (driver-
    local, the phrase twin of topk_many_local): ONE pruned pyarrow
    read of the union terms WITH pos_vb, shared per-term decode per
    shard, per-phrase positional intersection. Returns, per phrase,
    ALL matching docs as [(doc_id, phrase_tf, dl)] — candidates are
    bounded by min(df of the phrase terms), which is what makes
    phrases cheap: selectivity compounds.

    This is the reference's ES match_phrase analog
    (INSTALL-and-USAGE.md query examples); Lucene answers it from the
    .prx positions exactly this way (doc-at-a-time position
    intersection)."""
    if not reader.positions:
        raise ValueError(
            "index was built with positions=False; phrase queries need "
            "the positional payload (rebuild with IndexConfig(positions=True))")
    phrase_terms_list = [_qtokens(reader, p) for p in phrase_texts]
    all_terms = sorted({t for pt in phrase_terms_list for t in pt})
    out: list[list[tuple[int, int, int]]] = [[] for _ in phrase_texts]
    if not all_terms:
        return out
    pdf = reader.postings_blocks_local(all_terms, with_positions=True)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return out
    shard_size = reader.cfg.shard_size
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        decoded = _decode_term_positions(g, reader.codec)
        base = int(shard) * shard_size
        excl = shard_slice(dels, base, shard_size)
        for pi, pterms in enumerate(phrase_terms_list):
            if not pterms:
                continue
            hits = _phrase_hits_shard(decoded, pterms)
            if hits is None:
                continue
            udoc, ptf, dl = hits
            if excl is not None:
                # tombstone mask on the (global) candidate ids; the
                # phrase pseudo-term df downstream therefore counts
                # only live matches (both phrase paths agree)
                m = ~np.isin(udoc + base, excl, assume_unique=True)
                udoc, ptf, dl = udoc[m], ptf[m], dl[m]
            out[pi] += [
                (int(d) + base, int(c), int(l))
                for d, c, l in zip(udoc, ptf, dl)
            ]
    return out


def phrase_topk_local(
    reader: IndexReader, phrase_text: str, k: int = 10
) -> list[tuple[int, int, float]]:
    """BM25-scored exact-phrase top-k from the positional index: the
    phrase scores as ONE pseudo-term (tf = phrase start count, df =
    docs containing the phrase) — ES match_phrase scoring. Returns
    [(doc_id, phrase_tf, score)] under the pinned (-score, doc_id)
    tie-break; rank-identical to the naive Catalyst scorer
    entry_queries.q_phrase_topk (pytest-pinned)."""
    cands = phrase_match_local(reader, [phrase_text])[0]
    if not cands:
        return []
    N, avgdl = reader.global_stats()
    w = idf_fn(N, len(cands))
    scored = [
        (d, ptf, w * ptf / (ptf + K1 * (1 - B + B * dl / avgdl)))
        for d, ptf, dl in cands
    ]
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


def phrase_topk(
    reader: IndexReader, phrase_text: str, k: int = 10,
    with_urls: bool = False,
) -> list[tuple]:
    """Distributed BM25 phrase top-k — the batch/scale-out twin of
    :func:`phrase_topk_local` (rank-identical, pytest-pinned).

    Plan shape mirrors :func:`topk`: ONE pruned posting scan (bucket
    partitions + term predicate pushed down, pos_vb read ONLY here) ->
    groupBy(shard).applyInPandas positional intersection, so the
    per-token position work happens in executors against shard-local
    arrays and only (doc_id, phrase_tf, dl) candidate rows leave the
    tasks. df(phrase) is a count over the candidate frame and the
    final top-k is TakeOrderedAndProject — candidates never
    concentrate on the driver, which is what a million-hit phrase on
    a 10^12-doc corpus needs."""
    if not reader.positions:
        raise ValueError(
            "index was built with positions=False; phrase queries need "
            "the positional payload (rebuild with IndexConfig(positions=True))")
    pterms = _qtokens(reader, phrase_text)
    if not pterms:
        return []
    blocks = reader.postings_blocks(sorted(set(pterms)), with_positions=True)
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    dels = reader.deletes()

    def _per_shard(key, pdf):
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "ptf": pd.Series(dtype="int64"),
                              "dl": pd.Series(dtype="int64")})
        pdf = pdf[pdf["block_id"] >= 0]
        if pdf.empty:
            return empty
        hits = _phrase_hits_shard(_decode_term_positions(pdf, codec), pterms)
        if hits is None:
            return empty
        udoc, ptf, dl = hits
        base = int(key[0]) * shard_size
        gdoc = udoc + base
        excl = shard_slice(dels, base, shard_size)
        if excl is not None:
            m = ~np.isin(gdoc, excl, assume_unique=True)
            gdoc, ptf, dl = gdoc[m], ptf[m], dl[m]
        return pd.DataFrame({"doc_id": gdoc, "ptf": ptf, "dl": dl})

    cands = blocks.groupBy("shard").applyInPandas(
        _per_shard, schema="doc_id long, ptf long, dl long")
    cands.persist()
    try:
        df_phrase = cands.count()
        if df_phrase == 0:
            return []
        N, avgdl = reader.global_stats()
        w = idf_fn(N, df_phrase)
        scored = cands.withColumn(
            "score",
            F.lit(w) * F.col("ptf") / (
                F.col("ptf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl))),
        )
        rows = (
            scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            .select("doc_id", "ptf", "score").collect()
        )
    finally:
        cands.unpersist()
    top = [(r.doc_id, r.ptf, r.score) for r in rows]
    if with_urls:
        urls = reader.doc_urls([d for d, _, _ in top])
        return [(d, p, s, urls.get(d)) for d, p, s in top]
    return top


def _phrase_prefix_hits_shard(
    decoded: dict, fixed_terms: list[str], exp_terms: list[str]
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Positional intersection for ONE match_phrase_prefix in ONE
    shard: the fixed terms intersect exactly like _phrase_hits_shard;
    the final slot (offset L = len(fixed_terms)) matches the UNION of
    the prefix's dictionary expansions — Lucene's MultiPhraseQuery
    position matching. Returns shard-local (docs, ptf, dl) or None."""
    L = len(fixed_terms)
    keys = None
    for j, t in enumerate(fixed_terms):
        dec = decoded.get(t)
        if dec is None:
            return None
        _, _, doc_rep, pos = dec
        if j == 0:
            kj = doc_rep * _POS_SHIFT + pos
        else:
            m = pos >= j
            kj = doc_rep[m] * _POS_SHIFT + (pos[m] - j)
        keys = kj if keys is None else np.intersect1d(keys, kj, assume_unique=True)
        if keys.size == 0:
            return None
    parts = []
    for t in exp_terms:
        dec = decoded.get(t)
        if dec is None:
            continue
        _, _, doc_rep, pos = dec
        m = pos >= L
        parts.append(doc_rep[m] * _POS_SHIFT + (pos[m] - L))
    if not parts:
        return None
    last = np.unique(np.concatenate(parts))
    keys = np.intersect1d(keys, last, assume_unique=True)
    if keys.size == 0:
        return None
    hit_docs = keys // _POS_SHIFT
    udoc, ptf = np.unique(hit_docs, return_counts=True)
    docs0, dls0, _, _ = decoded[fixed_terms[0]]
    dl = dls0[np.searchsorted(docs0, udoc)]
    return udoc, ptf.astype(np.int64), dl


def phrase_prefix_topk_local(
    reader: IndexReader, phrase_text: str, k: int = 10,
    max_terms: int = 50,
) -> list[tuple[int, int, float]]:
    """ES ``match_phrase_prefix`` (query-bar autocomplete on a phrase):
    the LAST token of ``phrase_text`` is a prefix, expanded through the
    term-dictionary sidecar (termdict.expand_prefix, max_terms cap,
    highest-df kept); the phrase then matches where the fixed tokens
    are followed by ANY expansion at the next position (Lucene
    MultiPhraseQuery). Scored as one pseudo-term like phrase_topk
    (tf = start-position count, df = matching docs). Returns
    [(doc_id, ptf, score)]; requires >= 2 tokens (a single prefix
    token is a plain prefix query — use termdict.prefix_topk)."""
    from .termdict import ensure_term_dict, expand_prefix

    if not reader.positions:
        raise ValueError(
            "index was built with positions=False; match_phrase_prefix "
            "needs the positional payload")
    toks = _qtokens(reader, phrase_text)
    if len(toks) < 2:
        raise ValueError(
            "match_phrase_prefix needs >= 2 tokens; use prefix_topk "
            "for a single prefix term")
    fixed, prefix = toks[:-1], toks[-1]
    ensure_term_dict(reader.spark, reader)
    exp_terms, _ = expand_prefix(reader, prefix, max_terms)
    if not exp_terms:
        return []
    all_terms = sorted(set(fixed) | set(exp_terms))
    pdf = reader.postings_blocks_local(all_terms, with_positions=True)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return []
    shard_size = reader.cfg.shard_size
    dels = reader.deletes()
    cands: list[tuple[int, int, int]] = []
    for shard, g in pdf.groupby("shard", sort=False):
        decoded = _decode_term_positions(g, reader.codec)
        base = int(shard) * shard_size
        hits = _phrase_prefix_hits_shard(decoded, fixed, exp_terms)
        if hits is None:
            continue
        udoc, ptf, dl = hits
        gdoc = udoc + base
        excl = shard_slice(dels, base, shard_size)
        if excl is not None:
            m = ~np.isin(gdoc, excl, assume_unique=True)
            gdoc, ptf, dl = gdoc[m], ptf[m], dl[m]
        cands += [(int(d), int(c), int(l)) for d, c, l in zip(gdoc, ptf, dl)]
    if not cands:
        return []
    N, avgdl = reader.global_stats()
    w = idf_fn(N, len(cands))
    scored = [
        (d, ptf, w * ptf / (ptf + K1 * (1 - B + B * dl / avgdl)))
        for d, ptf, dl in cands
    ]
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


# --------------------------------------------------- significant terms

def significant_terms(
    reader: IndexReader,
    match_df,
    top_n: int = 10,
):
    """ES ``significant_terms`` aggregation served from the index: for
    every term, compare its document frequency INSIDE a match set
    (foreground) against the whole index (background) with the JLH
    score — (fg% − bg%) · (fg% / bg%), keeping terms more frequent in
    the foreground (the ES definition; public ES docs). This is the
    "what is unusual about these matching docs" Kibana panel.

    Scale shape: the match set never passes through the driver — it is
    CO-GROUPED with the posting blocks on the shard key (one shuffle of
    (doc_id) rows + the block scan both engines already do), each shard
    task probes its decoded doc streams against ITS OWN match slice
    (sorted searchsorted membership), and only (term, fg_df, df)
    partials re-aggregate. ES itself caps this cost with shard-level
    sampling; at 10^12 docs you would bound match_df the same way.

    Returns a DataFrame (term, fg_df, bg_df, jlh) of the top_n terms
    by (jlh desc, term asc)."""
    spark = reader.spark
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    n_fg = match_df.count()
    if n_fg == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, jlh double")
    N, _ = reader.global_stats()
    # cogroup keys must agree in TYPE: the hive partition column reads
    # back int32 while doc_id arithmetic is int64 — mismatched key
    # types silently mispair the groups
    blocks = reader.postings_blocks_all().withColumn(
        "shard", F.col("shard").cast("long"))
    match_sharded = match_df.withColumn(
        "shard", (F.col("doc_id") / shard_size).cast("long"))

    def _per_shard(key, pdf, mdf):
        pdf = pdf[pdf["block_id"] >= 0]
        if pdf.empty or mdf.empty:
            return pd.DataFrame(
                {"term": pd.Series(dtype="object"),
                 "fg_df": pd.Series(dtype="int64"),
                 "df_part": pd.Series(dtype="int64")})
        base = int(key[0]) * shard_size
        match_ids = np.sort(mdf["doc_id"].to_numpy(dtype=np.int64))
        pdf = pdf.sort_values(["term", "block_id"], kind="mergesort",
                              ignore_index=True)
        terms = pdf["term"].to_numpy()
        gaps_a = pdf["gaps_vb"].to_numpy()
        tb = np.append(np.flatnonzero(
            np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
        out_t, out_fg, out_df = [], [], []
        for s, e in zip(tb[:-1], tb[1:]):
            # background df deliberately counts tombstoned docs — like
            # N (global_stats), stats include deletes until compaction
            # (Lucene behavior); the FOREGROUND is tombstone-clean
            # because the match set (bool_match_ids) already masks
            d = np.cumsum(
                decode_stream(gaps_a[s:e], codec).astype(np.int64)) + base
            idx = np.searchsorted(match_ids, d)
            idx[idx >= match_ids.size] = match_ids.size - 1
            fg = int((match_ids[idx] == d).sum()) if match_ids.size else 0
            out_t.append(terms[s])
            out_fg.append(fg)
            out_df.append(int(d.size))
        return pd.DataFrame({"term": out_t, "fg_df": out_fg, "df_part": out_df})

    partials = (
        blocks.groupby("shard")
        .cogroup(match_sharded.groupby("shard"))
        .applyInPandas(_per_shard, schema="term string, fg_df long, df_part long")
    )
    agg = partials.groupBy("term").agg(
        F.sum("fg_df").alias("fg_df"), F.sum("df_part").alias("bg_df"))
    fg_pct = F.col("fg_df") / F.lit(float(n_fg))
    bg_pct = F.col("bg_df") / F.lit(float(N))
    return (
        agg.filter(F.col("fg_df") > 0)
        .withColumn("jlh", F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6))
        .filter(fg_pct > bg_pct)
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(top_n)
    )


def span_near_local(
    reader: IndexReader, pairs: list[tuple[str, str, int]]
) -> list[list[tuple[int, int]]]:
    """ES ``span_near`` analog over the positional payload: for each
    (term_a, term_b, window) return every doc containing the terms
    within ``window`` token positions of each other (either order),
    with the PAIR COUNT — |{(p_a, p_b) : |p_a - p_b| <= window}| — as
    the proximity strength. Driver-local like phrase_match_local; one
    pruned pyarrow read for the union of the pairs' terms.

    Per shard the count is one vectorized two-sided searchsorted over
    the (doc, pos) key arrays (window < 2^32 keeps a doc's key range
    disjoint from its neighbors', so clamping the low bound at the
    doc's base is the only boundary care needed) — no per-doc loop.

    Returns, per pair, [(doc_id, n_pairs)] with n_pairs > 0."""
    if not reader.positions:
        raise ValueError(
            "index was built with positions=False; span_near needs "
            "the positional payload (rebuild with IndexConfig(positions=True))")
    all_terms = sorted({t for a, b, _ in pairs for t in (a, b)})
    out: list[list[tuple[int, int]]] = [[] for _ in pairs]
    if not all_terms:
        return out
    pdf = reader.postings_blocks_local(all_terms, with_positions=True)
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return out
    shard_size = reader.cfg.shard_size
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        decoded = _decode_term_positions(g, reader.codec)
        base = int(shard) * shard_size
        excl = shard_slice(dels, base, shard_size)
        for pi, (ta, tb, w) in enumerate(pairs):
            da, db = decoded.get(ta), decoded.get(tb)
            if da is None or db is None:
                continue
            _, _, rep_a, pos_a = da
            _, _, rep_b, pos_b = db
            ka = rep_a * _POS_SHIFT + pos_a
            kb = rep_b * _POS_SHIFT + pos_b
            lo = np.maximum(ka - w, rep_a * _POS_SHIFT)
            counts = (np.searchsorted(kb, ka + w, side="right")
                      - np.searchsorted(kb, lo, side="left"))
            m = counts > 0
            if not m.any():
                continue
            udoc, inv = np.unique(rep_a[m], return_inverse=True)
            npairs = np.bincount(inv, weights=counts[m]).astype(np.int64)
            gdoc = udoc + base
            if excl is not None:
                keep = ~np.isin(gdoc, excl, assume_unique=True)
                gdoc, npairs = gdoc[keep], npairs[keep]
            out[pi] += [
                (int(d), int(c)) for d, c in zip(gdoc, npairs)
            ]
    return out


# ----------------------------------------------------------------- bool queries

def _score_shard_bool(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    base: int,
    must: frozenset,
    must_not: frozenset,
    codec: str = "varbyte",
    excl=None,
):
    """Accumulator scorer with ES ``bool`` gating. ``idfs`` holds the
    SCORING terms (must + should); ``must_not`` terms appear in the
    shard's blocks only as exclusion sources. A doc survives iff it
    carries every ``must`` term and no ``must_not`` term; its score is
    the plain BM25 sum over the scoring terms it contains — exactly
    Lucene's BooleanQuery scoring (must_not never contributes, should
    affects only the score).

    The must gate is a bincount over each scoring doc's count of
    distinct must terms (per-(term,shard) doc streams are unique, so
    count == membership); exclusion is one sorted-side searchsorted
    membership probe. Everything stays vectorized numpy — the bool
    gate adds no decode work beyond the extra must_not postings."""
    pdf = pdf.sort_values(["term", "block_id"], kind="mergesort", ignore_index=True)
    terms = pdf["term"].to_numpy()
    gaps_a = pdf["gaps_vb"].to_numpy()
    tfs_a = pdf["tfs_vb"].to_numpy()
    dls_a = pdf["dls_vb"].to_numpy()
    tb = np.append(
        np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
    docs_all, contribs, must_all = [], [], []
    # tombstones join the must_not exclusion stream — one shared probe
    excl_all = [] if excl is None else [np.asarray(excl, dtype=np.int64)]
    for s, e in zip(tb[:-1], tb[1:]):
        t = terms[s]
        g = decode_stream(gaps_a[s:e], codec).astype(np.int64)
        d = np.cumsum(g) + base
        if t in must_not:
            excl_all.append(d)
            continue
        w = idfs.get(t)
        if w is None:
            continue
        tf = decode_stream(tfs_a[s:e], codec).astype(np.float64)
        dl = decode_stream(dls_a[s:e], codec).astype(np.float64)
        docs_all.append(d)
        contribs.append(_contrib(tf, dl, w, avgdl))
        if t in must:
            must_all.append(d)
    if not docs_all:
        return []
    docs = np.concatenate(docs_all)
    con = np.concatenate(contribs)
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.bincount(inv, weights=con)
    mask = np.ones(len(uniq), dtype=bool)
    if must:
        mdocs = np.concatenate(must_all) if must_all else np.empty(0, np.int64)
        # every must doc is also a scoring doc, so searchsorted hits exactly
        cnt = np.bincount(np.searchsorted(uniq, mdocs), minlength=len(uniq))
        mask &= cnt == len(must)
    if excl_all:
        excl = np.unique(np.concatenate(excl_all))
        mask &= ~np.isin(uniq, excl, assume_unique=True)
    if not mask.any():
        return []
    uniq, sums = uniq[mask], sums[mask]
    order = np.lexsort((uniq, -sums))[:k]
    return [(int(uniq[i]), float(sums[i])) for i in order]


def _bool_terms(reader, must_text: str, should_text: str,
                must_not_text: str):
    must = frozenset(_qtokens(reader, must_text))
    should = frozenset(_qtokens(reader, should_text))
    must_not = frozenset(_qtokens(reader, must_not_text))
    if must & must_not:
        # a term required and forbidden at once can match nothing
        return None
    return must, should - must_not, must_not


def bool_topk(
    reader: IndexReader,
    must: str,
    should: str = "",
    must_not: str = "",
    k: int = 10,
) -> list[tuple[int, float]]:
    """Distributed ES ``bool`` query (Lucene BooleanQuery semantics):
    docs matching ALL ``must`` terms and NO ``must_not`` term, scored
    by the BM25 sum over the distinct must+should terms they contain,
    ties broken by doc_id. One pruned block scan covers scoring AND
    exclusion terms; the bool gate runs inside the same per-shard
    vectorized scorer as :func:`topk`, so the driver merge still sees
    at most shards x k rows."""
    parsed = _bool_terms(reader, must, should, must_not)
    if parsed is None:
        return []
    mset, sset, nset = parsed
    scoring = sorted(mset | sset)
    if not scoring:
        return []
    all_terms = sorted(mset | sset | nset)
    blocks = reader.postings_blocks(all_terms)
    # driver-local metadata read (see topk_terms) — one Spark job
    dfs = reader.term_dfs_local(all_terms)
    if any(not dfs.get(t) for t in mset):
        return []  # a required term absent from the corpus matches nothing
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, dfs[t]) for t in scoring if dfs.get(t)}
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    dels = reader.deletes()

    def _per_shard(key, pdf):
        base = int(key[0]) * shard_size
        res = _score_shard_bool(
            pdf, idfs, avgdl, k, base=base,
            must=mset, must_not=nset, codec=codec,
            excl=shard_slice(dels, base, shard_size))
        return pd.DataFrame({"doc_id": [d for d, _ in res], "score": [s for _, s in res]})

    per_shard = blocks.groupBy("shard").applyInPandas(_per_shard, schema="doc_id long, score double")
    pairs = [(r.doc_id, r.score) for r in per_shard.collect()]
    return _topk_merge(pairs, k)


def _match_shard_bool(pdf: pd.DataFrame, must: frozenset, should: frozenset,
                      must_not: frozenset, base: int, codec: str, excl):
    """Filter-context bool matching for one shard: doc ids carrying
    every must term (or, with no must, any should term) and no
    must_not term — NO scores, NO top-k truncation, and only the gap
    streams decode (tf/dl are never touched, the cheapest possible
    pass over the blocks). Returns a sorted np.int64 array of global
    doc ids."""
    empty = np.empty(0, dtype=np.int64)
    pdf = pdf.sort_values(["term", "block_id"], kind="mergesort",
                          ignore_index=True)
    terms = pdf["term"].to_numpy()
    gaps_a = pdf["gaps_vb"].to_numpy()
    tb = np.append(np.flatnonzero(
        np.concatenate(([True], terms[1:] != terms[:-1]))), len(terms))
    must_parts, should_parts, excl_parts = [], [], []
    for s, e in zip(tb[:-1], tb[1:]):
        t = terms[s]
        d = np.cumsum(
            decode_stream(gaps_a[s:e], codec).astype(np.int64)) + base
        if t in must_not:
            excl_parts.append(d)
        elif t in must:
            must_parts.append(d)
        elif not must and t in should:
            should_parts.append(d)
    if must:
        if len(must_parts) < len(must):
            return empty  # a required term absent from this shard
        uniq, cnt = np.unique(np.concatenate(must_parts), return_counts=True)
        matched = uniq[cnt == len(must)]
    else:
        if not should_parts:
            return empty
        matched = np.unique(np.concatenate(should_parts))
    if excl_parts:
        bad = np.unique(np.concatenate(excl_parts))
        matched = matched[~np.isin(matched, bad, assume_unique=True)]
    if excl is not None and matched.size:
        matched = matched[~np.isin(matched, excl, assume_unique=True)]
    return matched


def bool_match_ids(
    reader: IndexReader,
    must: str,
    should: str = "",
    must_not: str = "",
):
    """Distributed bool MATCH SET — the ``query`` half of an ES
    ``_search`` body with ``aggs`` (every Kibana panel): ALL doc ids
    matching the bool filter, as a DataFrame[doc_id] that downstream
    aggregations join against. Unlike :func:`bool_topk` there is no
    top-k and no scoring — filter-context semantics (ES skips scoring
    there too), so only the gap streams decode.

    Scale shape: the match set never concentrates on the driver — it
    flows task-to-task into the aggregation join (AQE converts that
    join to broadcast at runtime when the match set turns out small,
    the common dashboard-filter case)."""
    spark = reader.spark
    schema = "doc_id long"
    parsed = _bool_terms(reader, must, should, must_not)
    if parsed is None:
        return spark.createDataFrame([], schema)
    mset, sset, nset = parsed
    match_terms = sorted(mset) if mset else sorted(sset)
    if not match_terms:
        return spark.createDataFrame([], schema)
    blocks = reader.postings_blocks(sorted(set(match_terms) | nset))
    shard_size = reader.cfg.shard_size
    codec = reader.codec
    dels = reader.deletes()

    def _per_shard(key, pdf):
        base = int(key[0]) * shard_size
        matched = _match_shard_bool(
            pdf[pdf["block_id"] >= 0], mset, sset, nset, base, codec,
            shard_slice(dels, base, shard_size))
        return pd.DataFrame({"doc_id": matched})

    return blocks.groupBy("shard").applyInPandas(_per_shard, schema=schema)


def bool_topk_local(
    reader: IndexReader,
    must: str,
    should: str = "",
    must_not: str = "",
    k: int = 10,
) -> list[tuple[int, float]]:
    """Driver-local twin of :func:`bool_topk` (pyarrow pruned read,
    no Spark job) — the serving path for interactive bool queries."""
    parsed = _bool_terms(reader, must, should, must_not)
    if parsed is None:
        return []
    mset, sset, nset = parsed
    scoring = sorted(mset | sset)
    if not scoring:
        return []
    pdf = reader.postings_blocks_local(sorted(mset | sset | nset))
    pdf = pdf[pdf["block_id"] >= 0]
    if pdf.empty:
        return []
    dfs = pdf.groupby("term", sort=False)["n"].sum().to_dict()
    if any(not dfs.get(t) for t in mset):
        return []
    N, avgdl = reader.global_stats()
    idfs = {t: idf_fn(N, int(dfs[t])) for t in scoring if dfs.get(t)}
    pairs: list[tuple[int, float]] = []
    dels = reader.deletes()
    for shard, g in pdf.groupby("shard", sort=False):
        base = int(shard) * reader.cfg.shard_size
        pairs += _score_shard_bool(
            g, idfs, avgdl, k, base=base,
            must=mset, must_not=nset, codec=reader.codec,
            excl=shard_slice(dels, base, reader.cfg.shard_size))
    return _topk_merge(pairs, k)
