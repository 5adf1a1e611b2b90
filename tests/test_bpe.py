"""Deterministic BPE subword counting (functions/bpe.py): the learner
and the rank-greedy replay must agree, learning is reproducible, and
the Spark application (q_token_count.n_subword_tokens) matches a
driver-side recount."""

from __future__ import annotations

from logsentinelai_spark.functions import bpe
from logsentinelai_spark.functions.tokenizer import tokens

SF = "/root/testdata/sf0.001"


def test_segment_agrees_with_learner_vocab():
    """Two implementations, one answer: the committed model's vocab
    block holds the LEARNER's sequential merge application; segment()
    re-derives by lowest-rank-first replay. They must agree on every
    learned word."""
    model = bpe.load_model()
    ranks = bpe._ranks(model)
    for w, n in model["vocab"].items():
        assert len(bpe.segment(w, ranks)) == n, w


def test_learn_bpe_is_deterministic_and_matches_naive_reference():
    """learn_bpe twice on the same corpus -> identical artifact; and
    on a tiny corpus the merges equal a from-scratch naive BPE
    (independent code path, straight from Sennrich et al. 2016)."""
    corpus = ["low low low lower lowest", "newer newest new low"]
    m1 = bpe.learn_bpe(corpus, n_merges=8)
    m2 = bpe.learn_bpe(corpus, n_merges=8)
    assert m1 == m2

    # naive reference: recount pairs from scratch each round
    freqs: dict[str, int] = {}
    for t in corpus:
        for w in tokens(t):
            freqs[w] = freqs.get(w, 0) + 1
    words = {w: list(w) for w in freqs}
    expect = []
    for _ in range(8):
        pf: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pf[(syms[i], syms[i + 1])] = pf.get((syms[i], syms[i + 1]), 0) + freqs[w]
        if not pf:
            break
        best = min(p for p, c in pf.items() if c == max(pf.values()))
        expect.append([best[0], best[1]])
        for w, syms in words.items():
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == best:
                    syms[i:i + 2] = [syms[i] + syms[i + 1]]
                else:
                    i += 1
    assert m1["merges"] == expect


def test_segment_handles_unknown_words():
    """Words absent at learn time segment without error: merges apply
    where pairs match, everything else stays split (no <unk>)."""
    assert bpe.segment("zzz") == ["z", "z", "z"]
    assert bpe.n_subwords("") == 0 or bpe.segment("") == []
    # a word made of learned fragments still merges its known pairs
    model = bpe.load_model()
    a, b = model["merges"][0]
    segs = bpe.segment(a + b + "zq")
    assert a + b in segs[0]


def test_token_count_subwords_match_driver_recount(spark):
    """The distributed application (distinct-term pandas UDF +
    broadcast join) equals a per-doc Python recount with the same
    frozen model."""
    from logsentinelai_spark.operators.textstats import q_token_count

    import duckdb

    got = {r.doc_id: r.n_subword_tokens
           for r in q_token_count(spark, SF).collect()}
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()
    for doc_id, text in docs:
        want = sum(bpe.n_subwords(w) for w in tokens(text))
        assert got[doc_id] == want, doc_id
