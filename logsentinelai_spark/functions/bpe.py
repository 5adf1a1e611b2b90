"""Deterministic subword (BPE) token counting.

Reference analog: the reference counts tokens with tiktoken
(`src/logsentinelai/core/token_utils.py:9-45`) for budget accounting;
a training pipeline needs the same SUBWORD accounting without a
network-fetched vocabulary. We learn a small byte-pair-encoding merge
table offline from the fixture corpus (classic BPE, Sennrich et al.
2016, ACL — public algorithm), commit it as JSON, and apply it as a
frozen model — the same freeze-at-build discipline as the ANN
codebooks (`index/ann.py`).

Scale shape of application (`subword_count_col` consumers): the
corpus explodes to (doc_id, term) rows, but the Python merge replay
runs only over DISTINCT terms — O(vocabulary), not O(corpus) — via a
vectorized pandas UDF; occurrences then meet the per-term subword
length through a broadcast join. At 100 TB the vocabulary table is
millions of rows (MBs) while the corpus is trillions of tokens: the
expensive work stays vocabulary-sized, the corpus-sized work is one
JVM join + sum.
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

MERGES_PATH = Path(__file__).with_name("bpe_merges.json")
BPE_FORMAT_VERSION = 1


def learn_bpe(texts: list[str], n_merges: int = 60) -> dict:
    """Classic BPE merge learning over word-internal character pairs.
    Deterministic: ties in pair frequency break on the lexicographic
    pair, so the committed artifact is reproducible from the corpus
    alone (no RNG anywhere). Returns the model dict that is committed
    as bpe_merges.json."""
    from .tokenizer import tokens

    word_freq: dict[str, int] = {}
    for t in texts:
        for w in tokens(t):
            word_freq[w] = word_freq.get(w, 0) + 1

    # each word as a tuple of current symbols
    words = {w: tuple(w) for w in word_freq}
    merges: list[list[str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + f
        if not pair_freq:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair among the tied
        top = max(pair_freq.values())
        best = min(p for p, c in pair_freq.items() if c == top)
        merges.append([best[0], best[1]])
        merged = best[0] + best[1]
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return {
        "version": BPE_FORMAT_VERSION,
        "n_merges": len(merges),
        "merges": merges,
        # precomputed expected column for the DuckDB twin: subword
        # count per learn-corpus word, produced by the LEARNER's
        # sequential merge application — segment() re-derives the same
        # numbers by rank-greedy replay, and the pytest pins the two
        # implementations against each other
        "vocab": {w: len(syms) for w, syms in sorted(words.items())},
    }


def load_model(path: Path | None = None) -> dict:
    if path is not None:
        return json.loads(Path(path).read_text())
    # importlib.resources, not Path: executors import the package from
    # the shipped zip (session.ship_package), where filesystem paths
    # into the archive don't exist
    from importlib import resources

    return json.loads(
        resources.files(__package__).joinpath("bpe_merges.json").read_text())


def _ranks(model: dict) -> dict[tuple[str, str], int]:
    return {(a, b): i for i, (a, b) in enumerate(model["merges"])}


@lru_cache(maxsize=1)
def _default_ranks() -> dict[tuple[str, str], int]:
    return _ranks(load_model())


def segment(word: str, ranks: dict[tuple[str, str], int] | None = None) -> list[str]:
    """Apply the frozen merge table to one word: repeatedly merge the
    LOWEST-rank adjacent pair (the order the merges were learned),
    exactly the tiktoken/GPT-2 application rule. Unknown characters
    and never-merged pairs simply stay split — no <unk>."""
    if ranks is None:
        ranks = _default_ranks()
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms[i:i + 2] = [syms[i] + syms[i + 1]]
    return syms


@lru_cache(maxsize=65536)
def n_subwords(word: str) -> int:
    """len(segment(word)) with per-word memoization — the vocabulary
    is small relative to occurrences, so replay cost amortizes to a
    dict hit per token even inside the UDF."""
    return len(segment(word))


def term_subword_lengths(terms):
    """Vectorized pandas implementation (one Arrow batch of DISTINCT
    terms in, int64 lengths out) — the pandas-UDF body."""
    return terms.map(n_subwords)
