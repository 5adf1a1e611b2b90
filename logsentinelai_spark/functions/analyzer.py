"""Optional analyzer chain: stopword removal + minimal S-stemmer.

OFF by default — the default token stream stays byte-identical to
rounds 1-6 (rank parity with every committed gate). When enabled via
``IndexConfig(stopwords=..., stemmer="s")`` the chain applies at BUILD
time inside the stage-1 Arrow kernel (zero PyObjects — pyarrow compute
end to end) and at QUERY analysis through
``IndexReader.analyze_terms`` — the same split ES makes between an
index analyzer and a search analyzer defaulting to it.

The stemmer is the minimal English S-stemmer (Harman 1991, "How
Effective Is Suffixing?", JASIS 42(1) — public domain algorithm):

    ies -> y   unless preceded by a/e        (ties -> ty)
    es  -> e-  drop s unless aes/ees/oes     (tables -> table... no:
                                              'tables' hits rule 3)
    s   ->     drop unless us/ss             (tables -> table)

Length guards keep a rule from emptying a token (the bare token "s"
stays "s"). Positions are assigned over the KEPT tokens (no position
increments for removed stopwords — phrases over an analyzed index
match the analyzed stream, consistently on both sides).
"""

from __future__ import annotations

import numpy as np


def s_stem(t: str) -> str:
    """Python twin of the Arrow kernel — byte-identical by the shared
    rule set; pytest-pinned against analyze_arrow."""
    if len(t) > 3 and t.endswith("ies") and not t.endswith(("eies", "aies")):
        return t[:-3] + "y"
    if len(t) > 2 and t.endswith("es") and not t.endswith(("aes", "ees", "oes")):
        return t[:-1]
    if len(t) > 1 and t.endswith("s") and not t.endswith(("us", "ss")):
        return t[:-1]
    return t


def analyze(toks: list[str], stopwords=(), stemmer: str | None = None
            ) -> list[str]:
    """Query-side/driver-side analyzer: the exact transform the build
    kernel applies to the indexed stream."""
    if stemmer not in (None, "s"):
        raise ValueError(f"unknown stemmer {stemmer!r}; supported: 's'")
    sw = set(stopwords or ())
    out = [t for t in toks if t not in sw]
    if stemmer == "s":
        out = [s_stem(t) for t in out]
    return out


def analyze_arrow(flat, stopwords=(), stemmer: str | None = None):
    """Vectorized analyzer over a flat token StringArray (the stage-1
    kernel's token stream). Returns ``(keep_mask | None, flat)`` —
    the mask marks stopword survivors (None when no stopwords), the
    array is the (possibly stemmed) token values, length-aligned with
    the input so it composes with the kernel's nonempty mask."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if stemmer not in (None, "s"):
        raise ValueError(f"unknown stemmer {stemmer!r}; supported: 's'")
    keep = None
    if stopwords:
        keep = pc.invert(pc.is_in(
            flat, value_set=pa.array(sorted(set(stopwords)), type=pa.string())
        )).to_numpy(zero_copy_only=False).astype(bool)
    if stemmer == "s":
        n = pc.utf8_length(flat)

        def ends(suf: str):
            return pc.ends_with(flat, pattern=suf)

        c1 = pc.and_(pc.and_(pc.greater(n, 3), ends("ies")),
                     pc.invert(pc.or_(ends("eies"), ends("aies"))))
        c2 = pc.and_(pc.and_(pc.greater(n, 2), ends("es")),
                     pc.invert(pc.or_(pc.or_(ends("aes"), ends("ees")),
                                      ends("oes"))))
        c3 = pc.and_(pc.and_(pc.greater(n, 1), ends("s")),
                     pc.invert(pc.or_(ends("us"), ends("ss"))))
        ies_form = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(flat, 0, stop=-3), "y", "")
        drop_s = pc.utf8_slice_codeunits(flat, 0, stop=-1)
        flat = pc.if_else(c1, ies_form,
                          pc.if_else(pc.or_(c2, c3), drop_s, flat))
    return keep, flat
