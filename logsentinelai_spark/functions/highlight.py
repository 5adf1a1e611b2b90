"""ES ``highlight`` fragment rendering as pure Catalyst expressions.

The reference ships raw log lines to Kibana and lets Elasticsearch's
highlighter mark query terms (every dashboard search box). Here the
fragment is computed over the ``tokens`` array column with
higher-order functions only — transform/filter/slice/array_join stay
inside whole-stage codegen, no Python touches the row path, so the
projection rides whatever scan already materialized the tokens.

Shared by the standalone highlight gates (entry_queries) and the
composed ``_search`` body compiler (index/body.py).
"""

from __future__ import annotations

# fragment window: tokens kept before the first hit, total fragment len
HL_BEFORE, HL_LEN = 3, 7


def hl_exprs(terms: list[str]) -> tuple[str, str]:
    """(pos_expr, frag_expr) over a ``tokens`` array column: position
    of the first query-term hit, and the `<em>`-marked fragment of
    HL_LEN tokens starting HL_BEFORE before it."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    pos = (
        "array_min(filter(transform(tokens, (t, i) -> "
        f"IF(t IN ({in_list}), i, CAST(NULL AS INT))), p -> p IS NOT NULL))"
    )
    frag = (
        f"array_join(transform(slice(tokens, greatest(0, {pos} - {HL_BEFORE})"
        f" + 1, {HL_LEN}), t -> IF(t IN ({in_list}), "
        "concat('<em>', t, '</em>'), t)), ' ')"
    )
    return pos, frag
