"""Deterministic tokenizer — the engine's analog of the reference's
token counting (`src/logsentinelai/core/token_utils.py:9-45`, which uses
tiktoken or a whitespace fallback). Ours must be byte-stable across the
single-node oracle and the distributed Arrow UDF path, so it is one
compiled regex applied identically in both.

Contract (pinned by tests/golden fixtures):
  tokens(text) = all non-overlapping matches of ``[^\\W_]+`` (Unicode
  letters/digits/marks; underscore excluded) over ``text.lower()``.

For DuckDB-oracle parity on the ASCII ``documents`` table we expose the
equivalent ASCII pattern ``[a-z0-9]+`` as SQL_TOKEN_PATTERN — on ASCII
input the two patterns agree; the Unicode pattern is the engine truth
for the multilingual pages corpus (FIXTURES.md: en/ko/fa).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# ASCII-equivalent pattern usable verbatim in both Spark SQL (Java regex)
# and DuckDB (RE2) for oracle queries over ASCII text.
SQL_TOKEN_PATTERN = "[a-z0-9]+"


def tokens(text: str | None) -> list[str]:
    """Single-node reference tokenizer (oracle)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokens_series(text: pd.Series) -> pd.Series:
    """Vectorized pandas implementation (per Arrow batch)."""
    return text.fillna("").str.lower().str.findall(TOKEN_RE)


def tokenize_df(df, text_col: str = "text", out_col: str = "tokens"):
    """Append a ``tokens array<string>`` column via mapInPandas."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def _tok(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = tokens_series(pdf[text_col])
            yield pdf

    return df.mapInPandas(_tok, schema=out_schema)
