"""HTML -> text extraction: pure reference function + vectorized Arrow UDF.

The reference (call518/LogSentinelAI) ingests plain text log lines and its
only per-row normalization is strip + skip-empty
(`src/logsentinelai/core/commons.py:1069-1071`); it has no HTML extractor.
Our engine's input is Common-Crawl-style pages with an ``html:binary``
column (BASELINE.json input_hint), so the extraction contract is defined
here and pinned by tests (FIXTURES.md §1, §4):

  extract_text(html) is deterministic, and the distributed pandas/Arrow
  implementation is byte-identical to the single-node pure function.

Algorithm (fixed, documented, order matters):
  1. decode utf-8 (errors="replace")
  2. drop HTML comments
  3. drop the entire <head>...</head> section (title/meta/script/style in
     head are not body text)
  4. drop <script>/<style> blocks remaining in body
  5. closing block-level tags (</p>, </h1..6>, </div>, </li>, </tr>,
     </title>) and <br> become newlines
  6. strip every remaining tag
  7. decode the fixed entity set (html.escape's output set plus &#39;
     and &nbsp;), ampersand last so no double-decode
  8. per line: collapse whitespace runs to one space, strip; drop empties
  9. join surviving lines with "\n"

Both implementations below share the same compiled regexes + entity
table, so byte-identity is by construction; tests still assert it.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

# Compiled once; DOTALL so blocks span lines, IGNORECASE for tag names.
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.S | re.I)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.S | re.I)
_BLOCK_CLOSE_RE = re.compile(r"</(?:p|h[1-6]|div|li|tr|title)\s*>|<br\s*/?>", re.I)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Fixed entity table. Ampersand MUST be decoded last (single pass
# left-to-right over this list) so "&amp;lt;" -> "&lt;" not "<".
_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text(html: bytes | bytearray | str | None) -> str:
    """Single-node reference extractor (the byte-identity oracle)."""
    if html is None:
        return ""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _COMMENT_RE.sub("", s)
    s = _HEAD_RE.sub("", s)
    s = _SCRIPT_STYLE_RE.sub("", s)
    s = _BLOCK_CLOSE_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    lines = (_WS_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized pandas implementation — same regex pipeline via
    pandas .str ops (C-looped over the Arrow batch, no Python per-row
    closure). Byte-identical to :func:`extract_text`."""
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if isinstance(b, (bytes, bytearray)) else (b or "")
    )
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    s = s.str.replace(_HEAD_RE, "", regex=True)
    s = s.str.replace(_SCRIPT_STYLE_RE, "", regex=True)
    s = s.str.replace(_BLOCK_CLOSE_RE, "\n", regex=True)
    s = s.str.replace(_TAG_RE, "", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    # collapse whitespace per line, drop empty lines, join with \n:
    # do it in one pass: collapse [^\S\n]+ runs to " ", trim around \n,
    # squeeze \n runs, trim ends.
    s = s.str.replace(r"[^\S\n]+", " ", regex=True)
    s = s.str.replace(r" ?\n ?", "\n", regex=True)
    s = s.str.replace(r"\n+", "\n", regex=True)
    s = s.str.strip()
    return s


def extract_pages(pages_df, html_col: str = "html", out_col: str = "extracted_text"):
    """Distributed extraction over a pages DataFrame via ``mapInPandas``
    (Arrow-batched; one batch ≈ the reference's chunk,
    `core/commons.py:1073-1097`). Keeps all input columns, appends
    ``out_col``. No per-row Python UDFs — the batch is processed with
    vectorized pandas .str ops."""
    from pyspark.sql import types as T

    out_schema = T.StructType(list(pages_df.schema.fields) + [T.StructField(out_col, T.StringType())])

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = extract_series(pdf[html_col])
            yield pdf

    return pages_df.mapInPandas(_extract, schema=out_schema)


def unescape_newlines(col):
    """C11: turn literal backslash-n sequences into real newlines in a
    string column (reference `utils/general.py:56-58`, which renders
    multiline log payloads by `line.replace('\\n', '\n')`). JVM-side
    regexp_replace — pattern '\\\\n' (an escaped backslash + n) to a
    real newline."""
    from pyspark.sql import functions as F

    return F.regexp_replace(col, r"\\n", "\n")
