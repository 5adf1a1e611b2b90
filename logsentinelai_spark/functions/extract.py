"""HTML -> text extraction: pure reference function + vectorized Arrow UDF.

The reference (call518/LogSentinelAI) ingests plain text log lines and its
only per-row normalization is strip + skip-empty
(`src/logsentinelai/core/commons.py:1069-1071`); it has no HTML extractor.
Our engine's input is Common-Crawl-style pages with an ``html:binary``
column (BASELINE.json input_hint), so the extraction contract is defined
here and pinned by tests (FIXTURES.md §1, §4):

  extract_text(html) is deterministic, and the distributed pandas/Arrow
  implementation is byte-identical to the single-node pure function.

Algorithm (fixed, documented, order matters; "whitespace" means ASCII
whitespace ``[ \\t\\n\\r\\f\\v]`` throughout — pinned so the Python-``re``
oracle and the Arrow/RE2 hot path agree by construction on every input,
not just on inputs without exotic Unicode spaces):
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

The hot path (`extract_arrow`) runs the same pipeline as RE2 passes over
Arrow string buffers (`pc.replace_substring_regex`): no per-row Python,
no PyObject string churn — each pass is one C scan over a contiguous
buffer, which is what keeps stage 1 memory-bandwidth-light at 32
concurrent workers. The single-node oracle keeps Python ``re``
(ASCII-classes) and tests assert byte-identity; the one Python-re /
RE2 semantic difference that matters (no backreferences in RE2) is
avoided by writing the script|style alternation explicitly.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Compiled once; DOTALL so blocks span lines, IGNORECASE for tag names.
# re.ASCII pins \s / \S to ASCII, matching RE2's default classes.
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_HEAD_RE = re.compile(r"<head\b.*?</head\s*>", re.S | re.I | re.A)
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b.*?</\1\s*>", re.S | re.I | re.A)
_BLOCK_CLOSE_RE = re.compile(r"</(?:p|h[1-6]|div|li|tr|title)\s*>|<br\s*/?>", re.I | re.A)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+", re.A)

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

# RE2 pattern set for the Arrow hot path — same semantics as the
# compiled Python patterns above ((?s)/(?i) inline flags; the \1
# backreference unrolled into an explicit two-branch alternation,
# which is what the original alternation means). Whitespace is spelled
# as an explicit class: RE2's \s is [ \t\n\f\r] (no \v) while Python's
# ASCII \s includes \v.
_WS = r" \t\n\r\f\v"
_RE2_PASSES: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", ""),
    (rf"(?si)<head\b.*?</head[{_WS}]*>", ""),
    (rf"(?si)<script\b.*?</script[{_WS}]*>|<style\b.*?</style[{_WS}]*>", ""),
    (rf"(?i)</(?:p|h[1-6]|div|li|tr|title)[{_WS}]*>|<br[{_WS}]*/?>", "\n"),
    (r"<[^>]*>", ""),
]
# Two passes, provably equivalent to the naive three (collapse
# non-newline runs -> trim spaces around newlines -> squeeze \n+):
# matches never span non-whitespace, so equivalence reduces to maximal
# whitespace runs — a run containing >=1 newline becomes "\n" (pass 1
# swallows the whole run: space-class prefix, first \n, then any
# whitespace greedily), a run without newlines becomes " " (pass 2).
# One fewer full-buffer scan per batch; the Python oracle is the
# byte-identity contract and the fuzz test pins the equivalence.
_RE2_WS_PASSES: list[tuple[str, str]] = [
    (r"[ \t\r\f\v]*\n[ \t\n\r\f\v]*", "\n"),  # ws runs containing \n
    (r"[ \t\r\f\v]+", " "),                   # remaining ws runs
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
    lines = (_WS_RE.sub(" ", ln).strip(" ") for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def _decode_utf8(arr: pa.Array) -> pa.Array:
    """binary -> string with errors="replace" semantics. The cast is a
    zero-copy validation for the (overwhelmingly) valid case; only a
    batch that actually contains invalid UTF-8 pays a Python decode."""
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr
    try:
        return arr.cast(pa.string())
    except pa.ArrowInvalid:
        return pa.array(
            [None if v is None else v.decode("utf-8", errors="replace")
             for v in arr.to_pylist()],
            type=pa.string(),
        )


def extract_arrow(html: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized extraction over an Arrow binary/string array — the
    stage-1 hot path. RE2 passes over contiguous string buffers; byte-
    identical to :func:`extract_text` (asserted by tests)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    s = _decode_utf8(html)
    s = pc.fill_null(s, "")
    for pat, rep in _RE2_PASSES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    for pat, rep in _RE2_WS_PASSES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return pc.utf8_trim(s, characters=" \n")


def extract_series(html: pd.Series) -> pd.Series:
    """Vectorized pandas wrapper around :func:`extract_arrow` (kept for
    mapInPandas call sites and tests). Byte-identical to
    :func:`extract_text`."""
    try:
        arr = pa.array(html, type=pa.binary(), from_pandas=True)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        # mixed str/bytes input (tests, ad-hoc callers): normalize via
        # the oracle path per element — not a hot path
        return html.map(extract_text)
    return extract_arrow(arr).to_pandas()


def extract_pages(pages_df, html_col: str = "html", out_col: str = "extracted_text"):
    """Distributed extraction over a pages DataFrame via ``mapInPandas``
    (Arrow-batched; one batch ≈ the reference's chunk,
    `core/commons.py:1073-1097`). Keeps all input columns, appends
    ``out_col``. No per-row Python UDFs — the batch is processed with
    vectorized Arrow/RE2 passes."""
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
