"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Produces the canonical input table of BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string,
          lang string)

Key properties:
  * **Seeded + order-independent**: every page is generated from
    ``default_rng([seed, doc_index])`` so the same (seed, i) yields the
    same page regardless of partitioning or parallelism level — required
    for the scale-invariance tests (SURVEY.md §5.2).
  * **Invertible rendering**: ``html`` is rendered from ``text`` by a
    fixed template whose noise lives only in places the extractor
    removes (head section, comments, script/style blocks, tag
    attributes, extra whitespace), so ``extract_text(html) == text``
    holds row-for-row (the byte-identity contract).
  * **Zipfian vocabulary** (s≈1.1, ~5k terms) so hot-term skew is real
    — the salted index build is exercised, not just tolerated.
  * **Mixed scripts**: ~10% of pages draw from Korean/Persian word
    lists (the reference corpus mixes scripts — Persian URLs in
    `sample-logs/access-10k.log`, Korean default in
    `src/logsentinelai/core/config.py:88`).

Timestamps use base epoch 2019-01-22T00:00:00Z + i*37 s (the
reference's access-log era).
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import re

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000
ZIPF_S = 1.1
BASE_EPOCH = dt.datetime(2019, 1, 22, 0, 0, 0, tzinfo=dt.timezone.utc)

_BASE_WORDS = (
    "the of and to in a is that for it as was with be by on not he its are at from this "
    "have or had but what all were when we there can an your which their said if do will "
    "each about how up out them then she many some so these would other into has more her "
    "two like him see time could no make than first been long little very after words "
    "called just where most know get through back much before go good new write our used "
    "me man too any day same right look think also around another came come work three "
    "must because does part even place well such here take why things help put years "
    "different away again off went old number great tell men say small every found still "
    "between name should home big give air line set own under read last never us left end "
    "along while might next sound below saw something thought both few those always show "
    "large often together asked house world going want school important until form food "
    "keep children feet land side without boy once animal life enough took four head above "
    "kind began almost live page got earth need far hand high year mother light country "
    "father let night picture being study second soon story since white ever paper hard "
    "near sentence better best across during today however sure knew try told young sun "
    "thing whole hear example heard several change answer room sea against top turned learn "
    "point city play toward five himself usually money seen car morning long1 body upon "
    "family later turn move face door cut done group true half red fish plants living black "
    "eat short united run book gave order open ground cold really table remember tree "
    "course front american space inside ago sad early legs interest index search query term "
    "document score rank page2 crawl web site link text token corpus build merge shard "
    "partition block posting compress varbyte heap"
).split()

_KO_WORDS = "한국어 분석 로그 보안 시스템 서버 네트워크 데이터 검색 색인 질의 문서 단어 빈도 점수".split()
_FA_WORDS = "تحلیل امنیت سامانه شبکه داده جستجو نمایه پرسش سند واژه بسامد امتیاز وب صفحه خزش".split()

# A couple of entity-bearing tokens so extraction's entity decode is
# exercised (html.escape round-trips them).
_ENTITY_WORDS = ["r&d", "q&a", "<tag>", "it's"]


def build_vocab(size: int = VOCAB_SIZE) -> list[str]:
    v = list(_BASE_WORDS) + _ENTITY_WORDS
    i = 0
    while len(v) < size:
        v.append(f"term{i:04d}")
        i += 1
    return v[:size]


_VOCAB = np.array(build_vocab(), dtype=object)
_ZIPF_P = (1.0 / np.arange(1, len(_VOCAB) + 1) ** ZIPF_S)
_ZIPF_P /= _ZIPF_P.sum()
# Precomputed inverse-CDF for the Zipf draw: Generator.choice(p=...)
# validates and cumsums the 5k-entry p vector PER CALL (per document).
# Sampling u = rng.random(n) then searchsorted over this cdf consumes
# the identical random stream and picks identical indices (asserted by
# test_corpus_zipf_draw_matches_choice), at ~3x less per-doc cost.
_ZIPF_CDF = _ZIPF_P.cumsum()
_ZIPF_CDF /= _ZIPF_CDF[-1]

_MULTI_WS = re.compile(r"\s+")


def _doc_rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng([seed, int(i)])


def gen_text(i: int, seed: int = SEED) -> tuple[str, str]:
    """Return (text, lang) for doc index i. Deterministic per (seed, i)."""
    rng = _doc_rng(seed, i)
    r = rng.random()
    lang = "en" if r < 0.90 else ("ko" if r < 0.95 else "fa")
    n_tokens = max(8, int(rng.lognormal(mean=np.log(120.0), sigma=0.6)))
    # identical stream + indices as rng.choice(_VOCAB, n, p=_ZIPF_P)
    words = _VOCAB[_ZIPF_CDF.searchsorted(rng.random(n_tokens),
                                          side="right")]
    if lang != "en":
        extra = np.array(_KO_WORDS if lang == "ko" else _FA_WORDS, dtype=object)
        n_extra = max(2, n_tokens // 8)
        pos = rng.integers(0, n_tokens, size=n_extra)
        words[pos] = rng.choice(extra, size=n_extra)
    # split into sentence-lines of 8..16 words
    lines: list[str] = []
    j = 0
    while j < n_tokens:
        ln = int(rng.integers(8, 17))
        lines.append(" ".join(words[j : j + ln]))
        j += ln
    return "\n".join(lines), lang


def render_html(text: str, i: int, seed: int = SEED) -> bytes:
    """Render text into noisy-but-invertible HTML (FIXTURES.md §1)."""
    rng = _doc_rng(seed, i * 2 + 1)
    lines = text.split("\n")
    esc = [html_mod.escape(ln) for ln in lines]
    parts = [
        f'<html><head><title>page {i}</title><meta charset="utf-8">'
        "<script>var x = 1 < 2 && true;</script><style>.c{color:red}</style></head>",
        "<body>",
    ]
    if rng.random() < 0.3:
        parts.append("<!-- generated page; not body text -->")
    for k, e in enumerate(esc):
        # seeded whitespace noise (collapsed by the extractor)
        pad = " " * int(rng.integers(0, 4))
        if rng.random() < 0.2:
            e = e.replace(" ", "  ", 1)
        if k == 0:
            parts.append(f"<h1 class=\"t\">{pad}{e}</h1>")
        else:
            tag = "p" if rng.random() < 0.8 else "div"
            parts.append(f"<{tag}>{e}{pad}</{tag}>")
        if rng.random() < 0.1:
            parts.append("<script type=\"text/javascript\">trk(" + str(i) + ");</script>")
    parts.append("</body></html>")
    return "\n".join(parts).encode("utf-8")


def gen_pages_pandas(n: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Generate pages[start, start+n) as a pandas DataFrame."""
    idx = np.arange(start, start + n, dtype=np.int64)
    texts, langs, htmls, urls, ts = [], [], [], [], []
    for i in idx:
        t, lang = gen_text(int(i), seed)
        texts.append(t)
        langs.append(lang)
        htmls.append(render_html(t, int(i), seed))
        urls.append(f"https://site{int(i) % 97}.example/p/{int(i):010d}")
        ts.append(BASE_EPOCH + dt.timedelta(seconds=int(i) * 37))
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": [t.replace(tzinfo=None) for t in ts],
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_pages_df(spark, n: int, seed: int = SEED, partitions: int = 32):
    """Distributed generation: spark.range drives per-batch pandas gen.

    Order-independent — each row i is generated purely from (seed, i).
    """

    def _gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            out = []
            for i in ids:
                t, lang = gen_text(int(i), seed)
                out.append(
                    (
                        f"https://site{int(i) % 97}.example/p/{int(i):010d}",
                        (BASE_EPOCH + dt.timedelta(seconds=int(i) * 37)).replace(tzinfo=None),
                        render_html(t, int(i), seed),
                        t,
                        lang,
                    )
                )
            yield pd.DataFrame(out, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(0, n, 1, partitions).mapInPandas(_gen, schema=PAGES_SCHEMA)


def pages_from_documents(spark, sf_dir: str, seed: int = SEED):
    """Wrap the driver-provided ``documents`` table into the pages shape
    (TESTDATA.md) — text is whitespace-normalized so the byte-identity
    invariant extract(html) == text holds."""

    def _wrap(batches):
        for pdf in batches:
            texts = pdf["text"].fillna("").map(lambda s: _MULTI_WS.sub(" ", s).strip())
            ids = pdf["doc_id"].to_numpy()
            out = pd.DataFrame(
                {
                    "url": [f"https://docs.example/{int(i):010d}" for i in ids],
                    "warc_ts": [
                        (BASE_EPOCH + dt.timedelta(seconds=int(i) * 37)).replace(tzinfo=None) for i in ids
                    ],
                    "html": [render_html(t, int(i), seed) for t, i in zip(texts, ids)],
                    "text": texts.to_numpy(),
                    "lang": pdf["lang"].to_numpy(),
                }
            )
            yield out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.mapInPandas(_wrap, schema=PAGES_SCHEMA)


def gen_queries(seed: int = SEED, n_common: int = 20, n_rare: int = 20, n_mixed: int = 5, n_oov: int = 5) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): 1-4 terms each; common /
    rare / mixed / OOV strata. Deterministic."""
    rng = np.random.default_rng([seed, 777])
    rows = []
    qid = 1
    common = _VOCAB[:100]
    rare = _VOCAB[1000:]
    for _ in range(n_common):
        k = int(rng.integers(1, 5))
        rows.append((qid, " ".join(rng.choice(common, size=k, replace=False)), 10))
        qid += 1
    for _ in range(n_rare):
        k = int(rng.integers(1, 5))
        rows.append((qid, " ".join(rng.choice(rare, size=k, replace=False)), 10))
        qid += 1
    for _ in range(n_mixed):
        rows.append(
            (qid, f"{rng.choice(common)} {rng.choice(rare)}", 10)
        )
        qid += 1
    for _ in range(n_oov):
        rows.append((qid, f"zzqx{qid:03d} vvwk{qid:03d}", 10))
        qid += 1
    return pd.DataFrame(rows, columns=["query_id", "query_text", "k"])
