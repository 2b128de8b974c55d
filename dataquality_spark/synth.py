"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Schema is exactly BASELINE.json's ``input_hint``:
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Generation is a pure function of (seed, row index, n_rows) — a splitmix64
counter PRNG (models/corpus.py) — so content never depends on partitioning
(FIXTURES.md §1 requirement). Distributed via ``mapInPandas`` over
``spark.range``: scales linearly with executors, no driver materialization.

Dirt-pattern rates follow FIXTURES.md §1: empty 3%, symbol-heavy 4%,
word-stat violations 4%, low stop-word 3%, dup-lines 3%, exact dups 5%
(skewed to hot domains), near-dups 3%, PII 5%, wrong lang label 5%.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dataquality_spark import spec
from dataquality_spark.models import corpus

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

# language prior: en-heavy, like web text
_LANG_WEIGHTS = {
    "en": 34, "de": 10, "fr": 9, "es": 9, "it": 6, "pt": 6, "nl": 5,
    "pl": 5, "id": 4, "sv": 3, "da": 3, "no": 3, "fi": 3,
}
_LANG_CUM = np.cumsum([_LANG_WEIGHTS[lg] for lg in spec.LANGS])
_LANG_TOTAL = int(_LANG_CUM[-1])

N_DOMAINS = 500


def _u(seed: int, idx: np.ndarray, stream: int) -> np.ndarray:
    """One uint64 draw per index for a named decision stream."""
    return corpus.mix64(
        idx.astype(np.uint64) * np.uint64(2654435761)
        + np.uint64((seed * 1_000_003 + stream * 7919) & 0xFFFFFFFFFFFFFFFF)
    )


def _frac(u: np.ndarray) -> np.ndarray:
    return (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _true_lang_idx(seed: int, idx: np.ndarray) -> np.ndarray:
    r = (_u(seed, idx, 1) % np.uint64(_LANG_TOTAL)).astype(np.int64)
    return np.searchsorted(_LANG_CUM, r, side="right")


def _clean_words(seed: int, i: int, lang: str, n_words: int) -> list[str]:
    """~40% stop words + content words; pure function of (seed, i)."""
    pool = corpus.full_vocab(lang)
    n_stop = len(spec.STOPWORDS[lang])
    k = np.arange(n_words, dtype=np.uint64)
    u = corpus.mix64(k * np.uint64(6364136223846793005)
                     + np.uint64((seed ^ (i * 0x9E3779B9)) & 0xFFFFFFFFFFFFFFFF))
    is_stop = (u % np.uint64(100)) < np.uint64(40)
    stop_ix = (u % np.uint64(n_stop)).astype(np.int64)
    cont_ix = n_stop + ((u >> np.uint64(17)) % np.uint64(len(pool) - n_stop)).astype(np.int64)
    ix = np.where(is_stop, stop_ix, cont_ix)
    return [pool[j] for j in ix]


def _doc_text(seed: int, i: int, lang: str, category: int, u2: int) -> str | None:
    """Body text for logical content id ``i`` given its dirt category."""
    n_words = 120 + (u2 % 180)  # clean docs: 120-299 words
    lines_of = lambda ws, per=12: "\n".join(
        " ".join(ws[j : j + per]) for j in range(0, len(ws), per)
    )
    if category == 0:  # clean
        return lines_of(_clean_words(seed, i, lang, n_words))
    if category == 1:  # null / empty / whitespace
        return [None, "", "   \n  \t "][u2 % 3]
    if category == 2:  # symbol-heavy
        ws = _clean_words(seed, i, lang, 80)
        syms = "#@%^*+=<>|~"
        ws = [w + syms[(u2 + j) % len(syms)] * 2 if j % 3 == 0 else w
              for j, w in enumerate(ws)]
        return lines_of(ws)
    if category == 3:  # too few words
        return " ".join(_clean_words(seed, i, lang, 5 + u2 % 30))
    if category == 4:  # weird mean word length
        if u2 % 2 == 0:  # single letters
            return lines_of(list("abcdefghij" * 20))
        gib = ["".join(_clean_words(seed, i + j, lang, 4)) for j in range(80)]
        return lines_of(gib)
    if category == 5:  # word salad — content words only, no stop words
        pool = corpus.content_vocab(lang)
        k = np.arange(150, dtype=np.uint64)
        u = corpus.mix64(k + np.uint64(i * 31 + seed))
        return lines_of([pool[j] for j in (u % np.uint64(len(pool))).astype(int)])
    if category == 6:  # boilerplate: one line repeated
        ws = _clean_words(seed, i, lang, 150)
        line = " ".join(ws[:10])
        body = [line] * 10 + [" ".join(ws[j : j + 10]) for j in range(10, 100, 10)]
        return "\n".join(body)
    raise AssertionError(category)


def _perturb(text: str, key: int) -> str:
    """Near-dup perturbation: tweak a few words, keep ≥0.91 similarity."""
    ws = text.split(" ")
    out = []
    for j, w in enumerate(ws):
        r = (key * 1103515245 + j) & 0x7FFFFFFF
        if r % 37 == 0 and w and not w.startswith("<"):
            out.append(w.upper() if r % 2 == 0 else w + str(r % 97))
        else:
            out.append(w)
    return " ".join(out)


_PII_SNIPPETS = [
    "contact me at user{k}@example{d}.com for details",
    "call +1-555-{k3}-{k4} during office hours",
    "my ssn is {k3}-5{k1}-{k4} please keep private",
    "server at 192.168.{k1}.{k2} responded",
    "email admin{k}@mail{d}.org or (555) 01{k1}-{k4}",
]


def _inject_pii(text: str, key: int) -> str:
    tmpl = _PII_SNIPPETS[key % len(_PII_SNIPPETS)]
    snippet = tmpl.format(
        k=key % 1000, d=key % 50, k1=10 + key % 90, k2=key % 256,
        k3=100 + key % 900, k4=1000 + key % 9000,
    )
    lines = text.split("\n")
    pos = key % (len(lines) + 1)
    lines.insert(pos, snippet)
    return "\n".join(lines)


def gen_pages_pdf(idx: np.ndarray, seed: int, n_rows: int) -> pd.DataFrame:
    """Generate pages for the given global row indices (pure, vectorized
    control flow; per-row Python only for string assembly)."""
    n = len(idx)
    hot_n = max(32, n_rows // 1000)  # indices [0, hot_n) are always clean

    cat_u = _frac(_u(seed, idx, 2))
    lang_ix = _true_lang_idx(seed, idx)
    # category thresholds (FIXTURES.md rates)
    #   0 clean | 1 empty .03 | 2 symbols .04 | 3 short .02 | 4 wordlen .02
    #   5 salad .03 | 6 duplines .03 | 7 exact-dup .05 | 8 near-dup .03
    bounds = [0.03, 0.07, 0.09, 0.11, 0.14, 0.17, 0.22, 0.25]
    cats = np.searchsorted(bounds, cat_u, side="right")  # 0..8 → dirt cat
    # searchsorted: <0.03→0 ... map to our category codes
    cat_map = np.array([1, 2, 3, 4, 5, 6, 7, 8, 0])
    cats = cat_map[cats]
    cats = np.where(idx < hot_n, 0, cats)  # hot base docs stay clean

    dup_base = (_u(seed, idx, 3) % np.uint64(hot_n)).astype(np.int64)
    u2 = (_u(seed, idx, 4) % np.uint64(1 << 31)).astype(np.int64)
    pii_flag = _frac(_u(seed, idx, 5)) < 0.05
    wrong_lang = _frac(_u(seed, idx, 6)) < 0.05
    wrong_off = 1 + (_u(seed, idx, 7) % np.uint64(len(spec.LANGS) - 1)).astype(np.int64)
    # Zipf-ish domains: r**4 concentrates on low ids; dups inherit base domain
    dom = (np.power(_frac(_u(seed, idx, 8)), 4.0) * N_DOMAINS).astype(np.int64)
    ts_jitter = (_u(seed, idx, 9) % np.uint64(3600)).astype(np.int64)
    empty_html = _frac(_u(seed, idx, 10)) < 0.01

    texts: list[str | None] = []
    langs: list[str] = []
    for r in range(n):
        i = int(idx[r])
        c = int(cats[r])
        if c in (7, 8):  # exact/near dup of a hot clean doc
            b = int(dup_base[r])
            b_lang = spec.LANGS[int(_true_lang_idx(seed, np.array([b]))[0])]
            b_u2 = int((_u(seed, np.array([b]), 4) % np.uint64(1 << 31))[0])
            t = _doc_text(seed, b, b_lang, 0, b_u2)
            if c == 8:
                t = _perturb(t, i)
            lang = b_lang
        else:
            lang = spec.LANGS[int(lang_ix[r])]
            t = _doc_text(seed, i, lang, c, int(u2[r]))
        if t is not None and pii_flag[r] and c not in (1,):
            t = _inject_pii(t, i)
        texts.append(t)
        claimed = lang
        if wrong_lang[r]:
            claimed = spec.LANGS[(spec.LANGS.index(lang) + int(wrong_off[r])) % len(spec.LANGS)]
        langs.append(claimed)

    urls = [
        f"https://www.domain{int(dom[r]):04d}.example/p/{int(idx[r]):012d}"
        for r in range(n)
    ]
    ts = pd.to_datetime(
        EPOCH_2024 + idx.astype(np.int64) + ts_jitter, unit="s", utc=True
    ).tz_localize(None)
    html = [
        b"" if empty_html[r] else
        b"<html><body>" + (texts[r] or "").encode("utf-8") + b"</body></html>"
        for r in range(n)
    ]
    return pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": html, "text": texts, "lang": langs}
    )


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(spark: SparkSession, n_rows: int, seed: int = 42,
                   partitions: int | None = None) -> DataFrame:
    """Distributed pages DataFrame: spark.range → mapInPandas(gen batch)."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_pages_pdf(b["id"].to_numpy(), seed, n_rows)

    return spark.range(0, n_rows, 1, parts).mapInPandas(gen, PAGES_SCHEMA)
