"""Deterministic per-language vocabulary + seed corpus.

No external data: content vocabularies are synthesized as a pure function of
(language code, word index) from language-characteristic syllable inventories,
seeded by the language's stop-word list. The pages generator (synth.py), the
langid trainer (langid.py) and the n-gram LM (ngram_lm.py) all derive from
THIS module, which is what makes language identification and perplexity
scoring well-posed on the synthetic corpus (FIXTURES.md §2 `lang_ref`).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from dataquality_spark import spec

# language-flavored syllable inventories (public-knowledge phonotactics,
# hand-written — enough to make char-ngram distributions separable)
_SYLLABLES: dict[str, list[str]] = {
    "en": ["tion", "ing", "ther", "wor", "ment", "sh", "th", "ck", "ly", "ed"],
    "fr": ["eau", "oux", "tion", "ment", "ée", "çon", "eur", "oi", "ais", "que"],
    "de": ["sch", "ung", "keit", "lich", "über", "ein", "zw", "pf", "tz", "ens"],
    "es": ["ción", "illo", "ar", "er", "os", "ña", "que", "ado", "ía", "ura"],
    "it": ["zione", "etto", "are", "ere", "oso", "ggi", "cch", "ino", "ità", "uro"],
    "pt": ["ção", "inho", "ar", "er", "os", "ão", "lh", "ado", "ia", "ura"],
    "nl": ["sch", "ij", "aa", "oo", "uu", "lijk", "heid", "ke", "tje", "een"],
    "sv": ["sk", "å", "ä", "ö", "ning", "lig", "are", "het", "ande", "sj"],
    "da": ["sk", "å", "æ", "ø", "ning", "lig", "ere", "hed", "ende", "kk"],
    "no": ["sk", "å", "æ", "ø", "ning", "lig", "ere", "het", "ende", "kj"],
    "fi": ["kk", "pp", "tt", "ai", "uo", "yö", "nen", "lla", "ssa", "sti"],
    "pl": ["cz", "sz", "rz", "ów", "ść", "dz", "ę", "ą", "ny", "ego"],
    "id": ["ng", "ny", "an", "kan", "me", "ber", "per", "nya", "lah", "kah"],
}

VOCAB_SIZE = 160  # content words per language


def _mix(x: np.ndarray | int) -> np.ndarray | int:
    """splitmix64 finalizer — the engine's one deterministic PRNG primitive."""
    x = np.uint64(x) if np.isscalar(x) else x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def mix64(x):
    return _mix(x)


def _lang_seed(lang: str) -> int:
    h = 1469598103934665603
    for ch in lang:
        h = ((h ^ ord(ch)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


@lru_cache(maxsize=None)
def content_vocab(lang: str) -> list[str]:
    """VOCAB_SIZE deterministic pseudo-words with the language's syllables."""
    syl = _SYLLABLES[lang]
    base = "bcdfglmnprstv"
    vowels = "aeiou"
    seed = _lang_seed(lang)
    out = []
    for w in range(VOCAB_SIZE):
        u = int(_mix(seed + w * 7919))
        n_syl = 2 + (u % 3)
        parts = []
        for k in range(n_syl):
            v = int(_mix(u + k * 104729))
            parts.append(base[v % len(base)] + vowels[(v >> 8) % len(vowels)])
            if (v >> 16) % 3 == 0:
                parts.append(syl[(v >> 24) % len(syl)])
        out.append("".join(parts))
    return out


@lru_cache(maxsize=None)
def full_vocab(lang: str) -> list[str]:
    """stop words + content words — the sampling pool for document text."""
    return list(spec.STOPWORDS[lang]) + content_vocab(lang)


def seed_corpus(lang: str, n_docs: int = 200, words_per_doc: int = 60) -> list[str]:
    """Deterministic training documents for the langid / LM models."""
    pool = full_vocab(lang)
    n_stop = len(spec.STOPWORDS[lang])
    seed = _lang_seed(lang) ^ 0xC0FFEE
    docs = []
    for d in range(n_docs):
        ws = []
        for k in range(words_per_doc):
            u = int(_mix(seed + d * 1_000_003 + k))
            if u % 100 < 40:  # ~40% stop words, like the generator
                ws.append(pool[u % n_stop])
            else:
                ws.append(pool[n_stop + (u >> 16) % (len(pool) - n_stop)])
        docs.append(" ".join(ws))
    return docs
