"""fastText-style quality classifier: hashed word-ngram logistic regression.

The classifier-based quality filter used by LLaMA/RedPajama-style corpus
prep (public knowledge: Joulin et al. 2016 "Bag of Tricks" architecture —
averaged hashed n-gram features into a linear model; Touvron et al. 2023
describe filtering CommonCrawl with exactly such a classifier). Complements
the HEURISTIC gate (rules/heuristics.py): the rules encode thresholds, the
classifier learns a decision surface from labeled examples and produces a
graded probability usable for head/middle/tail bucketing.

Everything is deterministic and self-contained: positives come from the
seed corpus (models/corpus.py), negatives from a junk generator covering
the canonical web-garbage failure modes (gibberish, symbol spam, repetition
spam, digit spam). Training is full-batch logistic regression in numpy with
a manual CSR layout — forward and gradient are two ``np.bincount`` calls
per epoch, no per-doc Python in the loop. The trained artifact is a plain
dict of numpy arrays: picklable, broadcast once, scored inside an
Arrow-batched pandas UDF like the langid/LM artifacts (models/udf.py).

Word hashing uses ``zlib.crc32`` (stable across processes — NEVER builtin
``hash()``, which is salted per interpreter) + the splitmix64 finalizer.
"""

from __future__ import annotations

import zlib
from functools import lru_cache as _lru_cache

import numpy as np
import pandas as pd

from dataquality_spark import spec
from dataquality_spark.models import corpus

N_WORD_BUCKETS = 1 << 12
N_CHAR_BUCKETS = 1 << 12
N_BUCKETS = N_WORD_BUCKETS + N_CHAR_BUCKETS
MAX_WORDS = 512  # score on a prefix — plenty for a quality signal
_WMASK = np.uint64(N_WORD_BUCKETS - 1)
_P = np.uint64(1099511628211)


def _doc_buckets(text: str | None) -> np.ndarray:
    """Hashed feature bucket ids for one document: word 1-/2-grams in the
    lower bucket half, char 2-/3-grams (langid's subword hasher) in the
    upper half. Word grams catch template junk (SEO phrases, repeated
    boilerplate); SUBWORD grams are what generalize to never-seen junk
    vocabulary — gibberish, symbol runs, and digit strings have
    characteristic character n-grams even when every token is novel (the
    same reason fastText uses subword features)."""
    from dataquality_spark.models import langid as L

    if not isinstance(text, str):  # None / NaN-from-pandas
        text = ""
    ws = text.lower().split()[:MAX_WORDS]
    if not ws:
        return np.zeros(0, dtype=np.int64)
    h = np.fromiter((zlib.crc32(w.encode("utf-8")) for w in ws),
                    dtype=np.uint64, count=len(ws))
    uni = corpus.mix64(h)
    grams = [uni & _WMASK]
    if len(h) > 1:
        with np.errstate(over="ignore"):
            grams.append(corpus.mix64(h[:-1] * _P ^ h[1:]) & _WMASK)
    with np.errstate(over="ignore"):
        cg = L._ngram_buckets(L._codepoints(text)) % np.uint64(N_CHAR_BUCKETS)
    grams.append(cg + np.uint64(N_WORD_BUCKETS))
    return np.concatenate(grams).astype(np.int64)


def _csr(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bucket_idx, doc_ids, data) with data = 1/n_features per doc —
    averaged features, the fastText formulation."""
    idx_parts, doc_parts, data_parts = [], [], []
    for i, t in enumerate(texts):
        b = _doc_buckets(t)
        if len(b) == 0:
            continue
        idx_parts.append(b)
        doc_parts.append(np.full(len(b), i, dtype=np.int64))
        data_parts.append(np.full(len(b), 1.0 / len(b)))
    if not idx_parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0)
    return (np.concatenate(idx_parts), np.concatenate(doc_parts),
            np.concatenate(data_parts))


# --- deterministic junk generator (negative class) -------------------------

_JUNK_KINDS = 4


def _junk_doc(u: int) -> str:
    kind = u % _JUNK_KINDS
    r = corpus.mix64(np.uint64(u))
    if kind == 0:    # gibberish: long unpronounceable tokens, no stopwords
        toks = []
        for k in range(40):
            v = int(corpus.mix64(np.uint64(u * 131 + k)))
            toks.append("".join("bcdfghjklmnpqrstvwxz"[(v >> (3 * j)) % 20]
                                for j in range(8 + v % 7)))
        return " ".join(toks)
    if kind == 1:    # symbol spam
        v = int(r)
        syms = "#@%^*+=<>|~$&"
        return " ".join(
            syms[(v >> (j % 50)) % len(syms)] * (2 + j % 4) + "win"
            for j in range(60))
    if kind == 2:    # repetition spam: one short phrase looped
        v = int(r)
        phrase = f"click here {v % 997} buy now"
        return (phrase + " ") * 50
    # digit spam
    v = int(r)
    return " ".join(str((v >> (j % 40)) + j * 7919) for j in range(80))


def junk_corpus(n_docs: int = 200, seed: int = 0xBAD) -> list[str]:
    return [_junk_doc(seed * 1_000_003 + d) for d in range(n_docs)]


# --- training --------------------------------------------------------------

@_lru_cache(maxsize=4)
def train_quality(n_per_class: int = 600, epochs: int = 800,
                  lr: float = 100.0, l2: float = 1e-6) -> dict:
    """Binary logistic regression, full-batch GD, fixed schedule —
    bit-deterministic. Positives: seed-corpus docs round-robin over the
    supported languages; negatives: junk_corpus. Cached per-process like
    ``pipeline.get_artifacts`` (callers must not mutate the arrays)."""
    langs = spec.LANGS
    per_lang = n_per_class // len(langs) + 1
    pos = []
    for lg in langs:
        pos.extend(corpus.seed_corpus(lg, n_docs=per_lang))
    pos = pos[:n_per_class]
    neg = junk_corpus(n_per_class)
    texts = pos + neg
    y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
    idx, doc_ids, data = _csr(texts)
    n = len(texts)

    w = np.zeros(N_BUCKETS)
    b = 0.0
    for _ in range(epochs):
        scores = np.bincount(doc_ids, weights=w[idx] * data, minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-scores))
        err = p - y
        gw = np.bincount(idx, weights=err[doc_ids] * data,
                         minlength=N_BUCKETS) / n + l2 * w
        w -= lr * gw
        b -= lr * float(err.mean())
    return {"w": w, "b": b, "n_buckets": N_BUCKETS}


def predict_batch(texts: pd.Series, art: dict) -> np.ndarray:
    """P(quality) per text; empty/null text scores exactly 0.0 (no features
    ⇒ junk by definition, matching the heuristic min-words rule)."""
    vals = texts.tolist()
    idx, doc_ids, data = _csr(vals)
    n = len(vals)
    scores = (np.bincount(doc_ids, weights=art["w"][idx] * data, minlength=n)
              + art["b"])
    probs = 1.0 / (1.0 + np.exp(-scores))
    has_features = np.bincount(doc_ids, minlength=n) > 0
    probs[~has_features] = 0.0
    return probs


def make_quality_udf(spark, art: dict):
    """Double-returning Arrow-batched UDF with the broadcast artifact."""
    from pyspark.sql import functions as F

    b_art = spark.sparkContext.broadcast(art)

    @F.pandas_udf("double")
    def quality_prob(text: pd.Series) -> pd.Series:
        return pd.Series(predict_batch(text, b_art.value))

    return quality_prob
