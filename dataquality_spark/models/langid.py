"""fastText-style language identification: hashed char-ngram linear model.

Public-knowledge design (Joulin et al., "Bag of Tricks for Efficient Text
Classification", 2016): character 2-/3-gram features hashed into a fixed
bucket space, multinomial Naive-Bayes log-linear scoring. Implemented as pure
numpy so the trained artifact is broadcast to executors and scored inside an
Arrow-batched pandas UDF — no per-row Python crosses the JVM boundary
(BASELINE.json input_hint).

Training data is the deterministic seed corpus (models/corpus.py); no
external model weights or downloads. Re-expresses the reference's
"conformance to a canonical reference list" tests C2/C3
(`dimensions/consistency/c2.py:53-67`, `c3.py:42-55`) as language-ID.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dataquality_spark import spec
from dataquality_spark.models import corpus

N_BUCKETS = 1 << 15
MAX_CHARS = 256  # score on a prefix; plenty for language ID
_P2 = np.uint64(1099511628211)
_P3 = np.uint64(16777619)
_MASK = np.uint64(N_BUCKETS - 1)


def _codepoints(text: str) -> np.ndarray:
    t = (text or "")[:MAX_CHARS].lower()
    if not t:
        return np.zeros(0, dtype=np.uint64)
    return np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)


def _ngram_buckets(a: np.ndarray) -> np.ndarray:
    """Hashed char 2- and 3-gram bucket ids (vectorized rolling hash).

    Callers must run under ``np.errstate(over='ignore')`` — hoisted out of
    this per-row hot path (uint64 wraparound is intended).
    """
    if len(a) < 2:
        return np.zeros(0, dtype=np.uint64)
    h2 = (a[:-1] * _P2) ^ a[1:]
    if len(a) < 3:
        return h2 & _MASK
    h3 = (h2[:-1] * _P3) ^ a[2:]
    return np.concatenate([h2 & _MASK, h3 & _MASK])


def train_langid(seed_docs: dict[str, list[str]] | None = None) -> dict:
    """Multinomial NB over hashed char-ngram counts; returns the artifact
    (plain dict of numpy arrays — picklable, broadcastable)."""
    langs = spec.LANGS
    docs = seed_docs or {lg: corpus.seed_corpus(lg) for lg in langs}
    counts = np.ones((len(langs), N_BUCKETS), dtype=np.float64)  # add-1
    with np.errstate(over="ignore"):
        for li, lg in enumerate(langs):
            for d in docs[lg]:
                b = _ngram_buckets(_codepoints(d))
                if len(b):
                    np.add.at(counts[li], b.astype(np.int64), 1.0)
    logp = np.log(counts) - np.log(counts.sum(axis=1, keepdims=True))
    return {"langs": list(langs), "W": logp.astype(np.float32)}


def predict_batch(texts: pd.Series, artifact: dict) -> tuple[np.ndarray, np.ndarray]:
    """(predicted lang index, confidence) per text. Vectorized numpy per row;
    texts with no features predict index -1 / conf 0."""
    W = artifact["W"]
    pred = np.full(len(texts), -1, dtype=np.int64)
    conf = np.zeros(len(texts), dtype=np.float64)
    vals = texts.to_numpy(dtype=object)
    with np.errstate(over="ignore"):
        for r in range(len(vals)):
            t = vals[r]
            if t is None or (isinstance(t, float) and np.isnan(t)):
                continue
            b = _ngram_buckets(_codepoints(str(t)))
            nb = len(b)
            if nb == 0:
                continue
            scores = W.take(b.astype(np.int64), axis=1).sum(axis=1) / nb
            # softmax over mean log-likelihood × a temperature that sharpens
            # with evidence size (cap so exp stays stable)
            s = (scores - scores.max()) * min(nb, 64)
            e = np.exp(np.maximum(s, -60.0))
            p = e / e.sum()
            k = int(np.argmax(p))
            pred[r] = k
            conf[r] = float(p[k])
    return pred, conf
