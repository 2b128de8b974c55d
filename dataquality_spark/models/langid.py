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


# --- ENGINE-PORTABLE fixed-point spec (exact-oracle path) -------------------
#
# Same architecture (hashed char 2-/3-gram multinomial NB), but every step is
# expressible identically in numpy AND DuckDB SQL — the pattern that made the
# quality classifier exact-oracle (models/quality.py, round 3 item #3):
#
#   * features hash RAW Unicode codepoints (NO case fold — the İ lesson from
#     round 3: Python str.lower() and SQL lower() disagree on U+0130-class
#     mappings; skipping the fold removes the divergence surface entirely,
#     and case carries no language-ID signal in the seed corpus anyway);
#   * 2-gram hash = (cp_i·31 + cp_{i+1}) mod M31 (the `poly_hash31` fold the
#     quality oracle already mirrors in SQL), 3-gram = one more fold step;
#   * NB log-weights QUANTIZED to int64 fixed point, so the per-(doc, lang)
#     score  Σ_f dq[lang, b_f] − n_f·baseq[lang]  is pure integer arithmetic
#     — exact in any summation order, no float knife edge between engines.
#
# score algebra: with add-1 smoothing, W[l,b] = log(counts[l,b]) − log(S_l)
# where S_l = Σ_b counts[l,b]; summing over a doc's features,
#   score(doc, l) = Σ_f log(counts[l, b_f]) − n_f·log(S_l)
# so only buckets with counts > 1 carry a nonzero delta (log 1 = 0) — the
# oracle emits ~14k (lang, bucket, delta) triplets, not 13×4096 weights.
# Bounds: dq ≤ log(1.2e6)·QS ≈ 1.4e7, n_f ≤ 2·(L_MAX_CHARS−1) = 510,
# |score| < 2^35, margin sums over ≤1e6 rows stay < 2^55 — no i64 overflow.

L_BUCKETS = 1 << 11          # per gram type; feature space = 2·L_BUCKETS
L_MAX_CHARS = 256            # same prefix budget as the production spec
L_QSCALE = 1_000_000         # fixed-point scale (quality.py's QSCALE)
_M31 = (1 << 31) - 1         # operators/dedup._MERSENNE


def portable_lang_buckets(text) -> np.ndarray:
    """char 2-/3-gram bucket ids for one text under the portable spec.
    2-grams land in [0, L_BUCKETS), 3-grams in [L_BUCKETS, 2·L_BUCKETS)."""
    if not isinstance(text, str) or len(text) < 2:
        return np.zeros(0, dtype=np.int64)
    t = text[:L_MAX_CHARS]
    cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    if len(cp) < 2:
        return np.zeros(0, dtype=np.int64)
    h2 = (cp[:-1] * 31 + cp[1:]) % _M31
    grams = [h2 % L_BUCKETS]
    if len(cp) >= 3:
        h3 = (h2[:-1] * 31 + cp[2:]) % _M31
        grams.append(h3 % L_BUCKETS + L_BUCKETS)
    return np.concatenate(grams)


def train_langid_portable() -> dict:
    """Multinomial NB over the portable buckets, quantized to int64 fixed
    point. Deterministic and fast (<1s) — trained per process (lru-cached
    via pipeline-style callers), and the SQL generator derives the VALUES
    table from THIS function, so the two engines cannot drift."""
    from dataquality_spark.models import corpus

    langs = spec.LANGS
    counts = np.ones((len(langs), 2 * L_BUCKETS), dtype=np.float64)  # add-1
    for li, lg in enumerate(langs):
        for d in corpus.seed_corpus(lg):
            b = portable_lang_buckets(d)
            if len(b):
                np.add.at(counts[li], b, 1.0)
    dq = np.rint(np.log(counts) * L_QSCALE).astype(np.int64)  # log1 → 0
    baseq = np.rint(np.log(counts.sum(axis=1)) * L_QSCALE).astype(np.int64)
    return {"langs": list(langs), "dq": dq, "baseq": baseq}


_PORTABLE_ART: dict | None = None


def get_portable_langid() -> dict:
    global _PORTABLE_ART
    if _PORTABLE_ART is None:
        _PORTABLE_ART = train_langid_portable()
    return _PORTABLE_ART


def predict_portable_batch(texts: pd.Series, art: dict
                           ) -> tuple[np.ndarray, np.ndarray]:
    """(pred lang index, integer margin) per text under the portable spec.
    pred = argmax_l score(doc, l), ties broken by LOWEST lang index (the
    SQL mirror orders `score DESC, li ASC`); margin = best − runner-up
    (0 when fewer than two languages, impossible here). Texts with no
    features → (−1, 0) → NULL pred on both engines."""
    dq, baseq = art["dq"], art["baseq"]
    n_langs = dq.shape[0]
    pred = np.full(len(texts), -1, dtype=np.int64)
    margin = np.zeros(len(texts), dtype=np.int64)
    vals = texts.to_numpy(dtype=object)
    for r in range(len(vals)):
        b = portable_lang_buckets(vals[r])
        n_f = len(b)
        if n_f == 0:
            continue
        scores = dq[:, b].sum(axis=1) - n_f * baseq  # int64, (n_langs,)
        k = int(np.argmax(scores))          # numpy argmax = first max = low index
        pred[r] = k
        if n_langs > 1:
            second = np.partition(scores, n_langs - 2)[n_langs - 2]
            margin[r] = int(scores[k]) - int(second)
    return pred, margin


def make_portable_langid_udf(spark, art: dict):
    """Arrow-batched UDF → struct(pred_idx int, margin long): the portable
    integer decision surface (broadcast quantized artifact, no per-row
    Python crossing the JVM boundary)."""
    from pyspark.sql import functions as F

    b_art = spark.sparkContext.broadcast(art)

    @F.pandas_udf("struct<pred_idx: int, margin: long>")
    def portable_langid(text: pd.Series) -> pd.DataFrame:
        pred, margin = predict_portable_batch(text, b_art.value)
        return pd.DataFrame({"pred_idx": pred.astype(np.int32),
                             "margin": margin})

    return portable_langid
