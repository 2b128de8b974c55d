"""KenLM-style character n-gram language model for perplexity scoring.

Public-knowledge design: per-language character-trigram counts with add-k
smoothing, hashed context/trigram tables (Heafield, "KenLM: Faster and
Smaller Language Model Queries", 2011 — here reduced to hashed count tables
since the vocabulary is characters). Pure numpy artifact, broadcast, scored
in the same Arrow-batched UDF as langid.

The outlier gate re-expresses the reference's grouped-IQR outlier detection
A2 (`dimensions/accuracy/a2.py:46-67`, factor 1.5 from `a2.py:23`): per-lang
logprob bounds are computed at TRAIN time on the seed corpus, so the gate is
a deterministic artifact constant — identical in the Spark pipeline and the
pandas oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from dataquality_spark import spec
from dataquality_spark.models import corpus
from dataquality_spark.models.langid import _codepoints  # same text prep

N_BUCKETS = 1 << 16
_PA = np.uint64(1099511628211)
_PB = np.uint64(16777619)
_MASK = np.uint64(N_BUCKETS - 1)
ADD_K = 0.1
CHAR_VOCAB = 64.0  # smoothing denominator scale (≈ chars per language)
# the effective window: _codepoints (shared with langid) truncates to
# langid.MAX_CHARS first, so a larger value here would be dead — keep
# the two pinned together (a drift would silently shift the per-lang
# IQR bounds against previously trained artifacts)
MAX_CHARS = 256


def _tri_ctx_buckets(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(trigram bucket, bigram-context bucket) arrays for a codepoint seq."""
    if len(a) < 3:
        z = np.zeros(0, dtype=np.uint64)
        return z, z
    ctx = (a[:-2] * _PA) ^ a[1:-1]
    tri = (ctx * _PB) ^ a[2:]
    return tri & _MASK, ctx & _MASK


def _doc_logprob(text: str, tri_c: np.ndarray, ctx_c: np.ndarray) -> float:
    """Average per-char log probability under one language's tables."""
    a = _codepoints((text or "")[:MAX_CHARS])
    tri, ctx = _tri_ctx_buckets(a)
    n = len(tri)
    if n == 0:
        return float("nan")
    num = tri_c.take(tri.astype(np.int64)) + ADD_K
    den = ctx_c.take(ctx.astype(np.int64)) + ADD_K * CHAR_VOCAB
    return float(np.log(num / den).sum() / n)


def train_lm(seed_docs: dict[str, list[str]] | None = None) -> dict:
    """Per-language trigram/context count tables + IQR logprob bounds."""
    langs = spec.LANGS
    docs = seed_docs or {lg: corpus.seed_corpus(lg) for lg in langs}
    tri_tab = np.zeros((len(langs), N_BUCKETS), dtype=np.float32)
    ctx_tab = np.zeros((len(langs), N_BUCKETS), dtype=np.float32)
    lo = np.zeros(len(langs)); hi = np.zeros(len(langs))
    with np.errstate(over="ignore"):
        for li, lg in enumerate(langs):
            for d in docs[lg]:
                a = _codepoints(d[:MAX_CHARS])
                tri, ctx = _tri_ctx_buckets(a)
                if len(tri):
                    np.add.at(tri_tab[li], tri.astype(np.int64), 1.0)
                    np.add.at(ctx_tab[li], ctx.astype(np.int64), 1.0)
        # per-lang logprob distribution on the training docs → IQR bounds
        for li, lg in enumerate(langs):
            lps = np.array([
                _doc_logprob(d, tri_tab[li], ctx_tab[li]) for d in docs[lg]
            ])
            q1, q3 = np.percentile(lps, [25, 75])
            iqr = q3 - q1
            pad = max(spec.IQR_FACTOR * iqr, 0.75)  # floor so degenerate IQR≈0
            lo[li], hi[li] = q1 - pad, q3 + pad     # doesn't reject everything
    return {"langs": list(langs), "tri": tri_tab, "ctx": ctx_tab,
            "lo": lo, "hi": hi}


def logprob_batch(texts: pd.Series, lang_idx: np.ndarray, artifact: dict
                  ) -> np.ndarray:
    """Per-text average char logprob under lang_idx's model (NaN if no lang
    or too-short text)."""
    out = np.full(len(texts), np.nan, dtype=np.float64)
    vals = texts.to_numpy(dtype=object)
    tri_tab, ctx_tab = artifact["tri"], artifact["ctx"]
    with np.errstate(over="ignore"):
        for r in range(len(vals)):
            li = int(lang_idx[r])
            t = vals[r]
            if li < 0 or t is None or (isinstance(t, float) and np.isnan(t)):
                continue
            out[r] = _doc_logprob(str(t), tri_tab[li], ctx_tab[li])
    return out
