"""Regex PII/toxicity scrubbing as a vectorized pandas UDF.

Ordered compiled-regex replacement over ``pd.Series.str.replace`` (Arrow
batches in/out; the regex engine is CPython ``re`` in both this UDF and the
oracle's row-wise ``re.sub`` — byte-identical output is the per-row invariant,
BASELINE.json input_hint; SURVEY.md §7.3 hard part #1).

Re-expresses the reference's sensitive-data concern I1
(`dimensions/interdependency/i1.py:40-77`) as an operational transform.
Idempotence (scrub∘scrub == scrub) is property-tested: replacement tokens
contain no digits/@ so they can never re-match a pattern.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataquality_spark import spec

_COMPILED = [(re.compile(p), r) for p, r in spec.SCRUB_PATTERNS] + [
    (re.compile(rf"\b{re.escape(w)}\b"), spec.TOXIC_REPLACEMENT)
    for w in spec.TOXIC_WORDS
]


def scrub_series(s: pd.Series) -> pd.Series:
    """Vectorized ordered replace; nulls pass through untouched."""
    out = s.astype(object)
    mask = out.notna()
    if mask.any():
        t = out[mask].astype(str)
        for pat, repl in _COMPILED:
            t = t.str.replace(pat, repl, regex=True)
        out[mask] = t
    return out


@F.pandas_udf(T.StringType())
def scrub_udf(text: pd.Series) -> pd.Series:
    return scrub_series(text)


def with_scrubbed_text(df: DataFrame, text_col: str = "text",
                       out_col: str = "scrubbed_text") -> DataFrame:
    return df.withColumn(out_col, scrub_udf(F.col(text_col)))
