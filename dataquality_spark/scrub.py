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

# Prerequisite-gated groups, in the SAME order as the chain above: a
# pattern can only fire on text containing its cheap literal witness
# ('@' for email, any digit for phone/IP/ID/IBAN, a denylist literal for
# toxicity), so the expensive subs run only on witness rows. Group
# boundaries respect chain order (email < digit patterns < toxic), and
# the digit witness is evaluated AFTER the email sub (whose replacement
# token carries no digits/@), so skipped rows are exactly rows where the
# skipped subs would no-op — output is byte-identical to the plain chain
# (property-tested + byte-exact oracle query). Measured 2.15s → ~0.5s per
# 10k pages: most web text has no PII witness at all.
_EMAIL_PATS = _COMPILED[:1]
_DIGIT_PATS = _COMPILED[1:len(spec.SCRUB_PATTERNS)]
_TOXIC_PATS = _COMPILED[len(spec.SCRUB_PATTERNS):]
_DIGIT_RE = re.compile(r"\d")
_TOXIC_ANY = re.compile("|".join(re.escape(w) for w in spec.TOXIC_WORDS))
# Digit-witness byte LUT: ASCII digits plus the UTF-8 LEAD byte of every
# non-ASCII codepoint Python's \d matches (enumerated exhaustively over
# the whole codespace; tests/test_scrub.py regenerates the set so a
# CPython Unicode-table upgrade fails loudly instead of silently).
# A row with no such byte provably contains no \d match — lead bytes
# never alias continuation bytes (0x80-0xBF) in valid UTF-8 — so gating
# on this LUT is a strict superset of the regex witness: false positives
# only no-op the subs (European accents lead with 0xC2-0xC5, OUTSIDE the
# set, so Latin-script rows without ASCII digits skip entirely).
_DIGIT_LEAD_BYTES = (0xD9, 0xDB, 0xDF, 0xE0, 0xE1, 0xEA, 0xEF, 0xF0)
import numpy as _np
_DIGIT_WITNESS_LUT = _np.zeros(256, dtype=_np.bool_)
_DIGIT_WITNESS_LUT[ord("0"):ord("9") + 1] = True
_DIGIT_WITNESS_LUT[list(_DIGIT_LEAD_BYTES)] = True

# The gating above is POSITIONAL (pattern 0 ⇒ '@' witness, the rest of
# SCRUB_PATTERNS ⇒ digit witness): pin the convention at import time so a
# future digit-free pattern appended to spec.SCRUB_PATTERNS fails loudly
# here instead of silently never firing on digit-free rows.
assert "@" in spec.SCRUB_PATTERNS[0][0], \
    "pattern 0 must be the email pattern (its witness is '@')"
for _p, _r in spec.SCRUB_PATTERNS[1:]:
    assert r"\d" in _p or "[0-9]" in _p, (
        f"scrub pattern {_p!r} has no digit witness — extend the gating "
        "groups in scrub.py before adding digit-free patterns")
for _p, _r in spec.SCRUB_PATTERNS:
    # replacement tokens must never introduce a later group's witness
    # (or re-match any pattern — the idempotence property)
    assert "@" not in _r and not _DIGIT_RE.search(_r), _r
assert "@" not in spec.TOXIC_REPLACEMENT and \
    not _DIGIT_RE.search(spec.TOXIC_REPLACEMENT)
del _p, _r


def _gated(t: pd.Series, witness_mask: pd.Series,
           pats: list[tuple[re.Pattern, str]]) -> pd.Series:
    if witness_mask.any():
        sub = t[witness_mask]
        for pat, repl in pats:
            sub = sub.str.replace(pat, repl, regex=True)
        t = t.copy()
        t[witness_mask] = sub
    return t


def _digit_witness(t: pd.Series) -> pd.Series:
    """Superset of ``t.str.contains(_DIGIT_RE)`` at C speed: one byte-LUT
    segment reduction over the series' Arrow buffer (see
    ``_DIGIT_WITNESS_LUT``). Sound as a GATE — every row where \\d could
    match is included; the rare false positive (a digit-lead byte whose
    codepoint is not a digit) just runs subs that no-op. Measured
    13.2 µs/row (Python regex scan) → ~2 µs/row."""
    import numpy as np
    import pyarrow as pa

    from dataquality_spark.functions.stats_batch import _seg_sums

    arr = pa.array(t, type=pa.large_string(), from_pandas=True)
    n = len(t)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=n + 1)
    if int(offs[-1]) - int(offs[0]) == 0:
        return pd.Series(False, index=t.index)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))
    if int(offs[0]):
        data = data[int(offs[0]):]
        offs = offs - offs[0]
    return pd.Series(_seg_sums(_DIGIT_WITNESS_LUT[data], offs) > 0,
                     index=t.index)


def _toxic_witness(t: pd.Series) -> pd.Series:
    """Rows containing any denylist literal — identical row set to
    ``t.str.contains(_TOXIC_ANY)`` (the alternation is of escaped plain
    literals, so substring presence IS the match condition), as k plain
    C substring scans instead of one Python-regex scan per row
    (measured 20.2 µs/row → <1 µs/row for the committed 3-word list)."""
    mask = None
    for w in spec.TOXIC_WORDS:
        c = t.str.contains(w, regex=False)
        mask = c if mask is None else (mask | c)
    return mask


def scrub_series(s: pd.Series) -> pd.Series:
    """Vectorized ordered replace; nulls pass through untouched."""
    out = s.astype(object)
    mask = out.notna()
    if mask.any():
        t = out[mask].astype(str)
        t = _gated(t, t.str.contains("@", regex=False), _EMAIL_PATS)
        t = _gated(t, _digit_witness(t), _DIGIT_PATS)
        t = _gated(t, _toxic_witness(t), _TOXIC_PATS)
        out[mask] = t
    return out


def scrub_series_sparse(s: pd.Series) -> pd.Series:
    """``scrub_series`` with UNCHANGED rows returned as None — the Arrow
    return-path optimization (guide §4.1: control how many bytes cross the
    boundary): most web text has no PII witness, so shipping every input
    string back JVM-ward duplicates the heaviest column for nothing. The
    JVM side must re-attach via ``coalesce(scrubbed, text)``, which
    reconstructs ``scrub_series`` byte-identically (NULL inputs stay NULL
    through both spellings). The != scan is cheap: untouched rows keep the
    SAME str object, so equality short-circuits on identity; a full
    compare runs only on witness rows."""
    out = scrub_series(s)
    changed = out.notna().to_numpy() & (out.to_numpy(object)
                                        != s.to_numpy(object))
    res = pd.Series([None] * len(s), dtype=object, index=s.index)
    res[changed] = out[changed]
    return res


@F.pandas_udf(T.StringType())
def scrub_udf(text: pd.Series) -> pd.Series:
    return scrub_series_sparse(text)


def with_scrubbed_text(df: DataFrame, text_col: str = "text",
                       out_col: str = "scrubbed_text") -> DataFrame:
    # sparse UDF + coalesce ≡ scrub_series(text) byte-for-byte; only
    # actually-modified rows cross the boundary back
    return df.withColumn(
        out_col, F.coalesce(scrub_udf(F.col(text_col)), F.col(text_col)))
