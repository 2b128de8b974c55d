"""Property-based parity: the Spark text statistics (single-pass regex
forms, `functions/text.py` + `rules/heuristics.with_text_stats`) must equal
the pandas oracle (`oracle.text_stats_row`) on arbitrary generated text.

Alphabet note: the cross-engine agreement zone for \\s is ASCII whitespace
(Java regex and RE2 are ASCII-\\s; CPython re is Unicode-\\s), so the
strategy generates ASCII whitespace plus non-whitespace Unicode — the same
contract the synthetic corpus and the oracle queries rely on.
"""

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataquality_spark import oracle, spec
from dataquality_spark.rules.heuristics import STAT_COLS, with_text_stats

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n" + "#@%^*+=<>|~" + ".,;:!?()'\"-" + "éüßñçøあ中"
    + "\xa0 "  # Unicode spaces — word CHARACTERS per the spec
)
WORDS = ["the", "and", "of", "der", "die", "le", "la", "word", "x1", "42",
         "---", "...", "#tag"]

texts = st.one_of(
    st.text(alphabet=ALPHABET, max_size=200),
    st.lists(st.sampled_from(WORDS), max_size=40).map(" ".join),
    st.just(""), st.just("   "), st.just("\n\n"), st.none(),
)
langs = st.sampled_from(["en", "de", "fr", "xx", None])


def _close(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if isinstance(a, float) and math.isnan(a):
        return isinstance(b, float) and math.isnan(b)
    return abs(float(a) - float(b)) < 1e-9


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(st.tuples(texts, langs), min_size=30, max_size=60))
def test_text_stats_match_oracle(spark, rows):
    df = spark.createDataFrame(
        [(i, t, lg) for i, (t, lg) in enumerate(rows)],
        "id long, text string, lang string")
    got = {r["id"]: r.asDict()
           for r in with_text_stats(df).collect()}
    for i, (t, lg) in enumerate(rows):
        want = oracle.text_stats_row(t, lg)
        for col in STAT_COLS:
            assert _close(got[i][col], want[col]), (
                col, repr(t), lg, got[i][col], want[col])


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(st.text(alphabet=ALPHABET, max_size=120) | st.none(),
                     min_size=20, max_size=40))
def test_scrub_matches_oracle_on_generated_text(spark, rows):
    from dataquality_spark.scrub import with_scrubbed_text
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "id long, text string")
    got = {r["id"]: r["scrubbed_text"]
           for r in with_scrubbed_text(df).collect()}
    for i, t in enumerate(rows):
        want = oracle.scrub_text(t)
        w = None if (want is None or (isinstance(want, float))) else want
        assert got[i] == w, (repr(t), got[i], w)


# --- codec round-trip properties (pure numpy, no Spark session needed) -----

@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40), seed=st.integers(0, 2**31))
def test_prop_image_codec_roundtrip(w, h, seed):
    import numpy as np
    from dataquality_spark.operators.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm)
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 2000), ch=st.integers(1, 2),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_prop_wav_codec_roundtrip(n, ch, rate, seed):
    import numpy as np
    from dataquality_spark.operators.multimodal import decode_wav, encode_wav
    rng = np.random.default_rng(seed)
    x = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    got, got_rate = decode_wav(encode_wav(x, sample_rate=rate))
    assert got_rate == rate and np.array_equal(got, x)
