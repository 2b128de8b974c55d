"""Bit-exact parity for the batched text-stat kernel (functions/stats_batch)
against the JVM stat forms it replaces in the fused-pipeline path.

Two layers:
1. the raw counts (word_cnt / nonws_len / symbol_cnt / nb_lines /
   nb_distinct) equal their JVM spellings on hostile + generated text;
2. `with_text_stats(precomputed=True)` — the fused-pipeline branch — is
   BIT-equal (float equality, not tolerance) to the default JVM branch for
   every STAT_COL, since the pipeline's decisions/metrics/oracles are exact.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from dataquality_spark.functions import text as TX
from dataquality_spark.functions.stats_batch import stats_batch
from dataquality_spark.rules.heuristics import STAT_COLS, with_text_stats

HOSTILE = [
    None, "", "\n", "\n\n\n", " \t\x0b\f\r", "a", "a b  c\td\ne",
    "İstanbul DİYARBAKIR", "🎉🎊 astral 🎉", "\xa0nbsp\xa0edge\xa0",
    "line1\nline1\nline2\n\nline1", "  \r\nCRLF\r\nCRLF\r\n",
    "#@%^*+=<>|~ symbols #@", "＃fullwidth＃", "ÄÖÜ äöü ß ẞ",
    "x" * 5000, ("dup\n" * 200) + "tail", "\v\f vertical \v",
    "mixé çédille ñ", "tab\tsep\tvals", "trailing ws   \n   ",
    "\rlone\rcarriage\r", "a\x00b nul", "🎉\n🎉\n🎊", " ", "\t",
    "word", "two words",
]

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\x0b\f\r" + "#@%^*+=<>|~" + ".,;:!?()'\"-" + "éüßñçøあ中🎉"
    + "\xa0"
)


def _jvm_counts(spark, texts):
    """The JVM spellings of the five moved counts."""
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(texts)), "text": texts}),
        "id long, text string")
    t = F.col("text")
    ws = " \t\n\x0b\f\r"
    nonblank = F.filter(
        TX.lines_col(t),
        lambda l: F.length(F.translate(l, ws, "")) != 0)
    rows = df.select(
        "id",
        TX.word_count_rx(t).alias("word_cnt"),
        F.coalesce(F.length(F.translate(t, ws, "")), F.lit(0))
        .cast("long").alias("nonws_len"),
        TX.symbol_count(t).alias("symbol_cnt"),
        F.coalesce(F.size(nonblank), F.lit(0)).cast("long").alias("nb_lines"),
        F.coalesce(F.size(F.array_distinct(nonblank)), F.lit(0))
        .cast("long").alias("nb_distinct"),
    ).collect()
    return {r["id"]: r.asDict() for r in rows}


def _assert_counts_match(spark, texts):
    want = _jvm_counts(spark, texts)
    got = stats_batch(pd.Series(texts, dtype=object))
    for i, t in enumerate(texts):
        for col in ("word_cnt", "nonws_len", "symbol_cnt",
                    "nb_lines", "nb_distinct"):
            assert int(got[col][i]) == want[i][col], (
                col, repr(t), int(got[col][i]), want[i][col])


def test_counts_match_jvm_hostile(spark):
    _assert_counts_match(spark, HOSTILE)


@settings(max_examples=4, deadline=None)
@given(rows=st.lists(st.text(alphabet=ALPHABET, max_size=200) | st.none(),
                     min_size=30, max_size=60))
def test_counts_match_jvm_generated(spark, rows):
    _assert_counts_match(spark, rows)


def _bit_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    return a == b  # exact float equality — the fused path must be bit-equal


@settings(max_examples=3, deadline=None)
@given(rows=st.lists(
    st.tuples(st.text(alphabet=ALPHABET, max_size=200) | st.none(),
              st.sampled_from(["en", "de", "fr", "xx", None])),
    min_size=20, max_size=40))
def test_precomputed_branch_bit_equals_default(spark, rows):
    pdf = pd.DataFrame({
        "id": range(len(rows)),
        "text": [t for t, _ in rows],
        "lang": [lg for _, lg in rows],
    })
    df = spark.createDataFrame(pdf, "id long, text string, lang string")
    base = {r["id"]: r.asDict() for r in with_text_stats(df).collect()}

    # attach the kernel's counts the way the fused UDF does, then run the
    # precomputed branch
    counts = stats_batch(pdf["text"])
    pdf2 = pdf.copy()
    for k, v in counts.items():
        pdf2[k] = v
    df2 = spark.createDataFrame(
        pdf2, "id long, text string, lang string, word_cnt long, "
              "nonws_len long, symbol_cnt long, nb_lines long, "
              "nb_distinct long")
    got = {r["id"]: r.asDict()
           for r in with_text_stats(df2, precomputed=True).collect()}

    for i in base:
        for col in STAT_COLS:
            assert _bit_eq(got[i][col], base[i][col]), (
                col, repr(pdf["text"][i]), got[i][col], base[i][col])
        # helper columns must not leak into the output schema
        for helper in ("nonws_len", "symbol_cnt", "nb_lines", "nb_distinct"):
            assert helper not in got[i]
