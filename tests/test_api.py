"""Uniform per-rule test API (reference `test_template.py:21-52` contract)
and the strptime-parity datetime validator (SURVEY §7.3 hard part #2)."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import spec
from dataquality_spark.api import NO_RESULTS, run_rule, run_rules
from dataquality_spark.functions.datetime_check import (
    inconsistent_datetime_py, strptime_invalid_udf)


@pytest.fixture(scope="module")
def ds(spark):
    long = " ".join("the word of list and to in is are" for _ in range(10))
    return spark.createDataFrame(
        [("u1", "en", long),                       # passes min_words
         ("u2", "en", "tiny text"),                # fails min_words
         ("u3", "en", long + " extra tokens here")],
        ["url", "lang", "text"])


def test_score_mode(ds, spark):
    score, extra = run_rule(spark, ds, "min_words")
    assert extra is None
    assert score == pytest.approx(2 / 3)


def test_dataset_mode_writes_evidence(ds, spark, tmp_path):
    out = str(tmp_path / "ev")
    score, path = run_rule(spark, ds, "min_words", return_type="dataset",
                           logging_path=out)
    assert score == pytest.approx(2 / 3) and path == out
    ev = spark.read.parquet(out)
    assert [r["url"] for r in ev.select("url").collect()] == ["u2"]
    assert "word_cnt" in ev.columns  # stat columns ride along (a1 evidence)


def test_raw_dataframe_mode(ds, spark):
    df, extra = run_rule(spark, ds, "min_words", return_type="dataframe")
    assert extra is None
    assert "r_min_words" in df.columns and df.count() == 3


def test_empty_input_contract(spark):
    empty = spark.createDataFrame([], "url string, lang string, text string")
    out, extra = run_rule(spark, empty, "min_words")
    assert out == NO_RESULTS.format(rule="min_words") and extra is None


def test_params_flow_through(ds, spark):
    score, _ = run_rule(spark, ds, "min_words", params={"min_words": 1})
    assert score == 1.0


def test_unknown_rule(ds, spark):
    with pytest.raises(ValueError, match="unknown rule"):
        run_rule(spark, ds, "no_such_rule")


def test_run_rules_one_pass(ds, spark):
    scores = run_rules(spark, ds)
    assert set(scores) == set(spec.HEURISTIC_RULES)
    assert scores["min_words"] == pytest.approx(2 / 3)
    assert scores["nonempty"] == 1.0


FMT_CASES = [
    ("2024-02-03", "%Y-%m-%d"),
    ("2024-2-3", "%Y-%m-%d"),        # CPython accepts unpadded; JDK strict rejects
    ("2024-02-30", "%Y-%m-%d"),      # invalid day
    ("03/02/2024 17:45", "%d/%m/%Y %H:%M"),
    ("29/02/2023", "%d/%m/%Y"),      # non-leap
    ("29/02/2024", "%d/%m/%Y"),      # leap
    ("2024-02-03 extra", "%Y-%m-%d"),
    ("99", "%y"),
    ("", "%Y-%m-%d"),
]


def test_strptime_udf_matches_reference(spark):
    # one format at a time (the UDF binds fmt at plan time, like the rule)
    for fmt in sorted({f for _, f in FMT_CASES}):
        sub = [s for s, f in FMT_CASES if f == fmt]
        sdf = spark.createDataFrame([(x,) for x in sub] + [(None,)],
                                    "s string")
        got = [r["bad"] for r in sdf.select(
            strptime_invalid_udf(fmt)(F.col("s")).alias("bad")).collect()]
        want = [inconsistent_datetime_py(x, fmt) for x in sub] + [None]
        assert got == want, fmt


def test_strptime_parity_diverges_from_jdk(spark):
    """Documents WHY the UDF exists: '2024-2-3' parses under CPython
    %Y-%m-%d but Spark's try_to_timestamp('yyyy-MM-dd') rejects it."""
    assert not inconsistent_datetime_py("2024-2-3", "%Y-%m-%d")
    row = spark.sql(
        "SELECT try_to_timestamp('2024-2-3', 'yyyy-MM-dd') AS t").collect()[0]
    assert row["t"] is None
