"""As-of join: hand-computed semantics + one-exchange plan shape."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 25), (3, "a", 5), (4, "b", 7)],
        "id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 10, 100.0), ("a", 20, 200.0), ("b", 9, 900.0)],
        "k string, t long, v double")
    got = {r["id"]: r["v"] for r in asof_join(
        left, right, on="k", left_time="t", right_time="t",
        value_cols=["v"]).collect()}
    assert got == {
        1: 100.0,   # exact-time tie: right row at t=10 IS visible (<=)
        2: 200.0,   # latest preceding of two
        3: None,    # nothing precedes t=5
        4: None,    # right 'b' at t=9 is after t=7
    }


def test_asof_plan_single_exchange(spark):
    import io, contextlib, re
    left = spark.range(100).selectExpr("id", "id % 5 AS k", "id AS t")
    right = spark.range(20).selectExpr("id % 5 AS k", "id * 3 AS t",
                                       "id * 1.0 AS v")
    df = asof_join(left, right, on="k", left_time="t", right_time="t",
                   value_cols=["v"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1  # union-window shape
    assert "Join" not in s  # never a range/nested-loop join
