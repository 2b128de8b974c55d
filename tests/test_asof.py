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


def test_range_join_semantics_and_plan(spark):
    from dataquality_spark.operators.rangejoin import range_join
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 19.9), (4, 20.0)], "id long, v double")
    iv = spark.createDataFrame(
        [("A", 0.0, 10.0), ("B", 10.0, 20.0), ("C", 5.0, 25.0)],
        "name string, lo double, hi double")
    got = sorted((r["id"], r["name"]) for r in range_join(
        pts, iv, "v", "lo", "hi", bin_width=8.0).collect())
    # half-open [lo, hi): v=10 not in A, v=20 not in B
    assert got == [(1, "A"), (1, "C"), (2, "B"), (2, "C"),
                   (3, "B"), (3, "C"), (4, "C")]

    import io, contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(pts, iv, "v", "lo", "hi", 8.0).explain("formatted")
    assert "NestedLoop" not in buf.getvalue()  # equi-join on bins only
    assert "CartesianProduct" not in buf.getvalue()


def test_asof_null_semantics(spark):
    """ASOF parity on NULLs: a matched right row whose VALUE is null yields
    null (no stale fill-forward past it); right rows with null TIME match
    nothing; name collisions without a suffix raise."""
    from pyspark.sql import functions as F
    left = spark.createDataFrame([(1, "a", 3)], "id long, k string, t long")
    right = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", None, 99.0)],
        "k string, t long, v double")
    row = asof_join(left, right, on="k", left_time="t", right_time="t",
                    value_cols=["v"]).collect()[0]
    assert row["v"] is None  # t=2 row matched, its null value surfaces

    left_v = left.withColumnRenamed("id", "v")
    with pytest.raises(ValueError, match="collides"):
        asof_join(left_v, right, on="k", left_time="t", right_time="t",
                  value_cols=["v"])
    out = asof_join(left_v, right, on="k", left_time="t", right_time="t",
                    value_cols=["v"], suffix="_r").collect()[0]
    assert out["v_r"] is None and out["v"] == 1
