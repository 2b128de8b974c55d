"""Distributed exact selection (operators/selection.py): the k-th
largest from histogram refinement must equal the sorted-list answer on
adversarial value distributions — ties, negatives, huge magnitudes,
skewed clusters — for every k, and the walk must never sort or shuffle
row data (plan-free routine, so the pin here is pass-count-bounded
semantics, not a plan string).
"""

import random

import pytest

from dataquality_spark.operators.selection import exact_kth_largest


def _frame(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v long")


DISTROS = {
    "ties_heavy": [5] * 40 + [7] * 3 + [-2] * 17,
    "negatives": [-(2**40), -1, 0, 1, 2**40, -(2**62), 2**62],
    "skew_cluster": [10**12 + i % 3 for i in range(50)] + [-(10**12)],
    "singleton": [42],
}


@pytest.mark.parametrize("name", sorted(DISTROS))
def test_kth_largest_matches_sorted(spark, name):
    values = DISTROS[name]
    df = _frame(spark, values)
    want = sorted(values, reverse=True)
    for k in sorted({1, 2, len(values) // 2 or 1, len(values)}):
        if k > len(values):
            continue
        assert exact_kth_largest(df, "v", k) == want[k - 1], (name, k)


def test_kth_largest_random_property(spark):
    rng = random.Random(20260820)
    values = [rng.randint(-(2**60), 2**60) for _ in range(200)]
    values += values[:25]  # planted duplicates
    df = _frame(spark, values)
    want = sorted(values, reverse=True)
    for k in (1, 37, 120, len(values)):
        assert exact_kth_largest(df, "v", k) == want[k - 1]


def test_kth_largest_ignores_nulls_and_validates_k(spark):
    df = spark.createDataFrame([(3,), (None,), (9,)], "v long")
    assert exact_kth_largest(df, "v", 1) == 9
    assert exact_kth_largest(df, "v", 2) == 3
    with pytest.raises(ValueError):
        exact_kth_largest(df, "v", 3)
    with pytest.raises(ValueError):
        exact_kth_largest(df, "v", 0)


def test_kth_largest_with_count_matches_sorted(spark):
    from dataquality_spark.operators.selection import (
        exact_kth_largest_with_count)
    for values in (DISTROS["ties_heavy"], DISTROS["negatives"],
                   DISTROS["singleton"], [7, 7, 7, 7]):
        df = _frame(spark, values)
        want = sorted(values, reverse=True)
        for k in sorted({1, len(values) // 2 or 1, len(values)}):
            v, ge, k_out, n = exact_kth_largest_with_count(df, "v", k)
            assert v == want[k - 1]
            assert ge == sum(1 for x in values if x >= v)
            assert (k_out, n) == (k, len(values))
    # callable k: keep-rate spelling needs no separate count job
    df = _frame(spark, DISTROS["ties_heavy"])
    vals = DISTROS["ties_heavy"]
    v, ge, k_out, n = exact_kth_largest_with_count(
        df, "v", lambda n: max(1, n * 30 // 100))
    want = sorted(vals, reverse=True)
    assert k_out == max(1, len(vals) * 30 // 100) and v == want[k_out - 1]
    assert ge == sum(1 for x in vals if x >= v)
