"""Association statistics vs hand-computed pandas/numpy oracles
(reference G-6: dython.associations for P2/I1)."""

import math

import numpy as np
import pandas as pd
import pytest

from dataquality_spark.functions.stats import (
    association_matrix, correlation_ratio, cramers_v,
)


def _pdf():
    rng = np.random.RandomState(3)
    n = 400
    cat = rng.choice(["a", "b", "c"], n)
    # dep depends on cat → nonzero V and η; noise → not 1.0
    dep = np.where(cat == "a",
                   rng.choice(["x", "y"], n, p=[0.8, 0.2]),
                   rng.choice(["x", "y"], n, p=[0.3, 0.7]))
    num = np.where(cat == "a", 5.0, 1.0) + rng.randn(n)
    other = rng.randn(n)
    return pd.DataFrame({"cat": cat, "dep": dep, "num": num, "other": other})


def _cramers_py(pdf, c1, c2, bias_correction=True):
    ct = pd.crosstab(pdf[c1], pdf[c2]).to_numpy().astype(float)
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    r, k = ct.shape
    phi2 = chi2 / n
    if bias_correction:
        phi2c = max(0.0, phi2 - (k - 1) * (r - 1) / (n - 1))
        rc = r - (r - 1) ** 2 / (n - 1)
        kc = k - (k - 1) ** 2 / (n - 1)
        return math.sqrt(phi2c / min(kc - 1, rc - 1))
    return math.sqrt(phi2 / min(k - 1, r - 1))


def _eta_py(pdf, cat, num):
    groups = pdf.groupby(cat)[num]
    grand = pdf[num].mean()
    ss_between = (groups.count() * (groups.mean() - grand) ** 2).sum()
    ss_total = ((pdf[num] - grand) ** 2).sum()
    return math.sqrt(ss_between / ss_total)


@pytest.fixture(scope="module")
def data(spark):
    pdf = _pdf()
    return spark.createDataFrame(pdf), pdf


def test_cramers_v(data):
    sdf, pdf = data
    got = cramers_v(sdf, "cat", "dep")
    want = _cramers_py(pdf, "cat", "dep")
    assert got == pytest.approx(want, abs=1e-9)
    assert 0.2 < got < 0.9  # genuinely associated, not degenerate


def test_cramers_v_uncorrected(data):
    sdf, pdf = data
    assert cramers_v(sdf, "cat", "dep", bias_correction=False) == pytest.approx(
        _cramers_py(pdf, "cat", "dep", bias_correction=False), abs=1e-9)


def test_correlation_ratio(data):
    sdf, pdf = data
    got = correlation_ratio(sdf, "cat", "num")
    assert got == pytest.approx(_eta_py(pdf, "cat", "num"), abs=1e-9)
    assert got > 0.5
    assert correlation_ratio(sdf, "cat", "other") < 0.2


def test_association_matrix(data):
    sdf, pdf = data
    m = association_matrix(sdf, nominal=["cat", "dep"], numeric=["num", "other"])
    assert m[("num", "other")] == pytest.approx(
        pdf["num"].corr(pdf["other"]), abs=1e-9)
    assert set(m) == {("num", "other"), ("cat", "dep"), ("cat", "num"),
                      ("cat", "other"), ("dep", "num"), ("dep", "other")}


def test_cramers_v_sparse_table_perfect_association(spark):
    """Regression: zero-count contingency cells must contribute their
    expected mass to chi-square — perfect association on a diagonal table
    used to return ~0.707 instead of 1.0."""
    from dataquality_spark.functions.stats import cramers_v
    rows = [("a", "x")] * 10 + [("b", "y")] * 10
    df = spark.createDataFrame(rows, "c1 string, c2 string")
    assert abs(cramers_v(df, "c1", "c2", bias_correction=False) - 1.0) < 1e-12


def test_iqr_group_score_all_null_group_excluded(spark):
    """Regression: a group whose values are ALL null must be absent from
    n_groups AND the score (it used to inflate n_groups while avg()
    silently skipped it, breaking a2_score == n_passing / n_groups)."""
    from dataquality_spark.functions.stats import iqr_group_score
    rows = ([("g1", float(v)) for v in range(10)]
            + [("g2", float(v)) for v in range(10)]
            + [("g3", None)] * 4)
    df = spark.createDataFrame(rows, "g string, v double")
    r = iqr_group_score(df, "g", "v").collect()[0]
    assert r["n_groups"] == 2
    assert r["a2_score"] == round(r["n_passing"] / r["n_groups"], 6)
