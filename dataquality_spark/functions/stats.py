"""Association statistics beyond Pearson — the Spark re-expression of the
reference's `dython.nominal.associations` usage (P2 null-indicator
associations `dimensions/completeness/p2.py:46`, I1 inter-column
associations `dimensions/interdependency/i1.py:68`; SURVEY.md G-6).

Design: the heavy pass (contingency table / grouped moments) runs
distributed as ONE aggregation; the final scalar statistic folds the tiny
result on the driver. No per-row Python.

Public formulas: Cramér's V with the Bergsma–Wicher bias correction option
off by default (dython's default `bias_correction=True`; we expose both),
correlation ratio η (nominal→numeric) as in dython's `correlation_ratio`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cramers_v(df: DataFrame, col1: str, col2: str,
              bias_correction: bool = True) -> float:
    """Cramér's V between two categorical columns.

    One distributed groupBy builds the contingency counts; chi² and V fold
    driver-side (the contingency table is |c1|×|c2| — tiny by assumption,
    like the reference's category columns).
    """
    rows = (df.select(col1, col2).where(
        F.col(col1).isNotNull() & F.col(col2).isNotNull())
        .groupBy(col1, col2).count().collect())
    if not rows:
        return float("nan")
    r_tot: dict = {}
    c_tot: dict = {}
    n = 0
    for row in rows:
        a, b, c = row[0], row[1], row[2]
        r_tot[a] = r_tot.get(a, 0) + c
        c_tot[b] = c_tot.get(b, 0) + c
        n += c
    chi2 = 0.0
    for row in rows:
        a, b, c = row[0], row[1], row[2]
        expected = r_tot[a] * c_tot[b] / n
        chi2 += (c - expected) ** 2 / expected
    r, k = len(r_tot), len(c_tot)
    if min(r, k) == 1:
        return 0.0
    phi2 = chi2 / n
    if bias_correction:
        phi2c = max(0.0, phi2 - (k - 1) * (r - 1) / (n - 1))
        rc = r - (r - 1) ** 2 / (n - 1)
        kc = k - (k - 1) ** 2 / (n - 1)
        denom = min(kc - 1, rc - 1)
        if denom <= 0:
            return 0.0
        return math.sqrt(phi2c / denom)
    return math.sqrt(phi2 / min(k - 1, r - 1))


def correlation_ratio(df: DataFrame, categorical: str, numeric: str) -> float:
    """η (correlation ratio) nominal→numeric: sqrt(SS_between / SS_total).

    One grouped aggregation (count, sum, sum²) — partial+final combine —
    then a driver-side fold over the per-category moments.
    """
    rows = (df.select(categorical, numeric).where(
        F.col(categorical).isNotNull() & F.col(numeric).isNotNull())
        .groupBy(categorical)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(numeric).alias("s"),
             F.sum(F.col(numeric) * F.col(numeric)).alias("ss"))
        .collect())
    n = sum(r["n"] for r in rows)
    if n == 0:
        return float("nan")
    total_sum = sum(r["s"] for r in rows)
    grand_mean = total_sum / n
    ss_total = sum(r["ss"] for r in rows) - n * grand_mean ** 2
    if ss_total <= 0:
        return 0.0
    ss_between = sum(r["n"] * (r["s"] / r["n"] - grand_mean) ** 2 for r in rows)
    return math.sqrt(max(ss_between, 0.0) / ss_total)


def association_matrix(df: DataFrame, nominal: list[str],
                       numeric: list[str]) -> dict[tuple[str, str], float]:
    """Full mixed-type association matrix like dython.associations:
    numeric↔numeric Pearson, nominal↔nominal Cramér's V, nominal↔numeric η."""
    out: dict[tuple[str, str], float] = {}
    for i, a in enumerate(numeric):
        for b in numeric[i + 1:]:
            out[(a, b)] = float(df.stat.corr(a, b))
    for i, a in enumerate(nominal):
        for b in nominal[i + 1:]:
            out[(a, b)] = cramers_v(df, a, b)
    for a in nominal:
        for b in numeric:
            out[(a, b)] = correlation_ratio(df, a, b)
    return out
