"""Association statistics beyond Pearson — the Spark re-expression of the
reference's `dython.nominal.associations` usage (P2 null-indicator
associations `dimensions/completeness/p2.py:46`, I1 inter-column
associations `dimensions/interdependency/i1.py:68`; SURVEY.md G-6).

Design: the heavy pass (contingency table / grouped moments) runs
distributed as ONE aggregation; the final scalar statistic folds the tiny
result on the driver. No per-row Python.

Public formulas: Cramér's V with the Bergsma–Wicher bias correction
(defaulting to ``bias_correction=True``, matching dython's default; pass
False for the uncorrected statistic), correlation ratio η
(nominal→numeric) as in dython's `correlation_ratio`.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fold_cramers(cells: list[tuple], bias_correction: bool) -> float:
    """Driver-side fold: contingency cells (a, b, count) → Cramér's V."""
    if not cells:
        return float("nan")
    r_tot: dict = {}
    c_tot: dict = {}
    n = 0
    for a, b, c in cells:
        r_tot[a] = r_tot.get(a, 0) + c
        c_tot[b] = c_tot.get(b, 0) + c
        n += c
    chi2 = 0.0
    e_seen = 0.0
    for a, b, c in cells:
        expected = r_tot[a] * c_tot[b] / n
        chi2 += (c - expected) ** 2 / expected
        e_seen += expected
    # zero-count cells never appear in a groupBy result but still
    # contribute (0 - E)^2 / E = E to chi-square; their total is
    # n - sum(E over observed cells). Omitting them understates V on any
    # sparse table (e.g. perfect association gives 0.707 instead of 1.0).
    chi2 += max(0.0, n - e_seen)
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


def _fold_eta(moments: list[tuple]) -> float:
    """Driver-side fold: per-category (n, sum, sum²) → correlation ratio η."""
    n = sum(m[0] for m in moments)
    if n == 0:
        return float("nan")
    total_sum = sum(m[1] for m in moments)
    grand_mean = total_sum / n
    ss_total = sum(m[2] for m in moments) - n * grand_mean ** 2
    if ss_total <= 0:
        return 0.0
    ss_between = sum(m[0] * (m[1] / m[0] - grand_mean) ** 2 for m in moments)
    return math.sqrt(max(ss_between, 0.0) / ss_total)


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
    return _fold_cramers([(r[0], r[1], r[2]) for r in rows], bias_correction)


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
    return _fold_eta([(r["n"], r["s"], r["ss"]) for r in rows])


def iqr_group_score(df: DataFrame, group_col: str, value_col: str,
                    factor: float = 1.5, min_score: float = 0.85) -> DataFrame:
    """A2's two-level grouped scoring (reference
    `dimensions/accuracy/a2.py:55-67`): per group, flag values outside
    [Q1 - factor·IQR, Q3 + factor·IQR] using the GROUP'S OWN quartiles, fold
    to a per-group score 1 - mean(outlier), then the dimension score is the
    fraction of groups whose score exceeds ``min_score`` — a nested
    aggregation, not the flat per-group rate.

    Two shuffles on the same key (quantile agg + broadcast-join + final agg);
    the quantile table is tiny (one row per group) and broadcast.

    Rows with a NULL value are excluded up front, so a group whose values
    are ALL null is absent from n_groups AND the score — previously it was
    counted by n_groups but silently skipped by avg(), making
    a2_score ≠ n_passing / n_groups.
    """
    df = df.where(F.col(value_col).isNotNull())
    q = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.25)).alias("_q1"),
        F.percentile(value_col, F.lit(0.75)).alias("_q3"))
    j = df.join(F.broadcast(q), group_col)
    iqr = F.col("_q3") - F.col("_q1")
    out = (F.col(value_col) < F.col("_q1") - factor * iqr) | (
        F.col(value_col) > F.col("_q3") + factor * iqr)
    g = (j.groupBy(group_col)
         .agg((1.0 - F.avg(out.cast("double"))).alias("_gscore")))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("_gscore") > min_score).cast("long")).alias("n_passing"),
        F.round(F.avg((F.col("_gscore") > min_score).cast("double")), 6)
        .alias("a2_score"))


_SEP = "\x00"


def association_matrix(df: DataFrame, nominal: list[str],
                       numeric: list[str],
                       bias_correction: bool = True) -> dict[tuple[str, str], float]:
    """Full mixed-type association matrix like dython.associations:
    numeric↔numeric Pearson, nominal↔nominal Cramér's V, nominal↔numeric η.

    Exactly THREE Spark jobs regardless of column count (the reference builds
    the whole matrix in one pandas pass, `p2.py:46`; round 1 of this module
    launched one job per pair — O(p²) input scans at 100 TB):

      1. one ``agg`` carrying every numeric-pair ``corr`` expression;
      2. one shuffle for ALL nominal-pair contingencies — pair keys exploded
         into (pair, x, y) rows, single groupBy;
      3. one shuffle for ALL (nominal, numeric) moment tables, same shape.

    Fan-out cost is explicit: the explode multiplies rows by the number of
    pairs — fine while p is tens of columns (the reference's regime); the
    partial aggregation collapses each pair to its category cells map-side.
    """
    out: dict[tuple[str, str], float] = {}

    num_pairs = [(a, b) for i, a in enumerate(numeric) for b in numeric[i + 1:]]
    if num_pairs:
        aggs = [F.corr(a, b).alias(f"c{i}") for i, (a, b) in enumerate(num_pairs)]
        row = df.agg(*aggs).collect()[0]
        for i, (a, b) in enumerate(num_pairs):
            out[(a, b)] = float(row[f"c{i}"]) if row[f"c{i}"] is not None else float("nan")

    nom_pairs = [(a, b) for i, a in enumerate(nominal) for b in nominal[i + 1:]]
    if nom_pairs:
        structs = [F.struct(F.lit(a + _SEP + b).alias("p"),
                            F.col(a).cast("string").alias("x"),
                            F.col(b).cast("string").alias("y"))
                   for a, b in nom_pairs]
        cells = (df.select(F.explode(F.array(*structs)).alias("e"))
                 .select("e.p", "e.x", "e.y")
                 .where(F.col("x").isNotNull() & F.col("y").isNotNull())
                 .groupBy("p", "x", "y").count().collect())
        by_pair: dict[str, list] = {}
        for r in cells:
            by_pair.setdefault(r["p"], []).append((r["x"], r["y"], r["count"]))
        for a, b in nom_pairs:
            out[(a, b)] = _fold_cramers(by_pair.get(a + _SEP + b, []),
                                        bias_correction)

    mixed = [(a, b) for a in nominal for b in numeric]
    if mixed:
        structs = [F.struct(F.lit(a + _SEP + b).alias("p"),
                            F.col(a).cast("string").alias("x"),
                            F.col(b).cast("double").alias("v"))
                   for a, b in mixed]
        moments = (df.select(F.explode(F.array(*structs)).alias("e"))
                   .select("e.p", "e.x", "e.v")
                   .where(F.col("x").isNotNull() & F.col("v").isNotNull())
                   .groupBy("p", "x")
                   .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                        F.sum(F.col("v") * F.col("v")).alias("ss"))
                   .collect())
        by_pair = {}
        for r in moments:
            by_pair.setdefault(r["p"], []).append((r["n"], r["s"], r["ss"]))
        for a, b in mixed:
            out[(a, b)] = _fold_eta(by_pair.get(a + _SEP + b, []))
    return out
