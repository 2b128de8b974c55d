"""Distributed exact k-th order statistic (selection without sorting).

The calibration primitive a quality pipeline needs when the spec is a
KEEP RATE, not a score: "keep the best 30% of the corpus" requires the
exact k-th largest classifier logit as the threshold. A global sort is
the naive plan and the wrong one at 100 TB; approximate quantiles
(`percentile_approx`) cannot promise the advertised keep rate.

This is histogram-refinement selection: each pass runs ONE filtered,
map-side-combined aggregate that buckets the still-candidate range into
~66 integer strides (a bounded driver collect), the driver walks the
buckets from the top to find the one containing the k-th largest, and
the search range shrinks by >= 32x (the q=0 bucket of truncating DIV
spans two strides; every other bucket spans one). For the full int64
domain that is <= 13 passes, each a narrow scan of one long column — no
sort, no shuffle of row data, bounded driver memory, and arbitrary
value skew just recurses into the heavy bucket. The reference has no selection
surface (its scoring is whole-frame pandas); this is the distributed
re-expression its grade ladder implies at corpus scale.

Engine-parity: values are int64 and stride math is pure integer
(``stride = width // 64 + 1`` keeps every product in range — no
``(v - lo) * 64`` overflow), so the result is bit-exact and the DuckDB
oracle can recompute it as a plain ``row_number()`` order statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SELECTION_FANOUT = 64


def exact_kth_largest(df: DataFrame, value_col: str, k: int) -> int:
    """The exact k-th largest value (1-based, counting duplicates) of an
    int64 column. NULLs are ignored. Raises ValueError when k is out of
    range. The input frame should be persisted by the caller if it is
    expensive to recompute — this routine scans it O(log_64(range))
    times."""
    vals = (df.select(F.col(value_col).cast("long").alias("v"))
            .where(F.col("v").isNotNull()))
    n = vals.count()
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for {n} non-null values")
    row = vals.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    lo, hi = row["lo"], row["hi"]
    k_above = 0  # values strictly greater than the current hi
    while lo < hi:
        # Bucket by v DIV stride directly: monotone in v, and — unlike
        # (v - lo) DIV stride — free of int64 overflow when the candidate
        # range spans more than 2^63 (caught by the ±2^62 distribution in
        # tests). stride stays a Python int, so the width arithmetic here
        # is unbounded-precision; only the Spark-side expression must fit.
        stride = (hi - lo) // SELECTION_FANOUT + 1
        buckets = (
            vals.where((F.col("v") >= lo) & (F.col("v") <= hi))
            .groupBy(F.expr(f"v DIV {stride}").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"),
                 F.min("v").alias("bmin"), F.max("v").alias("bmax"))
            .collect())
        acc = k_above
        for r in sorted(buckets, key=lambda r: r["b"], reverse=True):
            if acc + r["c"] >= k:
                # exact per-bucket extrema, no boundary arithmetic —
                # also tightens faster than stride bounds would
                lo, hi = r["bmin"], r["bmax"]
                k_above = acc
                break
            acc += r["c"]
        else:  # pragma: no cover - unreachable while k <= n
            raise AssertionError("selection walk exhausted buckets")
    return lo
