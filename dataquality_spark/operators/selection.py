"""Distributed exact k-th order statistic (selection without sorting).

The calibration primitive a quality pipeline needs when the spec is a
KEEP RATE, not a score: "keep the best 30% of the corpus" requires the
exact k-th largest classifier logit as the threshold. A global sort is
the naive plan and the wrong one at 100 TB; approximate quantiles
(`percentile_approx`) cannot promise the advertised keep rate.

This is histogram-refinement selection: each pass runs ONE filtered,
map-side-combined aggregate that buckets the still-candidate range into
~4096 integer strides (a bounded, few-hundred-KB driver collect), the
driver walks the buckets from the top to find the one containing the
k-th largest, and the search range shrinks by >= 2048x (the q=0 bucket
of truncating DIV spans two strides; every other bucket spans one). For
the full int64 domain that is <= 6 passes, each a narrow scan of one
long column — no sort, no shuffle of row data, bounded driver memory,
and arbitrary value skew just recurses into the heavy bucket. Round-5
shipped this with fanout 64 (<= 13 passes); each pass is a whole Spark
job whose fixed latency dwarfs the per-row work, so fanout 4096 trades
a still-tiny collect for half the passes (guide §1.2: job count IS the
cost at the margins). The reference has no selection surface (its
scoring is whole-frame pandas); this is the distributed re-expression
its grade ladder implies at corpus scale.

Engine-parity: values are int64 and stride math is pure integer
(``stride = width // 4096 + 1`` keeps every product in range — no
``(v - lo) * 4096`` overflow), so the result is bit-exact and the
DuckDB oracle can recompute it as a plain ``row_number()`` order
statistic. The result is provably FANOUT-INVARIANT (any fanout >= 2
walks to the same k-th value), so the fanout is a pure latency knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SELECTION_FANOUT = 4096


def exact_kth_largest(df: DataFrame, value_col: str, k: int) -> int:
    """The exact k-th largest value (1-based, counting duplicates) of an
    int64 column. NULLs are ignored. Raises ValueError when k is out of
    range. The input frame should be persisted by the caller if it is
    expensive to recompute — this routine scans it O(log_4096(range))
    times."""
    return exact_kth_largest_with_count(df, value_col, k)[0]


def exact_kth_largest_with_count(df: DataFrame, value_col: str, k
                                 ) -> tuple[int, int, int, int]:
    """(k-th largest value, count of values >= it) in the SAME passes.

    Returns (value, ge_count, k, n) — k/n echoed so keep-rate callers
    get every reported figure from this one routine.

    The >=-count rides the walk for free: the driver's running ``k_above``
    is by invariant the number of values strictly greater than the current
    upper bound, and the walk only terminates inside a single-valued
    bucket whose count is exactly the multiplicity of the answer — so no
    extra counting job is needed (the round-5 spelling paid one more full
    scan for it). ``k`` may be an int, or a callable ``n -> k`` evaluated
    on the non-null count (keep-rate callers then need no separate count
    job of their own)."""
    vals = (df.select(F.col(value_col).cast("long").alias("v"))
            .where(F.col("v").isNotNull()))
    # ONE job for validity + initial range (count/min/max fuse into a
    # single map-side-combined aggregate; round 5 paid two jobs here)
    row = vals.agg(F.count("v").alias("n"),
                   F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    n, lo, hi = row["n"], row["lo"], row["hi"]
    if callable(k):
        k = k(n)
    if not 1 <= k <= n:
        raise ValueError(f"k={k} out of range for {n} non-null values")
    k_above = 0      # values strictly greater than the current hi
    ge_count = n     # count(v >= result); exact when the loop never runs
                     # (lo == hi ⇒ every value equals the answer)
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
                # the walk ends inside a single-valued bucket: its count
                # is then the answer's multiplicity, and every copy of
                # the answer lies in the candidate range (lo<=ans<=hi is
                # a loop invariant), so count(v >= ans) = acc + c
                ge_count = acc + r["c"]
                break
            acc += r["c"]
        else:  # pragma: no cover - unreachable while k <= n
            raise AssertionError("selection walk exhausted buckets")
    return lo, ge_count, k, n
