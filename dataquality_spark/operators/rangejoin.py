"""Range (interval) join — point-in-interval without a nested-loop plan.

Spark plans a raw ``start <= t AND t < end`` join as BroadcastNestedLoopJoin
(or worse, a cartesian filter) — quadratic at scale. The standard fix:
bucketize. Each interval explodes into the fixed-width bins it covers, each
point maps to its single bin, the join is a plain equi-join on the bin key,
and the original range predicate re-applies as a residual filter. Join cost
becomes O(points + intervals x bins_per_interval + matches); bin width
trades replication against candidate precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               bin_width: float) -> DataFrame:
    """Inner join rows where ``start <= point < end``.

    ``points`` and ``intervals`` must not share column names (select/alias
    upstream). Intervals replicate into ceil(span / bin_width) + 1 bins —
    pick ``bin_width`` near the typical interval span so replication stays
    O(1) per interval."""
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / bin_width).cast("long"))
    lo = F.floor(F.col(start_col) / bin_width).cast("long")
    hi = F.floor(F.col(end_col) / bin_width).cast("long")
    # inverted intervals (end < start) can match nothing, but sequence(lo,
    # hi) with hi < lo counts DOWN (wasted candidates) and one badly
    # inverted row can demand a billion-element array and kill the job —
    # drop them before the explode
    i = (intervals.where(F.col(start_col) <= F.col(end_col))
         .withColumn("_bin", F.explode(F.sequence(lo, hi))))
    return (p.join(i, "_bin")
            .where((F.col(start_col) <= F.col(point_col))
                   & (F.col(point_col) < F.col(end_col)))
            .drop("_bin"))
