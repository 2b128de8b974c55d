"""As-of join — the time-series operator Spark's built-ins lack.

For each left row, attach the most recent right row with the same key whose
time is <= the left time (the "backward" as-of of kdb/pandas.merge_asof/
DuckDB ASOF JOIN).

Scale shape — the canonical distributed formulation: UNION the two sides
tagged by origin, shuffle ONCE on the key, and run a single
``last(value, ignorenulls=True)`` window ordered by (time, origin) so every
left row picks up the latest preceding right value in the same pass. No
range-condition join (which Spark would plan as a broadcast-nested-loop or
an exploded inequality join — both quadratic blowups), no per-key collect;
one exchange, one sort, linear in the union size. Right-side ties on time
resolve to the LAST right row in (time, tiebreak) order, matching DuckDB
ASOF semantics for the verified data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str, right_time: str,
              value_cols: list[str],
              suffix: str = "") -> DataFrame:
    """Backward as-of join: left columns + the latest-preceding right
    ``value_cols`` (null when no right row precedes). ``on`` is the equality
    key; times must be mutually comparable (cast upstream)."""
    lcols = left.columns
    l = (left.withColumn("_t", F.col(left_time))
         .withColumn("_src", F.lit(1)))
    for v in value_cols:
        l = l.withColumn(f"_v_{v}", F.lit(None).cast(
            dict(right.dtypes)[v]))
    r = (right.withColumnRenamed(on, "_on_r")
         .withColumn("_t", F.col(right_time))
         .withColumn("_src", F.lit(0)))
    r_sel = [F.col("_on_r").alias(on), "_t", "_src"] + [
        F.col(v).alias(f"_v_{v}") for v in value_cols]
    l_sel = [F.col(c) for c in lcols] + [F.col("_t"), F.col("_src")] + [
        F.col(f"_v_{v}") for v in value_cols]
    lu = l.select(*l_sel)
    ru = r.select(*r_sel)
    for c in lcols:
        if c not in (on,):
            ru = ru.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = lu.unionByName(ru.select(*[c for c in lu.columns]))
    # right rows sort BEFORE left rows at equal time (_src 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (<= join)
    w = (Window.partitionBy(on).orderBy("_t", "_src")
         .rowsBetween(Window.unboundedPreceding, 0))
    for v in value_cols:
        u = u.withColumn(f"_v_{v}",
                         F.last(f"_v_{v}", ignorenulls=True).over(w))
    return (u.where(F.col("_src") == 1)
            .select(*lcols, *[F.col(f"_v_{v}").alias(v + suffix)
                              for v in value_cols]))
