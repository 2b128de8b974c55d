"""As-of join — the time-series operator Spark's built-ins lack.

For each left row, attach the most recent right row with the same key whose
time is <= the left time (the "backward" as-of of kdb/pandas.merge_asof/
DuckDB ASOF JOIN).

Scale shape — the canonical distributed formulation: UNION the two sides
tagged by origin, shuffle ONCE on the key, and run a single
``last(ignorenulls=True)`` window ordered by (time, origin) so every left
row picks up the latest preceding right row in the same pass. No
range-condition join (which Spark would plan as a broadcast-nested-loop or
an exploded inequality join — both quadratic blowups), no per-key collect;
one exchange, one sort, linear in the union size.

NULL semantics match ASOF: right values travel inside a struct so a
GENUINELY NULL right value is still "the matched row" (not skipped by
ignorenulls — only the left-row placeholder structs are null); right rows
with a NULL time are dropped (a NULL time satisfies no ``t >= t`` bound).
Right-side ties on time resolve to the LAST right row in (time, tiebreak)
order, matching DuckDB ASOF for tie-free data.
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
    key; times must be mutually comparable (cast upstream). Raises when an
    output value column name collides with a left column — pass ``suffix``."""
    lcols = left.columns
    for v in value_cols:
        if v + suffix in lcols:
            raise ValueError(
                f"output column {v + suffix!r} collides with a left column; "
                f"pass suffix=")
    # one struct carries all right values: NULL struct = "no right row here"
    # (the left-side placeholder), non-null struct with null fields = a real
    # matched right row whose value IS null — exactly ASOF's behavior
    payload = F.struct(*[F.col(v).alias(v) for v in value_cols])
    lu = (left.withColumn("_t", F.col(left_time))
          .withColumn("_src", F.lit(1))
          .withColumn("_pay", F.lit(None).cast(
              right.select(payload.alias("_pay")).schema["_pay"].dataType)))
    # NULL-key right rows can never match under equi-key semantics, but the
    # window's partitionBy groups NULL with NULL — drop them so a NULL-key
    # left row gets NULL values (as DuckDB ASOF / any SQL equi-join would),
    # not the latest NULL-key right row
    ru = (right.where(F.col(right_time).isNotNull()
                      & F.col(on).isNotNull())
          .select(F.col(on), F.col(right_time).alias("_t"),
                  F.lit(0).alias("_src"), payload.alias("_pay")))
    for c in lcols:
        if c != on:
            ru = ru.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = lu.select(*lcols, "_t", "_src", "_pay").unionByName(
        ru.select(*lcols, "_t", "_src", "_pay"))
    # right rows sort BEFORE left rows at equal time (_src 0 < 1), so an
    # exactly-simultaneous right row IS visible to the left row (<= join)
    w = (Window.partitionBy(on).orderBy("_t", "_src")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_pay", F.last("_pay", ignorenulls=True).over(w))
    return (u.where(F.col("_src") == 1)
            .select(*lcols, *[F.col(f"_pay.{v}").alias(v + suffix)
                              for v in value_cols]))
