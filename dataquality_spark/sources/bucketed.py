"""Bucketed-table writes for co-located, exchange-free joins.

At 100 TB the dominant cost of a repeated equi-join (decisions ⋈ pages by
content hash, embeddings ⋈ labels by vec_id, …) is the shuffle. Writing both
sides bucketed on the join key makes every later join between them
shuffle-free: Spark plans a SortMergeJoin whose BOTH inputs read already-
co-located buckets, so the plan contains ZERO Exchange nodes — the sort is
per-bucket and spill-safe, which is exactly the shape you want for a join
that recurs across runs (`sort_by` at write time removes even that sort).

This rides Spark's session catalog (``bucketBy`` requires ``saveAsTable``;
plain path writes cannot carry bucket metadata). On a real deployment the
same property comes from Iceberg's ``bucket(N, col)`` partition transform —
the ManifestCatalog emulates the snapshot side, this module the bucket side;
both are thin, swappable boundaries (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``n_buckets`` must match across tables that will join (Spark only
    elides the shuffle when both sides agree); ``sort_col`` pre-sorts each
    bucket file so later merge-joins skip their sort too."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either side (assert via ``exchange_count``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes in the EXECUTED physical plan
    (broadcast exchanges excluded — they are not shuffles)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "BroadcastExchange" not in line)
