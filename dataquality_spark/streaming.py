"""Structured-Streaming ingest for the quality rules (optional path).

The reference is strictly batch and v1's resume contract is checkpointed
partitions, not streaming (SURVEY.md §2.9). This module exists because the
rule stages are stateless projections, so they compose with
``readStream`` unchanged — incremental ingest of new page snapshots needs no
new operator code. Model scoring + scrub (stateless pandas UDFs) compose the
same way; exact dedup is the one stage that genuinely requires batch
semantics (global winner per content group) and is therefore excluded here —
streaming emits `pre_dedup_pass`, and the batch compactor finalizes `keep`.

Usage shape (files source; on a cluster this would be Kafka/Iceberg CDC):

    q = stream_rule_metrics(spark, in_dir, out_table)  # micro-batched
    q.processAllAvailable(); q.stop()
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataquality_spark import spec
from dataquality_spark.rules.heuristics import with_rule_flags

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream.schema(PAGES_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def stream_flagged(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming frame with all heuristic rule flags — same projection as
    batch (stateless ⇒ identical results per row)."""
    return with_rule_flags(stream_pages(spark, input_dir).drop("html"))


def stream_rule_metrics_query(spark: SparkSession, input_dir: str,
                              query_name: str = "rule_metrics_stream"):
    """Running per-rule pass/fail counts over the stream (complete mode,
    memory sink — swap for an Iceberg/Kafka sink on a cluster)."""
    flagged = stream_flagged(spark, input_dir)
    aggs = []
    for r in spec.HEURISTIC_RULES:
        flag = F.col(f"r_{r}")
        aggs.append(F.count(F.when(flag, 1)).alias(f"{r}__pass"))
        aggs.append(F.count(F.when(~flag, 1)).alias(f"{r}__fail"))
    agg = flagged.agg(*aggs)
    return (agg.writeStream.outputMode("complete")
            .format("memory").queryName(query_name).start())
