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


def stream_decisions_query(spark: SparkSession, input_dir: str,
                           out_dir: str, checkpoint_dir: str):
    """Incremental pre-dedup decisions to a parquet file sink with a
    checkpoint — the production shape: exactly-once per input file across
    restarts (the file source records consumed files in the checkpoint; a
    killed/restarted query neither drops nor duplicates rows — tested).
    Stateless stages only; the batch compactor finalizes ``keep``
    (module docstring)."""
    flagged = stream_flagged(spark, input_dir)
    gate = F.lit(True)
    for r in spec.HEURISTIC_RULES:
        gate = gate & F.col(f"r_{r}")
    dec = flagged.withColumn("pre_dedup_pass", gate).select(
        "url", "warc_ts", "pre_dedup_pass",
        *[f"r_{r}" for r in spec.HEURISTIC_RULES])
    return (dec.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .start())


def stream_windowed_metrics_query(spark: SparkSession, input_dir: str,
                                  window: str = "1 hour",
                                  watermark: str = "2 hours",
                                  query_name: str = "windowed_metrics"):
    """Event-time windowed pass rates with a watermark for late snapshots:
    per ``window(warc_ts)``, rows seen and heuristic-gate pass count. The
    watermark bounds state for out-of-order WARC captures — the standard
    late-data shape at crawl scale (update mode + memory sink here; Iceberg
    sink on a cluster)."""
    flagged = stream_flagged(spark, input_dir)
    gate = F.lit(True)
    for r in spec.HEURISTIC_RULES:
        gate = gate & F.col(f"r_{r}")
    agg = (flagged.withColumn("pass", gate)
           .withWatermark("warc_ts", watermark)
           .groupBy(F.window("warc_ts", window).alias("w"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("pass").cast("long")).alias("n_pass")))
    return (agg.select(F.col("w.start").alias("w_start"), "n_rows", "n_pass")
            .writeStream.outputMode("update")
            .format("memory").queryName(query_name).start())


def stream_first_seen_dedup_query(spark: SparkSession, input_dir: str,
                                  out_dir: str, checkpoint_dir: str,
                                  watermark: str = "24 hours"):
    """Streaming exact dedup: emit only the FIRST-ARRIVING row per content
    hash, state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — Spark's native stateful dedup; no
    custom state UDF needed). Semantics differ from batch dedup by design:
    batch picks min(warc_ts, url) per group, streaming picks arrival order —
    both are deterministic "one winner per content group" policies; the
    batch compactor remains the canonical one."""
    from dataquality_spark.functions import text as TX
    pages = stream_pages(spark, input_dir).drop("html")
    hashed = (pages.withColumn("content_hash", TX.content_hash(F.col("text")))
              .withWatermark("warc_ts", watermark)
              .dropDuplicatesWithinWatermark(["content_hash"]))
    return (hashed.select("url", "warc_ts", "content_hash")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .start())
