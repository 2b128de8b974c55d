"""Structured-Streaming rules path: streaming metrics == batch metrics."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import spec
from dataquality_spark.rules.heuristics import rule_metrics, with_rule_flags
from dataquality_spark.streaming import stream_rule_metrics_query
from dataquality_spark.synth import generate_pages


def test_stream_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    pages = generate_pages(spark, 600, seed=11, partitions=6)
    pages.write.parquet(in_dir)  # 6 files → multiple micro-batches

    q = stream_rule_metrics_query(spark, in_dir, query_name="t_stream")
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM t_stream").collect()[0].asDict()
    finally:
        q.stop()

    batch = rule_metrics(with_rule_flags(spark.read.parquet(in_dir))) \
        .collect()
    for row in batch:
        assert got[f"{row.rule_id}__pass"] == row.pass_count, row.rule_id
        assert got[f"{row.rule_id}__fail"] == row.fail_count, row.rule_id
