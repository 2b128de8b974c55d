"""Structured-Streaming rules path: streaming metrics == batch metrics;
checkpointed file sink is exactly-once across restarts; watermarked windows;
streaming first-seen dedup."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import spec
from dataquality_spark.rules.heuristics import rule_metrics, with_rule_flags
from dataquality_spark.streaming import (
    stream_decisions_query, stream_first_seen_dedup_query,
    stream_rule_metrics_query, stream_windowed_metrics_query,
)
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


def test_decisions_sink_exactly_once_across_restart(spark, tmp_path):
    """Kill the query between input arrivals, restart on the SAME
    checkpoint: every url appears exactly once in the sink."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    first = generate_pages(spark, 200, seed=3, partitions=2)
    first.write.mode("append").parquet(in_dir)
    q = stream_decisions_query(spark, in_dir, out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # "crash" between micro-batches

    generate_pages(spark, 150, seed=4, partitions=2) \
        .withColumn("url", F.concat(F.lit("b2-"), F.col("url"))) \
        .write.mode("append").parquet(in_dir)
    q2 = stream_decisions_query(spark, in_dir, out_dir, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    out = spark.read.parquet(out_dir)
    assert out.count() == 350
    assert out.select("url").distinct().count() == 350  # no dup, no loss
    # flags identical to batch for a spot row set
    batch = with_rule_flags(spark.read.parquet(in_dir)) \
        .select("url", "r_min_words").toPandas().set_index("url")
    got = out.select("url", "r_min_words").toPandas().set_index("url")
    assert (batch.sort_index()["r_min_words"]
            == got.sort_index()["r_min_words"]).all()


def test_windowed_metrics_match_batch_windows(spark, tmp_path):
    in_dir = str(tmp_path / "win_in")
    pages = generate_pages(spark, 400, seed=9, partitions=4)
    pages.write.parquet(in_dir)

    q = stream_windowed_metrics_query(spark, in_dir, window="6 hours",
                                      watermark="1 hour",
                                      query_name="t_win")
    try:
        q.processAllAvailable()
        got = {r["w_start"]: (r["n_rows"], r["n_pass"])
               for r in spark.sql("SELECT * FROM t_win").collect()}
    finally:
        q.stop()

    gate = F.lit(True)
    for r in spec.HEURISTIC_RULES:
        gate = gate & F.col(f"r_{r}")
    batch = (with_rule_flags(spark.read.parquet(in_dir))
             .withColumn("pass", gate)
             .groupBy(F.window("warc_ts", "6 hours").alias("w"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("pass").cast("long")).alias("p"))
             .select(F.col("w.start").alias("s"), "n", "p").collect())
    want = {r["s"]: (r["n"], r["p"]) for r in batch}
    assert got == want


def test_streaming_first_seen_dedup(spark, tmp_path):
    in_dir = str(tmp_path / "dd_in")
    out_dir = str(tmp_path / "dd_out")
    ckpt = str(tmp_path / "dd_ckpt")
    pages = generate_pages(spark, 300, seed=5, partitions=3)
    pages.write.parquet(in_dir)

    q = stream_first_seen_dedup_query(spark, in_dir, out_dir, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(out_dir)
    n_distinct_hashes = (spark.read.parquet(in_dir)
                         .select(F.xxhash64("text")).distinct().count())
    assert out.count() == n_distinct_hashes          # one winner per group
    assert out.select("content_hash").distinct().count() == n_distinct_hashes


def test_host_reputation_stateful_across_batches(spark, tmp_path):
    """Custom stateful operator (applyInPandasWithState): per-host counters
    must ACCUMULATE across micro-batches — totals after two separate input
    arrivals equal the batch computation over the union."""
    from dataquality_spark.streaming import stream_host_reputation_query

    in_dir = str(tmp_path / "rep_in")
    generate_pages(spark, 300, seed=21, partitions=3) \
        .write.mode("append").parquet(in_dir)
    # min_docs=1, max_fail_rate=0.0 -> blocked iff any doc failed the gate
    q = stream_host_reputation_query(spark, in_dir, query_name="t_rep",
                                     min_docs=1, max_fail_rate=0.0)
    try:
        q.processAllAvailable()
        # second arrival, same host pool -> existing state must carry over
        generate_pages(spark, 200, seed=22, partitions=2) \
            .withColumn("url", F.regexp_replace("url", "/p/", "/q/")) \
            .write.mode("append").parquet(in_dir)
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM t_rep").toPandas()
    finally:
        q.stop()

    # latest update per host = the row with max docs (counters are monotone)
    latest = emitted.loc[emitted.groupby("host")["docs"].idxmax()] \
        .set_index("host")

    gate = F.lit(True)
    for r in spec.HEURISTIC_RULES:
        gate = gate & F.col(f"r_{r}")
    batch = (with_rule_flags(spark.read.parquet(in_dir))
             .select(F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
                     .alias("host"), gate.alias("doc_pass"))
             .groupBy("host")
             .agg(F.count(F.lit(1)).alias("docs"),
                  F.count(F.when(~F.col("doc_pass"), 1)).alias("fails"))
             ).toPandas().set_index("host")

    assert set(latest.index) == set(batch.index)
    for host, row in batch.iterrows():
        got = latest.loc[host]
        assert got["docs"] == row["docs"], host
        assert got["fails"] == row["fails"], host
        assert bool(got["blocked"]) == (row["fails"] > 0), host
    assert latest["blocked"].any() and not latest["blocked"].all()
