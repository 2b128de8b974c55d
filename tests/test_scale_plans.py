"""Plan-shape assertions for the scale tier (VERDICT r2 #1): the heaviest
queries must not force a broadcast of a scaled input table, and the known
engineered plan features (hot-bucket cap blocklist broadcast, prefix-sum
range partitioning, salted dedup) must actually be present in the plan.

Runs at small size — these are STATIC plan properties, invariant to row
count by construction (that is exactly what the audit checks: the pre-AQE
``sparkPlan``, where only plan-time hints appear; AQE's runtime broadcast
conversions are correct at small scale and self-reverse at 100×).
tools/bench_scale.py applies the same audit to the timed 10× tier.
"""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
from tools.bench_scale import (HEAVY_QUERIES,  # noqa: E402
                               broadcast_scan_violations,
                               hints_only_broadcasts)

from dataquality_spark import queries as Q  # noqa: E402


@pytest.fixture(scope="module")
def scale_dir(spark, tmp_path_factory):
    from dataquality_spark import synth
    d = str(tmp_path_factory.mktemp("scaleplan"))
    synth.generate_documents(spark, 2000).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet"))
    synth.generate_embeddings(spark, 800).write.mode("overwrite").parquet(
        os.path.join(d, "embeddings.parquet"))
    return d


@pytest.mark.parametrize("name", HEAVY_QUERIES)
def test_no_forced_broadcast_of_scaled_table(spark, name, scale_dir):
    with hints_only_broadcasts(spark):
        out = Q.QUERIES[name](spark, scale_dir)
        try:
            bad = broadcast_scan_violations(out, scale_dir)
            assert not bad, f"{name} hint-broadcasts a scaled input: {bad}"
        finally:
            Q.release_cached()


def test_audit_catches_a_real_violation(spark, scale_dir):
    """The auditor itself must not be vacuous: a deliberate hinted
    broadcast of the scaled table (no aggregation between) has to be
    flagged."""
    from pyspark.sql import functions as F
    docs = spark.read.parquet(os.path.join(scale_dir, "documents.parquet"))
    with hints_only_broadcasts(spark):
        bad = docs.join(F.broadcast(docs.select("doc_id", "text")),
                        "doc_id")
        assert broadcast_scan_violations(bad, scale_dir)
        # ...and a broadcast of an AGGREGATED frame stays allowed
        small = docs.groupBy("lang").count()
        ok = docs.join(F.broadcast(small), "lang")
        assert not broadcast_scan_violations(ok, scale_dir)
        # ...and an aggregate in a SIBLING branch must not launder a raw
        # scan in another branch of the same broadcast subtree
        laundered = docs.join(
            F.broadcast(small.join(docs.select("doc_id", "lang", "text"),
                                   "lang")), ["lang", "doc_id"])
        assert broadcast_scan_violations(laundered, scale_dir), \
            "sibling-branch aggregate excused a raw scaled-table scan"


def test_runtime_bloom_semi_only_not_anti(spark, scale_dir, tmp_path):
    """Pins the empirical basis for `incremental_new_docs`' docstring
    (operators/dedup.py): Spark's runtime Bloom-filter injection fires for
    the SEMI form of the hash-keyed join shape but can never fire for the
    ANTI form (a Bloom miss must be KEPT under anti semantics). If a Spark
    upgrade changes either branch, the docstring's scale story needs
    re-auditing."""
    from pyspark.sql import functions as F
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter."
        "creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    d = str(tmp_path)
    (spark.range(0, 20000)
     .withColumn("h", F.xxhash64(F.col("id").cast("string")))
     .write.mode("overwrite").parquet(os.path.join(d, "big.parquet")))
    (spark.range(0, 20000)
     .withColumn("ph", F.xxhash64((F.col("id") * 3).cast("string")))
     .write.mode("overwrite").parquet(os.path.join(d, "small.parquet")))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.read.parquet(os.path.join(d, "big.parquet"))
        # selective filter makes the creation side bloom-eligible
        small = (spark.read.parquet(os.path.join(d, "small.parquet"))
                 .where(F.col("id") % 1000 == 0).select("ph"))

        def has_bloom(how):
            j = big.join(small, big["h"] == small["ph"], how)
            plan = j._jdf.queryExecution().optimizedPlan().toString().lower()
            return "bloom" in plan or "might_contain" in plan

        assert has_bloom("left_semi"), \
            "bloom no longer injected for semi — docstring basis changed"
        assert not has_bloom("left_anti"), \
            "bloom now injected for anti — update incremental_new_docs docs"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_fuzzy_dedup_plan_has_no_cartesian(spark, scale_dir):
    """The LSH candidate join must be an equi-join on bucket keys — never
    a (broadcast) nested-loop — at any scale."""
    out = Q.QUERIES["fuzzy_dedup_decisions"](spark, scale_dir)
    try:
        plan = out._jdf.queryExecution().sparkPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    finally:
        Q.release_cached()
