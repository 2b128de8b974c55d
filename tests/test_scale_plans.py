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
