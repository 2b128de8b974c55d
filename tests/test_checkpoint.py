"""Kill/resume test (SURVEY.md §5.2): partial run + resume must produce a
decisions table identical to a one-shot run."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import pipeline
from dataquality_spark.checkpoint import (
    completed_chunks, lineage, read_decisions, run_checkpointed,
)
from dataquality_spark.synth import generate_pages

N = 800
CHUNKS = 4


def _decisions_pdf(spark, out_dir):
    return (read_decisions(spark, out_dir)
            .select("url", "keep", "scrubbed_text")
            .toPandas().sort_values("url").reset_index(drop=True))


def test_resume_identical_to_oneshot(spark, artifacts, tmp_path):
    pages = generate_pages(spark, N, seed=42, partitions=4)

    # one-shot reference run
    full_dir = str(tmp_path / "full")
    r = run_checkpointed(spark, pages, full_dir, n_chunks=CHUNKS)
    assert r["completed"] == list(range(CHUNKS))

    # "crashed" run: 2 of 4 chunks, then resume
    part_dir = str(tmp_path / "partial")
    r1 = run_checkpointed(spark, pages, part_dir, n_chunks=CHUNKS, max_chunks=2)
    assert len(r1["processed"]) == 2
    assert completed_chunks(part_dir) == set(r1["processed"])
    r2 = run_checkpointed(spark, pages, part_dir, n_chunks=CHUNKS)
    assert set(r2["processed"]).isdisjoint(r1["processed"])
    assert r2["completed"] == list(range(CHUNKS))

    a = _decisions_pdf(spark, full_dir)
    b = _decisions_pdf(spark, part_dir)
    assert len(a) == N and len(b) == N
    assert (a["url"] == b["url"]).all()
    assert (a["keep"] == b["keep"]).all()
    assert (a["scrubbed_text"].fillna("\0") == b["scrubbed_text"].fillna("\0")).all()


def test_lineage_rows(spark, tmp_path):
    pages = generate_pages(spark, 200, seed=7, partitions=4)
    out = str(tmp_path / "lin")
    run_checkpointed(spark, pages, out, n_chunks=2)
    rows = lineage(out)
    assert [r["chunk"] for r in rows] == [0, 1]
    assert sum(r["rows_in"] for r in rows) == 200
    for r in rows:
        assert r["rows_kept"] <= r["rows_in"]
        metric_rules = {m["rule_id"] for m in r["rule_metrics"]}
        assert metric_rules == set(pipeline.PIPELINE_RULES)


def test_chunking_matches_global_dedup(spark, artifacts, tmp_path):
    """Content-hash chunking ⇒ per-chunk dedup == global dedup."""
    pages = generate_pages(spark, 600, seed=42, partitions=4)
    out = str(tmp_path / "glob")
    run_checkpointed(spark, pages, out, n_chunks=3)
    chunked = _decisions_pdf(spark, out)

    cleanup = []
    ann = pipeline.run_pipeline(spark, pages, cleanup=cleanup)
    direct = (ann.select("url", "keep").toPandas()
              .sort_values("url").reset_index(drop=True))
    for f in cleanup:
        f.unpersist()
    assert (chunked["keep"].to_numpy() == direct["keep"].to_numpy()).all()


def test_single_input_pass_and_no_cache_leak(spark, artifacts, tmp_path,
                                             monkeypatch):
    """The multi-chunk path must (a) invoke the pipeline exactly once — one
    input scan regardless of n_chunks (round-1 re-filtered per chunk: n full
    scans) — and (b) unpersist everything it persisted."""
    pages = generate_pages(spark, 400, seed=11, partitions=4)
    calls = []
    real = pipeline.run_pipeline

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    import dataquality_spark.checkpoint as CP
    monkeypatch.setattr(CP.P, "run_pipeline", counting)
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    out = str(tmp_path / "once")
    r = run_checkpointed(spark, pages, out, n_chunks=4)
    assert r["completed"] == [0, 1, 2, 3]
    assert len(calls) == 1
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(after) <= len(before)


def test_resume_rejects_mismatched_n_chunks(spark, tmp_path):
    from dataquality_spark import checkpoint as C
    pages = generate_pages(spark, 120, seed=9, partitions=2)
    out = str(tmp_path / "run")
    C.run_checkpointed(spark, pages, out, n_chunks=4)
    with pytest.raises(ValueError, match="n_chunks=8 does not match"):
        C.run_checkpointed(spark, pages, out, n_chunks=8)


def test_empty_input_commits_zero_row_states(spark, tmp_path):
    """Regression: a first run whose todo chunks produced zero rows used to
    crash on the unreadable empty data dir and wedge resume forever."""
    from dataquality_spark import checkpoint as C
    pages = generate_pages(spark, 100, seed=3, partitions=2).where("1=0")
    out = str(tmp_path / "run")
    summary = C.run_checkpointed(spark, pages, out, n_chunks=3)
    assert summary["completed"] == [0, 1, 2]
    for row in C.lineage(out):
        assert row["rows_in"] == 0 and row["rows_kept"] == 0
    # and the resume is a clean no-op
    again = C.run_checkpointed(spark, pages, out, n_chunks=3)
    assert again == {"processed": [], "completed": [0, 1, 2]}
