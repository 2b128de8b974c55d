"""End-to-end gates: keep/drop F1 vs the pandas oracle (target ≥0.99,
BASELINE.md) and byte-identical scrubbed text per url."""

import pytest
from pyspark.sql import functions as F

from dataquality_spark import oracle, pipeline, spec
from dataquality_spark.synth import generate_pages

N = 2500


@pytest.fixture(scope="module")
def run(spark, artifacts):
    pages = generate_pages(spark, N, seed=42, partitions=8)
    cleanup = []
    ann = pipeline.run_pipeline(spark, pages, cleanup=cleanup)
    sp = (ann.select("url", "keep", "pre_dedup_pass", "scrubbed_text")
          .toPandas().sort_values("url").reset_index(drop=True))
    raw = pages.toPandas().sort_values("url").reset_index(drop=True)
    lab = oracle.full_labels(raw, artifacts["langid"], artifacts["lm"])
    met = pipeline.pipeline_metrics(ann).toPandas()
    for f in cleanup:
        f.unpersist()
    return sp, lab, met


def test_keep_f1(run):
    sp, lab, _ = run
    tp = (sp["keep"] & lab["keep"]).sum()
    fp = (sp["keep"] & ~lab["keep"]).sum()
    fn = (~sp["keep"] & lab["keep"]).sum()
    prec = tp / (tp + fp)
    rec = tp / (tp + fn)
    f1 = 2 * prec * rec / (prec + rec)
    assert f1 >= 0.99, (f1, int(fp), int(fn))


def test_scrub_byte_identity(run):
    sp, lab, _ = run
    got = sp["scrubbed_text"].fillna("\0")
    want = lab["scrubbed_text"].fillna("\0")
    assert (got == want).all()


def test_keep_rate_sane(run):
    sp, _, _ = run
    assert 0.4 < sp["keep"].mean() < 0.95


def test_metrics_cover_all_rules(run):
    _, _, met = run
    assert set(met["rule_id"]) == set(pipeline.PIPELINE_RULES)
    assert ((met["pass_count"] + met["fail_count"]) == N).all()


def test_decisions_schema(spark, artifacts):
    pages = generate_pages(spark, 200, seed=7, partitions=4)
    cleanup = []
    ann = pipeline.run_pipeline(spark, pages, cleanup=cleanup)
    dec = pipeline.decisions_table(ann)
    fields = dict(dec.dtypes)
    assert fields["keep"] == "boolean"
    assert fields["rules"] == "map<string,boolean>"
    assert fields["scores"] == "map<string,double>"
    assert fields["scrubbed_text"] == "string"
    rows = dec.limit(5).collect()
    assert all(set(r["rules"].keys()) == set(pipeline.PIPELINE_RULES)
               for r in rows)
    for f in cleanup:
        f.unpersist()


def test_pipeline_auto_salt(spark, artifacts):
    """salt_buckets='auto' picks the factor from the frequency sketch and
    produces the identical decisions frame (salt invariance end-to-end)."""
    from dataquality_spark.pipeline import run_pipeline
    from dataquality_spark.synth import generate_pages
    pages = generate_pages(spark, 400, seed=31, partitions=4)
    cleanup = []
    fixed = sorted((r["url"], r["keep"]) for r in run_pipeline(
        spark, pages, cleanup=cleanup).select("url", "keep").collect())
    auto = sorted((r["url"], r["keep"]) for r in run_pipeline(
        spark, pages, salt_buckets="auto", cleanup=cleanup)
        .select("url", "keep").collect())
    for f in cleanup:
        f.unpersist()
    assert fixed == auto
