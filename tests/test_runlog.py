"""Run-log sink: append-only snapshots with the reference's fixed columns
(`utils/core_operations.py:110-125` schema parity)."""

import datetime

from dataquality_spark.catalog import ManifestCatalog
from dataquality_spark.runlog import RUN_LOG_COLUMNS, append_run_log, read_run_log

ROWS1 = [
    {"rule_id": "nonempty", "pass_count": 95, "fail_count": 5, "score": 0.95},
    {"rule_id": "dedup", "pass_count": 80, "fail_count": 20, "score": 0.8},
]
ROWS2 = [
    {"rule_id": "lang_match", "pass_count": 90, "fail_count": 10, "score": 0.9},
]

NOW = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)


def test_append_and_schema(spark, tmp_path):
    cat = ManifestCatalog(str(tmp_path))
    append_run_log(spark, cat, "ds1", ROWS1, now=NOW)
    append_run_log(spark, cat, "ds2", ROWS2, now=NOW)
    log = read_run_log(spark, cat)
    assert log.columns == RUN_LOG_COLUMNS
    pdf = log.toPandas()
    assert len(pdf) == 3  # append, not overwrite
    row = pdf[pdf.Test == "nonempty"].iloc[0]
    assert row["Dimension"] == "completeness"
    assert row["One_Line_Summary"] == "5 of 100 documents have null/blank text"
    assert row["Score"] == 0.95
    assert len(cat.snapshots("run_log")) == 2
