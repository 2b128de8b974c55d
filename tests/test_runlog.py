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


def test_export_run_log_xlsx_reference_format(spark, tmp_path):
    """Exported workbook carries the reference log schema with its exact
    Score/Threshold string conventions, and round-trips through the repo's
    own XLSX reader."""
    from dataquality_spark.catalog import ManifestCatalog
    from dataquality_spark.runlog import append_run_log, export_run_log_xlsx
    from dataquality_spark.sources.xlsx import read_xlsx_pdf
    cat = ManifestCatalog(str(tmp_path / "cat"))
    append_run_log(spark, cat, "corpus_v1", [
        {"rule_id": "min_words", "pass_count": 7, "fail_count": 4,
         "score": 7 / 11},
        {"rule_id": "dedup", "pass_count": 5, "fail_count": 0, "score": None},
    ])
    p = str(tmp_path / "DQS_Output_Log_Test.xlsx")
    export_run_log_xlsx(spark, cat, p)
    back = read_xlsx_pdf(p)
    from dataquality_spark.runlog import RUN_LOG_COLUMNS
    assert list(back.columns) == RUN_LOG_COLUMNS
    by_test = back.set_index("Test")
    assert by_test.loc["min_words", "Score"] == "63.64%"
    assert by_test.loc["dedup", "Score"] == "0%"
    assert by_test.loc["min_words", "Threshold"] == "no threshold"


def test_append_all_none_then_typed_errors_reads_back(spark, tmp_path):
    """Regression: schema inference made an all-None Errors/Score snapshot
    NullType parquet, and a later typed append broke every whole-table
    read with a parquet type mismatch."""
    from dataquality_spark.catalog import ManifestCatalog
    from dataquality_spark.runlog import append_run_log, read_run_log
    cat = ManifestCatalog(str(tmp_path))
    base = {"pass_count": 9, "fail_count": 1, "score": None}
    append_run_log(spark, cat, "d1",
                   [{"rule_id": "min_words", **base}])        # all-None cols
    append_run_log(spark, cat, "d2",
                   [{"rule_id": "dedup", **base, "score": 0.5,
                     "errors": "boom", "why_failed": "because"}])
    rows = read_run_log(spark, cat).collect()
    assert len(rows) == 2
    by = {r["Dataset"]: r for r in rows}
    assert by["d1"]["Errors"] is None and by["d1"]["Score"] is None
    assert by["d2"]["Errors"] == "boom" and by["d2"]["Score"] == 0.5
    # empty metrics list must also not crash inference
    append_run_log(spark, cat, "d3", [])
    assert read_run_log(spark, cat).count() == 2
