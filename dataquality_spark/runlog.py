"""Run-log sink — the append-only analogue of the reference's XLSX output log.

The reference appends one row per test run to ``DQS_Output_Log_Test.xlsx``
with a fixed column set, re-reading and re-writing the whole workbook each
time (`utils/core_operations.py:73-137` — O(log²) per run). Here the same
schema appends as snapshots on a ManifestCatalog table (S-6 → SURVEY.md §2.1).

The one-line summary synthesis replaces the reference's 137-line 16-way
if-chain (`utils/core_operations.py:152-289`, X-11) with a per-rule template
registry.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from dataquality_spark.catalog import ManifestCatalog

RUN_LOG_COLUMNS = [
    "Dataset", "Dimension", "Test", "Selected_Columns", "Threshold", "Score",
    "Run_Time_and_Date", "New_or_Existing_Test", "One_Line_Summary",
    "Errors", "Why_Did_the_Test_Fail",
]

# rule_id → (dimension, summary template over pass/fail counts)
_SUMMARIES: dict[str, tuple[str, str]] = {
    "nonempty": ("completeness", "{fail} of {total} documents have null/blank text"),
    "min_words": ("accuracy", "{fail} of {total} documents fall below the minimum word count"),
    "max_words": ("accuracy", "{fail} of {total} documents exceed the maximum word count"),
    "mean_word_len": ("accuracy", "{fail} of {total} documents have implausible mean word length"),
    "alpha_ratio": ("accuracy", "{fail} of {total} documents are mostly non-alphabetic"),
    "symbol_ratio": ("accuracy", "{fail} of {total} documents are symbol-heavy"),
    "stopword_ratio": ("consistency", "{fail} of {total} documents lack natural stop-word density"),
    "dup_lines": ("uniqueness", "{fail} of {total} documents are dominated by repeated lines"),
    "lang_match": ("consistency", "{fail} of {total} documents contradict their claimed language"),
    "perplexity": ("accuracy", "{fail} of {total} documents score outside the language-model band"),
    "dedup": ("uniqueness", "{fail} of {total} documents are non-winning exact duplicates"),
}


def one_line_summary(rule_id: str, pass_count: int, fail_count: int) -> str:
    dim, tmpl = _SUMMARIES.get(
        rule_id, ("quality", "{fail} of {total} documents fail rule " + rule_id))
    return tmpl.format(fail=fail_count, total=pass_count + fail_count)


def rule_dimension(rule_id: str) -> str:
    return _SUMMARIES.get(rule_id, ("quality", ""))[0]


def append_run_log(spark: SparkSession, cat: ManifestCatalog,
                   dataset: str, metrics_rows: list[dict],
                   table: str = "run_log", is_standard: bool = True,
                   now: datetime.datetime | None = None) -> str:
    """metrics_rows: dicts with rule_id/pass_count/fail_count/score (the
    pipeline_metrics schema). Returns the new snapshot id.

    The ``New_or_Existing_Test`` column holds ``Standard``/``Custom`` —
    the reference's own quirk (the column NAME says new/existing but
    `core_operations.py:100` writes standard-or-custom values); preserved
    verbatim so exported logs are drop-in compatible."""
    ts = (now or datetime.datetime.now(datetime.timezone.utc)).strftime(
        "%Y-%m-%d %H:%M:%S")
    rows = []
    for m in metrics_rows:
        rows.append({
            "Dataset": dataset,
            "Dimension": rule_dimension(m["rule_id"]),
            "Test": m["rule_id"],
            "Selected_Columns": "text",
            "Threshold": float(m.get("threshold") or 0.0),
            "Score": float(m["score"]) if m["score"] is not None else None,
            "Run_Time_and_Date": ts,
            "New_or_Existing_Test": "Standard" if is_standard else "Custom",
            "One_Line_Summary": one_line_summary(
                m["rule_id"], m["pass_count"], m["fail_count"]),
            "Errors": m.get("errors"),
            "Why_Did_the_Test_Fail": m.get("why_failed"),
        })
    pdf = pd.DataFrame(rows, columns=RUN_LOG_COLUMNS)
    # EXPLICIT schema, never inference: a snapshot whose Errors/Why/Score
    # values are all None would otherwise land as NullType parquet, and a
    # later typed append makes every subsequent whole-table read fail with
    # PARQUET_COLUMN_DATA_TYPE_MISMATCH (reproduced); empty metrics_rows
    # would fail inference outright
    schema = ("Dataset string, Dimension string, Test string, "
              "Selected_Columns string, Threshold double, Score double, "
              "Run_Time_and_Date string, New_or_Existing_Test string, "
              "One_Line_Summary string, Errors string, "
              "Why_Did_the_Test_Fail string")
    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                                schema=schema)
    return cat.write(sdf, table, mode="append",
                     summary={"dataset": dataset, "rules": len(rows)})


def read_run_log(spark: SparkSession, cat: ManifestCatalog,
                 table: str = "run_log") -> DataFrame:
    return cat.read(spark, table)


def export_run_log_xlsx(spark: SparkSession, cat: ManifestCatalog,
                        path: str, table: str = "run_log") -> None:
    """Write the run log as a reference-format ``DQS_Output_Log`` workbook
    (S-6 interop): same column roster, Score as the reference's percentage
    string (`core_operations.py:76-79` — falsy score → '0%'), Threshold as
    the value or the literal 'no threshold' (`:86`). A file produced here
    reads back with both this repo's reader and the reference's pandas
    ``read_data``."""
    from dataquality_spark.sources.xlsx import write_xlsx
    pdf = read_run_log(spark, cat, table).toPandas()[RUN_LOG_COLUMNS]
    pdf["Score"] = pdf["Score"].map(
        lambda v: "0%" if v is None or pd.isna(v) or not v
        else f"{float(v) * 100:.2f}%")
    pdf["Threshold"] = pdf["Threshold"].map(
        lambda v: v if v else "no threshold")
    write_xlsx(pdf, path, sheet_name="Sheet1")
