"""Column-parameterized per-row rule kernels — the reference's generic test
flags as reusable Spark expressions.

These are the exact flag semantics of the reference's per-row tests, each a
pure native expression (no UDF except the CPython-strptime parity mode), so
they fuse into whatever projection the caller builds — the same expressions
back the oracle queries in ``queries.py``; this module gives them the
column-parameterized API shape the reference exposes (pass column names +
thresholds per test, `dimensions/*/..`).

Verified against the reference's OWN fixture dataset and golden reports in
``tests/test_reference_golden.py`` (`/root/reference/run_tests/
example_reports/`): every flag below reproduces the reference's published
flag values row-for-row on its own data.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def only_numbers_flag(col: Column) -> Column:
    """A1 (`dimensions/accuracy/a1.py:44-53` via `utils/column_operations.py:
    15-35`): True when the value is numerically coercible OR null/blank
    (null counts as valid — the reference pre-flags null/blank and scores
    only the rest); False only for present, non-numeric values."""
    s = col.cast("string")
    blank = col.isNull() | (F.trim(s) == "")
    return blank | s.try_cast("double").isNotNull()


def chronology_flag(start: Column, end: Column) -> Column:
    """A4 out-of-order flag (`dimensions/accuracy/a4.py:40-47`):
    True when end < start; null on either side is valid (False)."""
    return ~((end >= start) | end.isNull() | start.isNull())


def datetime_invalid_flag(col: Column, fmt: str) -> Column:
    """C4 (`dimensions/consistency/c4.py:43-46`): True when the non-null
    value does not parse under CPython ``strptime(fmt)`` — strptime itself
    runs inside the Arrow UDF for exact parity (SURVEY §7.3 #2); null in →
    null out (the reference computes flags on the dropna'd frame, leaving
    NaN flags for null rows)."""
    from dataquality_spark.functions.datetime_check import strptime_invalid_udf
    return F.when(col.isNotNull(),
                  strptime_invalid_udf(fmt)(col.cast("string")))


def range_invalid_flag(col: Column, lo: float, hi: float) -> Column:
    """C5 (`dimensions/consistency/c5.py:56-67`): True when the non-null
    value falls outside [lo, hi]; null in → null out."""
    return F.when(col.isNotNull(), ~col.between(F.lit(lo), F.lit(hi)))


def rowsum_mismatch_flag(component_cols: list[Column], total: Column) -> Column:
    """A3 (`dimensions/accuracy/a3.py:39-46`): True when the null-as-zero
    row-wise sum of components does not equal the null-as-zero total."""
    s = None
    for c in component_cols:
        term = F.coalesce(c, F.lit(0))
        s = term if s is None else s + term
    return s != F.coalesce(total, F.lit(0))
