"""Datetime-format validation with CPython ``strptime`` parity (X-4).

The reference validates datetime strings with ``datetime.strptime`` and
catches ``ValueError`` (`utils/item_operations.py:54-60`). Spark's
``to_timestamp``/``try_cast`` use JDK datetime patterns whose semantics
differ from CPython's in known corners (e.g. ``%Y-%m-%d`` accepts
``2024-2-3`` — no zero padding required — while the strict JDK
``yyyy-MM-dd`` rejects it; ``%y`` pivots differently). SURVEY §7.3 hard
part #2: for reference-exact results, keep ``strptime`` itself inside an
Arrow-batched UDF instead of translating format strings.

The SQL-expressible ``try_cast`` form remains the default for the generic
ISO case (oracle query ``date_format_check``); this UDF is the exact-parity
mode for reference-format workloads.
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F


def inconsistent_datetime_py(date_str: str, fmt: str) -> bool:
    """Scalar spec — direct transcription of the reference
    (`item_operations.py:54-60`): True when the string does NOT match."""
    try:
        datetime.strptime(date_str, fmt)
        return False
    except ValueError:
        return True


def strptime_invalid_udf(fmt: str):
    """pandas UDF: string column → True where the value does not parse under
    CPython ``strptime(fmt)``; null in → null out (the reference would
    TypeError on None — the engine treats missing as "no evidence", the
    F-4/P1 null-handling convention)."""

    @F.pandas_udf("boolean")
    def invalid(s: pd.Series) -> pd.Series:
        out = []
        for v in s:
            out.append(None if v is None
                       else inconsistent_datetime_py(str(v), fmt))
        return pd.Series(out, dtype=object)

    return invalid
