"""Multi-format input dispatch — the reference's ``read_data`` re-expressed.

Parity target: `/root/reference/utils/core_operations.py:50-70` — DataFrame
passthrough (S-3), ``.csv`` with utf-8-sig then cp1252 fallback (S-1),
``.xlsx`` first sheet (S-2). Everything else is Parquet (the engine's native
fact-table format; the reference has no third format).

The encoding fallback is probed driver-side on a file prefix: Spark's CSV
reader replaces undecodable bytes instead of raising, so the reference's
try/except UnicodeDecodeError shape must be decided before the distributed
read. utf-8-sig's BOM survives Spark's header parse as a ``\\ufeff`` prefix
on the first column name; it is stripped to match pandas semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataquality_spark.sources.xlsx import read_xlsx

_PROBE_BYTES = 1 << 20

# Spark's CSV reader whitelists charsets (no cp1252). iso-8859-1 decodes the
# same single bytes, differing from cp1252 only at the 27 defined codepoints
# in 0x80-0x9F (smart quotes, euro, dashes, ...) — fixed up post-read with a
# distributed translate, so the fallback never funnels data through the driver.
_CP1252_DEFINED = [i for i in range(0x80, 0xA0)
                   if i not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)]
_LATIN1_CHARS = "".join(chr(i) for i in _CP1252_DEFINED)
_CP1252_CHARS = bytes(_CP1252_DEFINED).decode("cp1252")


def _is_utf8(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            head = f.read(_PROBE_BYTES)
    except OSError:
        # non-local URI (s3a://…) or a directory of part files — both are
        # things spark.read.csv handles itself; assume utf-8 and let the
        # distributed read decide rather than crashing on a driver open()
        return True
    try:
        head.decode("utf-8")
        return True
    except UnicodeDecodeError as e:
        # a multi-byte sequence truncated by the probe boundary is NOT
        # evidence of a non-UTF-8 file (a UTF-8 char is at most 4 bytes)
        return len(head) == _PROBE_BYTES and e.start >= len(head) - 3


def read_data(spark: SparkSession, dataset, name: str | None = None) -> DataFrame:
    """S-1/S-2/S-3 scan dispatch. ``name`` carries the extension when the
    path itself has none (the reference's Streamlit-upload case,
    `core_operations.py:55-58`)."""
    if isinstance(dataset, DataFrame):
        return dataset
    _, ext = os.path.splitext(name if name else dataset)
    if ext == ".csv":
        utf8 = _is_utf8(dataset)
        df = (spark.read.option("header", True).option("inferSchema", True)
              .option("encoding", "UTF-8" if utf8 else "iso-8859-1")
              .csv(dataset))
        if df.columns:  # zero-byte/whitespace files parse to no columns
            first = df.columns[0]
            if first.startswith("﻿"):
                df = df.withColumnRenamed(first, first.lstrip("﻿"))
        if not utf8:
            tr = str.maketrans(_LATIN1_CHARS, _CP1252_CHARS)
            df = df.select(*[
                F.translate(F.col(f"`{c}`"), _LATIN1_CHARS, _CP1252_CHARS)
                 .alias(c.translate(tr))
                if t == "string" else F.col(f"`{c}`").alias(c.translate(tr))
                for c, t in df.dtypes])
        return df
    if ext == ".xlsx":
        return read_xlsx(spark, dataset)
    return spark.read.parquet(dataset)
