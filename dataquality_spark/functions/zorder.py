"""Z-order (Morton) keys for multi-dimensional data layout.

At 100 TB, scan pruning is the cheapest optimization there is — but
min/max row-group statistics only prune on the SORT column. Writing files
ordered by an interleaved-bit key keeps BOTH dimensions locally clustered,
so range predicates on either column skip most row groups (the same idea
as Delta/Iceberg ``OPTIMIZE ZORDER BY``; public technique, Morton 1966).

The key is pure native expressions — the classic magic-number bit spread
(each step doubles the gaps between bits), then interleave. Works on any
engine with shifts/and/or, which is exactly what the DuckDB oracle checks:
the SQL below is the same arithmetic, so key values must agree bit-for-bit.

``zorder_key2`` interleaves two 16-bit dimensions into a 32-bit key.
Callers quantize wider domains first (`F.ntile`/bucketize or a right
shift); layout keys need locality, not exactness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_STEPS = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333),
                 (1, 0x55555555)]


def _spread16(x: Column) -> Column:
    """16-bit value → its bits at even positions of a 32-bit word."""
    x = x.bitwiseAND(F.lit(0xFFFF)).cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key2(a: Column, b: Column) -> Column:
    """Morton-interleave two 16-bit dimensions: bit i of ``a`` lands at
    position 2i, bit i of ``b`` at 2i+1."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_key2_py(a: int, b: int) -> int:
    """Scalar spec (test oracle)."""
    out = 0
    for i in range(16):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def sql_zorder_key2(a_expr: str, b_expr: str) -> str:
    """The identical arithmetic as ANSI/DuckDB SQL (engine-portable).

    Emitted as a chain of nested scalar subqueries so each input
    expression appears exactly ONCE (the naive textual substitution
    doubled the operand per spread step — 16 copies each), and the base
    is CAST to BIGINT: the Spark side spreads longs, and on a 32-bit
    INTEGER input the final ``<< 1`` overflows int32 in DuckDB
    (verified: b >= 32768 raised OutOfRangeException before the cast)."""

    def spread(e: str, alias: str) -> str:
        inner = f"SELECT CAST(({e}) AS BIGINT) & 65535 AS v0"
        for i, (shift, mask) in enumerate(_SPREAD_STEPS):
            inner = (f"SELECT (v{i} | (v{i} << {shift})) & {mask} "
                     f"AS v{i + 1} FROM ({inner})")
        n = len(_SPREAD_STEPS)
        return f"(SELECT v{n} FROM ({inner}) {alias})"

    return f"({spread(a_expr, '_za')} | ({spread(b_expr, '_zb')} << 1))"


def write_zordered(df: DataFrame, path: str, a: str, b: str,
                   files: int = 64) -> None:
    """Layout write: repartitionByRange on the Morton key → each output
    file covers a compact 2-D tile, so min/max stats prune on either
    dimension. (Range partitioning samples the key distribution; no
    driver-side sort.)"""
    keyed = df.withColumn("_zkey", zorder_key2(F.col(a), F.col(b)))
    (keyed.repartitionByRange(files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey")
     .write.mode("overwrite").parquet(path))
