"""Local mirror of the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir, compare row count,
column-name set, per-column canonical TYPE (the driver's value hash is
type-sensitive: DuckDB HUGEINT/DECIMAL sums hash differently from Spark
BIGINT even when the Python values are equal — round-1 lesson), and an
order-insensitive value multiset (columns sorted by name, floats normalized).
Usage:

    python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6g}"
    except Exception:
        pass
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


# Canonical type classes. int32 vs int64 is tolerated (driver r1 evidence:
# heuristic_gate passed with Spark INT vs DuckDB BIGINT), but HUGEINT and
# DECIMAL are NOT ints — they surface as float64/object in pandas and break
# the driver's value hash.
def spark_type_class(dt) -> str:
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return "list"
    return dt.simpleString()


def duck_type_class(tname: str) -> str:
    t = tname.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t == "HUGEINT" or t.startswith("DECIMAL") or t == "NUMBER":
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "STRING", "TEXT"):
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP") or t == "DATETIME":
        return "ts"
    if t.endswith("[]") or t.startswith("LIST"):
        return "list"
    return t


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from dataquality_spark import queries as Q
    from dataquality_spark.session import get_spark

    spark = get_spark(app_name="verify_queries")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    unknown = only - set(Q.QUERIES)
    if unknown:
        # a typo'd name must not report '0 failures' after checking nothing
        print(f"unknown query name(s): {sorted(unknown)}", flush=True)
        sys.exit(2)

    failures = []
    for name, fn in Q.QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        finally:
            # drain persists the query pinned (collect() above is the
            # terminal action, so the prefix-sum pin is releasable)
            Q.release_cached()
        sql = Q.ORACLE_SQL.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only, {len(s_rows)} rows")
            continue
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
            d_type_by_col = {r[0]: r[1] for r in desc}
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            s_tc = {f.name: spark_type_class(f.dataType) for f in sdf.schema}
            d_tc = {c: duck_type_class(str(d_type_by_col.get(c, "?")))
                    for c in d_cols}
            tdiff = [(c, s_tc[c], d_tc[c]) for c in sorted(s_tc)
                     if s_tc[c] != d_tc[c]]
            if tdiff:
                problems.append(f"type mismatch (driver hash-sensitive): {tdiff}")
        if not problems:
            a, b = canon(s_rows, s_cols), canon(d_rows, d_cols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(s_rows)} rows match")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
