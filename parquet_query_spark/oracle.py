"""DuckDB differential-oracle harness (mirrors the driver's t2 check).

For every catalog entry with an ``oracle`` SQL string, run the Spark query
and the DuckDB SQL over the same parquet files and compare:

1. row count,
2. column names (sorted),
3. the multiset of rows, canonicalized to strings (columns sorted by name,
   floats via repr, timestamps via isoformat) — an order-insensitive
   value comparison, strict (no tolerance), like a hash compare.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from parquet_query_spark.sources.registry import TESTDATA_TABLES


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):  # multi-file table (streaming split fixtures)
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}/*.parquet'"
            )
        elif os.path.exists(path):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon_value(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"  # -0.0 == 0.0
        return repr(v)
    if isinstance(v, (int, Decimal)):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (a tuple subclass) ↔ DuckDB dict
        return canon_value(v.asDict())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Sort columns by name (driver semantics), canonicalize, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon_value(row[i]) for i in order) for row in rows)


def spark_result(df: DataFrame) -> tuple[list[str], list[tuple]]:
    return list(df.columns), [tuple(r) for r in df.collect()]


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(
    spark: SparkSession, sf_dir: str, df: DataFrame, oracle_sql: str, con=None
) -> dict:
    """Run both sides; return a comparison report dict."""
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        s_cols, s_rows = spark_result(df)
        d_cols, d_rows = duckdb_result(con, oracle_sql)
    finally:
        if own_con:
            con.close()
    report = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duckdb": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
    }
    if report["count_match"] and report["schema_match"]:
        cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
        report["value_match"] = cs == cd
        if not report["value_match"]:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b]
            report["first_diffs"] = diff[:5]
    else:
        report["value_match"] = False
    report["match"] = report["count_match"] and report["schema_match"] and report["value_match"]
    return report
