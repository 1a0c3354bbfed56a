"""DuckDB-style ``SUMMARIZE`` for the workbench pass-through tier.

The reference forwards user SQL to DuckDB untouched
(``/root/reference/src/duckdb.ts:46-49``), so ``SUMMARIZE tbl`` /
``SUMMARIZE SELECT ...`` work there out of the box.  This module gives
``Engine.run`` the same statement: one distributed aggregation pass over
the input producing DuckDB's column profile (column_name, column_type,
min, max, approx_unique, avg, std, q25/q50/q75, count, null_percentage).

Design for scale: the whole profile is ONE ``df.agg`` — every stat is a
partial-aggregatable expression (min/max/count/approx_count_distinct/
avg/stddev/approx-percentile), so the pass is map-side combined and the
shuffle carries one partial row per partition regardless of input size;
the final explode is over a schema-width array, not data.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUMMARIZE = re.compile(r"^\s*SUMMARIZE\b", re.IGNORECASE)


def _null_str():
    # built per-call: a Column needs an active SparkContext, which is not
    # guaranteed at import time
    return F.lit(None).cast("string")


def summarize_statement_body(statement: str) -> str | None:
    """If ``statement`` is a SUMMARIZE, return the inner query text
    (``SUMMARIZE t`` → ``SELECT * FROM t``); else None."""
    m = _SUMMARIZE.match(statement)
    if not m:
        return None
    rest = statement[m.end() :].strip().rstrip(";").strip()
    if not rest:
        raise ValueError("SUMMARIZE needs a table name or a SELECT query")
    if re.match(r"^(SELECT|WITH|VALUES)\b", rest, re.IGNORECASE):
        return rest
    if re.match(r"^FROM\b", rest, re.IGNORECASE):
        return f"SELECT * {rest}"
    return f"SELECT * FROM {rest}"


def _is_orderable(dt: T.DataType) -> bool:
    return isinstance(
        dt,
        (
            T.NumericType,
            T.StringType,
            T.DateType,
            T.TimestampType,
            T.TimestampNTZType,
            T.BooleanType,
        ),
    )


def summarize(df: DataFrame) -> DataFrame:
    """Per-column profile of ``df`` (DuckDB SUMMARIZE shape)."""
    structs = []
    total = F.count(F.lit(1))
    for i, field in enumerate(df.schema.fields):
        c = F.col(f"`{field.name}`")
        numeric = isinstance(field.dataType, T.NumericType)
        orderable = _is_orderable(field.dataType)
        if numeric:
            quants = F.percentile_approx(c, [0.25, 0.5, 0.75])
            q25, q50, q75 = (quants[j].cast("string") for j in range(3))
            avg = F.avg(c).cast("string")
            std = F.stddev_samp(c).cast("string")
        else:
            q25 = q50 = q75 = _null_str()
            avg = std = _null_str()
        structs.append(
            F.struct(
                F.lit(field.name).alias("column_name"),
                F.lit(field.dataType.simpleString().upper()).alias("column_type"),
                (F.min(c).cast("string") if orderable else F.min(_null_str())).alias("min"),
                (F.max(c).cast("string") if orderable else F.max(_null_str())).alias("max"),
                F.approx_count_distinct(c).cast("bigint").alias("approx_unique"),
                avg.alias("avg"),
                std.alias("std"),
                q25.alias("q25"),
                q50.alias("q50"),
                q75.alias("q75"),
                total.cast("bigint").alias("count"),
                F.round(
                    F.lit(100.0) * (total - F.count(c)) / F.greatest(total, F.lit(1)),
                    2,
                )
                .cast("double")
                .alias("null_percentage"),
            ).alias(f"__summ_{i}")
        )
    wide = df.agg(*structs)
    return wide.select(
        F.explode(F.array(*[F.col(f"__summ_{i}") for i in range(len(structs))])).alias(
            "s"
        )
    ).select("s.*")
