"""DuckDB ``UNION [ALL] BY NAME`` (src/duckdb.ts:46-49 pass-through).

Spark SQL has no BY NAME spelling (the engine-side equivalent is
``DataFrame.unionByName(allowMissingColumns=True)``), so the statement is
split at its top-level ``UNION [ALL] BY NAME`` separators, each branch
runs through ``Engine.sql`` (so nested dialect constructs keep working),
and the results fold left with ``unionByName`` — missing columns become
NULL, column order is the left branch's schema then new names appended,
exactly DuckDB's output (probed: ``SELECT 2 AS b, 1 AS a UNION BY NAME
SELECT 1 AS a, 2 AS b`` → columns ``b, a``, one row after dedup).

A top-level ``ORDER BY`` / ``LIMIT`` / ``OFFSET`` tail after the last
branch belongs to the whole union (standard SQL reading); it is cut off
and applied over the combined result through a per-invocation unique temp
view (monotonic counter — the ADVICE r6 fixed-name clobber lesson).

Plain ``UNION`` / ``INTERSECT`` / ``EXCEPT`` inside a branch stay in the
branch's text and bind tighter, matching DuckDB's left-associative
grouping.  DuckDB's parser (bundled build) rejects ``INTERSECT BY NAME``
/ ``EXCEPT BY NAME``, so only UNION is handled here.
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame

from parquet_query_spark.workbench.dialect import (
    _code_mask,
    _depths,
    _keyword_matches,
)

_UNION_BY_NAME = r"\bUNION\s+(ALL\s+)?BY\s+NAME\b"
_TAIL_KW = r"\bORDER\s+BY\b|\bLIMIT\b|\bOFFSET\b"

_view_counter = itertools.count()

INSERT_BY_NAME = re.compile(
    r"^\s*INSERT\s+INTO\s+([A-Za-z_][\w.]*)\s+BY\s+NAME\b(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def run_insert_by_name(engine, sql: str) -> DataFrame:
    """DuckDB ``INSERT INTO t BY NAME <query>`` — the query's output
    columns match the target by NAME, any unmentioned target column
    fills with NULL (probed).  Spark's column-list INSERT has exactly
    those semantics, so the query runs through ``Engine.sql`` (keeping
    every dialect construct) and lands via
    ``INSERT INTO t (cols) SELECT * FROM <unique temp view>``."""
    m = INSERT_BY_NAME.match(sql)
    table, query = m.group(1), m.group(2).strip().rstrip(";")
    df = engine.sql(query)
    view = f"__insert_by_name_{next(_view_counter)}"
    df.createOrReplaceTempView(view)
    cols = ", ".join(f"`{c}`" for c in df.columns)
    return engine.spark.sql(
        f"INSERT INTO {table} ({cols}) SELECT * FROM {view}"
    )


def _top_level_matches(sql: str, pattern: str) -> list[re.Match]:
    mask = _code_mask(sql)
    depths = _depths(sql, mask)
    return [
        m for m in _keyword_matches(sql, mask, pattern) if depths[m.start()] == 0
    ]


def has_union_by_name(sql: str) -> bool:
    return bool(_top_level_matches(sql, _UNION_BY_NAME))


def run_union_by_name(engine, sql: str) -> DataFrame:
    seps = _top_level_matches(sql, _UNION_BY_NAME)
    branches: list[str] = []
    all_flags: list[bool] = []
    pos = 0
    for m in seps:
        branches.append(sql[pos : m.start()])
        all_flags.append(bool(m.group(1)))
        pos = m.end()
    last = sql[pos:]
    tail = ""
    tails = _top_level_matches(last, _TAIL_KW)
    if tails:
        tail = last[tails[0].start() :].strip().rstrip(";")
        last = last[: tails[0].start()]
    branches.append(last)

    combined = engine.sql(branches[0])
    for is_all, branch in zip(all_flags, branches[1:]):
        combined = combined.unionByName(
            engine.sql(branch), allowMissingColumns=True
        )
        if not is_all:
            combined = combined.distinct()
    if tail:
        view = f"__union_by_name_{next(_view_counter)}"
        combined.createOrReplaceTempView(view)
        # through engine.sql so the tail gets the dialect treatment too
        # (NULLS LAST alignment, function renames, ...)
        return engine.sql(f"SELECT * FROM {view} {tail}")
    return combined
