"""Engine facade — the reference workbench's query lifecycle on Spark.

Re-expresses the run path of ``/root/reference/src/App.tsx:424-446``:
statement selection (A6) → dispatch (A7, ``spark.sql``) → 200-row preview +
true count (A10) → canonical cell text (A14) → optional client-side
filter/sort over the *displayed* rows only (A11/A12).

Deliberate scale improvement kept from SURVEY §2.A10: the reference
materializes the FULL result and then slices 200 rows; here the preview is
``df.limit(200)`` (pushed into the plan — TakeOrderedAndProject / CollectLimit)
plus a separate ``count()``, so a 100 TB result never lands on the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from parquet_query_spark.session import get_spark
from parquet_query_spark.sources.registry import register_folder
from parquet_query_spark.workbench.csv_sink import export_csv, write_csv_distributed
from parquet_query_spark.workbench.formatting import format_cell
from parquet_query_spark.workbench.statements import (
    has_executable_text,
    rewrite_path_tables,
    split_statements,
    statement_at_position,
)

PREVIEW_LIMIT = 200  # src/App.tsx:435


@dataclass
class Result:
    """Preview tuple the reference UI consumes (columns, rows, true count)."""

    columns: list[str]
    rows: list[list[str]]  # ≤ PREVIEW_LIMIT, formatCell-canonical strings
    num_rows: int
    df: DataFrame = field(repr=False, default=None)


_NUMERIC = re.compile(r"^-?\d+(\.\d+)?$")
_DATEISH = re.compile(r"[-T:]")


def _compare_key(value: str):
    """Comparator semantics of ``compareCells`` (src/App.tsx:456-480):
    numeric strings compare numerically; date-ish strings by parsed date;
    empties sort last; else case-insensitive natural-ish compare."""
    if value == "":
        return (3, 0, "")
    if _NUMERIC.match(value):
        return (0, float(value), "")
    if _DATEISH.search(value):
        try:
            import datetime as _dt

            ts = _dt.datetime.fromisoformat(value.rstrip("Z")).timestamp()
            return (1, ts, "")
        except ValueError:
            pass
    return (2, 0, value.lower())


def filter_rows(rows: list[list[str]], needle: str) -> list[list[str]]:
    """A11 — case-insensitive substring match across displayed cells only."""
    if not needle:
        return rows
    low = needle.lower()
    return [r for r in rows if any(low in c.lower() for c in r)]


def sort_rows(
    rows: list[list[str]], columns: list[str], column: str, direction: str = "asc"
) -> list[list[str]]:
    """A12 — stable sort of displayed rows by one column (asc/desc)."""
    if column not in columns or direction not in ("asc", "desc"):
        return rows
    idx = columns.index(column)
    return sorted(rows, key=lambda r: _compare_key(r[idx]), reverse=direction == "desc")


class Engine:
    """``Engine.open(folder)`` → ``run(sql)`` — the reference workbench on Spark."""

    def __init__(self, spark: SparkSession | None = None, root: str | None = None):
        self.spark = spark or get_spark()
        self.root = root
        self.registry: dict[str, DataFrame] = {}

    @classmethod
    def open(
        cls,
        folder: str,
        table_name: str | None = None,
        spark: SparkSession | None = None,
    ) -> "Engine":
        eng = cls(spark=spark, root=folder)
        eng.registry = register_folder(eng.spark, folder, table_name)
        return eng

    # A7 — materializing execute
    def sql(self, statement: str) -> DataFrame:
        from parquet_query_spark.sources.registry import view_name_for_path

        registered = {path: view_name_for_path(path) for path in self.registry}
        return self.spark.sql(rewrite_path_tables(statement, self.root, registered))

    # A6 + A7 + A10 + A14 — the full run path
    def run(
        self,
        sql: str,
        cursor: int | None = None,
        limit: int = PREVIEW_LIMIT,
        with_count: bool = True,
    ) -> Result:
        statement = (
            statement_at_position(sql, cursor) if cursor is not None else None
        ) or (split_statements(sql)[0] if split_statements(sql) else sql.strip())
        if not has_executable_text(statement):
            # reference UI no-ops on an empty buffer; surface a clear error
            # instead of Spark's raw PARSE_EMPTY_STATEMENT
            raise ValueError("no SQL statement to run (buffer is empty)")
        df = self.sql(statement)
        preview = df.limit(limit).collect()
        rows = [[format_cell(v) for v in row] for row in preview]
        if with_count:
            num_rows = df.count() if len(rows) >= limit else len(rows)
        else:
            num_rows = len(rows)
        return Result(columns=list(df.columns), rows=rows, num_rows=num_rows, df=df)

    def run_script(self, sql: str) -> list[Result]:
        """B27 — execute every statement of a multi-statement script."""
        return [self.run(stmt) for stmt in split_statements(sql)]

    # A8 — effect-only execute
    def exec(self, statement: str) -> None:
        self.sql(statement)

    # A13 — CSV sinks
    def export_csv(self, sql: str, path: str, distributed: bool = False) -> int:
        df = self.sql(sql)
        if distributed:
            write_csv_distributed(df, path)
            return -1
        return export_csv(df, path)
