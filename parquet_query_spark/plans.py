"""Plan-inspection helpers (used by tests to assert pushdown/broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()
