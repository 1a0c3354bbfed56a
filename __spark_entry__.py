"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 inventory +
LLM-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible operators: sketches, LSH-ANN, SimHash,
frame sampling).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    from parquet_query_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    catalog = _catalog()
    return catalog["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    catalog = _catalog()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from parquet_query_spark.session import ensure_session_confs

            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in catalog.items()}


def oracle_sql() -> dict[str, str]:
    catalog = _catalog()
    return {name: spec.oracle for name, spec in catalog.items() if spec.oracle}
