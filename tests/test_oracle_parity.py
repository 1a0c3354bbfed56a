"""Differential oracle tests — every catalog query with an oracle must match
DuckDB on the same data (mirrors the driver's CORRECTNESS gate).

Runs at sf0.01 by default (same SF the driver uses) — override with
SPARK_GRAFT_ORACLE_SF_DIR.
"""

import os

import pytest

from parquet_query_spark.operators.catalog import load_all
from parquet_query_spark.oracle import compare, duckdb_connection

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

CATALOG = load_all()
ORACLE_QUERIES = [name for name, spec in CATALOG.items() if spec.oracle]
WEAK_QUERIES = [name for name, spec in CATALOG.items() if not spec.oracle]


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(ORACLE_SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, con, name):
    spec = CATALOG[name]
    df = spec.fn(spark, ORACLE_SF_DIR)
    report = compare(spark, ORACLE_SF_DIR, df, spec.oracle, con=con)
    assert report["match"], f"{name}: {report}"


@pytest.mark.parametrize("name", WEAK_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = CATALOG[name]
    df = spec.fn(spark, ORACLE_SF_DIR)
    assert df.count() >= 0
    assert df.columns
