"""Regression guard for the driver's pandas canonicalization path.

The driver compares Spark vs DuckDB results AFTER converting the DuckDB
result to pandas (``con.execute(sql).df()``).  DuckDB types ``SUM(int)``
as HUGEINT, and pandas has no 128-bit dtype, so HUGEINT columns silently
become **float64** — ``3`` hashes as ``3.0`` and the row mismatches even
though both engines computed identical values.  This bit five oracles in
round 4 (VERDICT r4 "What's wrong" #1) and q12 in round 1; the fix is
always ``CAST(SUM(...) AS BIGINT)`` in the oracle SQL.

The local parity harness (``tests/test_oracle_parity.py``) goes through
``fetchall()``, which yields exact Python ints for HUGEINT — so it can
NEVER catch this class.  This module closes the gap without running any
Spark query:

1. ``DESCRIBE`` every oracle — no result column may be HUGEINT/UHUGEINT
   (plan-only, catches the class at its source).
2. Execute every oracle at sf0.001 through ``.df()`` — no column DuckDB
   declares integral may come back floating (catches e.g. NULL-induced
   int→float64 promotion, the other way pandas degrades integers).

Plus one Spark-side sweep: each catalog query's *declared* schema (lazy,
no execution) must not contain a column the oracle types as
DOUBLE/FLOAT while Spark declares it integral — the driver canonicalizes
``3`` vs ``3.0`` differently, so such a pair can never hash-match.
"""

import os

import pytest

from parquet_query_spark.operators.catalog import load_all
from parquet_query_spark.oracle import duckdb_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

CATALOG = load_all()
ORACLED = [name for name, spec in CATALOG.items() if spec.oracle]

_DUCK_INTEGRAL = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_DIR)
    yield c
    c.close()


def _described_types(con, sql: str) -> dict[str, str]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: r[1] for r in rows}


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_declares_no_hugeint(con, name):
    """SUM(int) must be CAST to BIGINT in every oracle (plan-level check)."""
    types = _described_types(con, CATALOG[name].oracle)
    huge = {c: t for c, t in types.items() if "HUGEINT" in t.upper()}
    assert not huge, (
        f"{name}: oracle columns {huge} are HUGEINT — pandas renders these "
        f"float64 in the driver's .df() path while Spark returns bigint; "
        f"wrap the aggregate in CAST(... AS BIGINT)"
    )


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_df_keeps_integers_integral(con, name):
    """Integral DuckDB columns must survive the pandas conversion intact.

    NULL-bearing integer columns are exempt: pandas promotes those to
    float64 on BOTH sides of the driver compare (Spark ``toPandas`` does
    the same), so the degradation is symmetric and the hashes still match
    (empirically: window_lag_lead_order_gaps / window_first_last_value
    carry NULL bigints and have been driver-green since round 2).  Only
    one-sided degradation — HUGEINT, which exists solely on the DuckDB
    side — mismatches, and the DESCRIBE test above catches it at the
    source."""
    spec = CATALOG[name]
    types = _described_types(con, spec.oracle)
    pdf = con.execute(spec.oracle).df()
    bad = {
        c: (types[c], str(pdf[c].dtype))
        for c in pdf.columns
        if types.get(c, "").upper() in _DUCK_INTEGRAL
        and pdf[c].dtype.kind == "f"
        and not pdf[c].isna().any()
    }
    assert not bad, (
        f"{name}: integral oracle columns degraded to float in .df() "
        f"(NULLs present?): {bad} — the driver hash will mismatch Spark's "
        f"integer rendering"
    )


def test_spark_integral_columns_not_float_in_oracle(spark, con):
    """Cross-engine dtype sweep: for every oracled query, a column Spark
    declares integral must not be declared floating by DuckDB (and vice
    versa a float column must not be integral) — ``3`` vs ``3.0``
    canonicalize differently, so these pairs can never hash-match.

    Spark schemas come from the lazy plan (no job for most queries);
    operators that materialize driver-side state (codebooks, centroids)
    run tiny sf0.001 jobs.
    """
    mismatches = {}
    for name in ORACLED:
        spec = CATALOG[name]
        try:
            s_types = {f.name: f.dataType.simpleString() for f in spec.fn(spark, SF_DIR).schema.fields}
        except Exception as e:  # pragma: no cover - surfaced as a failure
            mismatches[name] = f"schema build failed: {e}"
            continue
        d_types = _described_types(con, spec.oracle)
        for c, st in s_types.items():
            dt = d_types.get(c, "").upper()
            if not dt:
                continue
            if st in _SPARK_INTEGRAL and dt in ("DOUBLE", "FLOAT", "REAL"):
                mismatches[f"{name}.{c}"] = f"spark {st} vs duckdb {dt}"
            if st in ("double", "float") and dt in _DUCK_INTEGRAL:
                mismatches[f"{name}.{c}"] = f"spark {st} vs duckdb {dt}"
    assert not mismatches, f"cross-engine integral/float dtype conflicts: {mismatches}"
