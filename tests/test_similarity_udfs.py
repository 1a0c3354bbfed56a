"""Differential parity for the registered string-distance UDFs
(damerau_levenshtein / jaro_similarity / jaro_winkler_similarity /
nextafter) vs DuckDB on identical SQL text.

DuckDB semantics pinned by probe: BYTE-based distances (multi-byte
UTF-8 counts per byte), FULL Damerau-Levenshtein ('ca'→'abc' = 2, not
OSA 3), jaro 0.0 on any empty side, Jaro-Winkler prefix boost only
above the 0.7 Jaro threshold, NULL-propagating.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

PAIRS = [
    ("'kitten'", "'sitting'"),
    ("'ca'", "'abc'"),          # full DL = 2 (OSA would say 3)
    ("'ab'", "'ba'"),
    ("''", "'abc'"),
    ("''", "''"),
    ("'abc'", "'abc'"),
    ("'MARTHA'", "'MARHTA'"),
    ("'DWAYNE'", "'DUANE'"),
    ("'CRATE'", "'TRACE'"),
    ("'café'", "'cafe'"),       # byte semantics: é = 2 bytes
    ("'läuft'", "'lauft'"),
    ("'abcdex'", "'abczzz'"),   # jaro < 0.7 + shared prefix (boost rule)
    ("'aaaaaazz'", "'aaaazzaa'"),
    ("NULL", "'x'"),
    ("'x'", "NULL"),
]

FNS = ["damerau_levenshtein", "jaro_similarity", "jaro_winkler_similarity"]


@pytest.fixture(scope="module")
def pair():
    from parquet_query_spark.engine import Engine

    eng = Engine.open(SF_DIR)
    con = duckdb.connect()
    yield eng, con
    con.close()


@pytest.mark.parametrize("fn", FNS)
@pytest.mark.parametrize("a,b", PAIRS)
def test_distance_parity(pair, fn, a, b):
    eng, con = pair
    sql = f"SELECT {fn}({a}, {b}) AS v"
    got = eng.sql(sql).collect()[0][0]
    want = con.execute(sql).fetchone()[0]
    if want is None:
        assert got is None, (sql, got)
    else:
        assert got is not None, (sql, want)
        assert math.isclose(float(got), float(want), rel_tol=1e-12, abs_tol=1e-12), (
            sql, got, want,
        )


def test_nextafter_parity(pair):
    eng, con = pair
    cases = [
        "nextafter(1.0, 2.0)", "nextafter(1.0, -2.0)",
        "nextafter(0.0, 1.0)", "nextafter(-1.5, 0.0)",
        "nextafter(3.0, 3.0)",
    ]
    for expr in cases:
        sql = f"SELECT {expr} AS v"
        got = eng.sql(sql).collect()[0][0]
        want = con.execute(sql).fetchone()[0]
        assert got == want, (sql, got, want)  # bit-exact, no tolerance
    assert eng.sql("SELECT nextafter(NULL, 1.0) AS v").collect()[0][0] is None


def test_distance_over_table_column(pair):
    """Vectorized path over a real column (Arrow batch, not per-row SQL)."""
    eng, con = pair
    con.execute(
        f"CREATE OR REPLACE VIEW nation_parquet AS "
        f"SELECT * FROM '{SF_DIR}/nation.parquet'"
    )
    sql = (
        "SELECT n_nationkey AS k, "
        "jaro_winkler_similarity(n_name, 'UNITED STATES') AS v "
        "FROM nation_parquet ORDER BY k"
    )
    got = [(r[0], r[1]) for r in eng.sql(sql).collect()]
    want = con.execute(sql).fetchall()
    assert len(got) == len(want)
    for (gk, gv), (wk, wv) in zip(got, want):
        assert gk == wk
        assert math.isclose(gv, wv, rel_tol=1e-12, abs_tol=1e-12), (gk, gv, wv)
