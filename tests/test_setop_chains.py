"""Exhaustive differential battery for mixed top-level set-op chains.

The r8 ADVICE found ``A UNION BY NAME B UNION ALL C`` mis-associating
(the BY NAME splitter treated ``B UNION ALL C`` as one branch); the fix
folds LEFT at every top-level separator in statement order, matching
DuckDB's left-associative parse.  This battery enumerates every
2-separator combination of the six separators over value sets with
deliberate duplicates — semantics (ALL vs DISTINCT, BY NAME NULL-fill,
INTERSECT's tighter binding) all surface as row-multiset differences —
and compares Engine.sql row-for-row against DuckDB on identical text.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

# branches with controlled duplicate structure (x column)
A = "SELECT * FROM (VALUES (1), (1), (2)) t1(x)"
B = "SELECT * FROM (VALUES (2), (3)) t2(x)"
C = "SELECT * FROM (VALUES (1), (3), (3)) t3(x)"

# second layout: disjoint column names so BY NAME's NULL-fill differs
# from positional stacking
A2 = "SELECT * FROM (VALUES (1), (2)) t1(a)"
B2 = "SELECT * FROM (VALUES (7), (8)) t2(b)"
C2 = "SELECT * FROM (VALUES (9)) t3(a)"

SEPS = [
    "UNION",
    "UNION ALL",
    "UNION BY NAME",
    "UNION ALL BY NAME",
    "EXCEPT",
    "INTERSECT",
]


@pytest.fixture(scope="module")
def engine():
    from parquet_query_spark.engine import Engine

    return Engine.open(SF_DIR)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _norm_rows(rows):
    return sorted(
        tuple("" if v is None else str(v) for v in r) for r in rows
    )


def _compare(engine, con, sql):
    try:
        want = con.execute(sql).fetchall()
    except Exception:
        # DuckDB rejects the combination (e.g. BY NAME after a
        # different-width positional stack) — the engine may accept or
        # reject; either way there is no oracle row set to match
        return
    got = [tuple(r) for r in engine.sql(sql).collect()]
    assert _norm_rows(got) == _norm_rows(want), sql


def test_two_separator_chains_same_columns(engine, con):
    for s1 in SEPS:
        for s2 in SEPS:
            _compare(engine, con, f"{A} {s1} {B} {s2} {C}")


def test_two_separator_chains_disjoint_columns(engine, con):
    for s1 in SEPS:
        for s2 in SEPS:
            _compare(engine, con, f"{A2} {s1} {B2} {s2} {C2}")


def test_three_separator_mixed_samples(engine, con):
    cases = [
        f"{A} UNION BY NAME {B} UNION ALL {C} UNION {B}",
        f"{A} UNION ALL {B} EXCEPT {C} UNION BY NAME {B}",
        f"{A} INTERSECT {B} UNION ALL BY NAME {C} EXCEPT {B}",
        f"{A} EXCEPT {B} INTERSECT {C} UNION {C}",
        f"{A} UNION ALL BY NAME {B} UNION ALL {C} INTERSECT {C}",
    ]
    for sql in cases:
        _compare(engine, con, sql)


def test_chain_with_order_by_limit_tail(engine, con):
    sql = f"{A} UNION BY NAME {B} UNION ALL {C} ORDER BY x LIMIT 4"
    got = [tuple(r) for r in engine.sql(sql).collect()]
    want = con.execute(sql).fetchall()
    # tail applies to the whole chain — order is significant here
    assert [str(r[0]) for r in got] == [str(r[0]) for r in want], sql
