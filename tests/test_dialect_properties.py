"""Property-based differential fuzz for the dialect operator pack.

Random unparenthesized arithmetic chains run through BOTH engines on the
same text; DuckDB is the reference (the product contract — the reference
app forwards SQL to DuckDB untouched, src/duckdb.ts:46-49).  This is the
direct test of the precedence/associativity model the ``^``/``**``/``//``
rewrites implement: left-assoc ``^`` tighter than ``*``, unary minus
tighter than ``^``, ``//`` at ``*`` precedence.

Two chains because DuckDB's ``//`` is only integer division for INTEGER
operands (``7.5 // 2`` is plain division — a documented out-of-scope
divergence), so ``//`` is fuzzed in all-integer chains and ``^`` (which
produces DOUBLE) in chains without ``//``.
"""

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_query_spark.engine import Engine


@pytest.fixture(scope="module")
def engine(sf_dir):
    return Engine.open(sf_dir)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    yield con
    con.close()


@st.composite
def op_chain(draw, ops):
    n = draw(st.integers(min_value=2, max_value=5))
    terms = [draw(st.integers(min_value=1, max_value=9)) for _ in range(n)]
    negs = [draw(st.booleans()) for _ in range(n)]
    opseq = [draw(st.sampled_from(ops)) for _ in range(n - 1)]
    parts = [f"-{t}" if neg else str(t) for t, neg in zip(terms, negs)]
    return parts[0] + "".join(
        f" {o} {p}" for o, p in zip(opseq, parts[1:])
    )


def _both(engine, ddb, expr):
    got = engine.sql(f"SELECT {expr} AS v").collect()[0][0]
    want = ddb.execute(f"SELECT {expr} AS v").fetchone()[0]
    return float(got), float(want)


@given(op_chain(ops=["+", "-", "*", "//"]))
@settings(max_examples=50, deadline=None)
def test_integer_chain_matches_duckdb(engine, ddb, expr):
    got, want = _both(engine, ddb, expr)
    assert got == want, expr


@given(op_chain(ops=["+", "-", "*", "^"]))
@settings(max_examples=50, deadline=None)
def test_power_chain_matches_duckdb(engine, ddb, expr):
    got, want = _both(engine, ddb, expr)
    if math.isnan(want):
        assert math.isnan(got), expr
    elif math.isinf(want):
        assert got == want, expr
    else:
        assert math.isclose(got, want, rel_tol=1e-9, abs_tol=1e-9), expr
