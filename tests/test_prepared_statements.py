"""DuckDB PREPARE / EXECUTE / DEALLOCATE + transaction statements (r9).

Every behavior probed on the bundled DuckDB 1.0.0 and compared
differentially where results are produced; see
parquet_query_spark/workbench/prepared.py for the probe notes.
"""

import duckdb
import pytest

from parquet_query_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine():
    return Engine.open(SF_DIR)


def _both(engine, con, stmts):
    """Run the statement sequence through both engines; compare the last
    statement's rows."""
    got = want = None
    for s in stmts:
        got = [tuple(r) for r in engine.sql(s).collect()]
        want = con.execute(s).fetchall()
    assert got == want, (stmts[-1], got, want)


def test_prepare_execute_parity(engine):
    con = duckdb.connect()
    _both(engine, con, ["PREPARE q1 AS SELECT $1 + 1 AS v", "EXECUTE q1(41)"])
    _both(engine, con, ["PREPARE q2 AS SELECT $a * $b AS v",
                        "EXECUTE q2(a := 6, b := 7)"])
    _both(engine, con, ["PREPARE q3 AS SELECT ? + ? AS v", "EXECUTE q3(1, 2)"])
    # parameter reuse, zero-arg EXECUTE, expression args bind by value
    _both(engine, con, ["PREPARE q4 AS SELECT $1 + $1 AS v", "EXECUTE q4(5)"])
    _both(engine, con, ["PREPARE q5 AS SELECT 7 AS v", "EXECUTE q5"])
    _both(engine, con, ["PREPARE q6 AS SELECT $1 * 2 AS v", "EXECUTE q6(1+1)"])
    # string arg with embedded quote
    _both(engine, con, ["PREPARE q7 AS SELECT upper($1) AS v",
                        "EXECUTE q7('a''b')"])
    # LIMIT parameter takes the bare literal
    _both(engine, con, [
        "PREPARE q8 AS SELECT * FROM (VALUES (1),(2),(3)) t(x) ORDER BY x LIMIT $1",
        "EXECUTE q8(2)",
    ])
    con.close()


def test_prepare_replaces_and_deallocate(engine):
    con = duckdb.connect()
    _both(engine, con, ["PREPARE p AS SELECT $1 + 1 AS v", "EXECUTE p(1)"])
    _both(engine, con, ["PREPARE p AS SELECT $1 * 10 AS v", "EXECUTE p(1)"])
    # DEALLOCATE (both spellings), missing-name no-op, error after drop
    engine.sql("DEALLOCATE PREPARE p")
    con.execute("DEALLOCATE PREPARE p")
    engine.sql("DEALLOCATE nosuch")  # silently ok (probed)
    with pytest.raises(ValueError, match='"p" does not exist'):
        engine.sql("EXECUTE p(1)")
    con.close()


def test_execute_missing_params(engine):
    engine.sql("PREPARE pm AS SELECT $1 + $2 AS v")
    with pytest.raises(ValueError, match=r"\$2 not supplied"):
        engine.sql("EXECUTE pm(1)")


def test_dollar_param_in_string_is_data(engine):
    engine.sql("PREPARE ps AS SELECT '$1' AS s, $1 AS v")
    got = engine.sql("EXECUTE ps(9)").collect()[0]
    assert (got[0], got[1]) == ("$1", 9)


def test_prepared_over_table(engine):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem_parquet AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    _both(engine, con, [
        "PREPARE pt AS SELECT l_returnflag, count(*) AS n FROM lineitem_parquet "
        "WHERE l_quantity < $1 GROUP BY l_returnflag ORDER BY l_returnflag",
        "EXECUTE pt(10)",
    ])
    con.close()


def test_transaction_markers(engine):
    for s in ["BEGIN", "BEGIN TRANSACTION", "START TRANSACTION",
              "COMMIT", "ROLLBACK", "ABORT"]:
        assert engine.sql(s).collect() == []
    # a statement between markers still runs
    engine.sql("BEGIN")
    assert engine.sql("SELECT 1 AS v").collect()[0][0] == 1
    engine.sql("COMMIT")


def test_negative_literal_arg_parenthesized(engine):
    """ADVICE r9: EXECUTE p(-1) into 'SELECT 2-$1' must not expand to
    '2--1' (the comment stripper reads '--1 ...' as a line comment and the
    query silently returned 2 where DuckDB returns 3)."""
    con = duckdb.connect()
    _both(engine, con, ["PREPARE n1 AS SELECT 2-$1 AS v", "EXECUTE n1(-1)"])
    _both(engine, con, ["PREPARE n2 AS SELECT $1 AS v", "EXECUTE n2(-2.5)"])
    _both(engine, con, ["PREPARE n3 AS SELECT 10-?-? AS v", "EXECUTE n3(-1, -2)"])
    con.close()


def test_dollar_quoted_body_span_is_data(engine):
    """ADVICE r9: a $word inside a $$...$$ (or $tag$...$tag$) literal in
    the PREPARE body is string data, not a named parameter."""
    con = duckdb.connect()
    _both(engine, con, [
        "PREPARE dq1 AS SELECT $$hello $name$$ AS s, $1 AS v",
        "EXECUTE dq1(7)",
    ])
    _both(engine, con, [
        "PREPARE dq2 AS SELECT $tag$got $1 and $x here$tag$ AS s, $x AS v",
        "EXECUTE dq2(x := 3)",
    ])
    con.close()


def test_execute_empty_parens_is_parse_error(engine):
    """EXECUTE q() is a DuckDB parse error even for a zero-parameter body
    (probed r10); zero-arg EXECUTE omits the parens."""
    engine.sql("PREPARE z AS SELECT 1 AS v")
    with pytest.raises(ValueError, match="syntax error"):
        engine.sql("EXECUTE z()")
    # the no-parens form still works
    assert [tuple(r) for r in engine.sql("EXECUTE z").collect()] == [(1,)]


def test_prepared_rebinds_macros_and_views_at_execute(engine):
    """DuckDB re-binds at EXECUTE (probed r10): a macro or view redefined
    AFTER the PREPARE is visible to the next EXECUTE, and EXECUTE after
    DROP MACRO errors on both engines."""
    con = duckdb.connect()
    seq = [
        "CREATE OR REPLACE MACRO fz_rb(x) AS (x + 1)",
        "PREPARE rb AS SELECT fz_rb($1) AS v",
        "EXECUTE rb(10)",
        "CREATE OR REPLACE MACRO fz_rb(x) AS (x * 100)",
        "EXECUTE rb(10)",
        "CREATE OR REPLACE VIEW fz_rbv AS SELECT 1 AS a",
        "PREPARE rbv AS SELECT a + $1 AS v FROM fz_rbv",
        "EXECUTE rbv(1)",
        "CREATE OR REPLACE VIEW fz_rbv AS SELECT 50 AS a",
        "EXECUTE rbv(1)",
    ]
    for s in seq:
        got = [tuple(r) for r in engine.sql(s).collect()]
        want = con.execute(s).fetchall()
        if s.startswith("EXECUTE"):
            assert got == want, (s, got, want)
    engine.sql("DROP MACRO fz_rb")
    con.execute("DROP MACRO fz_rb")
    with pytest.raises(Exception):
        engine.sql("EXECUTE rb(10)").collect()
    with pytest.raises(Exception):
        con.execute("EXECUTE rb(10)")
    con.close()
