"""Round-12 ADVICE + VERDICT fixes, differential-tested against DuckDB.

1. CREATE OR REPLACE TABLE snapshots the body BEFORE replacing the target
   (DuckDB transactional-replace parity; ADVICE medium).
2. CTAS is matched on the pre-macro-expansion text so run_pivot's
   implicit-group judgment sees raw USING references (ADVICE low).
3. A paren group headed by a string literal only takes the substr reading
   when the literal is followed by ``||`` / a closer / end — boolean
   groups like ``('a' = 'b')[2]`` must error like DuckDB (ADVICE low).
4. Implicit-group consumption uses RAW USING references alone when the raw
   text parses — a macro reaching extra columns post-expansion must not
   over-consume (ADVICE low).
5. PIVOT USING retry pipeline only swallows analysis/parse failures
   (VERDICT #4) and the eager-analysis assumption is gated (VERDICT #7).
"""

import duckdb
import pytest

from pyspark.errors import AnalysisException


@pytest.fixture(scope="module")
def engine(sf_dir):
    from parquet_query_spark.engine import Engine

    return Engine.open(sf_dir, table_name="alldata")


# ── 1. OR REPLACE snapshots before the swap ─────────────────────────────


def test_ctas_or_replace_self_reference(engine):
    """CREATE OR REPLACE TABLE t AS SELECT ... FROM t — legal in DuckDB
    (probed r12: snapshots first), and must both succeed AND read the
    pre-replace rows; the old drop-then-write decomposition destroyed t."""
    con = duckdb.connect()
    n = "__r12_selfrep"
    stmts = [
        f"DROP TABLE IF EXISTS {n}",
        f"CREATE TABLE {n} AS SELECT * FROM (VALUES (1),(2),(3)) v(x)",
        f"CREATE OR REPLACE TABLE {n} AS SELECT x*10 AS x FROM {n}",
    ]
    for s in stmts:
        engine.sql(s) if s.lstrip().upper().startswith("CREATE") else engine.exec(s)
        con.execute(s)
    q = f"SELECT x FROM {n} ORDER BY x"
    assert [r[0] for r in engine.sql(q).collect()] == [
        r[0] for r in con.execute(q).fetchall()
    ] == [10, 20, 30]
    engine.exec(f"DROP TABLE {n}")
    con.close()


def test_ctas_or_replace_failed_body_keeps_target(engine):
    """A body that fails analysis/write must leave the existing target
    untouched (materialize-to-staging, then swap)."""
    n = "__r12_keep"
    engine.exec(f"DROP TABLE IF EXISTS {n}")
    engine.sql(f"CREATE TABLE {n} AS SELECT 42 AS x")
    with pytest.raises(AnalysisException):
        engine.sql(f"CREATE OR REPLACE TABLE {n} AS SELECT no_such_col FROM {n}")
    assert [r[0] for r in engine.sql(f"SELECT x FROM {n}").collect()] == [42]
    engine.exec(f"DROP TABLE {n}")


# ── 2. CTAS body keeps pre-macro USING references ───────────────────────


def test_ctas_pivot_using_macro_implicit_groups(engine):
    """CREATE TABLE ... AS PIVOT ... USING agg(macro(v)): the constant-body
    macro ignores v, but DuckDB judges consumption pre-binding, so v is
    consumed (NOT a group column) — the fix routes the RAW body through
    the nested sql() so run_pivot sees the pre-expansion references
    (fuzz v6 seeds 90151/90166 resurfaced on the CTAS path)."""
    con = duckdb.connect()
    n = "__r12_ctaspv"
    setup = [
        "CREATE TABLE __r12_pvsrc(k VARCHAR, v INT, w INT)",
        "INSERT INTO __r12_pvsrc VALUES ('a',1,10),('a',2,10),('b',3,30)",
        "CREATE MACRO __r12_c(a) AS (42)",
    ]
    engine.exec("DROP TABLE IF EXISTS __r12_pvsrc")
    engine.exec(f"DROP TABLE IF EXISTS {n}")
    for s in setup:
        engine.exec(s)
        con.execute(s)
    ctas = f"CREATE TABLE {n} AS PIVOT __r12_pvsrc ON k USING sum(__r12_c(v))"
    engine.sql(ctas)
    con.execute(ctas)
    want_cols = [d[0] for d in con.execute(f"SELECT * FROM {n}").description]
    got_cols = engine.sql(f"SELECT * FROM {n}").columns
    assert got_cols == want_cols  # w is a group column; v is consumed
    q = f"SELECT * FROM {n} ORDER BY w"
    assert [tuple(r) for r in engine.sql(q).collect()] == con.execute(q).fetchall()
    engine.exec(f"DROP TABLE {n}")
    engine.exec("DROP TABLE __r12_pvsrc")
    con.close()


# ── 3. string-literal-headed paren bases ────────────────────────────────


def test_boolean_paren_group_subscript_errors_like_duckdb(engine):
    """('a' = 'b')[2] is BOOLEAN — DuckDB: binder error (no
    array_extract(BOOLEAN, ...)); the static string-literal-head
    classifier must not hand it the substr reading (which would silently
    succeed on Spark via bool→string cast)."""
    con = duckdb.connect()
    for q in ["SELECT ('a' = 'b')[2] AS s", "SELECT ('a' IN ('b'))[1] AS s"]:
        with pytest.raises(duckdb.BinderException):
            con.execute(q)
        with pytest.raises(AnalysisException):
            engine.sql(q).collect()
    con.close()


def test_string_literal_headed_concat_subscripts_still_work(engine):
    """The legitimate static cases (fuzz v6 seed 96787 family) keep the
    string reading after the tightening."""
    con = duckdb.connect()
    for q in [
        "SELECT ('BUILDING' || 'xy')[2] AS s",
        "SELECT ('abc')[2] AS s",
        "SELECT ('a' || 'b' || 'cd')[3:4] AS s",
    ]:
        got = [r[0] for r in engine.sql(q).collect()]
        want = [r[0] for r in con.execute(q).fetchall()]
        assert got == want, q
    con.close()


# ── 4. raw-only implicit-group consumption ──────────────────────────────


def test_pivot_subquery_macro_does_not_overconsume(engine):
    """Probed r12: with ``m(a) := a + (SELECT max(w) FROM p)``, DuckDB's
    ``PIVOT p ON k USING sum(m(v))`` keeps w as an implicit group column
    (consumption judged pre-binding: only v is consumed).  Unioning
    post-expansion references would consume w and drop the column."""
    con = duckdb.connect()
    setup = [
        "CREATE TABLE __r12_sq(k VARCHAR, v INT, w INT)",
        "INSERT INTO __r12_sq VALUES ('a',1,10),('a',2,20),('b',3,30)",
        "CREATE MACRO __r12_m(a) AS (a + (SELECT max(w) FROM __r12_sq))",
    ]
    engine.exec("DROP TABLE IF EXISTS __r12_sq")
    for s in setup:
        engine.exec(s)
        con.execute(s)
    q = "PIVOT __r12_sq ON k USING sum(__r12_m(v)) ORDER BY w"
    r = con.execute(q)
    want_cols = [d[0] for d in r.description]
    want = r.fetchall()
    df = engine.sql(q)
    assert df.columns == want_cols  # ['w', 'a', 'b']
    assert [tuple(x) for x in df.collect()] == want
    engine.exec("DROP TABLE __r12_sq")
    con.close()


# ── 5. narrowed excepts + eager-analysis gate ───────────────────────────


def test_resolve_using_agg_surfaces_non_analysis_errors():
    """A py4j-bridge-style failure inside the variant probe must surface,
    not silently advance to the next rewrite variant (VERDICT #4)."""
    from parquet_query_spark.workbench.pivot import _resolve_using_agg

    class _Boom:
        def limit(self, n):
            return self

        def agg(self, c):
            raise RuntimeError("bridge down")

    with pytest.raises(RuntimeError, match="bridge down"):
        _resolve_using_agg(_Boom(), "sum(v)")


def test_resolve_using_agg_still_retries_analysis_failures(engine, views):
    """Analysis failures keep advancing through the variants (the v6
    seed-99180 family: array-reading ``len`` only exists as a fallback)."""
    from parquet_query_spark.workbench.pivot import _resolve_using_agg

    base = engine.sql("SELECT array(1,2,3) AS xs, 1 AS v")
    c = _resolve_using_agg(base, "sum(len(xs))")
    assert [r[0] for r in base.agg(c).collect()] == [3]


def test_eager_analysis_gate(spark):
    """The classic session passes; a session that defers analysis (the
    Spark Connect failure mode) is rejected at bootstrap (VERDICT #7)."""
    from parquet_query_spark.session import assert_eager_analysis

    assert_eager_analysis(spark)  # classic local session: no raise

    class _LazySql:
        def sql(self, q):
            return None  # deferred analysis: no AnalysisException

    with pytest.raises(RuntimeError, match="analyze eagerly"):
        assert_eager_analysis(_LazySql())
