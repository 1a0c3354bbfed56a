"""Window/aggregate depth differential battery (r8).

Probes the window and aggregate surface beyond the fuzzer's grammar —
IGNORE NULLS inside the call (DuckDB spelling), nth_value/ntile/
percent_rank/cume_dist, RANGE frames, ordered-set percentile_cont,
quantile_cont, product (composed: sign/zero bookkeeping +
exp(sum(ln))), mode/median, bit/bool aggregates, bias-corrected
moments, regression aggregates, arg_min/arg_max — each compared
against DuckDB on identical text over a small fixture with NULLs and
group-size-2 edge cases.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

FIXTURE_DUCK = (
    "CREATE TABLE t AS SELECT * FROM (VALUES (1, 10, 'a'), (2, NULL, 'a'), "
    "(3, 30, 'b'), (4, 40, 'b'), (5, NULL, 'a')) v(k, x, g)"
)
FIXTURE_SPARK = (
    "CREATE OR REPLACE TEMP VIEW t AS SELECT * FROM VALUES (1, 10, 'a'), "
    "(2, NULL, 'a'), (3, 30, 'b'), (4, 40, 'b'), (5, NULL, 'a') v(k, x, g)"
)

BATTERY = [
    "SELECT k, first_value(x IGNORE NULLS) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, last_value(x IGNORE NULLS) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, nth_value(x, 2) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, nth_value(x, 2 IGNORE NULLS) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, lag(x, 2, -1) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, lag(x IGNORE NULLS) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, sum(x) OVER (ORDER BY k RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS v FROM t ORDER BY k",
    "SELECT k, ntile(2) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, percent_rank() OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, cume_dist() OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT g, median(x) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT g, mode(x) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY x) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT g, quantile_cont(x, 0.25) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT g, product(x) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT g, product(x - 35) AS v FROM t GROUP BY g ORDER BY g",
    "SELECT product(x) AS v FROM t WHERE x IS NULL",
    "SELECT g, bool_and(x > 5) AS v, bool_or(x > 35) AS w FROM t GROUP BY g ORDER BY g",
    "SELECT g, bit_and(k) AS v, bit_or(k) AS w, bit_xor(k) AS u FROM t GROUP BY g ORDER BY g",
    "SELECT g, skewness(x) AS v, kurtosis(x) AS w FROM t GROUP BY g ORDER BY g",
    "SELECT corr(k, x) AS v, covar_samp(k, x) AS w, covar_pop(k, x) AS u FROM t",
    "SELECT regr_slope(x, k) AS v, regr_intercept(x, k) AS w, regr_r2(x, k) AS u FROM t",
    "SELECT g, arg_min(k, x) AS v, arg_max(k, x) AS w FROM t GROUP BY g ORDER BY g",
    # window FILTER (Spark: unsupported natively; rewritten to CASE args)
    "SELECT k, count(x) FILTER (WHERE k > 1) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, count(*) FILTER (WHERE g = 'a') OVER (PARTITION BY g ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, sum(x) FILTER (WHERE k % 2 = 0) OVER w AS v FROM t WINDOW w AS (ORDER BY k) ORDER BY k",
    "SELECT k, sum(x) FILTER (WHERE k > 1) OVER (ORDER BY k ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS v FROM t ORDER BY k",
    # DISTINCT window aggregates (Spark: unsupported natively; rewritten)
    "SELECT k, count(DISTINCT g) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, count(DISTINCT x) OVER (PARTITION BY g ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, count(DISTINCT x) OVER (ORDER BY k ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS v FROM t ORDER BY k",
    "SELECT k, count(DISTINCT g) FILTER (WHERE k <> 3) OVER (ORDER BY k) AS v FROM t ORDER BY k",
    "SELECT k, min(DISTINCT x) OVER (ORDER BY k) AS v, max(DISTINCT x) OVER (ORDER BY k) AS w FROM t ORDER BY k",
    # join-keyword and limit-form parity (native in both engines)
    "SELECT k FROM t SEMI JOIN (SELECT 1 AS k UNION ALL SELECT 3) u USING (k) ORDER BY k",
    "SELECT k FROM t ANTI JOIN (SELECT 1 AS k UNION ALL SELECT 3) u USING (k) ORDER BY k",
    "SELECT k FROM t ORDER BY k OFFSET 3",
    "SELECT k FROM t ORDER BY k LIMIT ALL",
    "SELECT k FROM t ORDER BY k DESC LIMIT 2 OFFSET 1",
]


@pytest.fixture(scope="module")
def pair():
    from parquet_query_spark.engine import Engine

    eng = Engine.open(SF_DIR)
    eng.sql(FIXTURE_SPARK)
    con = duckdb.connect()
    con.execute(FIXTURE_DUCK)
    yield eng, con
    con.close()


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.mark.parametrize("sql", BATTERY)
def test_window_agg_depth(pair, sql):
    eng, con = pair
    got = [tuple(r) for r in eng.sql(sql).collect()]
    want = con.execute(sql).fetchall()
    assert len(got) == len(want), sql
    for gr, wr in zip(got, want):
        assert len(gr) == len(wr), sql
        for gv, wv in zip(gr, wr):
            assert _close(gv, wv), (sql, gv, wv)
