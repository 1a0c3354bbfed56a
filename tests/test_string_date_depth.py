"""String/date function depth differential battery (r8).

Curated-battery sweep (the round-7 technique) over DuckDB string and
date functions beyond the fuzzer grammar: similarity metrics
(levenshtein/editdist3/jaccard/hamming), path parsing, accent
stripping, codepoint functions, printf/format, century/decade/era/
yearweek/julian, the to_days…to_years interval constructors, and the
date_add/datesub/datetrunc word forms — each compared against DuckDB
on identical text.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

BATTERY = [
    "printf('%d-%s', 7, 'x')",
    "format('{}-{}', 7, 'x')",
    "levenshtein('kitten', 'sitting')",
    "editdist3('kitten', 'sitting')",
    "jaccard('ab', 'bc')",
    "jaccard('aab', 'ab')",
    "jaccard('abc', 'abc')",
    "hamming('abc', 'abd')",
    "mismatches('abc', 'abc')",
    "translate('abc', 'ab', 'xy')",
    "ascii('A')",
    "chr(66)",
    "unicode('é')",
    "ord('é')",
    "to_base(255, 16)",
    "to_base(255, 2)",
    "md5('abc')",
    "sha256('abc')",
    "strip_accents('café')",
    "strip_accents('ÀÉÎõü Ñ ç')",
    "string_split_regex('a1b2c', '[0-9]')",
    "regexp_split_to_array('a1b', '[0-9]')",
    "parse_path('/a/b/c.txt')",
    "parse_path('a/b/c.txt')",
    "parse_dirname('/a/b/c.txt')",
    "parse_dirname('a/b/c.txt')",
    "parse_filename('/a/b/c.txt')",
    "parse_filename('/a/b/c.txt', true)",
    "starts_with('abc', 'ab')",
    "ends_with('abc', 'bc')",
    "suffix('abc', 'bc')",
    "prefix('abc', 'ab')",
    "contains('abc', 'b')",
    "position('b' IN 'abc')",
    "strpos('abc', 'b')",
    "instr('abc', 'b')",
    "ltrim('xxabc', 'x')",
    "rtrim('abcxx', 'x')",
    "trim('xabcx', 'x')",
    "split_part('a,b,c', ',', 2)",
    "make_timestamp(1995, 6, 17, 12, 30, 1.5)",
    "century(DATE '1995-06-17')",
    "century(DATE '2000-12-31')",
    "century(DATE '2001-01-01')",
    "decade(DATE '1995-06-17')",
    "era(DATE '1995-06-17')",
    "yearweek(DATE '1995-01-01')",
    "yearweek(DATE '1995-06-17')",
    "weekofyear(DATE '1995-06-17')",
    "dayofyear(DATE '1995-06-17')",
    "julian(DATE '1995-06-17')",
    "julian(TIMESTAMP '1995-06-17 12:30:00')",
    "to_days(30)",
    "to_hours(5)",
    "to_minutes(90)",
    "to_seconds(45)",
    "to_weeks(2)",
    "to_months(3)",
    "to_years(2)",
    "date_sub('day', DATE '1995-01-01', DATE '1995-03-01')",
    "datesub('month', DATE '1995-01-15', DATE '1995-06-01')",
    "datetrunc('week', DATE '1995-06-17')",
    "date_add(DATE '1995-01-01', INTERVAL 3 DAY)",
    "date_add(DATE '1995-01-01', INTERVAL 90 MINUTE)",
    "greatest(DATE '1995-01-01', DATE '1996-01-01')",
]


@pytest.fixture(scope="module")
def pair():
    from parquet_query_spark.engine import Engine

    eng = Engine.open(SF_DIR)
    con = duckdb.connect()
    yield eng, con
    con.close()


def _norm(v):
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    return v


def _close(a, b):
    a, b = _norm(a), _norm(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.mark.parametrize("expr", BATTERY)
def test_string_date_depth(pair, expr):
    eng, con = pair
    sql = f"SELECT ({expr}) AS c0"
    got = eng.sql(sql).collect()[0][0]
    want = con.execute(sql).fetchone()[0]
    assert _close(got, want), (expr, got, want)
