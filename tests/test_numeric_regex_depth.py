"""Numeric/regex/blob function depth differential battery (r8).

Covers the sweep beyond the string/date battery: gamma/lgamma (Lanczos
g=7 with reflection), even (away-from-zero to even), gcd/lcm, xor,
signbit, bit operators, isnan/isinf, encode/decode/octet_length with
the BLOB→BINARY type mapping, iff, map accessors, and — the silent
wrong-answer class — DuckDB regexp semantics: unflagged regexp_replace
replaces only the FIRST match, ``\\N`` backrefs, flag strings, named
and positional capture-group extraction.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

BATTERY = [
    "even(2.5)", "even(2)", "even(-2.5)", "even(3)", "even(-3)", "even(0)",
    "gcd(12, 18)", "gcd(0, 5)", "gcd(-12, 18)", "lcm(4, 6)", "lcm(0, 5)",
    "xor(5, 3)", "signbit(-2.5)", "signbit(0.0)", "signbit(2.5)",
    "gamma(5)", "gamma(0.5)", "gamma(-0.5)", "gamma(10.25)",
    # integer gamma is exact ((n-1)! — the Lanczos exp path drifted);
    # lcm/gcd long names type BIGINT (the emitted DIV previously hit the
    # divmod pass's DOUBLE dispatch); epoch_ns = micros * 1000
    "gamma(1)", "gamma(21)", "gamma(22)",
    "least_common_multiple(4, 6)", "greatest_common_divisor(12, 18)",
    "(least_common_multiple(4, 6) // 5)", "lcm(-4, 6)",
    "epoch_ns(TIMESTAMP '1970-01-01 00:00:01.5')",
    "epoch_ns(TIMESTAMP '2024-06-01 12:34:56.789012')",
    "lgamma(5)", "lgamma(10.5)", "lgamma(0.3)", "lgamma(200)",
    "cbrt(27)", "log(2, 8)", "log2(8)", "atan2(1, 1)", "cot(1)",
    "degrees(3.141592653589793)", "radians(180)", "pi()",
    "(5 << 2)", "(20 >> 2)", "(5 & 3)", "(5 | 3)",
    "isnan('nan'::DOUBLE)", "isinf('inf'::DOUBLE)",
    "bit_count(255)", "factorial(5)",
    "encode('abc')", "decode('abc'::BLOB)", "octet_length('abc'::BLOB)",
    "hex(255)", "unhex('FF')",
    # (iff is an engine extension — this DuckDB build lacks the alias)
    "ifnull(NULL, 5)",
    "map_keys(MAP {'a': 1, 'b': 2})", "map_values(MAP {'a': 1})",
    "cardinality(MAP {'a': 1, 'b': 2})", "element_at(MAP {'a': 5}, 'a')",
    "greatest(1, NULL, 3)",
    # regexp semantics
    "regexp_replace('xaxa', 'a', 'B')",
    "regexp_replace('xaxa', 'a', 'B', 'g')",
    "regexp_replace('ab', '(a)(b)', '\\2\\1')",
    "regexp_replace('abc', 'x*', '-')",
    "regexp_replace('abc', '[0-9]', '-')",
    "regexp_replace('AAA', 'a', 'b', 'i')",
    "regexp_extract('a1b2', '([a-z])([0-9])', 2)",
    "regexp_matches('ABC', 'abc', 'i')",
    "regexp_matches('abc', 'b')",
]


@pytest.fixture(scope="module")
def pair():
    from parquet_query_spark.engine import Engine

    eng = Engine.open(SF_DIR)
    con = duckdb.connect()
    yield eng, con
    con.close()


def _close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if hasattr(a, "asDict"):
        return isinstance(b, dict) and a.asDict() == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)


@pytest.mark.parametrize("expr", BATTERY)
def test_numeric_regex_depth(pair, expr):
    eng, con = pair
    sql = f"SELECT ({expr}) AS c0"
    got = eng.sql(sql).collect()[0][0]
    want = con.execute(sql).fetchone()[0]
    assert _close(got, want), (expr, got, want)


def test_regexp_extract_group_names(pair):
    eng, con = pair
    sql = (
        "SELECT regexp_extract('john doe', '([a-z]+) ([a-z]+)', "
        "['first', 'last']) AS c0"
    )
    got = eng.sql(sql).collect()[0][0].asDict()
    want = con.execute(sql).fetchone()[0]
    assert got == want
    # single-name form over a named group (engine extension — this
    # DuckDB build rejects the scalar-name spelling)
    got2 = eng.sql(
        "SELECT regexp_extract('abc123', '(?P<w>[a-z]+)', 'w') AS c0"
    ).collect()[0][0]
    assert got2 == "abc"


def test_int_cast_boundary_sweep(pair):
    """Dense .5-boundary sweep of the rounding integer casts: every
    half-step in [-25, 25] as a DECIMAL literal (half-away expected) and
    as a DOUBLE (half-even expected), engine vs DuckDB row-for-row."""
    eng, con = pair
    lits = [f"{k / 2.0:.1f}" for k in range(-50, 51)]
    dec_sql = "SELECT " + ", ".join(
        f"CAST({v} AS INT) AS d{i}" for i, v in enumerate(lits)
    )
    dbl_sql = "SELECT " + ", ".join(
        f"CAST(({v})::DOUBLE AS INT) AS f{i}" for i, v in enumerate(lits)
    )
    for sql in (dec_sql, dbl_sql):
        got = list(eng.sql(sql).collect()[0])
        want = list(con.execute(sql).fetchone())
        assert got == want, [
            (lits[i], g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
        ]


STRUCT_LIST_BATTERY = [
    ("struct_insert({'a': 1}, b := 2)", "struct"),
    ("struct_insert({'a': 1, 'c': 'x'}, b := 2, d := 3)", "struct"),
    ("list_apply([1,2], x -> x + 1)", "str"),
    ("list_bool_or([true, false])", "str"),
    ("list_bool_and([true, false])", "str"),
    ("list_bool_or([false, NULL])", "str"),
    ("list_bool_or([NULL])", "str"),
    ("list_grade_up([3,1,2])", "str"),
    ("list_grade_up([2,2,1])", "str"),
    ("list_select([10,20,30], [2,3])", "str"),
    ("list_select([10,20,30], [3,1])", "str"),
    ("list_where([10,20,30], [true,false,true])", "str"),
]


@pytest.mark.parametrize("expr,kind", STRUCT_LIST_BATTERY)
def test_struct_list_depth(pair, expr, kind):
    """struct_insert / list_apply / list_bool_* / list_grade_up /
    list_select / list_where parity (r8 struct/map sweep)."""
    eng, con = pair
    sql = f"SELECT ({expr}) AS c0"
    got = eng.sql(sql).collect()[0][0]
    want = con.execute(sql).fetchone()[0]
    if kind == "struct":
        assert got.asDict() == want, (expr, got, want)
    else:
        assert str(got) == str(want), (expr, got, want)
