"""Property-based tests (hypothesis) for the workbench layer — the parts
whose correctness is defined by invariants rather than a SQL oracle:
statement lexing (A6), CSV encoding (A13), cell formatting (A14).

No Spark session needed; these are pure functions.
"""

import csv
import datetime as dt
import io

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from parquet_query_spark.workbench.csv_sink import csv_escape, csv_line, rows_to_csv_parts
from parquet_query_spark.workbench.formatting import format_cell
from parquet_query_spark.workbench.statements import (
    split_statements,
    statement_at_position,
)

# SQL-ish text: identifiers, quotes, comment markers, semicolons, newlines
sql_text = st.text(
    alphabet=st.sampled_from(list("abc123 \n\t;'\"-/*,()=")), max_size=120
)


@given(sql_text)
@settings(max_examples=300, deadline=None)
def test_split_statements_are_substrings(sql):
    for stmt in split_statements(sql):
        assert stmt in sql
        assert stmt.strip() == stmt  # trimmed
        assert stmt  # non-empty


@given(sql_text, st.integers(min_value=0, max_value=130))
@settings(max_examples=300, deadline=None)
def test_statement_at_position_total_and_consistent(sql, pos):
    # never raises for any (text, position); result is either empty or one
    # of the split statements
    stmt = statement_at_position(sql, pos)
    assert stmt == "" or stmt in split_statements(sql)


@given(sql_text)
@settings(max_examples=200, deadline=None)
def test_quotes_and_comments_shield_semicolons(sql):
    # a ';' inside a single-quoted string never splits: embed the fuzz text
    # in a string literal -> always exactly one statement
    lit = "SELECT '" + sql.replace("'", "''") + "';"
    assert len(split_statements(lit)) == 1
    com = "SELECT 1 -- " + sql.replace("\n", " ").replace("\r", " ")
    assert split_statements(com) == [com.strip()]


cells = st.lists(
    st.text(alphabet=st.sampled_from(list('ab,"\n\r x0')), max_size=20),
    min_size=1,
    max_size=6,
)


@given(cells)
@settings(max_examples=300, deadline=None)
def test_csv_line_round_trips_through_rfc4180_parser(row):
    # a single empty cell encodes as a blank line, which any RFC-4180
    # parser reads as an empty row — inherent CSV ambiguity (the reference
    # encoder behaves identically), so exclude that one degenerate shape
    assume(row != [""])
    line = csv_line(row)
    assert line.endswith("\r\n")
    parsed = next(csv.reader(io.StringIO(line)))
    assert parsed == row


@given(st.lists(cells, max_size=8), st.integers(min_value=1, max_value=50))
@settings(max_examples=100, deadline=None)
def test_csv_parts_concatenation_is_whole_document(rows, flush):
    # width-normalize rows
    rows = [r[:3] + [""] * (3 - len(r[:3])) for r in rows]
    parts = list(rows_to_csv_parts(["a", "b", "c"], rows, flush_chars=flush))
    doc = "".join(parts)
    parsed = list(csv.reader(io.StringIO(doc)))
    assert parsed == [["a", "b", "c"]] + rows
    # every chunk except the last respects the flush threshold lower bound
    for p in parts[:-1]:
        assert len(p) >= flush


mixed_values = st.one_of(
    st.none(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=30),
    st.booleans(),
    st.datetimes(
        min_value=dt.datetime(1970, 1, 1), max_value=dt.datetime(2100, 1, 1)
    ),
    st.lists(st.integers(min_value=0, max_value=9), max_size=4),
    st.dictionaries(st.sampled_from(["k1", "k2"]), st.integers(0, 9), max_size=2),
)


@given(mixed_values)
@settings(max_examples=300, deadline=None)
def test_format_cell_is_total_and_stringly(v):
    out = format_cell(v)
    assert isinstance(out, str)
    if v is None:
        assert out == ""


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_csv_escape_only_quotes_when_needed(s):
    out = csv_escape(s)
    needs = any(c in s for c in ',"\n\r')
    if needs:
        assert out.startswith('"') and out.endswith('"')
        assert out[1:-1] == s.replace('"', '""')
    else:
        assert out == s
