import datetime as dt
from decimal import Decimal

from parquet_query_spark.workbench.csv_sink import csv_escape, csv_line, rows_to_csv_parts
from parquet_query_spark.workbench.formatting import bytes_human, format_cell


def test_format_cell_null_and_scalars():
    assert format_cell(None) == ""
    assert format_cell(42) == "42"
    assert format_cell(2**40) == str(2**40)
    assert format_cell("x") == "x"
    assert format_cell(True) == "true"
    assert format_cell(False) == "false"


def test_format_cell_floats_js_semantics():
    assert format_cell(1.5) == "1.5"
    assert format_cell(2.0) == "2"  # JS String(2.0) === "2"
    assert format_cell(-0.25) == "-0.25"
    assert format_cell(float("nan")) == "NaN"


def test_format_cell_datetime_iso():
    assert format_cell(dt.datetime(2025, 1, 2, 3, 4, 5, 678000)) == "2025-01-02T03:04:05.678Z"
    assert format_cell(dt.date(2025, 1, 2)) == "2025-01-02T00:00:00.000Z"


def test_format_cell_nested_json():
    assert format_cell([1, 2]) == "[1,2]"
    assert format_cell({"a": 1}) == '{"a":1}'


def test_format_cell_decimal():
    assert format_cell(Decimal("12.30")) == "12.30"


def test_csv_escape_rules():
    assert csv_escape("plain") == "plain"
    assert csv_escape('a"b') == '"a""b"'
    assert csv_escape("a,b") == '"a,b"'
    assert csv_escape("a\nb") == '"a\nb"'
    assert csv_line(["a", "b,c"]) == 'a,"b,c"\r\n'


def test_rows_to_csv_parts_flush():
    rows = [["x" * 10] for _ in range(100)]
    parts = list(rows_to_csv_parts(["c"], rows, flush_chars=120))
    assert "".join(parts).startswith("c\r\n")
    assert "".join(parts).count("\r\n") == 101
    assert all(len(p) >= 120 for p in parts[:-1])


def test_bytes_human():
    assert bytes_human(512) == "512 B"
    assert bytes_human(2048) == "2.0 KB"
