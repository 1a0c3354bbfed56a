"""CSV sink — reference operator A13 (byte-parity local path + scale path).

Reference encoding (``/root/reference/src/arrow.ts:17-26,47-88``): header
row; a cell is quoted iff it contains ``"``, ``,``, ``\\n`` or ``\\r``, with
``""`` escaping; CRLF line endings; output flushed in 1,000,000-char chunks.

Two paths:

* :func:`rows_to_csv_parts` — driver-side streaming encoder with the exact
  reference bytes, fed by ``df.toLocalIterator()`` (bounded memory; used for
  oracle/byte-parity tests and small exports).
* :func:`write_csv_distributed` — ``df.write.csv`` for scale: every executor
  writes its partition; no driver bottleneck at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame

from parquet_query_spark.workbench.formatting import format_cell

FLUSH_CHARS = 1_000_000


def csv_escape(value: str) -> str:
    if '"' in value or "," in value or "\n" in value or "\r" in value:
        return '"' + value.replace('"', '""') + '"'
    return value


def csv_line(cells: list[str]) -> str:
    return ",".join(csv_escape(c) for c in cells) + "\r\n"


def rows_to_csv_parts(
    columns: list[str],
    rows: Iterable,
    header: bool = True,
    flush_chars: int = FLUSH_CHARS,
) -> Iterator[str]:
    """Stream CSV chunks (≥``flush_chars`` each except the last)."""
    buffer = csv_line(list(columns)) if header else ""
    for row in rows:
        buffer += csv_line([format_cell(v) for v in row])
        if len(buffer) >= flush_chars:
            yield buffer
            buffer = ""
    if buffer:
        yield buffer


def export_csv(df: DataFrame, path: str, header: bool = True) -> int:
    """Reference-byte-parity export via toLocalIterator; returns row count."""
    n = 0

    def _rows():
        nonlocal n
        for row in df.toLocalIterator():
            n += 1
            yield row
    with open(path, "w", newline="") as f:
        for part in rows_to_csv_parts(df.columns, _rows(), header=header):
            f.write(part)
    return n


def write_csv_distributed(df: DataFrame, path: str, header: bool = True) -> None:
    """Scale path: distributed write, one file per partition."""
    df.write.mode("overwrite").option("header", header).csv(path)
