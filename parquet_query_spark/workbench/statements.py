"""Statement lexing/splitting — reference operator A6.

Semantics re-expressed 1:1 from ``/root/reference/src/App.tsx:66-151``
(``statementAtPosition``): the buffer is lexed with awareness of
single-quoted strings (``''`` escape), double-quoted identifiers (``""``
escape), ``--`` line comments and ``/* */`` block comments; ``;`` outside all
of those splits statements.  The statement containing the cursor wins; if it
is blank, the nearest non-empty statement before (then after) it runs.

This module also owns the ``FROM 'path'`` table-literal rewrite (B4): DuckDB
accepts a quoted file path as a table reference; Spark SQL's native spelling
is ``format.`path```.  The rewrite uses the same lexer so paths inside
comments or ordinary string literals are never touched (SURVEY §7 hard part
(c)).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Segment:
    start: int
    end: int


def _lex_segments(sql: str) -> list[Segment]:
    segments: list[Segment] = []
    start = 0
    in_single = in_double = in_line = in_block = False
    i = 0
    n = len(sql)
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if in_line:
            if ch == "\n":
                in_line = False
        elif in_block:
            if ch == "*" and nxt == "/":
                in_block = False
                i += 1
        elif in_single:
            if ch == "'" and nxt == "'":
                i += 1
            elif ch == "'":
                in_single = False
        elif in_double:
            if ch == '"' and nxt == '"':
                i += 1
            elif ch == '"':
                in_double = False
        elif ch == "-" and nxt == "-":
            in_line = True
            i += 1
        elif ch == "/" and nxt == "*":
            in_block = True
            i += 1
        elif ch == "'":
            in_single = True
        elif ch == '"':
            in_double = True
        elif ch == ";":
            segments.append(Segment(start, i))
            start = i + 1
        i += 1
    segments.append(Segment(start, n))
    return segments


def split_statements(sql: str) -> list[str]:
    """All non-empty ``;``-separated statements, in order (B27)."""
    return [s for seg in _lex_segments(sql) if (s := sql[seg.start : seg.end].strip())]


def statement_at_position(sql: str, position: int) -> str:
    """The statement under the cursor, else nearest non-empty (A6)."""
    segments = _lex_segments(sql)
    pos = max(0, min(position, len(sql)))
    idx = next(
        (i for i, s in enumerate(segments) if s.start <= pos <= s.end),
        len(segments) - 1,
    )

    def pick(i: int) -> str:
        return sql[segments[i].start : segments[i].end].strip()

    if pick(idx):
        return pick(idx)
    for j in range(idx - 1, -1, -1):
        if pick(j):
            return pick(j)
    for j in range(idx + 1, len(segments)):
        if pick(j):
            return pick(j)
    return ""


def has_executable_text(statement: str) -> bool:
    """True if anything other than whitespace/comments remains — a
    comment-only "statement" is not runnable (both engines reject it)."""
    i = 0
    n = len(statement)
    while i < n:
        ch = statement[i]
        nxt = statement[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            while i < n and statement[i] != "\n":
                i += 1
        elif ch == "/" and nxt == "*":
            i += 2
            while i < n - 1 and not (statement[i] == "*" and statement[i + 1] == "/"):
                i += 1
            i += 1
        elif not ch.isspace():
            return True
        i += 1
    return False


_FORMAT_BY_SUFFIX = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".ndjson": "json",
}

# a single-quoted literal in table position, i.e. right after FROM or JOIN
_TABLE_REF_KEYWORD = re.compile(r"(?:\bfrom\b|\bjoin\b)\s*$", re.IGNORECASE)


# Sniffed per-file temp views for path-literal CSV/JSON scans (r12):
# keyed by (session, abs_path, mtime_ns, size) so a re-written file
# (COPY ... TO the same path) re-registers instead of serving a stale
# view, and a second SparkSession never reads another session's view.
_PATH_VIEW_CACHE: dict[tuple, str] = {}
_PATH_VIEW_SEQ = 0


def _spark_path_ref(
    path: str,
    root: str | None,
    registered: dict[str, str] | None,
    spark=None,
) -> str | None:
    if registered and path in registered:
        # imported file: its per-file view carries the right reader options
        # (csv header/multiline, json multiline, nanos repair)
        return f"`{registered[path]}`"
    lower = path.lower()
    fmt = next(
        (f for suf, f in _FORMAT_BY_SUFFIX.items() if lower.endswith(suf)), None
    )
    if fmt is None:
        return None
    abs_path = path if os.path.isabs(path) else os.path.join(root or ".", path)
    if fmt != "parquet" and spark is not None and os.path.isfile(abs_path):
        # csv/json path scans need READER OPTIONS DuckDB auto-detects
        # (header, delimiter, inferred types, json array form) — a bare
        # ``csv.`path``` reads headerless _c0 strings (fuzz v7 probe).
        # Register a sniffed per-file temp view and reference it.
        st = os.stat(abs_path)
        key = (id(spark), abs_path, st.st_mtime_ns, st.st_size)
        view = _PATH_VIEW_CACHE.get(key)
        if view is None:
            from parquet_query_spark.sources.registry import reader_for

            global _PATH_VIEW_SEQ
            _PATH_VIEW_SEQ += 1
            view = f"__path_scan_{_PATH_VIEW_SEQ}"
            reader_for(spark, abs_path, sniff=True).createOrReplaceTempView(view)
            _PATH_VIEW_CACHE[key] = view
        return f"`{view}`"
    escaped = abs_path.replace("`", "``")
    return f"{fmt}.`{escaped}`"


def rewrite_path_tables(
    sql: str,
    root: str | None = None,
    registered: dict[str, str] | None = None,
    spark=None,
) -> str:
    """Rewrite ``FROM 'file.parquet'`` → ``FROM parquet.`/abs/file.parquet```.

    Lexer-aware: only single-quoted literals in table position (immediately
    after FROM/JOIN, outside comments/other strings) are rewritten, and only
    when the literal looks like a supported data file (A3 suffix set).
    With a ``spark`` session, csv/json paths resolve through sniffed
    per-file temp views instead of bare format-path scans (r12).
    """
    out: list[str] = []
    i = 0
    n = len(sql)
    in_double = in_line = in_block = False
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if in_line:
            if ch == "\n":
                in_line = False
            out.append(ch)
        elif in_block:
            if ch == "*" and nxt == "/":
                in_block = False
                out.append("*/")
                i += 1
            else:
                out.append(ch)
        elif in_double:
            if ch == '"' and nxt == '"':
                out.append('""')
                i += 1
            elif ch == '"':
                in_double = False
                out.append(ch)
            else:
                out.append(ch)
        elif ch == "-" and nxt == "-":
            in_line = True
            out.append("--")
            i += 1
        elif ch == "/" and nxt == "*":
            in_block = True
            out.append("/*")
            i += 1
        elif ch == '"':
            in_double = True
            out.append(ch)
        elif ch == "'":
            # scan the full single-quoted literal (with '' escapes)
            j = i + 1
            content: list[str] = []
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    content.append("'")
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    content.append(sql[j])
                    j += 1
            literal = "".join(content)
            ref = (
                _spark_path_ref(literal, root, registered, spark)
                if _TABLE_REF_KEYWORD.search("".join(out))
                else None
            )
            if ref is not None:
                out.append(ref)
            else:
                out.append(sql[i : j + 1] if j < n else sql[i:])
            i = j
        else:
            out.append(ch)
        i += 1
    return "".join(out)
