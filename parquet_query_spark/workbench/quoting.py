"""Identifier & literal quoting (SURVEY §1.4).

Reference rules (``/root/reference/src/App.tsx:44-53``): string literals are
single-quoted with ``''`` escaping; identifiers are bare when they match
``^[A-Za-z_][A-Za-z0-9_]*$``, else double-quoted with ``""`` escaping; an
empty identifier is an error.  Spark's quoted-identifier form is backticks
with ``` `` ``` escaping — a deliberate dialect difference carried by
``spark_identifier``.
"""

from __future__ import annotations

import re

_BARE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def sql_string_literal(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def sql_identifier(value: str) -> str:
    """ANSI/DuckDB spelling (double quotes) — used when emitting oracle SQL."""
    trimmed = value.strip()
    if not trimmed:
        raise ValueError("empty table name")
    if _BARE_IDENT.match(trimmed):
        return trimmed
    return '"' + trimmed.replace('"', '""') + '"'


def spark_identifier(value: str) -> str:
    """Spark spelling (backticks)."""
    trimmed = value.strip()
    if not trimmed:
        raise ValueError("empty table name")
    if _BARE_IDENT.match(trimmed):
        return trimmed
    return "`" + trimmed.replace("`", "``") + "`"
