"""Canonical cell text form — reference operator A14/A18.

``formatCell`` (``/root/reference/src/arrow.ts:3-15``) defines the canonical
string form used by BOTH the preview table and the CSV export:

* null → ``''``
* bigint → decimal string
* Date → ISO-8601 (``toISOString()``, i.e. ``YYYY-MM-DDTHH:MM:SS.mmmZ``)
* other objects → JSON
* everything else → ``String(value)``

The Python port maps the same families from PySpark row values: int, Decimal,
datetime/date, list/dict/Row, float (JS ``String(number)`` semantics), bool
(JS ``true``/``false``), str.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from decimal import Decimal


def _js_number(value: float) -> str:
    """JS ``String(number)`` for the common cases (no exponent extremes)."""
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    if value == int(value) and abs(value) < 1e21:
        return str(int(value))
    return repr(value)


def _iso(value: _dt.datetime) -> str:
    # JS Date.toISOString(): UTC, milliseconds, trailing Z
    if value.tzinfo is not None:
        value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    ms = value.microsecond // 1000
    return value.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms:03d}Z"


def format_cell(value: object) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if isinstance(value, Decimal):
        return str(value)
    if isinstance(value, _dt.datetime):
        return _iso(value)
    if isinstance(value, _dt.date):
        return _iso(_dt.datetime(value.year, value.month, value.day))
    if isinstance(value, float):
        return _js_number(value)
    if isinstance(value, bytes):
        return json.dumps(list(value))
    if isinstance(value, str):
        return value
    # Row / list / dict → JSON (arrow.ts:7-13)
    try:
        if hasattr(value, "asDict"):
            value = value.asDict(recursive=True)
        return json.dumps(value, default=str, separators=(",", ":"))
    except Exception:
        return str(value)


def bytes_human(size: float) -> str:
    """Human file sizes, ``src/App.tsx:33-42`` (A18)."""
    units = ["B", "KB", "MB", "GB"]
    idx = 0
    value = float(size)
    while value >= 1024 and idx < len(units) - 1:
        value /= 1024
        idx += 1
    return f"{value:.0f} {units[idx]}" if idx == 0 else f"{value:.1f} {units[idx]}"
