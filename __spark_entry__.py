"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 inventory +
LLM-pipeline extensions), each ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — DuckDB-equivalent SQL per query (omitted only for
genuinely non-SQL-expressible operators: sketches, LSH-ANN, SimHash,
frame sampling).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from parquet_query_spark.operators.catalog import load_all

    return load_all()


# Driver-facing presentation order — MECHANIZED staleness rotation
# (VERDICT r7 Next-round #2 + #8).  The correctness harness samples the
# catalog front-to-back (~50 slots per round), so the order is computed
# from the committed CORRECTNESS_r*.json files: operators with NO green
# driver row yet sort first (new-this-round ops automatically land inside
# the sample window), then everything else oldest-green-row-first, so the
# ops whose last driver confirmation predates engine-wide semantic changes
# (raw string literals, NULLS LAST, ANSI indexing) are re-witnessed before
# recently-confirmed ones.  `staleness_check.py` prints the same
# computation as a human-readable report.  _DRIVER_PRIORITY remains as a
# manual override escape hatch (names listed here go before the computed
# rotation); empty while the rotation needs no exceptions.
_DRIVER_PRIORITY: list[str] = []


def _latest_green_rounds() -> dict[str, int]:
    """Per operator, the latest round with a green driver CORRECTNESS row
    (err-free, rows matched, and neither schema nor value hash failed).
    Missing/unparseable files are skipped — worst case the order degrades
    to catalog-registration order, never an import failure."""
    import glob
    import json
    import os
    import re

    base = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(base, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except Exception:
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


_DRIVER_LAST: list[str] = []


def _ordered(catalog):
    first = [n for n in _DRIVER_PRIORITY if n in catalog]
    last = [n for n in _DRIVER_LAST if n in catalog]
    placed = set(first) | set(last)
    latest = _latest_green_rounds()
    # never-green (round 0) first, then oldest green row first; name
    # tiebreak keeps the order deterministic across runs
    rest = sorted(
        (n for n in catalog if n not in placed),
        key=lambda n: (latest.get(n, 0), n),
    )
    return {n: catalog[n] for n in (*first, *rest, *last)}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    from parquet_query_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    catalog = _catalog()
    return catalog["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    catalog = _catalog()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from parquet_query_spark.session import ensure_session_confs

            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in _ordered(catalog).items()}


def oracle_sql() -> dict[str, str]:
    catalog = _catalog()
    return {name: spec.oracle for name, spec in _ordered(catalog).items() if spec.oracle}
