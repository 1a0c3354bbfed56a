"""Query/operator catalog — the engine's SURVEY §2 coverage inventory.

Every implemented operator registers here as a :class:`QuerySpec`:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation (DataFrame
  API or ``spark.sql`` — whichever reads better; Catalyst sees the same plan).
* ``oracle`` — the equivalent ANSI SQL DuckDB runs over the same parquet
  files (views: region nation customer supplier part orders lineitem events
  documents embeddings).  ``None`` marks a genuinely non-SQL-expressible
  operator (the driver then records a weaker rows-only check).

Determinism contract for oracle-checked queries (the driver hash-compares
values): every floating-point aggregate is rounded; every LIMIT/top-k has a
total order (unique tie-break key); column names are identical on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_query_spark.sources.registry import register_testdata_views


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    doc: str = ""


CATALOG: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register an operator implementation in the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = QuerySpec(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def ordered_once(df: DataFrame, *keys: str) -> DataFrame:
    """``df.orderBy(*keys)`` with the expensive child computed ONCE.

    A global sort range-partitions its input, and the RangePartitioner's
    bound-sampling job computes the ENTIRE child plan a first time before
    the shuffle map tasks compute it again — so a query shaped
    ``scan → expensive projection → orderBy`` (regex/hash expression
    chains, mapInPandas kernels) pays the projection twice (guide §1.2:
    remove unnecessary passes; measured r13: dedup_simhash 0.86 → 0.62 s
    at sf0.1 — the whole Python/Arrow signature pass was running twice).

    Hash-repartitioning on the sort key first inserts a materialization
    point: the heavy child is computed once into the hash exchange, AQE
    materializes that stage, and both the sampling job and the range
    shuffle read the (slim) materialized rows.  The extra exchange moves
    only the projected output — at 100 TB that is orders of magnitude
    smaller than re-scanning and re-hashing the corpus.  The final
    ordering is identical: rows end range-partitioned and sorted by
    ``keys`` either way."""
    return df.repartition(*[F.col(k) for k in keys]).orderBy(*keys)


_VIEW_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
_ACTIVE_DIR: dict[int, str] = {}


def views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register the driver tables for this sf_dir.

    Memoized per (session, dir) — re-registering re-reads 10 parquet footers
    per query.  SQL-text queries resolve against the session's CURRENT temp
    views, so switching dirs must re-register even on a cache hit."""
    key = (id(spark), sf_dir)
    if key not in _VIEW_CACHE or _ACTIVE_DIR.get(id(spark)) != sf_dir:
        out = register_testdata_views(spark, sf_dir)
        if not out:
            raise FileNotFoundError(f"no driver parquet tables found in {sf_dir!r}")
        _VIEW_CACHE[key] = out
        _ACTIVE_DIR[id(spark)] = sf_dir
    return _VIEW_CACHE[key]


_LOADED = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so the catalog is fully populated."""
    global _LOADED
    if not _LOADED:
        from parquet_query_spark.operators import (  # noqa: F401
            tpch,
            tpch_full,
            relational,
            advanced,
            templates,
            events_ops,
            text,
            dedup,
            similarity,
            multimodal,
            misc,
            pipeline,
            temporal,
            scale_patterns,
            sink_queries,
            udfs,
            graph,
            round7,
            round8,
        )
        from parquet_query_spark.streaming import (  # noqa: F401
            stateful,
            streaming_ops,
        )

        _LOADED = True
    return CATALOG
