"""Driver-checkable sink round-trips: write → read back → aggregate.

The reference's only sink is the CSV download (``/root/reference/src/
arrow.ts:47-88``, ported in workbench/csv_sink.py); these queries prove the
*engine* sink surface (sources/sinks.py) end-to-end under the correctness
gate: the write is lossless, the read-back scan prunes, and the final
aggregate matches DuckDB computed directly on the source table.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_query_spark.operators.catalog import query, views
from parquet_query_spark.sources.sinks import (
    drop_table,
    write_bucketed_table,
    write_parquet,
)


def _drop_with_location(spark: SparkSession, name: str) -> None:
    """Drop a managed table AND its warehouse directory.

    A fresh session's in-memory catalog forgets managed tables, but their
    warehouse directories survive — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS.  Clear both."""
    import shutil
    from urllib.parse import urlparse

    drop_table(spark, name)
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{path.rstrip('/')}/{name}", ignore_errors=True)


@query(
    "sink_roundtrip_partitioned",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("sink", "partition"),
)
def sink_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet round-trip: write orders partitioned by
    o_orderstatus, read back filtering on the partition column, aggregate.

    The filter is satisfied by directory pruning (PartitionFilters in the
    scan, zero data-filter rows read from the excluded partition) — the
    oracle aggregates the source table directly, so a green row proves the
    sink is lossless AND the pruned read is complete.  Money is summed as
    integer cents (order-independent, no float shuffle drift)."""
    import os
    import shutil

    v = views(spark, sf_dir)
    # Fixed scratch path, delete-then-write: repeated bench/correctness runs
    # reuse one directory instead of leaking a fresh mkdtemp copy each time.
    out = os.path.join(tempfile.gettempdir(), "pqs_sink_roundtrip_part")
    shutil.rmtree(out, ignore_errors=True)
    write_parquet(v["orders"], out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out).where(F.col("o_orderstatus").isin("F", "O"))
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("double")
                / 100.0
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sink_roundtrip_bucketed_join",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("sink", "bucket", "join"),
)
def sink_roundtrip_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table round-trip: persist orders and lineitem bucketed on
    the join key, join the bucketed tables, aggregate.

    Both sides bucketed on orderkey with the same bucket count → the join
    plans with ZERO Exchange (asserted in tests/test_sinks.py); at 100 TB
    this is the layout that turns every recurring fact-fact join into a
    local merge.  The oracle runs the same join on the raw tables, so a
    green row proves bucketed write + bucket-aware join return identical
    results to the shuffle join."""
    v = views(spark, sf_dir)
    for t in ("sink_rt_orders_b", "sink_rt_lineitem_b"):
        _drop_with_location(spark, t)
    write_bucketed_table(
        v["orders"].select("o_orderkey", "o_orderpriority"),
        "sink_rt_orders_b",
        ["o_orderkey"],
        num_buckets=8,
    )
    write_bucketed_table(
        v["lineitem"].select("l_orderkey", "l_extendedprice"),
        "sink_rt_lineitem_b",
        ["l_orderkey"],
        num_buckets=8,
    )
    o = spark.table("sink_rt_orders_b")
    li = spark.table("sink_rt_lineitem_b")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).cast("double")
                / 100.0
            ).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


__all__ = ["sink_roundtrip_partitioned", "sink_roundtrip_bucketed_join", "drop_table"]
