"""TPC-H-shaped golden queries over the driver's star schema.

These exercise the §2.B/§2.C relational surface (scan → filter → project →
join → aggregate → sort → limit) with the plans a 100 TB deployment wants:

* Filters/projections are expressed declaratively so Catalyst pushes them
  into the Parquet scan (row-group pruning + column pruning).
* Dimension tables (region/nation/customer/supplier/part) are tiny relative
  to the fact tables — AQE picks broadcast joins; `F.broadcast` hints are
  placed where the small side is known a priori so the plan is broadcast even
  without runtime stats.
* Aggregations are partial (map-side) + final automatically; sorts feeding a
  LIMIT plan as TakeOrderedAndProject (no global sort).

Floating-point aggregates are rounded for oracle determinism (see
catalog.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_query_spark.operators.catalog import query, views


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(SUM(l_quantity), 2)                                        AS sum_qty,
       round(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       round(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(AVG(l_quantity), 4)                                        AS avg_qty,
       round(AVG(l_extendedprice), 4)                                   AS avg_price,
       round(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    tags=("aggregate", "bench"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: wide aggregation; partial agg keeps the shuffle tiny."""
    li = views(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "aggregate", "topk", "bench"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: fact-fact join + broadcast dim; top-k via TakeOrdered."""
    v = views(spark, sf_dir)
    cust = v["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = v["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = v["lineitem"].where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    tags=("join", "aggregate", "bench"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; dims broadcast, facts shuffle on join keys."""
    v = views(spark, sf_dir)
    return (
        v["lineitem"]
        .join(
            v["orders"].where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(v["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(v["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(v["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(v["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    tags=("aggregate", "pushdown", "bench"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; all four predicates push to Parquet."""
    li = views(spark, sf_dir)["lineitem"]
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


@query(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       round(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       round(c_acctbal, 2) AS acctbal,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "aggregate", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue ranking."""
    v = views(spark, sf_dir)
    return (
        v["lineitem"].where(F.col("l_returnflag") == "R")
        .join(
            v["orders"].where(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(v["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(v["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "pushdown_scan_project",
    oracle="""
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-10-01' AND l_quantity > 45
ORDER BY l_orderkey, l_linenumber
""",
    tags=("pushdown",),
)
def pushdown_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal scan: 2 predicates + 3-column projection, both pushed to the
    Parquet reader (verified in tests via the physical plan's PushedFilters /
    ReadSchema)."""
    li = views(spark, sf_dir)["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("2001-10-01").cast("timestamp"))
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price"))
        .orderBy("l_orderkey", "l_linenumber")
    )
