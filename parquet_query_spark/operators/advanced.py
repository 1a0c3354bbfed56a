"""Advanced aggregate/window/array coverage (SURVEY §2.C long tail).

Statistical moments, arg-min/max, ordered string aggregation, exact median,
higher-order array functions, n-gram frequency top-k, HAVING, value-window
functions, distribution ranks, and batch sliding windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from parquet_query_spark.operators.catalog import query, views


@query(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_quantity), 4)         AS qty_var,
       round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistics — single-pass, mergeable partial state."""
    v = views(spark, sf_dir)
    return (
        v["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_argminmax",
    oracle="""
SELECT o_orderstatus,
       max_by(o_custkey, o_orderkey) AS latest_cust,
       min_by(o_custkey, o_orderkey) AS first_cust,
       max(o_orderkey)               AS max_orderkey
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("aggregate",),
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/max with a UNIQUE ordering value (o_orderkey) — ties under
    max_by are engine-defined, so the ordering key must be total."""
    v = views(spark, sf_dir)
    return (
        v["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.max_by("o_custkey", "o_orderkey").alias("latest_cust"),
            F.min_by("o_custkey", "o_orderkey").alias("first_cust"),
            F.max("o_orderkey").alias("max_orderkey"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_ordered_string_agg",
    oracle="""
SELECT c_mktsegment,
       string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    tags=("aggregate",),
)
def agg_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct string aggregation — collect_set → array_sort →
    array_join keeps the merge associative (safe under partial agg),
    equivalent to DuckDB's ordered string_agg."""
    v = views(spark, sf_dir)
    return (
        v["customer"]
        .join(F.broadcast(v["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(F.array_sort(F.collect_set("n_name")), ",").alias("nations")
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_exact_median",
    oracle="""
SELECT o_orderstatus,
       floor(median(o_totalprice) * 10000 + 0.5) / 10000          AS median_price,
       floor(quantile_cont(o_totalprice, 0.25) * 10000 + 0.5) / 10000 AS p25,
       floor(quantile_cont(o_totalprice, 0.75) * 10000 + 0.5) / 10000 AS p75
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
    tags=("aggregate", "stats"),
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/quartiles (continuous interpolation).  Exact percentiles
    buffer the group — at 100 TB prefer `percentile_approx` (see
    agg_approx_distinct); this is the small-group/exactness path."""
    v = views(spark, sf_dir)
    return (
        v["orders"]
        .groupBy("o_orderstatus")
        .agg(
            # floor(x*1e4+0.5)/1e4, not round(): interpolated medians land
            # on exact .5 boundaries where round()'s half-rule diverges
            (F.floor(F.median("o_totalprice") * 10000 + 0.5) / 10000).alias("median_price"),
            (F.floor(F.percentile("o_totalprice", F.lit(0.25)) * 10000 + 0.5) / 10000).alias("p25"),
            (F.floor(F.percentile("o_totalprice", F.lit(0.75)) * 10000 + 0.5) / 10000).alias("p75"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "array_higher_order_functions",
    oracle="""
SELECT vec_id,
       len(list_filter(embedding, x -> x > 0))                          AS n_positive,
       CASE WHEN len(list_filter(embedding, x -> x > 2.0)) > 0
            THEN true ELSE false END                                     AS any_gt2,
       array_to_string(list_transform(embedding[1:3],
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS VARCHAR)),
           ',')                                                          AS head3,
       round(CAST(list_sum(list_transform(embedding, x -> CASE WHEN x > 0
             THEN CAST(x AS DOUBLE) ELSE 0.0 END)) AS DOUBLE), 4)        AS pos_sum
FROM embeddings
ORDER BY vec_id
""",
    tags=("array", "scalar"),
)
def array_higher_order_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter/exists/slice/transform/aggregate — the lambda-expression
    family, all evaluated inside codegen (no Python)."""
    v = views(spark, sf_dir)
    return (
        v["embeddings"]
        .select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
            F.exists("embedding", lambda x: x > 2.0).alias("any_gt2"),
            # stringified (scaled-int) form: array-typed output columns crash
            # the driver's row canonicalizer, so render "12345,-678,9" instead
            F.concat_ws(
                ",",
                F.transform(
                    F.slice("embedding", 1, 3),
                    lambda x: F.floor(x.cast("double") * 10000 + 0.5)
                    .cast("bigint")
                    .cast("string"),
                ),
            ).alias("head3"),
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + F.when(x > 0, x.cast("double")).otherwise(0.0),
                ),
                4,
            ).alias("pos_sum"),
        )
        .orderBy("vec_id")
    )


@query(
    "text_ngram_topk",
    oracle="""
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents) t
GROUP BY token
ORDER BY freq DESC, token
LIMIT 50
""",
    tags=("text", "topk"),
)
def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-k: explode → partial-agg count → top-k.
    The map-side partial aggregation collapses each partition to its
    vocabulary before the shuffle — the only scalable shape for 100 TB."""
    v = views(spark, sf_dir)
    return (
        v["documents"]
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "token")
        .limit(50)
    )


@query(
    "agg_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS n_orders, round(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15 AND SUM(o_totalprice) > 3000000
ORDER BY o_custkey
""",
    tags=("aggregate",),
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING — post-aggregation predicate."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_custkey, COUNT(*) AS n_orders, round(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 15 AND SUM(o_totalprice) > 3000000
        ORDER BY o_custkey
        """
    )


@query(
    "window_first_last_value",
    oracle="""
SELECT o_custkey, o_orderkey,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
    tags=("window",),
)
def window_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value windows — last_value needs the full-frame
    spelling (the default frame ends at CURRENT ROW in both engines)."""
    v = views(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        v["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(w_full).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_distribution_ranks",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6)    AS cume,
       dense_rank() OVER w             AS drank
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)
ORDER BY o_orderkey
""",
    tags=("window",),
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist/dense_rank — tie-stable (equal values share a
    rank), so no artificial tie-break is needed."""
    v = views(spark, sf_dir)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice")
    return (
        v["orders"]
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.dense_rank().over(w).alias("drank"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "events_sliding_window_counts",
    oracle="""
WITH assigned AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL '1' HOUR AS window_start, event_type FROM events
)
SELECT window_start, event_type, COUNT(*) AS n
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    tags=("events", "window"),
)
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide) in batch via ``window()`` — each
    event lands in exactly two windows; the oracle materializes the same
    assignment with a UNION ALL of the two hour-truncations."""
    v = views(spark, sf_dir)
    return (
        v["events"]
        .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
        .orderBy("window_start", "event_type")
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT c_mktsegment, n_name,
       GROUPING(c_mktsegment) AS g_seg, GROUPING(n_name) AS g_nat,
       COUNT(*) AS n_customers, round(SUM(c_acctbal), 2) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), (n_name), ())
ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, n_name NULLS FIRST
""",
    tags=("aggregate", "groupingsets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond ROLLUP/CUBE): four chosen granularities
    in one shuffle; GROUPING() disambiguates real NULL keys from subtotal
    rows — identical SQL both dialects."""
    views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, n_name,
               GROUPING(c_mktsegment) AS g_seg, GROUPING(n_name) AS g_nat,
               COUNT(*) AS n_customers, round(SUM(c_acctbal), 2) AS total_balance
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((c_mktsegment, n_name), (c_mktsegment), (n_name), ())
        ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, n_name NULLS FIRST
        """
    )


@query(
    "agg_exact_quantiles",
    oracle="""
SELECT l_returnflag,
       floor(quantile_cont(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS p25,
       floor(quantile_cont(l_extendedprice, 0.50) * 100 + 0.5) / 100 AS p50,
       floor(quantile_cont(l_extendedprice, 0.75) * 100 + 0.5) / 100 AS p75,
       floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.5) / 100 AS p95
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "quantile"),
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile per group (`percentile` = linear interpolation,
    same definition as DuckDB's quantile_cont).  For 100 TB you'd flip to
    `approx_percentile` (t-digest-style mergeable sketch, no full sort) —
    exposed as the weak-oracle `agg_approx_quantiles`."""
    li = views(spark, sf_dir)["lineitem"]
    # floor(x*100+0.5)/100 instead of round(): both engines produce the SAME
    # interpolated double, but round()'s half-rule on inexact doubles is
    # engine-dependent (even-count medians land on exact half-cents);
    # pure double arithmetic is identical on identical inputs
    q = lambda p: F.floor(F.percentile("l_extendedprice", F.lit(p)) * 100 + 0.5) / 100  # noqa: E731
    return (
        li.groupBy("l_returnflag")
        .agg(
            q(0.25).alias("p25"),
            q(0.50).alias("p50"),
            q(0.75).alias("p75"),
            q(0.95).alias("p95"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_approx_quantiles",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       (abs(approx_quantile(l_extendedprice, 0.25)
            - quantile_cont(l_extendedprice, 0.25))
          <= 0.05 * quantile_cont(l_extendedprice, 0.25))::INTEGER AS ap25_within_5pct,
       (abs(approx_quantile(l_extendedprice, 0.50)
            - quantile_cont(l_extendedprice, 0.50))
          <= 0.05 * quantile_cont(l_extendedprice, 0.50))::INTEGER AS ap50_within_5pct,
       (abs(approx_quantile(l_extendedprice, 0.75)
            - quantile_cont(l_extendedprice, 0.75))
          <= 0.05 * quantile_cont(l_extendedprice, 0.75))::INTEGER AS ap75_within_5pct,
       (abs(approx_quantile(l_extendedprice, 0.95)
            - quantile_cont(l_extendedprice, 0.95))
          <= 0.05 * quantile_cont(l_extendedprice, 0.95))::INTEGER AS ap95_within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    tags=("aggregate", "quantile", "approx"),
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles (`approx_percentile`) — the mergeable,
    single-pass form that replaces the exact sort at cluster scale.

    Sketch outputs are engine-specific, so the verifiable column is a
    per-quantile tolerance flag: each engine checks its own sketch against
    its own exact quantile (both deterministic on fixed input) and emits 1
    — hash-matchable across engines while still running the real sketch.
    Note each approx_percentile call builds its own independent sketch
    (four sketches per group, not one probed 4×); the array form would
    share one, but array outputs crash the driver canonicalizer."""
    li = views(spark, sf_dir)["lineitem"]

    def flag(p: float, name: str) -> F.Column:
        exact = F.percentile("l_extendedprice", F.lit(p))
        approx = F.approx_percentile("l_extendedprice", F.lit(p))
        return (F.abs(approx - exact) <= 0.05 * exact).cast("int").alias(name)

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            flag(0.25, "ap25_within_5pct"),
            flag(0.50, "ap50_within_5pct"),
            flag(0.75, "ap75_within_5pct"),
            flag(0.95, "ap95_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "window_range_frame_weekly_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, day_no,
       round(SUM(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY day_no
         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev_7d
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             datediff('day', DATE '1995-01-01', o_orderdate) AS day_no
      FROM orders)
ORDER BY o_custkey, day_no, o_orderkey
""",
    tags=("window", "rangeframe"),
)
def window_range_frame_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): trailing-7-day
    revenue per customer.  Day numbers make the frame numeric so the exact
    same frame definition runs on both engines."""
    from pyspark.sql import Window as W

    o = views(spark, sf_dir)["orders"].withColumn(
        "day_no", F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
    )
    w = W.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-6, W.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "day_no",
            F.round(F.sum("o_totalprice").over(w), 2).alias("rev_7d"),
        )
        .orderBy("o_custkey", "day_no", "o_orderkey")
    )


@query(
    "array_functions2",
    oracle="""
SELECT r_regionkey,
       array_to_string([r_regionkey, r_regionkey * 2, r_regionkey * 3], ',') AS triples,
       array_to_string(list_slice([10, 20, 30, 40, 50], 2, 4), ',')          AS mid,
       list_position([5, 1, 4, 1], 1)                                        AS first_one,
       array_to_string(list_sort([3, 1, 2], 'DESC'), ',')                    AS sorted_desc,
       array_to_string(flatten([[1, 2], [3], []]), ',')                      AS flat,
       list_contains([1, 2, 3], r_regionkey)                                 AS has_key,
       array_to_string([r_regionkey, 9], '-')                                AS joined,
       array_to_string(range(1, r_regionkey + 2), ',')                       AS upto
FROM region
ORDER BY r_regionkey
""",
    tags=("scalar", "nested"),
)
def array_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function sweep beyond the higher-order basics: construction,
    slice, position, sort, flatten, contains, join, sequence.  Name deltas
    live in the oracle (DuckDB ``list_*``; DuckDB ``range`` is
    end-exclusive vs Spark ``sequence`` inclusive, adjusted by bounds)."""
    v = views(spark, sf_dir)
    return (
        v["region"]
        .select(
            "r_regionkey",
            # integer arrays rendered "a,b,c" — array-typed output columns
            # crash the driver canonicalizer; int→string is engine-identical
            F.array_join(
                F.array(
                    F.col("r_regionkey"),
                    F.col("r_regionkey") * 2,
                    F.col("r_regionkey") * 3,
                ),
                ",",
            ).alias("triples"),
            F.array_join(
                F.slice(F.array(*[F.lit(x) for x in (10, 20, 30, 40, 50)]), 2, 3), ","
            ).alias("mid"),
            F.array_position(F.array(F.lit(5), F.lit(1), F.lit(4), F.lit(1)), 1).alias("first_one"),
            F.array_join(
                F.sort_array(F.array(F.lit(3), F.lit(1), F.lit(2)), asc=False), ","
            ).alias("sorted_desc"),
            F.array_join(
                F.flatten(
                    F.array(
                        F.array(F.lit(1), F.lit(2)),
                        F.array(F.lit(3)),
                        F.array().cast("array<int>"),
                    )
                ),
                ",",
            ).alias("flat"),
            F.array_contains(F.array(F.lit(1), F.lit(2), F.lit(3)), F.col("r_regionkey")).alias("has_key"),
            F.array_join(F.array(F.col("r_regionkey"), F.lit(9)), "-").alias("joined"),
            F.array_join(F.sequence(F.lit(1), F.col("r_regionkey") + 1), ",").alias("upto"),
        )
        .orderBy("r_regionkey")
    )


@query(
    "scalar_bitwise_functions",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey & 255 AS BIGINT)  AS and_mask,
       CAST(o_orderkey | 4096 AS BIGINT) AS or_flag,
       CAST(xor(o_orderkey, 21845) AS BIGINT) AS xor_pat,
       CAST(o_orderkey << 3 AS BIGINT)   AS shl3,
       CAST(o_orderkey >> 2 AS BIGINT)   AS shr2,
       CAST(bit_count(o_orderkey) AS INTEGER) AS popcount
FROM orders
WHERE o_orderkey < 200
ORDER BY o_orderkey
""",
    tags=("scalar",),
)
def scalar_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR masks, shifts, popcount — the
    primitives under every hash/bitmap/bloom construction in the catalog,
    exercised directly as a scalar sweep (the delegated-SQL tier a
    workbench user reaches with bit tricks).  Pure codegen scan."""
    v = views(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        v["orders"]
        .where(k < 200)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).cast("bigint").alias("and_mask"),
            k.bitwiseOR(F.lit(4096)).cast("bigint").alias("or_flag"),
            k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("xor_pat"),
            F.expr("shiftleft(o_orderkey, 3)").cast("bigint").alias("shl3"),
            F.expr("shiftright(o_orderkey, 2)").cast("bigint").alias("shr2"),
            F.expr("bit_count(o_orderkey)").cast("int").alias("popcount"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('quarter', o_orderdate) AS DATE)      AS quarter_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)     AS month_end,
       CAST(extract(quarter FROM o_orderdate) AS INTEGER)    AS q,
       CAST(extract(dow FROM o_orderdate) AS INTEGER)        AS dow_sun0,
       CAST(extract(doy FROM o_orderdate) AS INTEGER)        AS doy,
       CAST(o_orderdate + INTERVAL 45 DAY AS DATE)           AS plus45,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT)
                                                             AS days_since_95,
       strftime(o_orderdate, '%Y-%m')                        AS ym
FROM orders
WHERE o_orderkey <= 2000
ORDER BY o_orderkey
""",
    tags=("scalar", "temporal"),
)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar-function parity sweep (the date twin of the
    string/bitwise sweeps): quarter truncation, month end, quarter/
    day-of-week/day-of-year extraction, interval arithmetic, day diffs,
    and formatting.  DOW is normalized to DuckDB's Sunday=0 convention
    (Spark's dayofweek is Sunday=1)."""
    v = views(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        v["orders"]
        .where(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
            F.last_day(d).alias("month_end"),
            F.quarter(d).cast("int").alias("q"),
            (F.dayofweek(d) - 1).cast("int").alias("dow_sun0"),
            F.dayofyear(d).cast("int").alias("doy"),
            F.date_add(d.cast("date"), 45).alias("plus45"),
            F.datediff(d, F.lit("1995-01-01")).cast("bigint").alias("days_since_95"),
            F.date_format(d, "yyyy-MM").alias("ym"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "agg_exact_mode_per_group",
    oracle="""
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
)
SELECT o_orderpriority,
       arg_max(o_orderstatus,
               lpad(CAST(n AS VARCHAR), 12, '0') || '|' || o_orderstatus)
         AS mode_status,
       CAST(MAX(n) AS BIGINT) AS mode_n,
       CAST(SUM(n) AS BIGINT) AS total_n
FROM c
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("aggregate",),
)
def agg_exact_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group statistical mode with a total tie-break (highest
    count, then highest value — one zero-padded count||value max_by key,
    so both engines agree bit-for-bit).  Spark has no mode() aggregate;
    the two-level rollup IS the scalable formulation — the value-count
    layer map-side combines, and the argmax layer runs on
    |groups|x|values| rows."""
    v = views(spark, sf_dir)
    c = v["orders"].groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return (
        c.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "max_by(o_orderstatus, concat_ws('|', lpad(CAST(n AS STRING), 12, '0'), o_orderstatus))"
            ).alias("mode_status"),
            F.max("n").cast("bigint").alias("mode_n"),
            F.sum("n").cast("bigint").alias("total_n"),
        )
        .orderBy("o_orderpriority")
    )
