"""Window functions & multi-dimensional grouping (SURVEY.md §2 Tier C:
ranking / analytic / frames, rollup / cube / grouping sets).

The reference has no window functions (SURVEY.md §2 "Tier A is honest"
note) — this tier exists for the query surface the driver mandates.

Scale notes: every window here partitions by a reasonable-cardinality
key (segment, status, month) so state per partition is bounded;
rank<=k filters compile to WindowGroupLimit (partial top-k before the
shuffle) in Spark 3.5+/4.x. Rollup/cube are Expand + one aggregation —
the row multiplication happens after partial aggregation, not on the
raw scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


# --------------------------------------------------------------------------
# Ranking: top-k per group with row_number / rank / dense_rank
# --------------------------------------------------------------------------

def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by price per market segment, with all three ranking
    flavors (deterministic tie-break on o_orderkey)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_orderkey", "o_totalprice")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
    )


WIN_TOPK_PER_GROUP_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn, rnk, drnk
FROM (
    SELECT c_mktsegment, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY o_totalprice DESC, o_orderkey)
) WHERE rn <= 3
"""


# --------------------------------------------------------------------------
# Analytic functions over an ordered series: lag / lead / moving frame
# --------------------------------------------------------------------------

def win_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order revenue with prev/next month and a 3-month moving
    average — lag/lead + a rowsBetween frame over a deterministic
    pre-aggregated series."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    frame = w.rowsBetween(-2, 0)
    return monthly.select(
        "month",
        "revenue",
        "n_orders",
        F.lag("revenue").over(w).alias("prev_revenue"),
        F.lead("revenue").over(w).alias("next_revenue"),
        F.round(F.sum("revenue").over(frame) / F.count(F.lit(1)).over(frame), 6).alias("ma3"),
        F.round(
            F.sum("revenue").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("cum_revenue"),
    )


WIN_MONTHLY_REVENUE_SQL = """
WITH monthly AS (
    SELECT date_trunc('month', o_orderdate) AS month,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders GROUP BY 1
)
SELECT month, revenue, n_orders,
       lag(revenue)  OVER w AS prev_revenue,
       lead(revenue) OVER w AS next_revenue,
       round(sum(revenue) OVER f / count(*) OVER f, 6) AS ma3,
       round(sum(revenue) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING), 2)
           AS cum_revenue
FROM monthly
WINDOW w AS (ORDER BY month),
       f AS (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# ntile + percent-style analytics
# --------------------------------------------------------------------------

def win_ntile_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance quartiles per segment (ntile) + first/last frame
    values — summarized per (segment, quartile) so the output is small
    and deterministic."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal"), F.col("c_custkey")
    )
    tiled = cust.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
    )
    return tiled.groupBy("c_mktsegment", "quartile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
    )


WIN_NTILE_CUSTOMERS_SQL = """
SELECT c_mktsegment, quartile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal,
       round(max(c_acctbal), 2) AS max_bal
FROM (
    SELECT c_mktsegment, c_custkey, c_acctbal,
           ntile(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey) AS quartile
    FROM customer
)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# ROLLUP / CUBE
# --------------------------------------------------------------------------

def win_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (returnflag, linestatus): subtotals + grand total."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


WIN_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def win_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (orderstatus, orderpriority): all grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


WIN_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def win_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of account balance within each market
    segment — the rank-ratio analytics missing from the other window
    queries. Ties share a rank in both engines, so the ratios are
    deterministic; rounding to 9 decimals absorbs nothing but keeps the
    hash stable if either engine changes division order."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume_dist"),
    )


WIN_PERCENTILES_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist()    OVER w, 9) AS cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
"""


def win_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an explicit
    unbounded frame: each order is annotated with its segment's
    cheapest, priciest, and second-cheapest order.

    The frame is UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING so the
    navigation functions see the whole partition (last_value over the
    default frame is the current row — the classic trap both engines
    share; the explicit frame removes the footgun and the ambiguity).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("c_mktsegment", "o_orderkey", "o_totalprice")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return joined.select(
        "c_mktsegment",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("seg_min_price"),
        F.last("o_totalprice").over(w).alias("seg_max_price"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_cheapest_order"),
    )


WIN_VALUE_FRAMES_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice,
       first_value(o_totalprice) OVER w AS seg_min_price,
       last_value(o_totalprice)  OVER w AS seg_max_price,
       nth_value(o_orderkey, 2)  OVER w AS second_cheapest_order
FROM orders JOIN customer ON o_custkey = c_custkey
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


QUERIES = {
    "win_topk_per_group": win_topk_per_group,
    "win_percentiles": win_percentiles,
    "win_value_frames": win_value_frames,
    "win_monthly_revenue": win_monthly_revenue,
    "win_ntile_customers": win_ntile_customers,
    "win_rollup": win_rollup,
    "win_cube": win_cube,
}

ORACLES = {
    "win_topk_per_group": WIN_TOPK_PER_GROUP_SQL,
    "win_percentiles": WIN_PERCENTILES_SQL,
    "win_value_frames": WIN_VALUE_FRAMES_SQL,
    "win_monthly_revenue": WIN_MONTHLY_REVENUE_SQL,
    "win_ntile_customers": WIN_NTILE_CUSTOMERS_SQL,
    "win_rollup": WIN_ROLLUP_SQL,
    "win_cube": WIN_CUBE_SQL,
}
