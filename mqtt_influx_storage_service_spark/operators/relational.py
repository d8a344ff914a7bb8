"""Relational core (SURVEY.md §2 Tier C / §7 step 1): scans, filters,
hash aggregation, broadcast + sort-merge joins, semi/anti joins,
sort/limit/top-k, scalar function surface, JSON access.

These queries exist because the driver's correctness harness exercises
full relational coverage over the TPC-H-ish star schema — the reference
itself has no query engine (it delegates querying to InfluxDB,
SURVEY.md §0), so this tier is the "query capabilities" half of the
mandate.

Determinism: same policy as operators/timeseries.py — money sums are
``round(sum, 2)`` (2-decimal inputs make the rounded sum exact and
order-insensitive); averages are round(sum,2)/count; LIMIT queries
always carry a total deterministic ORDER BY tie-broken by a key.

Scale notes (100 TB): fact-fact joins (lineitem ⋈ orders) are
sort-merge on the join key and would be bucket-co-located in a real
deployment; dimension joins (nation/region/customer) are explicitly
``broadcast()``. Aggregations rely on Catalyst partial aggregation;
no Python functions anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table


# --------------------------------------------------------------------------
# TPC-H Q1 analog — the canonical scan→filter→hash-agg→sort pipeline
# --------------------------------------------------------------------------

def rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape) over lineitem.

    Map-side partial agg into a 6-group final agg — the plan Catalyst
    should pick is Scan(pushed filter on l_shipdate) → partial
    HashAggregate → shuffle(6 keys) → final HashAggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


REL_PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 6) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# TPC-H Q3 analog — 3-way join + agg + deterministic top-k
# --------------------------------------------------------------------------

def rel_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 revenue orders for one segment (TPC-H Q3 shape).

    customer (filtered, small) is broadcast into orders; orders⋈lineitem
    is the big join (sort-merge / AQE's choice). Top-k is orderBy+limit →
    Catalyst's TakeOrderedAndProject (no full sort at scale). Tie-break
    on o_orderkey keeps LIMIT deterministic for the oracle hash.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


REL_TOPK_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# TPC-H Q5 analog — 6-table snowflake join
# --------------------------------------------------------------------------

def rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation within one region where the supplying nation is
    the customer's nation (TPC-H Q5 shape) — the deepest join tree in
    the suite.

    region→nation→customer collapse into one small broadcast side;
    lineitem⋈orders is the only fact-fact shuffle; supplier is
    broadcast with the extra c_nationkey = s_nationkey equi-condition.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


REL_REGION_REVENUE_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Semi / anti joins (the reference's membership filter, A4, promoted)
# --------------------------------------------------------------------------

def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH at least one urgent order (left-semi; EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
    )


REL_SEMI_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS sum_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with NO orders at all (left-anti; NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


REL_ANTI_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# --------------------------------------------------------------------------
# Non-equi (range/theta) join
# --------------------------------------------------------------------------

def rel_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-band self-join on part: pairs within ±1% retail price.

    A true theta join (BNLJ with the small side broadcast). At 100 TB
    this shape needs banding: join on a coarse price-bucket key first
    (equi) then filter the band — both formulations produce the same
    rows; the equi-bucket version is what we'd deploy (see SCALE.md).
    """
    p1 = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("a_key"), F.col("p_retailprice").alias("a_price")
    )
    p2 = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("b_key"), F.col("p_retailprice").alias("b_price")
    )
    pairs = p1.join(
        F.broadcast(p2),
        (F.col("a_key") < F.col("b_key"))
        & (F.col("a_price") >= F.col("b_price") * 0.99)
        & (F.col("a_price") <= F.col("b_price") * 1.01),
    )
    return pairs.select(
        "a_key", "b_key", "a_price", "b_price",
        F.round(F.abs(F.col("a_price") - F.col("b_price")), 2).alias("price_diff"),
    )


REL_RANGE_JOIN_SQL = """
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_retailprice AS a_price, b.p_retailprice AS b_price,
       round(abs(a.p_retailprice - b.p_retailprice), 2) AS price_diff
FROM part a JOIN part b
  ON a.p_partkey < b.p_partkey
 AND a.p_retailprice >= b.p_retailprice * 0.99
 AND a.p_retailprice <= b.p_retailprice * 1.01
"""


# --------------------------------------------------------------------------
# Distinct aggregation mix
# --------------------------------------------------------------------------

def rel_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) alongside plain aggs — Catalyst expands to a
    two-phase distinct-agg plan; exact (not approx) to match DuckDB."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


REL_DISTINCT_AGG_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Scalar-function gauntlet: string / date / math over one scan
# --------------------------------------------------------------------------

def rel_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar surface in one projection (SURVEY.md §2
    Tier C scalar row). Everything stays in whole-stage codegen."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("quarter", F.col("o_orderdate")).alias("o_quarter"),
        F.lower(F.col("o_orderstatus")).alias("status_lower"),
        F.substring(F.col("o_orderpriority"), 1, 1).cast("int").alias("priority_rank"),
        F.regexp_extract(F.col("o_orderpriority"), "^(\\d)-(.+)$", 2).alias("priority_name"),
        F.length(F.col("o_orderpriority")).alias("priority_len"),
        F.concat_ws("#", F.col("o_orderstatus"), F.col("o_orderpriority")).alias("status_tag"),
        # round at 3 (not 2): x*0.1 of a 2-decimal value is a 3-decimal
        # value, so rounding at 2 lands exactly on .xx5 half-way points
        # where Spark (HALF_UP on exact decimal) and DuckDB disagree.
        F.round(F.col("o_totalprice") * 0.1, 3).alias("tithe"),
        F.round(F.sqrt(F.col("o_totalprice")), 6).alias("price_sqrt"),
        F.round(F.ln(F.col("o_totalprice")), 6).alias("price_ln"),
        F.floor(F.col("o_totalprice")).cast("long").alias("price_floor"),
        F.ceil(F.col("o_totalprice")).cast("long").alias("price_ceil"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


REL_SCALAR_FUNCS_SQL = """
SELECT o_orderkey,
       year(o_orderdate)  AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate)   AS o_day,
       date_trunc('quarter', o_orderdate) AS o_quarter,
       lower(o_orderstatus) AS status_lower,
       CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_rank,
       regexp_extract(o_orderpriority, '^(\\d)-(.+)$', 2) AS priority_name,
       length(o_orderpriority) AS priority_len,
       o_orderstatus || '#' || o_orderpriority AS status_tag,
       round(o_totalprice * 0.1, 3) AS tithe,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       round(ln(o_totalprice), 6) AS price_ln,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       o_orderkey % 7 AS key_mod7
FROM orders WHERE o_orderkey < 500
"""


# --------------------------------------------------------------------------
# JSON scalar access (events.props — the reference's service-event JSON,
# influx_service.py:324-328)
# --------------------------------------------------------------------------

def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
        )
    )


REL_JSON_EXTRACT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'k' AS INT)) AS min_k,
       max(CAST(props->>'k' AS INT)) AS max_k,
       count(DISTINCT CAST(props->>'k' AS INT)) AS n_distinct_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over nation-key sets, tagged so all
    three land in one comparable result."""
    cust_n = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_n = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    both = cust_n.intersect(supp_n).withColumn("op", F.lit("both"))
    # subtract == EXCEPT DISTINCT (exceptAll would only cancel one
    # duplicate per match, leaking keys present on both sides)
    cust_only = cust_n.subtract(supp_n).withColumn("op", F.lit("customer_only"))
    supp_only = supp_n.subtract(cust_n).withColumn("op", F.lit("supplier_only"))
    all_n = cust_n.union(supp_n).distinct().withColumn("op", F.lit("any"))
    return both.unionByName(cust_only).unionByName(supp_only).unionByName(all_n)


REL_SET_OPS_SQL = """
SELECT nationkey, 'both' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'customer_only' AS op FROM
  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'supplier_only' AS op FROM
  (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
   EXCEPT SELECT DISTINCT c_nationkey FROM customer)
UNION ALL
SELECT nationkey, 'any' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer
   UNION SELECT s_nationkey FROM supplier)
"""


def rel_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    join so zero-order customers survive with count 0, then a second
    aggregation over the counts. The outer join shuffles both sides on
    the key (sort-merge); null-extension happens stream-side, so the
    plan is the same class as the inner join — no special scale risk
    beyond key skew, which AQE handles."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


REL_OUTER_JOIN_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT OUTER JOIN orders ON c_custkey = o_custkey
                           AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
"""


def rel_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of account balance per segment
    (Spark ``percentile`` == DuckDB ``quantile_cont``), plus the count.
    ``percentile_approx`` (the t-digest sketch used at 100 TB, where an
    exact sort-based percentile is a full shuffle of the column) is
    exercised in tests — its error bound is implementation-defined, so
    the ORACLE pins the exact form."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(c_acctbal, 0.99)"), 6).alias("p99"),
    )


REL_QUANTILES_SQL = """
SELECT c_mktsegment, count(*) AS n,
       round(quantile_cont(c_acctbal, 0.5), 6) AS p50,
       round(quantile_cont(c_acctbal, 0.9), 6) AS p90,
       round(quantile_cont(c_acctbal, 0.99), 6) AS p99
FROM customer GROUP BY c_mktsegment
"""


def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) lineitem's money columns into (measure, value)
    rows and aggregate per measure — the wide→narrow inverse of the
    pivot view. Expand-based: no shuffle until the aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_returnflag"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )
    return melted.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
    )


REL_UNPIVOT_SQL = """
SELECT l_returnflag, measure, count(*) AS n, round(sum(value), 2) AS total
FROM (
    SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
)
GROUP BY l_returnflag, measure
"""


def rel_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (suppliers with any >45-quantity shipment):
    Catalyst de-correlates this to a left-semi join — same physical
    plan as rel_semi_join, but exercising the SQL subquery surface."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("rel_sq_supplier")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("rel_sq_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
        FROM rel_sq_supplier s
        WHERE EXISTS (SELECT 1 FROM rel_sq_lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        """
    )


REL_EXISTS_SUBQUERY_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS acctbal
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s_suppkey AND l_quantity > 45)
"""


def rel_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries: parts priced above their brand's
    average. The comparison is price*count > sum in DECIMAL so both
    engines evaluate it exactly (a double `avg` comparison would hinge
    on last-ulp summation order at the boundary). Catalyst
    de-correlates each scalar subquery to an aggregate + join."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("rel_sq_part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_above_avg
        FROM rel_sq_part p
        WHERE CAST(p_retailprice AS DECIMAL(18,2))
              * (SELECT count(*) FROM rel_sq_part p2
                 WHERE p2.p_brand = p.p_brand)
              > (SELECT sum(CAST(p_retailprice AS DECIMAL(18,2)))
                 FROM rel_sq_part p3 WHERE p3.p_brand = p.p_brand)
        GROUP BY p_brand
        """
    )


REL_SCALAR_SUBQUERY_SQL = """
SELECT p_brand, count(*) AS n_above_avg
FROM part p
WHERE CAST(p_retailprice AS DECIMAL(18,2))
      * (SELECT count(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
      > (SELECT sum(CAST(p_retailprice AS DECIMAL(18,2)))
         FROM part p3 WHERE p3.p_brand = p.p_brand)
GROUP BY p_brand
"""


def rel_range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE formulation of rel_range_join: identical output, but
    candidates come from an EQUI-join on a fine price bucket instead
    of a broadcast theta join — the shape that survives when both
    sides are too big to broadcast (SCALE.md §joins).

    Band sizing is the whole game (r4 lesson: a 50-wide band over the
    fixture's 100-wide price range meant TWO buckets — ~400M candidate
    pairs through 2 tasks, 14.7 s, the slowest query in the suite).
    The band must be a FRACTION of the ±1% predicate window (~19 price
    units here), not a multiple: each probe row explodes to the
    ``sequence`` of bucket ids covering its exact qualifying interval
    ``b_price ∈ [a_price/1.01, a_price/0.99]`` (window/band + 2
    buckets — a constant fan-out), so correctness never depends on the
    band exceeding the window, per-bucket build density shrinks with
    the band, and parallelism = range/band buckets. Candidate volume
    converges to ~2.5× the true output. Buckets are computed on exact
    integer CENTS so both sides agree at boundaries; the ±1-cent slack
    on the probe interval absorbs float division error.
    """
    band_cents = 500  # 5 price units ≈ 1/4 of the qualifying window
    # rebalance: the probe side fans out to ~100M candidate evaluations
    # downstream of a broadcast join — a single-file scan would push all
    # of that through one task
    p1 = load_table(spark, sf_dir, "part", rebalance=True).select(
        F.col("p_partkey").alias("a_key"), F.col("p_retailprice").alias("a_price")
    )
    p2 = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("b_key"), F.col("p_retailprice").alias("b_price")
    )
    lo = F.floor((F.col("a_price") * 100 / 1.01 - 1) / band_cents).cast("long")
    hi = F.floor((F.col("a_price") * 100 / 0.99 + 1) / band_cents).cast("long")
    probes = p1.select(
        "a_key", "a_price", F.explode(F.sequence(lo, hi)).alias("bucket")
    )
    builds = p2.withColumn(
        "bucket",
        (F.round(F.col("b_price") * 100).cast("long") / band_cents)
        .cast("long"),
    )
    pairs = probes.join(builds, "bucket").filter(
        (F.col("a_key") < F.col("b_key"))
        & (F.col("a_price") >= F.col("b_price") * 0.99)
        & (F.col("a_price") <= F.col("b_price") * 1.01)
    )
    return pairs.select(
        "a_key", "b_key", "a_price", "b_price",
        F.round(F.abs(F.col("a_price") - F.col("b_price")), 2).alias("price_diff"),
    )


# --------------------------------------------------------------------------
# Sort-merge join (explicit): large-large equi join, no broadcast
# --------------------------------------------------------------------------

def rel_merge_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with an explicit merge-join hint — the
    fact-fact join strategy at scale (both sides shuffle-partitioned on
    the key; with bucketed tables the shuffle disappears entirely).
    The hint pins the physical strategy so the plan is the one a 100 TB
    deployment runs, regardless of size estimates at test SF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


REL_MERGE_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Interval overlap join (non-equi): order activity windows vs quarters
# --------------------------------------------------------------------------

def rel_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join: each order is 'active' for 30 days from
    o_orderdate; count activity per calendar quarter it overlaps.
    Overlap predicate a.start < b.end AND b.start < a.end over a
    broadcast quarter dimension — the non-equi join becomes a
    BroadcastNestedLoopJoin against 28 rows, which is the right plan
    (the alternative, exploding each order into its quarters, is the
    scale path when the interval side is also huge)."""
    orders = load_table(spark, sf_dir, "orders")
    quarters = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(date'1992-01-01', date'1998-10-01', interval 3 month)"
            )
        ).alias("q_start")
    ).select("q_start", F.add_months("q_start", 3).alias("q_end"))
    o = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("a_start"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("a_end"),
    )
    j = o.join(
        F.broadcast(quarters),
        (F.col("a_start") < F.col("q_end")) & (F.col("q_start") < F.col("a_end")),
    )
    return j.groupBy("q_start").agg(
        F.count(F.lit(1)).alias("n_active_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


REL_INTERVAL_OVERLAP_SQL = """
WITH quarters AS (
    SELECT CAST(gs AS DATE) AS q_start,
           CAST(gs + INTERVAL 3 MONTH AS DATE) AS q_end
    FROM generate_series(DATE '1992-01-01', DATE '1998-10-01',
                         INTERVAL 3 MONTH) t(gs)
), o AS (
    SELECT o_orderkey, o_totalprice,
           CAST(o_orderdate AS DATE) AS a_start,
           CAST(o_orderdate AS DATE) + 30 AS a_end
    FROM orders
)
SELECT q_start, count(*) AS n_active_orders,
       round(sum(o_totalprice), 2) AS sum_price
FROM o JOIN quarters ON a_start < q_end AND q_start < a_end
GROUP BY 1
"""


# --------------------------------------------------------------------------
# GROUPING SETS (explicit, beyond rollup/cube)
# --------------------------------------------------------------------------

def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY GROUPING SETS ((returnflag), (linestatus), ()) — the
    general form rollup/cube specialize; via spark.sql since the
    DataFrame API exposes only the specializations. grouping() flags
    disambiguate real NULLs from subtotal rows."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("rel_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag) AS g_flag,
               grouping(l_linestatus) AS g_status,
               count(*) AS n_items,
               round(sum(l_quantity), 2) AS sum_qty
        FROM rel_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


REL_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
       CAST(grouping(l_linestatus) AS TINYINT) AS g_status,
       count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def rel_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-order revenue ranking (TPC-H Q3 shape): filter both
    fact sides on date, 3-way join, aggregate, global top-10.

    customer is the broadcast dimension; lineitem⋈orders is the one
    fact-fact shuffle (both sides pre-filtered so the shuffle carries
    only qualifying rows). The final orderBy().limit(10) compiles to
    TakeOrderedAndProject — per-partition top-10 then a single-driver
    merge of 10-row heaps, no global sort at any scale. Deterministic
    tie-break on l_orderkey keeps the LIMIT stable for the oracle.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


REL_SHIPPING_PRIORITY_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def rel_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns as a processing step: per-device event-type
    counts collected into a ``map<string,bigint>`` (map_from_entries),
    then probed with element_at / map_keys / size.

    The map itself never leaves the query (outputs are scalars), so the
    DuckDB oracle is plain conditional aggregation — the gate checks
    that Spark's map construction and lookup semantics reproduce it.
    One shuffle: the groupBy; the map assembly is a post-agg projection.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("by_type")
    )
    return mapped.select(
        "user_id",
        F.size("by_type").cast("long").alias("n_types"),
        F.concat_ws(",", F.array_sort(F.map_keys("by_type"))).alias("types"),
        F.coalesce(F.element_at("by_type", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("by_type", "error"), F.lit(0)).alias("n_error"),
    )


REL_MAP_FUNCS_SQL = """
SELECT user_id,
       count(DISTINCT event_type) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error
FROM events
GROUP BY user_id
"""


def rel_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregation — HyperLogLog++ distinct counts and
    quantile sketches per event_type.

    At 100 TB these replace their exact twins (rel_distinct_agg /
    rel_quantiles) wherever a bounded error is acceptable: fixed-size
    partial state, map-side combinable, no per-group sort or rehash.
    Sketch values are implementation-defined, so no DuckDB oracle —
    the driver records rows-only; tests/test_properties.py pins each
    estimate within tolerance of the exact answer.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("value_q"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type",
        "approx_users",
        F.col("value_q")[0].alias("p50"),
        F.col("value_q")[1].alias("p90"),
        F.col("value_q")[2].alias("p99"),
        "n_events",
    )


# --------------------------------------------------------------------------
# TPC-H Q11 shape — HAVING against a global scalar threshold
# --------------------------------------------------------------------------

def rel_revenue_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds a fraction of GLOBAL revenue (TPC-H
    Q11 shape, adapted to the fixture's partsupp-less star): the
    per-group aggregate is compared against a scalar aggregate of the
    WHOLE fact table. The scalar side is a 1-row aggregate broadcast
    onto every group — no second scan pass, no driver round-trip;
    both sides round to cents before comparing so the cut is
    bit-identical across engines. The cut itself is SCALE-FREE (TPC-H
    parameterizes Q11's fraction by 1/SF for the same reason): 1.6x
    the mean per-part share selects the above-average tail at any
    corpus size instead of going empty or all-pass as parts grow.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(
        F.round(rev, 2).alias("part_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    total = li.agg(
        F.round(rev * 1.6 / F.countDistinct("l_partkey"), 2).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_revenue") > F.col("threshold"))
        .join(F.broadcast(part), per_part.l_partkey == part.p_partkey)
        .select(
            "p_partkey", "p_name", "part_revenue", "n_lineitems", "threshold"
        )
    )


REL_REVENUE_THRESHOLD_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_revenue,
           count(*) AS n_lineitems
    FROM lineitem GROUP BY 1
), t AS (
    SELECT round(sum(l_extendedprice * (1 - l_discount)) * 1.6
                 / count(DISTINCT l_partkey), 2) AS threshold
    FROM lineitem
)
SELECT p_partkey, p_name, part_revenue, n_lineitems, threshold
FROM per_part, t
JOIN part ON p_partkey = l_partkey
WHERE part_revenue > threshold
"""


# --------------------------------------------------------------------------
# TPC-H Q22 shape — scalar avg subquery + anti join + group
# --------------------------------------------------------------------------

def rel_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wealthy-but-inactive customers per nation (TPC-H Q22 shape):
    acctbal above the average POSITIVE balance (scalar subquery),
    restricted to customers with no RECENT orders (anti join on the
    date-filtered order set; every fixture customer has some order, so
    the spec's never-ordered form would be vacuously empty), rolled up
    by nation. Scalar side is one broadcast row; the anti join streams
    the customer side against broadcast recent-order keys.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.round(F.round(F.sum("c_acctbal"), 2) / F.count(F.lit(1)), 6).alias(
            "avg_bal"
        )
    )
    inactive = cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return (
        inactive.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


REL_SALES_OPPORTUNITY_SQL = """
WITH ab AS (
    SELECT round(round(sum(c_acctbal), 2) / count(*), 6) AS avg_bal
    FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS n_custs,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer, ab
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# TPC-H Q15 shape — aggregate CTE reused against its own max
# --------------------------------------------------------------------------

def rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with maximum revenue (TPC-H Q15 shape): the revenue
    CTE is referenced twice — once as the relation, once reduced to its
    max — without recomputation: the same lazy plan feeds both and the
    max side is a broadcast single row. Ties (same rounded revenue)
    all return, like the spec's view formulation.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


REL_TOP_SUPPLIER_SQL = """
WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# --------------------------------------------------------------------------
# Suppliers who kept orders waiting (TPC-H Q21 shape)
# --------------------------------------------------------------------------

# The fixtures carry no receipt/commit dates, so "late" is adapted to
# l_shipdate > o_orderdate + LATE_DAYS (90 days ≈ the 75th percentile
# of the fixture's ship delay — late is the exception, as in the spec).
LATE_DAYS = 90


def rel_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: for finished ('F') multi-supplier orders where
    EXACTLY ONE supplier shipped late, count that supplier's late
    lineitems, rolled up per supplier for a nation subset
    (s_nationkey % 5 = 2 — scale-free, no literal key list).

    The spec formulation is EXISTS (another supplier in the order) AND
    NOT EXISTS (another LATE supplier) — two lineitem self-joins. The
    Spark plan uses the scale rewrite: per-order (distinct suppliers,
    distinct late suppliers) as WINDOW aggregates over the order key,
    then a filter ``n_supp >= 2 AND n_late_supp = 1``; late rows of
    such orders belong to the unique late supplier by construction.
    The r13 form derived the same counts via a groupBy + join-back,
    which scanned lineitem twice, paid an Expand (2 distinct aggs) and
    shuffled the fact table twice (4 Exchanges, plan nodes 9/21/24/38
    of plans/r14/rel_waiting_supplier_before.txt); the window form is
    ONE fact scan and ONE fact shuffle (guide §2.4 — a window keyed
    like the aggregation shares its exchange). collect_set drops
    nulls, so its size equals countDistinct exactly. The oracle below
    keeps the spec's EXISTS/NOT EXISTS form, so the two INDEPENDENT
    derivations must agree row-for-row.
    """
    lateness = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l = li.join(
        orders, li.l_orderkey == orders.o_orderkey
    ).withColumn("late", lateness)
    wo = Window.partitionBy("l_orderkey")
    waiting = (
        l.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(wo))
        )
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(wo)
            ),
        )
        .filter(
            F.col("late")
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1)
        )
    )
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") % 5 == 2
    )
    return (
        waiting.join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            waiting.l_suppkey == supp.s_suppkey,
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


REL_WAITING_SUPPLIER_SQL = f"""
WITH l AS (
    SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM l l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_shipdate > l1.o_orderdate + INTERVAL {LATE_DAYS} DAY
  AND s_nationkey % 5 = 2
  AND EXISTS (
      SELECT 1 FROM l l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM l l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l3.o_orderdate + INTERVAL {LATE_DAYS} DAY)
GROUP BY s_name
"""


# --------------------------------------------------------------------------
# Small-quantity order revenue (TPC-H Q17 shape)
# --------------------------------------------------------------------------


def rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape per brand: revenue carried by lineitems whose
    quantity is below 20% of their PART's average quantity (the
    lost-revenue-if-small-orders-stopped analysis; Q17 filters one
    brand/container — the fixture part table has no container, so the
    rollup keys on every brand, which also gives the oracle a
    many-row result to hash).

    The spec's correlated scalar subquery (``0.2 * avg(l_quantity)``
    per part) de-correlates into per-part WINDOW aggregates over
    lineitem — the r13 groupBy + join-back form scanned and shuffled
    the fact table twice (plan: 2 scans, agg Exchange + probe Exchange
    + SortMergeJoin); the window form keyed on the same ``l_partkey``
    is one scan and one fact shuffle (guide §2.4). The 20%-of-avg
    comparison is exact integer arithmetic (``5 · cnt · qty <
    sum_qty`` with BIGINT quantities — fixture quantities are
    integral), never a double divide at the boundary. Brand comes
    from the dimension-sized part table, broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_extendedprice",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    wp = Window.partitionBy("l_partkey")
    small = (
        li.withColumn("sum_qty", F.sum("qty").over(wp))
        .withColumn("cnt", F.count("qty").over(wp))
        .filter(F.lit(5) * F.col("cnt") * F.col("qty") < F.col("sum_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    return small.groupBy("p_brand").agg(
        F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 2).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_small"),
    )


REL_SMALL_QTY_REVENUE_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           count(l_quantity) AS cnt
    FROM lineitem GROUP BY 1
)
SELECT p_brand,
       round(round(sum(l_extendedprice), 2) / 7.0, 2) AS avg_yearly,
       count(*) AS n_small
FROM lineitem
JOIN per_part USING (l_partkey)
JOIN part ON p_partkey = l_partkey
WHERE 5 * cnt * CAST(l_quantity AS BIGINT) < sum_qty
GROUP BY p_brand
"""


# --------------------------------------------------------------------------
# Four more TPC-H shapes (Q12 / Q13 / Q14 / Q19), adapted to the
# fixture's column subset. Money arithmetic rides the exact-integer
# microcent discipline: revenue = cents(extprice) · (100 − disc100) is
# an exact BIGINT per row (both factors are 2-decimal fixtures), so
# the sums are order-free and the one double division happens last.
# --------------------------------------------------------------------------

def _rev_micro() -> F.Column:
    """Lazy: F.col needs an active SparkContext (classic API)."""
    return F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("bigint")
    )
_REV_MICRO_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def rel_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode/priority split): among lineitems
    shipped more than 90 days after their order date, count
    high-priority (1-URGENT / 2-HIGH) vs lower-priority orders per
    linestatus. The fixture has no l_shipmode / commit-receipt dates,
    so linestatus plays the mode column and lateness is
    shipdate − orderdate > 90d — the shape (fact-fact equi-join +
    conditional CASE sums) is Q12's.

    One shuffle: lineitem⋈orders on the order key; the priority CASE
    folds map-side. The date predicate is a pure row filter after the
    join (it references both sides)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


REL_LATE_LINES_PRIORITY_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def rel_customer_orders_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by
    how many qualifying orders they placed, INCLUDING the zero-order
    customers a plain join would drop (the left outer join is the
    point of Q13). The fixture lacks o_comment, so the exclusion
    filter is o_orderpriority <> '4-NOT SPECIFIED'.

    Two shuffles that cannot fuse: orders→per-customer counts (the
    filter pushes below the join; left join keeps count-0 customers),
    then the tiny count-histogram aggregation. All-integer output —
    nothing to round."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


REL_CUSTOMER_ORDERS_DIST_SQL = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '4-NOT SPECIFIED'
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect), monthly over 1996: the percent of
    discounted revenue carried by PROMO-type parts. The fixture's
    p_type is a bare class label, so the predicate is equality, not
    LIKE 'PROMO%' — same shape.

    Part is a broadcast dimension; the revenue terms are exact
    integer microcents, so the two conditional sums are order-free
    and the single percent division is the last step."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.month("l_shipdate").alias("mon"),
        _rev_micro().alias("rev"),
        F.col("p_type"),
    )
    return (
        j.groupBy("mon")
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0)))
                / F.sum("rev"),
                6,
            ).alias("promo_pct"),
            (F.floor((F.sum("rev") + 50) / 100) / 100.0).alias("revenue"),
        )
        .orderBy("mon")
    )


REL_PROMO_REVENUE_SQL = f"""
WITH j AS (
    SELECT month(l_shipdate) AS mon,
           {_REV_MICRO_SQL} AS rev,
           p_type
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT mon,
       round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
                                   ELSE 0 END) AS BIGINT)
             / CAST(sum(rev) AS BIGINT), 6) AS promo_pct,
       floor((CAST(sum(rev) AS BIGINT) + 50) / 100) / 100.0 AS revenue
FROM j
GROUP BY mon
ORDER BY mon
"""


def rel_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue under disjunctive brand/size/
    quantity bands): three OR'd clauses, each correlating a part
    attribute band with a lineitem quantity band — the classic test
    that an engine keeps the JOIN an equi-join and evaluates the
    disjunction as a post-join filter instead of falling back to a
    cartesian.

    Grouped by brand so the result is a multi-row hash target. The
    part side stays broadcast; `.explain` shows BroadcastHashJoin on
    p_partkey with the OR residual as a Filter above it."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    clause = (
        ((br == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((br == "Brand#13") & sz.between(1, 25) & q.between(10, 20))
        | ((br == "Brand#20") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(clause)
        .groupBy("p_brand")
        .agg(
            (F.floor((F.sum(_rev_micro()) + 50) / 100) / 100.0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


REL_DISJUNCTIVE_REVENUE_SQL = f"""
SELECT p_brand,
       floor((CAST(sum({_REV_MICRO_SQL}) AS BIGINT) + 50) / 100) / 100.0
           AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
ORDER BY p_brand
"""


def rel_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): the 20 customers who lost
    the most revenue to returned lineitems in one quarter, with their
    nation. Ranking rides the EXACT integer microcent sum (revenue
    ties break on c_custkey), so the top-20 cut is deterministic in
    both engines; the double division happens after the cut.

    Shape: lineitem(returnflag pushed to the scan)⋈orders(quarter
    pushed) is the one fact-fact shuffle; customer joins on the order
    key's custkey, nation broadcast; top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_micro()).alias("_micro"))
        .orderBy(F.col("_micro").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.floor((F.col("_micro") + 50) / 100) / 100.0).alias("revenue"),
        )
    )


REL_RETURNED_CUSTOMERS_SQL = f"""
WITH agg AS (
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_REV_MICRO_SQL}) AS BIGINT) AS micro
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
)
SELECT c_custkey, c_name, n_name,
       floor((micro + 50) / 100) / 100.0 AS revenue
FROM agg
ORDER BY micro DESC, c_custkey
LIMIT 20
"""


def rel_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) by month of 1996: the
    revenue increase if discounts in a band were eliminated —
    sum(extendedprice · discount) over a quantity band. Everything is
    a scan-side filter (all three predicates reach the parquet scan;
    no join at all) feeding one map-side-combinable aggregate — the
    pushdown-showcase query. Exact integer cents·discount-cents terms."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.02, 0.04))
        & (F.col("l_quantity") < 24)
    )
    disc_micro = F.round(F.col("l_extendedprice") * 100).cast("bigint") * (
        F.round(F.col("l_discount") * 100).cast("bigint")
    )
    return (
        li.groupBy(F.month("l_shipdate").alias("mon"))
        .agg(
            (F.floor((F.sum(disc_micro) + 50) / 100) / 100.0).alias(
                "forecast"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("mon")
    )


REL_FORECAST_REVENUE_SQL = """
SELECT month(l_shipdate) AS mon,
       floor((CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_discount * 100) AS BIGINT))
                   AS BIGINT) + 50) / 100) / 100.0 AS forecast,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
GROUP BY 1
ORDER BY 1
"""


def rel_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): discounted revenue flowing between
    a nation PAIR in both directions, by ship year — the two-nation
    OR'd join predicate that trips naive planners into a cartesian.

    supplier/customer/nation all broadcast (dimension-sized); the one
    fact-fact shuffle is lineitem⋈orders; the nation-pair disjunction
    is a residual filter above broadcast hash joins (covered by the
    registry-wide no-cartesian audit). Revenue rides the exact
    microcent discipline."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.sn_key)
        .join(F.broadcast(n2), cust.c_nationkey == n2.cn_key)
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            (F.floor((F.sum(_rev_micro()) + 50) / 100) / 100.0).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


REL_VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       floor((CAST(sum({_REV_MICRO_SQL}) AS BIGINT) + 50) / 100) / 100.0
           AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


LARGE_ORDER_QTY = 300  # Q18 threshold (fixture p99 per-order qty = 262)


def rel_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds LARGE_ORDER_QTY, with their customer — the
    aggregate-then-semi-join-back shape (the HAVING subquery
    de-correlates into one per-order aggregate reused as both the
    filter and an output column).

    One lineitem shuffle on the order key produces the per-order
    quantity; the qualifying-order set (tiny after the threshold)
    broadcasts back onto orders; customer joins broadcast. Quantities
    are integral fixtures, so the threshold compare and the output
    sum are exact BIGINTs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        orders.join(
            F.broadcast(big), orders.o_orderkey == big.l_orderkey
        )
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


REL_LARGE_ORDERS_SQL = f"""
WITH big AS (
    SELECT l_orderkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS BIGINT)) > {LARGE_ORDER_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM orders
JOIN big      ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def rel_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): per priority class, the
    count of orders in one quarter having AT LEAST ONE late lineitem —
    the EXISTS-correlated-subquery shape, de-correlated into a LEFT
    SEMI join with an extra non-equi conjunct (the fixture lacks
    commit/receipt dates, so 'late' is shipped > 60 days after the
    order date, same shape).

    The semi join keeps the orders side row-preserving and
    deduplicating in one pass (no distinct needed); the date conjunct
    rides the join condition, not a post-join filter, so the shuffle
    carries only the key columns."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


REL_PRIORITY_LATE_ORDERS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3 suppliers' share of
    PROMO-part revenue sold to ASIA-region customers, by order year.
    The share is a conditional-sum ratio over ONE joined relation —
    never two scans — and both the numerator and denominator are
    exact integer microcents, so the single division is the last
    step, round 6.

    customer→nation→region collapse into one broadcast side; part and
    supplier(+nation) broadcast; lineitem⋈orders is the only
    fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cr_key"),
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == nation_c.cn_key)
        .join(F.broadcast(region), nation_c.cr_key == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == nation_s.sn_key)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev_micro().alias("rev"),
            F.col("supp_nation"),
        )
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_3", F.col("rev")
                    ).otherwise(F.lit(0))
                )
                / F.sum("rev"),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


REL_MARKET_SHARE_SQL = f"""
WITH j AS (
    SELECT year(o_orderdate) AS o_year,
           {_REV_MICRO_SQL} AS rev,
           n1.n_name AS supp_nation
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region   ON n2.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev
                           ELSE 0 END) AS BIGINT)
             / CAST(sum(rev) AS BIGINT), 6) AS mkt_share,
       count(*) AS n_lines
FROM j
GROUP BY o_year
ORDER BY o_year
"""


# --------------------------------------------------------------------------
# The last four TPC-H shapes (Q2 / Q9 / Q16 / Q20), completing the
# 22-query suite. The fixture has no partsupp table, so the
# part-supplier catalog is DERIVED from lineitem (distinct pairs /
# per-pair aggregates) — the join/subquery shapes are unchanged, only
# the catalog's provenance differs. Supply cost rides the same exact
# microcent discipline as Q6..Q19: every per-row value is a BIGINT
# before any aggregate, and integer division (Spark DIV ≡ DuckDB //
# on positives) replaces float division so both engines agree bit-for-
# bit.
# --------------------------------------------------------------------------

_UNIT_MICRO = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def rel_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for every SMALL part of size
    <= 15, the EUROPE-region supplier(s) offering it at the minimum
    unit cost, ordered by supplier account balance. The spec's
    correlated MIN subquery over partsupp is decorrelated into a
    WINDOW MIN over the derived supply catalog — one shuffle keyed by
    part, no join-back against a second aggregate of the same
    relation (the classic Q2 plan needs two passes over partsupp;
    the window form needs one).

    Unit cost = min over the pair's lineitems of
    floor(rev_micro / quantity) — exact integer division, so the
    min/equality comparisons are engine-independent. Supplier→nation→
    region collapse into one broadcast side; part is broadcast after
    its selective filter. At 100 TB the only shuffle is the supply
    groupBy (partkey, suppkey) feeding the window repartition by
    partkey — and that shuffle is PRE-FILTERED by a broadcast semi
    join on the selective part keys (guide §3.2: reduce the big side
    before shuffling it): the r13 form aggregated ALL of lineitem and
    only then inner-joined the SMALL-part set, shuffling every
    (partkey, suppkey) group the join was about to drop. Dropping
    whole groups before the aggregation cannot change any surviving
    group's min."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
    )
    li = load_table(spark, sf_dir, "lineitem")
    li_small = li.join(
        F.broadcast(part.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    supply = li_small.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.expr(f"({_UNIT_MICRO}) DIV CAST(l_quantity AS BIGINT)")
        ).alias("cost_micro")
    )
    euro = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        supply.join(F.broadcast(euro), supply.l_suppkey == euro.s_suppkey)
        .join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .withColumn(
            "min_cost",
            F.min("cost_micro").over(Window.partitionBy("p_partkey")),
        )
    )
    return (
        cand.filter(F.col("cost_micro") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "cost_micro",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


REL_MIN_COST_SUPPLIER_SQL = f"""
WITH supply AS (
    SELECT l_partkey, l_suppkey,
           min(({_UNIT_MICRO}) // CAST(l_quantity AS BIGINT)) AS cost_micro
    FROM lineitem GROUP BY 1, 2
), euro AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), cand AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_micro,
           min(cost_micro) OVER (PARTITION BY p_partkey) AS min_cost
    FROM supply
    JOIN euro ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'SMALL' AND p_size <= 15
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_micro
FROM cand WHERE cost_micro = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def rel_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit on 'red' parts by
    supplier nation and order year. The fixture has no
    ps_supplycost, so cost is modeled as 60% of the part's retail
    price per unit — profit_micro = rev_micro − qty·retail_cents·60
    stays an exact BIGINT per row (retail prices are 2-decimal), and
    the one microcent→currency conversion happens after the sum with
    the integer half-up discipline shared by Q6..Q14.

    lineitem ⋈ orders is the only fact-fact shuffle; part (name-
    filtered), supplier, and nation broadcast. The p_name filter
    prunes ~11/12 of parts before the join, so the broadcast side
    stays small at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("supp_nation")
    )
    profit_micro = _rev_micro() - (
        F.col("l_quantity").cast("bigint")
        * F.round(F.col("p_retailprice") * 100).cast("bigint")
        * F.lit(60)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "supp_nation",
            F.year("o_orderdate").alias("o_year"),
            profit_micro.alias("pm"),
        )
        .groupBy("supp_nation", "o_year")
        .agg(
            (F.floor((F.sum("pm") + 50) / 100) / 100.0).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("supp_nation", F.desc("o_year"))
    )


REL_PRODUCT_PROFIT_SQL = f"""
WITH j AS (
    SELECT n_name AS supp_nation,
           year(o_orderdate) AS o_year,
           {_REV_MICRO_SQL}
             - CAST(l_quantity AS BIGINT)
               * CAST(round(p_retailprice * 100) AS BIGINT) * 60 AS pm
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
)
SELECT supp_nation, o_year,
       floor((CAST(sum(pm) AS BIGINT) + 50) / 100) / 100.0 AS sum_profit,
       count(*) AS n_lines
FROM j
GROUP BY supp_nation, o_year
ORDER BY supp_nation, o_year DESC
"""


def rel_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): how many suppliers can
    supply each (brand, type, size) combination, excluding a
    disqualified supplier set — the NOT IN subquery shape, lowered to
    a broadcast LEFT ANTI join. The part-supplier catalog is the
    DISTINCT (partkey, suppkey) projection of lineitem (the fixture's
    partsupp); 'customer complaints' is modeled as a negative account
    balance.

    Plan: one distinct-shuffle on the pair, anti join against the
    (tiny, broadcast) complained-supplier set, broadcast part join,
    then count(DISTINCT suppkey) per group — the distinct agg rides
    Catalyst's two-phase expand. The spec's size list is 8 literal
    sizes from the fixture's 2..37 domain.

    r14 (guide §3.2 "reduce the big side before shuffling it"): both
    broadcast filters now apply to the RAW lineitem rows, BELOW the
    pair distinct — they are row-level predicates on the distinct's own
    key columns, so they commute with it exactly — and the qualifying
    part keys additionally pre-filter as a broadcast semi join. The
    distinct exchange (the query's only fact shuffle) then carries only
    rows whose partkey survives the ~22% size/brand/type filter and
    whose suppkey is not disqualified, instead of every pair."""
    complained = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(2, 5, 11, 17, 23, 28, 31, 37)
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    pairs = (
        li.join(F.broadcast(complained), "l_suppkey", "left_anti")
        .join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .distinct()
    )
    return (
        pairs.join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


REL_SUPPLIER_PART_TYPES_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
  AND p_size IN (2, 5, 11, 17, 23, 28, 31, 37)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def rel_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion): ASIA-region suppliers
    whose supply of 'small…' parts is concentrated in one year —
    the nested-aggregate qualification chain (per-pair aggregate
    compared against a fraction of the pair's own total, Q20's
    availqty > ½·shipped-qty predicate with the derived catalog's
    '1996 qty > ½ all-time qty' as the excess test). Because the
    fixture's suppliers each hold hundreds of pairs, a bare EXISTS
    saturates (every supplier qualifies), so the output keeps Q20's
    qualification chain but reports per-supplier excess-part counts
    and quantities — discriminative at every SF, and the result size
    is bounded by the supplier dimension, never the fact table.

    Plan: one groupBy (partkey, suppkey) over lineitem with
    conditional sums (both BIGINT-exact), the integer qualification
    filter, then a reaggregation keyed by supplier — no window, no
    second fact scan. The broadcast semi join against the
    name-filtered part set sits BELOW the aggregation (guide §3.2;
    r14 — it previously filtered the aggregate's output, so every
    non-'small%' (partkey, suppkey) group rode the shuffle just to be
    dropped): semi-joining the fact rows first drops whole groups and
    cannot change any surviving group's sums."""
    li = load_table(spark, sf_dir, "lineitem")
    small = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li_small = li.join(
        F.broadcast(small), li.l_partkey == small.p_partkey, "left_semi"
    )
    qty = F.col("l_quantity").cast("bigint")
    sq = li_small.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(F.year("l_shipdate") == 1996, qty).otherwise(F.lit(0))
        ).alias("qty_1996"),
        F.sum(qty).alias("qty_total"),
    )
    qual = sq.filter(F.lit(2) * F.col("qty_1996") > F.col("qty_total"))
    asia = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    return (
        qual.join(F.broadcast(asia), qual.l_suppkey == asia.s_suppkey)
        .groupBy("s_name", "s_acctbal")
        .agg(
            F.count(F.lit(1)).alias("n_excess_parts"),
            F.sum("qty_1996").alias("excess_qty"),
        )
        .orderBy("s_name")
    )


REL_EXCESS_SUPPLY_SQL = """
WITH sq AS (
    SELECT l_partkey, l_suppkey,
           sum(CASE WHEN year(l_shipdate) = 1996
                    THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS qty_1996,
           sum(CAST(l_quantity AS BIGINT)) AS qty_total
    FROM lineitem GROUP BY 1, 2
), qual AS (
    SELECT * FROM sq
    WHERE 2 * qty_1996 > qty_total
      AND l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'small%')
), asia AS (
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
)
SELECT s_name, s_acctbal,
       count(*) AS n_excess_parts,
       CAST(sum(qty_1996) AS BIGINT) AS excess_qty
FROM qual JOIN asia ON l_suppkey = s_suppkey
GROUP BY s_name, s_acctbal
ORDER BY s_name
"""


QUERIES = {
    "rel_waiting_supplier": rel_waiting_supplier,
    "rel_small_qty_revenue": rel_small_qty_revenue,
    "rel_revenue_threshold": rel_revenue_threshold,
    "rel_sales_opportunity": rel_sales_opportunity,
    "rel_top_supplier": rel_top_supplier,
    "rel_pricing_summary": rel_pricing_summary,
    "rel_shipping_priority": rel_shipping_priority,
    "rel_map_funcs": rel_map_funcs,
    "rel_sketches": rel_sketches,
    "rel_topk_orders": rel_topk_orders,
    "rel_region_revenue": rel_region_revenue,
    "rel_semi_join": rel_semi_join,
    "rel_anti_join": rel_anti_join,
    # rel_range_join (the broadcast-BNLJ theta form) is deliberately NOT
    # registered: rel_range_join_banded produces identical rows against
    # the same oracle and is the formulation we'd deploy at scale, so
    # registering both spends a driver-gate slot re-proving one oracle
    # (the gate checks a bounded number of entries per round). The BNLJ
    # form remains as the theta-join reference implementation, equality-
    # pinned by tests/test_properties.py.
    "rel_outer_join": rel_outer_join,
    "rel_exists_subquery": rel_exists_subquery,
    "rel_quantiles": rel_quantiles,
    "rel_unpivot": rel_unpivot,
    "rel_scalar_subquery": rel_scalar_subquery,
    "rel_range_join_banded": rel_range_join_banded,
    "rel_distinct_agg": rel_distinct_agg,
    "rel_scalar_funcs": rel_scalar_funcs,
    "rel_json_extract": rel_json_extract,
    "rel_set_ops": rel_set_ops,
    "rel_merge_join": rel_merge_join,
    "rel_interval_overlap": rel_interval_overlap,
    "rel_grouping_sets": rel_grouping_sets,
    "rel_late_lines_priority": rel_late_lines_priority,
    "rel_customer_orders_dist": rel_customer_orders_dist,
    "rel_promo_revenue": rel_promo_revenue,
    "rel_disjunctive_revenue": rel_disjunctive_revenue,
    "rel_returned_customers": rel_returned_customers,
    "rel_forecast_revenue": rel_forecast_revenue,
    "rel_volume_shipping": rel_volume_shipping,
    "rel_large_orders": rel_large_orders,
    "rel_priority_late_orders": rel_priority_late_orders,
    "rel_market_share": rel_market_share,
    "rel_min_cost_supplier": rel_min_cost_supplier,
    "rel_product_profit": rel_product_profit,
    "rel_supplier_part_types": rel_supplier_part_types,
    "rel_excess_supply": rel_excess_supply,
}

ORACLES = {
    "rel_waiting_supplier": REL_WAITING_SUPPLIER_SQL,
    "rel_small_qty_revenue": REL_SMALL_QTY_REVENUE_SQL,
    "rel_revenue_threshold": REL_REVENUE_THRESHOLD_SQL,
    "rel_sales_opportunity": REL_SALES_OPPORTUNITY_SQL,
    "rel_top_supplier": REL_TOP_SUPPLIER_SQL,
    "rel_pricing_summary": REL_PRICING_SUMMARY_SQL,
    "rel_shipping_priority": REL_SHIPPING_PRIORITY_SQL,
    "rel_map_funcs": REL_MAP_FUNCS_SQL,
    "rel_topk_orders": REL_TOPK_ORDERS_SQL,
    "rel_region_revenue": REL_REGION_REVENUE_SQL,
    "rel_semi_join": REL_SEMI_JOIN_SQL,
    "rel_anti_join": REL_ANTI_JOIN_SQL,
    "rel_outer_join": REL_OUTER_JOIN_SQL,
    "rel_exists_subquery": REL_EXISTS_SUBQUERY_SQL,
    "rel_quantiles": REL_QUANTILES_SQL,
    "rel_unpivot": REL_UNPIVOT_SQL,
    "rel_scalar_subquery": REL_SCALAR_SUBQUERY_SQL,
    "rel_range_join_banded": REL_RANGE_JOIN_SQL,
    "rel_distinct_agg": REL_DISTINCT_AGG_SQL,
    "rel_scalar_funcs": REL_SCALAR_FUNCS_SQL,
    "rel_json_extract": REL_JSON_EXTRACT_SQL,
    "rel_set_ops": REL_SET_OPS_SQL,
    "rel_merge_join": REL_MERGE_JOIN_SQL,
    "rel_interval_overlap": REL_INTERVAL_OVERLAP_SQL,
    "rel_grouping_sets": REL_GROUPING_SETS_SQL,
    "rel_late_lines_priority": REL_LATE_LINES_PRIORITY_SQL,
    "rel_customer_orders_dist": REL_CUSTOMER_ORDERS_DIST_SQL,
    "rel_promo_revenue": REL_PROMO_REVENUE_SQL,
    "rel_disjunctive_revenue": REL_DISJUNCTIVE_REVENUE_SQL,
    "rel_returned_customers": REL_RETURNED_CUSTOMERS_SQL,
    "rel_forecast_revenue": REL_FORECAST_REVENUE_SQL,
    "rel_volume_shipping": REL_VOLUME_SHIPPING_SQL,
    "rel_large_orders": REL_LARGE_ORDERS_SQL,
    "rel_priority_late_orders": REL_PRIORITY_LATE_ORDERS_SQL,
    "rel_market_share": REL_MARKET_SHARE_SQL,
    "rel_min_cost_supplier": REL_MIN_COST_SUPPLIER_SQL,
    "rel_product_profit": REL_PRODUCT_PROFIT_SQL,
    "rel_supplier_part_types": REL_SUPPLIER_PART_TYPES_SQL,
    "rel_excess_supply": REL_EXCESS_SUPPLY_SQL,
}
