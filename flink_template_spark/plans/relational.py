"""Core batch relational query library over the TPC-H-ish star schema.

These are the engine's declared batch capabilities (SURVEY.md §2.5/§2.7):
scans with pushdown, multi-way joins (broadcast for small dims), hash
aggregation, semi/anti joins, set ops, distinct aggregation, scalar
function catalog (string/date/math/JSON).

Scale notes (100 TB design):
- ``region``/``nation``/``supplier``/``part`` are broadcast — they stay
  small at any SF (dimensions), so no shuffle on the fact side for those
  joins.
- fact-fact joins (orders ⨝ lineitem) shuffle on the join key; AQE
  handles skew/coalescing at runtime.
- all filters are plain Column predicates on scan columns → Catalyst
  pushes them into the parquet reader (verified via explain in tests).
- aggregates are exact-decimal then cast to double for cross-engine
  hash stability (see plans.registry docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def _one_minus(col: str):
    return F.lit(1).cast("decimal(3,2)") - _dec(col, 3, 2)


def _one_plus(col: str):
    return F.lit(1).cast("decimal(3,2)") + _dec(col, 3, 2)


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan + filter + 2-key hash agg.
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
      * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
    AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * _one_minus("l_discount")
    charge = disc_price * _one_plus("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            (F.sum(_dec("l_discount", 3, 2)).cast("double") / F.count(F.lit(1))).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority: 3-way join + agg + deterministic top-10.
# ---------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q5 — local supplier volume: 6-way star join, group by nation.
# ---------------------------------------------------------------------------

@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q6 — revenue forecast: pure pushdown filter + single agg.
# ---------------------------------------------------------------------------

@register(
    "q6_revenue_forecast",
    oracle="""
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 3, 2))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# q7 — volume by customer-nation × supplier-nation × year.
# ---------------------------------------------------------------------------

@register(
    "q7_nation_volume",
    oracle="""
SELECT
  cn.n_name AS cust_nation,
  sn.n_name AS supp_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name, CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume (TPC-H Q7 shape).

    Scale shape (r10 rework): the fixed 25-row nation table broadcasts
    into customer and supplier BEFORE the fact joins, so the dimension
    rows entering the three fact shuffles are the minimal 2-column
    (key, nation-name) maps — the nation keys never ride a fact
    exchange. Catalyst cannot reorder these joins itself without CBO
    stats; expressing the reduction explicitly is the portable form."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cn_key"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("cn_key"),
        )
        .select("c_custkey", "cust_nation")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        li.select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("volume"))
    )


# ---------------------------------------------------------------------------
# q10 — returned items: join + agg + deterministic top-20.
# ---------------------------------------------------------------------------

@register(
    "q10_returned_items",
    oracle="""
SELECT
  c_custkey,
  c_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
    AS revenue,
  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
  n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * _one_minus("l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# semi / anti joins (EXISTS / NOT EXISTS equivalents).
# ---------------------------------------------------------------------------

@register(
    "q_semi_join_urgent_customers",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
""",
)
def q_semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "q_anti_join_idle_customers",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey
)
""",
)
def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# set operations.
# ---------------------------------------------------------------------------

@register(
    "q_setops_nations",
    oracle="""
WITH cust_nations AS (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
), supp_nations AS (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
SELECT nationkey, 'both' AS side FROM cust_nations
INTERSECT
SELECT nationkey, 'both' AS side FROM supp_nations
UNION ALL
SELECT nationkey, 'cust_only' AS side FROM (
  SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations
)
""",
)
def q_setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = (
        cust.withColumn("side", F.lit("both"))
        .intersect(supp.withColumn("side", F.lit("both")))
    )
    cust_only = cust.exceptAll(supp).withColumn("side", F.lit("cust_only"))
    return both.unionAll(cust_only)


# ---------------------------------------------------------------------------
# distinct aggregation.
# ---------------------------------------------------------------------------

@register(
    "q_distinct_agg_segments",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  COUNT(DISTINCT o_orderpriority) AS n_priorities,
  COUNT(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
""",
)
def q_distinct_agg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# pivot via explicit conditional aggregation (portable shape).
# ---------------------------------------------------------------------------

@register(
    "q_pivot_status_by_flag",
    oracle="""
SELECT
  l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'O'
      THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END)
    AS DOUBLE) AS qty_open,
  CAST(SUM(CASE WHEN l_linestatus = 'F'
      THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END)
    AS DOUBLE) AS qty_finished,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_pivot_status_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(12,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", _dec("l_quantity")).otherwise(zero))
        .cast("double")
        .alias("qty_open"),
        F.sum(F.when(F.col("l_linestatus") == "F", _dec("l_quantity")).otherwise(zero))
        .cast("double")
        .alias("qty_finished"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# scalar function catalog: strings, dates, math, JSON.
# ---------------------------------------------------------------------------

@register(
    "q_string_funcs",
    oracle="""
SELECT
  p_partkey,
  UPPER(p_name) AS name_upper,
  LENGTH(p_name) AS name_len,
  SUBSTR(p_name, 1, 4) AS name_prefix,
  CONCAT(p_brand, ':', p_type) AS brand_type,
  REPLACE(p_name, ' ', '_') AS name_snake,
  CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS is_widget
FROM part
WHERE p_size >= 10
""",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_size") >= 10).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.when(F.col("p_name").contains("widget"), 1).otherwise(0).alias("is_widget"),
    )


@register(
    "q_date_funcs",
    oracle="""
SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
  CAST(MIN(o_orderdate) AS DATE) AS first_day,
  CAST(MAX(o_orderdate) AS DATE) AS last_day
FROM orders
GROUP BY 1, 2
""",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", 14, 2)).cast("double").alias("total_price"),
            F.min("o_orderdate").cast("date").alias("first_day"),
            F.max("o_orderdate").cast("date").alias("last_day"),
        )
    )


@register(
    "q_math_funcs",
    oracle="""
SELECT
  l_orderkey,
  l_linenumber,
  ABS(CAST(l_quantity AS DOUBLE) - 25.0) AS qty_dev,
  ROUND(CAST(l_extendedprice AS DOUBLE) / 1000.0, 2) AS price_k,
  FLOOR(CAST(l_quantity AS DOUBLE) / 10.0) AS qty_decile,
  CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE) AS qty_sq
FROM lineitem
WHERE l_orderkey % 100 = 0
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    return li.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(qty - 25.0).alias("qty_dev"),
        F.round(F.col("l_extendedprice").cast("double") / 1000.0, 2).alias("price_k"),
        F.floor(qty / 10.0).cast("double").alias("qty_decile"),
        (qty * qty).alias("qty_sq"),
    )


@register(
    "q_json_get",
    oracle="""
SELECT
  CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
""",
)
def q_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn(
            "k_bucket",
            (F.get_json_object("props", "$.k").cast("int") % 10),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# grouping sets: cube + rollup.
# ---------------------------------------------------------------------------

@register(
    "q_cube_flag_status",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@register(
    "q_rollup_region_nation",
    oracle="""
SELECT
  r_name,
  n_name,
  COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
    )


@register(
    "q_salted_join_revenue",
    oracle="""
SELECT s_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY s_name
""",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key join through operators.skew.salted_join: the testdata's
    lineitem→supplier FK is pathologically hot (every supplier key is a
    large fraction of the fact table), the case where one reducer gets
    an entire key. Salting spreads each key over 8 reducers; the result
    is oracle-identical to the plain join, which is the point — salting
    changes the SHUFFLE, never the answer."""
    from flink_template_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
        ).alias("disc_price"),
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        salted_join(li, sup, on="l_suppkey", n_salts=8)
        .groupBy("s_name")
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("s_name")
    )


@register(
    "q_bloom_pruned_join",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact⋈build semi join through operators.bloom: the fact
    (lineitem) is pre-pruned by a broadcast Bloom bitmap built
    distributively from the qualifying order keys, THEN exact-semi-joined
    — so only ~fpp of non-matching rows reach the shuffle. Bloom filters
    have no false negatives, making the result oracle-identical to the
    plain IN-subquery: pruning changes the shuffle volume, never the
    answer (the explicit dual of Spark's runtime row-level filtering)."""
    from flink_template_spark.operators.bloom import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_returnflag",
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
        ).alias("disc_price"),
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000))
        .select("o_orderkey")
    )
    pruned = bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", expected_items=20000
    )
    return (
        pruned.groupBy("l_returnflag")
        .agg(
            F.sum("disc_price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q_full_outer_join",
    oracle="""
SELECT
  n.n_name AS nation,
  COALESCE(c.n_cust, 0) AS n_cust,
  COALESCE(s.n_supp, 0) AS n_supp
FROM nation n
FULL OUTER JOIN (
  SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
) c ON n.n_nationkey = c.c_nationkey
FULL OUTER JOIN (
  SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey
) s ON n.n_nationkey = s.s_nationkey
ORDER BY nation
""",
)
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer joins preserving unmatched rows from both sides.

    Scale note: full outer can't broadcast (both sides must surface
    unmatched rows), so Spark plans a shuffle sort-merge join — correct;
    the shuffled payload here is pre-aggregated to one row per nation
    key before the join, which is the pattern that keeps full outers
    cheap at 100 TB (reduce THEN join)."""
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "full_outer")
        .join(supp, nation.n_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nation")
    )


@register(
    "q_cross_join_calendar",
    oracle="""
SELECT r_name, q AS quarter, COUNT(o_orderkey) AS n_orders
FROM region
CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS q) quarters
LEFT JOIN (
  SELECT o_orderkey, n_regionkey,
         CAST(CEIL(EXTRACT(month FROM o_orderdate) / 3.0) AS INT) AS oq
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
) o ON o.oq = quarters.q AND o.n_regionkey = region.r_regionkey
GROUP BY r_name, q
ORDER BY r_name, q
""",
)
def q_cross_join_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join: region × generated quarter spine (the
    dimension-scaffold pattern — every (region, quarter) cell appears
    even with zero orders). The cross join is tiny×tiny (5×4); the
    fact side then left-joins onto the spine. Cartesian products of
    scale-growing inputs stay forbidden (pinned by the no-cartesian
    plan tests); spines are the legitimate use."""
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    quarters = spark.range(1, 5).select(F.col("id").cast("int").alias("quarter"))
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "o_orderkey",
            "n_regionkey",
            F.ceil(F.month("o_orderdate") / 3.0).cast("int").alias("oq"),
        )
    )
    spine = region.crossJoin(quarters)
    return (
        spine.join(
            orders,
            (F.col("oq") == F.col("quarter"))
            & (orders.n_regionkey == spine.r_regionkey),
            "left",
        )
        .groupBy("r_name", "quarter")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("r_name", "quarter")
    )


@register(
    "q_setops_all_variants",
    oracle="""
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 0
  INTERSECT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
) GROUP BY nationkey
UNION ALL
SELECT -1 AS nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey FROM customer
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_acctbal > 0
)
""",
)
def q_setops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (INTERSECT ALL / EXCEPT ALL): bag semantics with
    per-row multiplicity, not the distinct variants — both are one
    shuffle on the full row as key with counted multiplicities."""
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).select(
        F.col("c_nationkey").alias("nationkey")
    )
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    inter = (
        pos.intersectAll(building)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    exc = (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .exceptAll(pos)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(-1).alias("nationkey"), "n")
    )
    return inter.unionAll(exc)


@register(
    "q_unpivot_balances",
    oracle="""
SELECT n_name, metric, CAST(val AS DOUBLE) AS val FROM (
  SELECT
    n_name,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS total_bal,
    CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
    CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
) UNPIVOT (val FOR metric IN (total_bal, min_bal, max_bal))
ORDER BY n_name, metric
""",
)
def q_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): the inverse of q_pivot_status_by_flag,
    via DataFrame.unpivot — a row-local expand, no shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_bal"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
        )
    )
    return wide.unpivot(
        ["n_name"], ["total_bal", "min_bal", "max_bal"], "metric", "val"
    ).orderBy("n_name", "metric")


def _recursive_chain_sql(div: str) -> str:
    """WITH RECURSIVE hierarchy rollup, dialect-parameterized on the
    integer-division operator (Spark ``DIV`` == DuckDB ``//`` for the
    positive keys here). The hierarchy is the implicit binary tree
    parent = suppkey {div} 2 (root = supplier 1) — a deterministic
    org-chart stand-in; recursion terminates structurally (every step
    halves the key) and row growth is O(n log n), never a cyclic or
    path-counting explosion."""
    return f"""
WITH RECURSIVE chain(suppkey, anc, depth, chain_bal_q) AS (
  SELECT s_suppkey, s_suppkey, 0,
         CAST(ROUND(s_acctbal * 100.0, 0) AS BIGINT)
  FROM supplier
  UNION ALL
  SELECT c.suppkey, c.anc {div} 2, c.depth + 1,
         c.chain_bal_q + CAST(ROUND(p.s_acctbal * 100.0, 0) AS BIGINT)
  FROM chain c
  JOIN supplier p ON p.s_suppkey = c.anc {div} 2
  WHERE c.anc > 1
)
SELECT suppkey, CAST(depth AS BIGINT) AS chain_len, chain_bal_q
FROM chain
WHERE anc = 1
ORDER BY suppkey
"""


@register("q_recursive_chain_rollup", oracle=_recursive_chain_sql("//"))
def q_recursive_chain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk every supplier's
    management chain up the implicit binary tree (parent =
    suppkey DIV 2) to the root, accumulating chain length and the
    exact integer-cents balance sum along the chain — the hierarchical
    rollup shape (org charts, BOM explosions, folder trees) that
    needed an iterative DataFrame loop before Spark 4. Both engines
    run the textually identical recursion (modulo the div operator),
    so the oracle is bit-exact.

    Scale shape: each recursive step is one equi-join of the frontier
    against the parent table — the same per-round shuffle as the
    operator-level BFS (operators/bfs.py), with the engine owning
    round scheduling; depth is log2(n) by construction. The DataFrame
    dual of this family (bounded rounds + localCheckpoint) remains the
    100 TB posture for graphs whose depth is data-dependent."""
    from flink_template_spark.sql import run_sql

    return run_sql(spark, sf_dir, _recursive_chain_sql("DIV"))


# ---------------------------------------------------------------------------
# round 9: incremental view maintenance, concentration, trend fitting
# ---------------------------------------------------------------------------

_IVM_SPLIT = "1997-01-01"


@register(
    "q_ivm_delta_merge",
    oracle=f"""
SELECT
  o_custkey,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend,
  CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_order
FROM orders
GROUP BY o_custkey
""",
)
def q_ivm_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-customer spend materialized
    view built from the BASE period (< {_IVM_SPLIT}) is brought up to
    date by merging only the DELTA rows (>= {_IVM_SPLIT}) — the merge
    re-aggregates partial states (count-sum, sum-sum, max-max) without
    ever touching base ROWS again. The oracle is the full recompute
    over all of orders: hash equality proves merge(partials) ==
    recompute, i.e. the aggregate state is genuinely mergeable (the
    contract every incremental lakehouse pipeline relies on).

    Scale shape: the stored MV stands in as a checkpoint-pinned base
    aggregate (at 100 TB it is the table the previous run wrote);
    the refresh plan scans ONLY the delta partition (plan-pinned to
    one parquet Scan in tests/test_plans.py) and shuffles
    |customers|-sized aggregates, not order rows. Deletes/updates
    would carry signed counts (retractions) through the same merge."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(_IVM_SPLIT).cast("timestamp")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias(
                "total_spend_dec"
            ),
            F.max("o_orderdate").alias("last_order"),
        )

    # the "stored" MV: built once from the base period, pinned so the
    # refresh below cannot re-expand it into a second orders scan
    mv_base = agg(orders.filter(F.col("o_orderdate") < split)).localCheckpoint(
        eager=True
    )
    delta = agg(orders.filter(F.col("o_orderdate") >= split))
    return (
        mv_base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("total_spend_dec").cast("double").alias("total_spend"),
            F.max("last_order").alias("last_order"),
        )
    )


@register(
    "q_supplier_hhi",
    oracle="""
WITH bal AS (
  SELECT s_nationkey,
         CAST(s_acctbal AS DECIMAL(14,2)) AS b
  FROM supplier WHERE s_acctbal > 0
),
agg AS (
  SELECT s_nationkey,
         COUNT(*) AS n_suppliers,
         SUM(b * b) AS sum_sq,
         SUM(b) AS sum_b
  FROM bal GROUP BY s_nationkey
)
SELECT
  n.n_name AS nation,
  CAST(n_suppliers AS BIGINT) AS n_suppliers,
  ROUND(CAST(sum_sq AS DOUBLE)
        / (CAST(sum_b AS DOUBLE) * CAST(sum_b AS DOUBLE)), 6) AS hhi,
  ROUND(1.0 / CAST(n_suppliers AS DOUBLE), 6) AS hhi_floor
FROM agg JOIN nation n ON agg.s_nationkey = n.n_nationkey
ORDER BY nation
""",
)
def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of positive supplier
    account balances per nation (HHI = Σshare² = Σb² / (Σb)²), with the
    1/n perfect-competition floor beside it — the third classic
    concentration measure next to q_source_gini (Gini) and
    q_revenue_concentration (Lorenz/top-k).

    Float discipline: shares are never materialized (a per-row double
    division then order-dependent sum would be nondeterministic);
    both Σb² and Σb are exact DECIMAL sums, with ONE double division
    at the end — identical trees in both engines.

    Scale shape: one hash agg on s_nationkey with map-side partials;
    the nation join broadcasts."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    b = F.col("s_acctbal").cast("decimal(14,2)")
    agg = (
        supplier.filter(F.col("s_acctbal") > 0)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(b * b).alias("sum_sq"),
            F.sum(b).alias("sum_b"),
        )
    )
    return (
        agg.join(
            F.broadcast(nation), agg.s_nationkey == nation.n_nationkey
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.round(
                F.col("sum_sq").cast("double")
                / (F.col("sum_b").cast("double") * F.col("sum_b").cast("double")),
                6,
            ).alias("hhi"),
            F.round(F.lit(1.0) / F.col("n_suppliers").cast("double"), 6).alias(
                "hhi_floor"
            ),
        )
        .orderBy("nation")
    )


@register(
    "q_ols_price_trend",
    oracle="""
WITH pts AS (
  SELECT
    p.p_brand,
    (EXTRACT(YEAR FROM l.l_shipdate) * 12 + EXTRACT(MONTH FROM l.l_shipdate) - 1)
      AS x,
    CAST(l.l_extendedprice AS DECIMAL(14,2)) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sums AS (
  SELECT p_brand,
    COUNT(*) AS k,
    SUM(x) AS sx,
    SUM(x * x) AS sxx,
    SUM(y) AS sy,
    SUM(x * y) AS sxy
  FROM pts GROUP BY p_brand
)
SELECT
  p_brand,
  CAST(k AS BIGINT) AS n_points,
  ROUND(
    (CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
    6) AS slope_per_month,
  ROUND(CAST(sy AS DOUBLE) / CAST(k AS DOUBLE), 4) AS mean_price
FROM sums
ORDER BY p_brand
""",
)
def q_ols_price_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS price trend: least-squares slope of extended price
    over ship month (x = months since year 0), from the closed-form
    normal equations slope = (kΣxy − ΣxΣy) / (kΣxx − (Σx)²) — the
    cheap one-pass complement to q_theil_sen_trend's robust slope.

    Float discipline: all five sufficient statistics are exact (x is
    an integer month index; y, x·y are DECIMAL sums); the slope is
    assembled in doubles from identical expression trees — the
    map-side-combinable way to fit millions of independent
    regressions in one shuffle.

    Scale shape: broadcast part join onto lineitem, one hash agg on
    p_brand with map-side partials; no window, no sort."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pts = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias("x"),
        F.col("l_extendedprice").cast("decimal(14,2)").alias("y"),
    )
    sums = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    kd = F.col("k").cast("double")
    return sums.select(
        "p_brand",
        F.col("k").cast("bigint").alias("n_points"),
        F.round(
            (kd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (kd * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx").cast("double")),
            6,
        ).alias("slope_per_month"),
        F.round(F.col("sy").cast("double") / kd, 4).alias("mean_price"),
    ).orderBy("p_brand")


_BUCKETS = 8
def _bucketed_tables(spark: SparkSession, sf_dir: str):
    """Write (once per session+sf) bucketed duals of orders/customer,
    bucketed AND sorted by the join key into {_BUCKETS} buckets, and
    return them as catalog tables. At 100 TB this is the one-off
    layout job a co-location strategy pays so every subsequent
    customer-keyed join in the workload is exchange-free."""
    from flink_template_spark.tables import layout_once, layout_token, warehouse_dir

    token = layout_token(sf_dir)
    t_orders, t_cust = f"bkt_orders_{token}", f"bkt_customer_{token}"

    def _build() -> None:
        import shutil

        for name, tbl in (("orders", t_orders), ("customer", t_cust)):
            col = "o_custkey" if name == "orders" else "c_custkey"
            # a PREVIOUS session's managed-table location survives in
            # the warehouse while this session's fresh in-memory
            # catalog has never heard of the table — overwrite can't
            # reconcile that, so drop both explicitly first (the token
            # is lowercased, matching Spark's lowercased table dirs)
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(f"{warehouse_dir(spark)}/{tbl}", ignore_errors=True)
            (
                load_table(spark, sf_dir, name)
                .write.bucketBy(_BUCKETS, col)
                .sortBy(col)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tbl)
            )

    layout_once(spark, sf_dir, "bucketed_orders_customer", _build)
    return spark.table(t_orders), spark.table(t_cust)


@register(
    "q_bucketed_join_colocated",
    oracle="""
SELECT
  c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY 1
""",
)
def q_bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketing as a co-location strategy: orders and customer are
    written bucketed+sorted by the customer key, so their join needs
    NO exchange on either side — the bucketed scan already provides
    the hash distribution (plan-pinned in tests/test_plans.py: exactly
    one Exchange in the whole plan, the post-join rollup's). The merge
    hint forces the sort-merge path so the demonstration doesn't
    degrade into a broadcast at toy scale; at 100 TB (where neither
    fact side broadcasts) bucketing is THE lever that turns every
    repeated customer-keyed join from a 100 TB shuffle into a local
    merge. Result identical to the plain join — the oracle recomputes
    it from the unbucketed tables."""
    orders_b, cust_b = _bucketed_tables(spark, sf_dir)
    joined = orders_b.hint("merge").join(
        cust_b, orders_b.o_custkey == cust_b.c_custkey
    )
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


def _card_audit_pair(name, df1, k1, df2, k2):
    """One row of the cardinality audit: textbook equi-join estimate
    |R|·|S| / max(d_R, d_S) vs the EXACT output size Σ_k c_R(k)·c_S(k),
    computed from the two per-key count tables without running the
    join itself."""
    # each count table feeds TWO consumers (side totals + the
    # count-product join): pin them so every base table is scanned
    # and aggregated exactly once (multi-consumer subtree policy)
    c1 = (
        df1.groupBy(F.col(k1).alias("k"))
        .agg(F.count(F.lit(1)).alias("c1"))
        .localCheckpoint(eager=False)
    )
    c2 = (
        df2.groupBy(F.col(k2).alias("k"))
        .agg(F.count(F.lit(1)).alias("c2"))
        .localCheckpoint(eager=False)
    )
    s1 = c1.agg(
        F.sum("c1").alias("n1"), F.count(F.lit(1)).alias("d1")
    )
    s2 = c2.agg(
        F.sum("c2").alias("n2"), F.count(F.lit(1)).alias("d2")
    )
    actual = c1.join(c2, "k").agg(
        F.sum(F.col("c1") * F.col("c2")).alias("actual_rows")
    )
    est = (
        F.col("n1").cast("double")
        * F.col("n2").cast("double")
        / F.greatest(F.col("d1"), F.col("d2")).cast("double")
    )
    return (
        actual.crossJoin(F.broadcast(s1))
        .crossJoin(F.broadcast(s2))
        .select(
            F.lit(name).alias("join_name"),
            F.col("n1").cast("bigint").alias("n_left"),
            F.col("n2").cast("bigint").alias("n_right"),
            F.col("actual_rows").cast("bigint").alias("actual_rows"),
            F.round(est, 2).alias("est_rows"),
            F.round(est / F.col("actual_rows").cast("double"), 6).alias(
                "est_over_actual"
            ),
        )
    )


_CARD_PAIR_SQL = """
SELECT '{name}' AS join_name,
  CAST(n1 AS BIGINT) AS n_left,
  CAST(n2 AS BIGINT) AS n_right,
  CAST(actual_rows AS BIGINT) AS actual_rows,
  ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        / CAST(GREATEST(d1, d2) AS DOUBLE), 2) AS est_rows,
  ROUND((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         / CAST(GREATEST(d1, d2) AS DOUBLE))
        / CAST(actual_rows AS DOUBLE), 6) AS est_over_actual
FROM
 (SELECT SUM(c1) AS n1, COUNT(*) AS d1 FROM
   (SELECT {k1} AS k, COUNT(*) AS c1 FROM {t1} GROUP BY 1) z1) a,
 (SELECT SUM(c2) AS n2, COUNT(*) AS d2 FROM
   (SELECT {k2} AS k, COUNT(*) AS c2 FROM {t2} GROUP BY 1) z2) b,
 (SELECT SUM(c1 * c2) AS actual_rows FROM
   (SELECT {k1} AS k, COUNT(*) AS c1 FROM {t1} GROUP BY 1) x
   JOIN
   (SELECT {k2} AS k, COUNT(*) AS c2 FROM {t2} GROUP BY 1) y
   ON x.k = y.k) c
"""


@register(
    "q_join_cardinality_audit",
    oracle=(
        _CARD_PAIR_SQL.format(
            name="customer_x_orders", k1="c_custkey", t1="customer",
            k2="o_custkey", t2="orders",
        )
        + " UNION ALL "
        + _CARD_PAIR_SQL.format(
            name="orders_x_lineitem", k1="o_orderkey", t1="orders",
            k2="l_orderkey", t2="lineitem",
        )
        + " UNION ALL "
        + _CARD_PAIR_SQL.format(
            name="supplier_x_lineitem", k1="s_suppkey", t1="supplier",
            k2="l_suppkey", t2="lineitem",
        )
        + " ORDER BY join_name"
    ),
)
def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimator audit — the statistic a cost-based optimizer
    lives on: for three FK joins, the textbook equi-join estimate
    |R|·|S| / max(ndv_R, ndv_S) against the EXACT join output size
    Σ_k c_R(k)·c_S(k), and their ratio. A ratio far from 1.0 is the
    skew/correlation signal that tells a planner its uniformity
    assumption (and thus its join order and broadcast choice) is
    wrong — the audit a 100 TB deployment runs BEFORE trusting
    ANALYZE-based plans on a new dataset.

    Scale shape: the exact size is computed WITHOUT executing the
    join — both sides collapse to per-key count tables first (hash
    aggs with map-side partials, output bounded by ndv), and the
    count-product join is key-partitioned on those compacted tables;
    the side totals are broadcast scalars. Integer counts end-to-end;
    estimate and ratio are one fixed IEEE dag each (2-dp / 6-dp)."""
    pairs = [
        (
            "customer_x_orders",
            load_table(spark, sf_dir, "customer"), "c_custkey",
            load_table(spark, sf_dir, "orders"), "o_custkey",
        ),
        (
            "orders_x_lineitem",
            load_table(spark, sf_dir, "orders"), "o_orderkey",
            load_table(spark, sf_dir, "lineitem"), "l_orderkey",
        ),
        (
            "supplier_x_lineitem",
            load_table(spark, sf_dir, "supplier"), "s_suppkey",
            load_table(spark, sf_dir, "lineitem"), "l_suppkey",
        ),
    ]
    out = None
    for name, df1, k1, df2, k2 in pairs:
        row = _card_audit_pair(name, df1, k1, df2, k2)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("join_name")


_ELA_MIN_LINES = 200  # brands with fewer observations are noise


@register(
    "q_price_elasticity",
    oracle=f"""
WITH obs AS (
  SELECT p.p_brand AS brand,
    LN(l_extendedprice / l_quantity) AS x,
    LN(l_quantity) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l_quantity > 0 AND l_extendedprice > 0
),
s AS (
  SELECT brand, COUNT(*) AS m, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM obs GROUP BY brand
)
SELECT brand,
  CAST(m AS BIGINT) AS n_lines,
  CASE WHEN m * sxx - sx * sx <= 0 THEN CAST(NULL AS DOUBLE)
       ELSE ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6)
  END AS elasticity,
  CASE WHEN m * sxx - sx * sx <= 0 OR m * syy - sy * sy <= 0
       THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(((m * sxy - sx * sy) * (m * sxy - sx * sy))
                  / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 6)
  END AS r2
FROM s
WHERE m >= {_ELA_MIN_LINES}
ORDER BY brand
""",
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the log-log OLS slope of
    quantity on unit price (ln q = a + e·ln p) — the pricing-team
    readout, and the GROUPED form of the repo's OLS family (one
    closed-form slope PER GROUP off grouped sufficient sums, where
    q_ols_price_trend fits one global line). Brands under 200
    observations (_ELA_MIN_LINES) are dropped as noise.

    Float discipline: ln inputs from exact positive doubles in an
    identical dag; per-brand sums are double accumulations over the
    group (accumulation-order ulp noise, orders below the 6-dp
    rounding); the slope/r² closed form carries the shared
    NULL degenerate-variance guard (functions.stats discipline).

    Scale shape: ONE fact-dim equi-join — part is SF-proportional, so
    NO broadcast hint (the audited discipline: AQE broadcasts the
    2-column projection while it fits and falls back to a shuffle
    join past the threshold; a pinned broadcast is a driver OOM at
    100 TB) — feeding one grouped hash agg with map-side partials
    (functions.stats.suff_sums_by); everything after is |brands|
    rows of scalar algebra — no window, no second scan."""
    from flink_template_spark.functions.stats import pearson_terms, suff_sums_by

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(part.select("p_partkey", "p_brand"),
              li.l_partkey == F.col("p_partkey"))
        .select(
            F.col("p_brand").alias("brand"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
            F.log(F.col("l_quantity")).alias("y"),
        )
    )
    s = suff_sums_by(obs, ["brand"])
    num, dxx, dyy = pearson_terms()
    return (
        s.filter(F.col("m") >= _ELA_MIN_LINES)
        .select(
            "brand",
            F.col("m").cast("bigint").alias("n_lines"),
            F.when(dxx <= 0, F.lit(None).cast("double"))
            .otherwise(F.round(num / dxx, 6))
            .alias("elasticity"),
            F.when((dxx <= 0) | (dyy <= 0), F.lit(None).cast("double"))
            .otherwise(F.round((num * num) / (dxx * dyy), 6))
            .alias("r2"),
        )
        .orderBy("brand")
    )


@register(
    "q_spearman_price_balance",
    oracle="""
WITH j AS (
  SELECT o_orderkey AS okey, o_totalprice AS price, c_acctbal AS bal
  FROM orders JOIN customer ON o_custkey = c_custkey
),
r AS (
  SELECT okey,
    ROW_NUMBER() OVER (ORDER BY price, okey) AS rx,
    ROW_NUMBER() OVER (ORDER BY bal, okey) AS ry
  FROM j
),
s AS (
  SELECT COUNT(*) AS m, SUM((rx - ry) * (rx - ry)) AS sd2 FROM r
)
SELECT
  CAST(m AS BIGINT) AS n_orders,
  CASE WHEN m < 2 THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(
         1.0 - 6.0 * CAST(sd2 AS DOUBLE)
         / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) * CAST(m AS DOUBLE) - 1.0)),
         6)
  END AS spearman_rho
FROM s
""",
)
def q_spearman_price_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between order value and the owning
    customer's account balance — the monotone-association dual of the
    Pearson family (does customer wealth order with order size at
    ALL, linearly or not?), with a deterministic (value, orderkey)
    tiebreak so both engines assign identical integer ranks (ties are
    broken totally rather than averaged; documented, and exact under
    the cross-engine hash).

    Exactness: with total-order tiebreaks both rank columns are exact
    permutations of 1..n, so Spearman reduces to the closed form
    rho = 1 − 6·Σd²/(n(n²−1)) with d = rx − ry — ONE exact integer
    sum instead of six (the Pearson-on-ranks sufficient sums carry an
    n⁴-order cross term that overflows int64 at ~150k rows and even
    decimal38 at ~3×10⁹; Σd² ≤ n³ keeps exact DECIMAL(38,0)
    arithmetic in range past 10¹² rows). Zero float accumulation;
    the one final division is a fixed dag (6-dp) behind an n < 2
    NULL guard.

    Scale shape: one key-partitioned fact-dim join (no broadcast —
    customer is SF-scaled), then TWO two-pass range-partitioned
    global rankings (operators.rank_global — never a single-partition
    window over the data), then one 1-row reduction of integer
    sums."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("price"),
        F.col("c_acctbal").alias("bal"),
    )
    # drop price before the second ranking: with_global_ranks pins its
    # input, and Catalyst can't column-prune across the materialized
    # boundary — anything carried here is physically shuffled twice
    rx = with_global_ranks(
        j, [("price", True)], tiebreak=["okey"], row_number_col="rx"
    ).select("okey", "bal", "rx")
    rxy = with_global_ranks(
        rx, [("bal", True)], tiebreak=["okey"], row_number_col="ry"
    )
    d = (F.col("rx") - F.col("ry")).cast("decimal(38,0)")
    s = rxy.agg(
        F.count(F.lit(1)).alias("m"), F.sum(d * d).alias("sd2")
    )
    md = F.col("m").cast("double")
    return s.select(
        F.col("m").cast("bigint").alias("n_orders"),
        F.when(F.col("m") < 2, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(1.0)
                - F.lit(6.0)
                * F.col("sd2").cast("double")
                / (md * (md * md - 1.0)),
                6,
            )
        )
        .alias("spearman_rho"),
    )


@register(
    "q_ols_two_feature",
    oracle="""
WITH pts AS (
  SELECT l_returnflag AS flag,
    CAST(l_quantity AS DECIMAL(12,2)) AS x1,
    CAST(l_discount AS DECIMAL(6,2)) AS x2,
    CAST(l_extendedprice AS DECIMAL(14,2)) AS y
  FROM lineitem
),
sums AS (
  SELECT flag, COUNT(*) AS k,
    SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
    SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12, SUM(x2 * x2) AS s22,
    SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y, SUM(y * y) AS syy
  FROM pts GROUP BY flag
),
cm AS (
  SELECT flag, k,
    CAST(k * s11 - s1 * s1 AS DOUBLE) AS c11,
    CAST(k * s12 - s1 * s2 AS DOUBLE) AS c12,
    CAST(k * s22 - s2 * s2 AS DOUBLE) AS c22,
    CAST(k * s1y - s1 * sy AS DOUBLE) AS c1y,
    CAST(k * s2y - s2 * sy AS DOUBLE) AS c2y,
    CAST(k * syy - sy * sy AS DOUBLE) AS cyy,
    CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
    CAST(sy AS DOUBLE) AS syd
  FROM sums
),
fit AS (
  SELECT flag, k, s1d, s2d, syd, cyy, c1y, c2y,
    (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
    (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
  FROM cm
)
SELECT flag,
  CAST(k AS BIGINT) AS n_rows,
  ROUND((syd - b1 * s1d - b2 * s2d) / CAST(k AS DOUBLE), 6) AS intercept,
  ROUND(b1, 6) AS beta_quantity,
  ROUND(b2, 6) AS beta_discount,
  ROUND((b1 * c1y + b2 * c2y) / cyy, 6) AS r2
FROM fit
ORDER BY flag
""",
)
def q_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS via the normal equations, fit independently per
    return flag: extendedprice ~ quantity + discount. The closed-form
    2x2 solve (Cramer on the CENTERED moment matrix) is how a
    distributed engine fits millions of small regressions in one
    shuffle — no gradient loop, no driver iteration, just sufficient
    statistics with map-side partial aggregation (the multi-feature
    generalization of q_ols_price_trend's single-slope form).

    Float discipline: all ten sufficient sums are exact DECIMALs; the
    centered moments k*Sab − Sa*Sb are computed IN DECIMAL (exact —
    magnitudes bounded by k²·max|x·y|, far inside decimal38 even at
    10^10 rows) and only the final 2x2 solve runs in doubles with an
    identical expression tree in both engines, rounded 6 dp.

    Scale shape: ONE lineitem scan (3 columns pruned), one hash agg on
    the 3-value flag key; everything downstream is a 3-row table."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("decimal(12,2)").alias("x1"),
        F.col("l_discount").cast("decimal(6,2)").alias("x2"),
        F.col("l_extendedprice").cast("decimal(14,2)").alias("y"),
    )
    s = pts.groupBy("flag").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    k = F.col("k")
    cm = s.select(
        "flag",
        "k",
        (k * F.col("s11") - F.col("s1") * F.col("s1")).cast("double").alias("c11"),
        (k * F.col("s12") - F.col("s1") * F.col("s2")).cast("double").alias("c12"),
        (k * F.col("s22") - F.col("s2") * F.col("s2")).cast("double").alias("c22"),
        (k * F.col("s1y") - F.col("s1") * F.col("sy")).cast("double").alias("c1y"),
        (k * F.col("s2y") - F.col("s2") * F.col("sy")).cast("double").alias("c2y"),
        (k * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("sy").cast("double").alias("syd"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    fit = cm.select(
        "flag", "k", "s1d", "s2d", "syd", "cyy", "c1y", "c2y",
        b1.alias("b1"), b2.alias("b2"),
    )
    kd = F.col("k").cast("double")
    return fit.select(
        "flag",
        F.col("k").cast("bigint").alias("n_rows"),
        F.round(
            (F.col("syd") - F.col("b1") * F.col("s1d") - F.col("b2") * F.col("s2d"))
            / kd,
            6,
        ).alias("intercept"),
        F.round(F.col("b1"), 6).alias("beta_quantity"),
        F.round(F.col("b2"), 6).alias("beta_discount"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y")) / F.col("cyy"),
            6,
        ).alias("r2"),
    ).orderBy("flag")


@register(
    "q_winsorized_stats",
    oracle="""
WITH ranked AS (
  SELECT CAST(o_totalprice AS DECIMAL(14,2)) AS price,
    ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
  FROM orders
),
nk AS (
  SELECT COUNT(*) AS n, COUNT(*) // 20 AS k FROM ranked
),
bounds AS (
  SELECT
    MAX(CASE WHEN rn = k + 1 THEN price END) AS lo,
    MAX(CASE WHEN rn = n - k THEN price END) AS hi
  FROM ranked CROSS JOIN nk
),
clamped AS (
  SELECT
    CASE WHEN rn <= k THEN lo WHEN rn > n - k THEN hi ELSE price END AS w,
    price
  FROM ranked CROSS JOIN nk CROSS JOIN bounds
),
sums AS (
  SELECT COUNT(*) AS n,
    SUM(price) AS sr, SUM(price * price) AS srr,
    SUM(w) AS sw, SUM(w * w) AS sww
  FROM clamped
)
SELECT
  CAST(n AS BIGINT) AS n_orders,
  CAST((SELECT k FROM nk) AS BIGINT) AS k_each_side,
  CAST((SELECT lo FROM bounds) AS DOUBLE) AS lo,
  CAST((SELECT hi FROM bounds) AS DOUBLE) AS hi,
  ROUND(CAST(sr AS DOUBLE) / n, 6) AS mean_raw,
  ROUND(CAST(sw AS DOUBLE) / n, 6) AS mean_winsorized,
  ROUND(SQRT(CAST(n * srr - sr * sr AS DOUBLE)) / n, 6) AS sd_raw,
  ROUND(SQRT(CAST(n * sww - sw * sw AS DOUBLE)) / n, 6) AS sd_winsorized
FROM sums
""",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/sd of order totals at 5%/95% — the robust-stats
    companion to q_trimmed_mean_price: instead of DROPPING the k = n/20
    most extreme values on each side, winsorization CLAMPS them to the
    boundary order statistics, keeping n constant (the estimator
    metric pipelines use when row counts must be preserved).

    Exactness: boundary values are ORDER STATISTICS (the rank-(k+1)
    and rank-(n−k) prices), located by the two-pass range-partitioned
    global row_number — never a single-partition sort; clamped and raw
    sums are exact DECIMALs; sd uses the integer-exact n·Σx² − (Σx)²
    form before one double sqrt, rounded 6 dp.

    Scale shape: ONE orders scan (2 columns) into rank_global; the
    pinned ranking feeds three consumers (count, boundary lookup,
    clamped reduction) without re-materializing; bounds and (n, k) are
    1-row broadcasts."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(14,2)").alias("price"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_totalprice").alias("raw"),
    )
    # three consumers of one materialized ranking (the q_rank_family
    # pin pattern)
    ranked = (
        with_global_ranks(
            orders, [("raw", True)], tiebreak=["okey"], row_number_col="rn"
        )
        .select("price", "rn")
        .localCheckpoint(eager=False)
    )
    nk = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("COUNT(1) DIV 20").alias("k"),
    )
    bounds = (
        ranked.crossJoin(F.broadcast(nk))
        .agg(
            F.max(
                F.when(F.col("rn") == F.col("k") + 1, F.col("price"))
            ).alias("lo"),
            F.max(
                F.when(F.col("rn") == F.col("n") - F.col("k"), F.col("price"))
            ).alias("hi"),
        )
    )
    w = (
        F.when(F.col("rn") <= F.col("k"), F.col("lo"))
        .when(F.col("rn") > F.col("n") - F.col("k"), F.col("hi"))
        .otherwise(F.col("price"))
    )
    sums = (
        ranked.crossJoin(F.broadcast(nk))
        .crossJoin(F.broadcast(bounds))
        .select(w.alias("w"), F.col("price"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").alias("sr"),
            F.sum(F.col("price") * F.col("price")).alias("srr"),
            F.sum("w").alias("sw"),
            F.sum(F.col("w") * F.col("w")).alias("sww"),
        )
    )
    n = F.col("n")
    nd = n.cast("double")
    return (
        sums.crossJoin(F.broadcast(nk.select("k")))
        .crossJoin(F.broadcast(bounds))
        .select(
            n.cast("bigint").alias("n_orders"),
            F.col("k").cast("bigint").alias("k_each_side"),
            F.col("lo").cast("double").alias("lo"),
            F.col("hi").cast("double").alias("hi"),
            F.round(F.col("sr").cast("double") / nd, 6).alias("mean_raw"),
            F.round(F.col("sw").cast("double") / nd, 6).alias("mean_winsorized"),
            F.round(
                F.sqrt((n * F.col("srr") - F.col("sr") * F.col("sr")).cast("double"))
                / nd,
                6,
            ).alias("sd_raw"),
            F.round(
                F.sqrt((n * F.col("sww") - F.col("sw") * F.col("sw")).cast("double"))
                / nd,
                6,
            ).alias("sd_winsorized"),
        )
    )


@register(
    "q_kendall_tau",
    oracle="""
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
    CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y,
    CAST(COUNT(*) AS DECIMAL(38,0)) AS c
  FROM lineitem GROUP BY 1, 2
),
tot AS (
  SELECT SUM(c) AS n FROM cells
),
pq AS (
  SELECT
    SUM(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END) AS p,
    SUM(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END) AS q
  FROM cells a JOIN cells b ON a.x < b.x
),
tx AS (
  SELECT SUM(cx * (cx - 1) / 2) AS t FROM (
    SELECT SUM(c) AS cx FROM cells GROUP BY x
  )
),
ty AS (
  SELECT SUM(cy * (cy - 1) / 2) AS t FROM (
    SELECT SUM(c) AS cy FROM cells GROUP BY y
  )
)
SELECT
  CAST(n AS BIGINT) AS n_rows,
  CAST(p AS DOUBLE) AS n_concordant,
  CAST(q AS DOUBLE) AS n_discordant,
  ROUND(
    CAST(p - q AS DOUBLE)
    / SQRT(CAST(n * (n - 1) / 2 - tx.t AS DOUBLE)
           * CAST(n * (n - 1) / 2 - ty.t AS DOUBLE)),
  6) AS tau_b
FROM pq CROSS JOIN tot CROSS JOIN tx CROSS JOIN ty
""",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Kendall tau-b between line quantity and
    discount — the rank-correlation statistic that is normally
    O(n log n) sequential (inversion counting) and hard to distribute.
    The engine computes it EXACTLY off the bounded joint value
    HISTOGRAM (the q_mann_whitney_drift trick in two dimensions): the
    (quantity, discount) domain is 50 x 11 cells, so concordant /
    discordant pair mass is a cell-table self-join — corpus rows touch
    ONE hash agg, never a pair join.

    Exactness: cell counts and all pair products are exact
    DECIMAL(38,0) internally (c_a*c_b sums overflow int64 past ~10^9
    rows — the Spearman lesson); tie terms come from the cell
    marginals; the tau division runs in doubles, rounded 6 dp, and the
    OUTPUT pair-mass columns are double-cast for cross-engine pandas
    representation (the decimals stay exact inside the dag).

    Scale shape: one 2-column pruned scan into a |domain|-sized hash
    agg; the pinned cell table serves four consumers (pair join both
    sides, both tie marginals, total); the self-join is broadcast —
    bounded by the value domain, never the data."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (
        li.select(
            F.col("l_quantity").cast("bigint").alias("x"),
            F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("c").alias("n"))
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    pq = (
        a.join(F.broadcast(b), F.col("xa") < F.col("xb"))
        .agg(
            F.sum(
                F.when(F.col("ya") < F.col("yb"), F.col("ca") * F.col("cb"))
                .otherwise(F.lit(0))
            ).alias("p"),
            F.sum(
                F.when(F.col("ya") > F.col("yb"), F.col("ca") * F.col("cb"))
                .otherwise(F.lit(0))
            ).alias("q"),
        )
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("cx"))
        .agg(F.sum(F.col("cx") * (F.col("cx") - 1) / 2).alias("t"))
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("cy"))
        .agg(F.sum(F.col("cy") * (F.col("cy") - 1) / 2).alias("t"))
    )
    n = F.col("n")
    half = n * (n - 1) / 2
    return (
        pq.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(tx.select(F.col("t").alias("tx"))))
        .crossJoin(F.broadcast(ty.select(F.col("t").alias("ty"))))
        .select(
            n.cast("bigint").alias("n_rows"),
            F.col("p").cast("double").alias("n_concordant"),
            F.col("q").cast("double").alias("n_discordant"),
            F.round(
                (F.col("p") - F.col("q")).cast("double")
                / F.sqrt(
                    (half - F.col("tx")).cast("double")
                    * (half - F.col("ty")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# One-way ANOVA / Grubbs outlier statistic (round 11)
# ---------------------------------------------------------------------------


@register(
    "q_anova_oneway",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp,
    CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
),
sums AS (
  SELECT grp, COUNT(*) AS n_i, SUM(x) AS s_i, SUM(x * x) AS ss_i
  FROM g GROUP BY grp
),
-- per-group within-SS quantized to exact integers BEFORE the k-row sum
-- (a k-row double sum is partition-order-dependent; the fixed-point sum
-- is not)
terms AS (
  SELECT n_i, s_i,
    CAST(ROUND(
      CAST(n_i * ss_i - s_i * s_i AS DOUBLE) / CAST(n_i AS DOUBLE), 6
    ) AS DECIMAL(38,6)) AS ssw_e
  FROM sums
),
tot AS (
  SELECT COUNT(*) AS k,
    SUM(n_i) AS n,
    SUM(s_i) AS s,
    SUM(ssw_e) AS ssw_e
  FROM terms
),
grand AS (
  SELECT k, n, ssw_e,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m
  FROM tot
),
ssb AS (
  SELECT
    SUM(CAST(ROUND(
      CAST(t.n_i AS DOUBLE)
        * (CAST(t.s_i AS DOUBLE) / t.n_i - g.m)
        * (CAST(t.s_i AS DOUBLE) / t.n_i - g.m),
      6) AS DECIMAL(38,6))) AS ssb_e
  FROM terms t CROSS JOIN grand g
)
SELECT
  CAST(g.k AS BIGINT) AS k_groups,
  CAST(g.n AS BIGINT) AS n_rows,
  CAST(ROUND(b.ssb_e, 0) AS DOUBLE) AS ss_between,
  CAST(ROUND(g.ssw_e, 0) AS DOUBLE) AS ss_within,
  ROUND(
    (CAST(b.ssb_e AS DOUBLE) / (g.k - 1))
      / (CAST(g.ssw_e AS DOUBLE) / (g.n - g.k)),
    6) AS f_stat
FROM grand g CROSS JOIN ssb b
""",
)
def q_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of order value across the five order
    priorities — the k-group generalization of q_welch_ttest: does
    priority class explain any of the price variance? (In curation
    terms: the gate for "does this categorical source/shard label
    predict the metric", run before investing in per-group models.)

    Exactness: per-group (n, Σx, Σx²) are exact decimal sums. The
    within-group SS of each group, (nᵢΣx² − (Σx)²)/nᵢ, is ONE double
    division of exact decimals, rounded 6 dp and captured as an exact
    DECIMAL(38,6) BEFORE the k-row sum — a k-row double sum would be
    partition-order-dependent; the decimal sum is exact in any order
    (the q_nb_lang_classifier discipline, in decimal rather than
    bigint because SSW·1e6 overflows int64 at realistic price
    magnitudes). Between-group terms get the same treatment against
    the exact grand mean.

    Scale shape: ONE orders scan (2 columns pruned) into a |k|-row
    hash agg with map-side partials; everything after the k-row
    rollup is constant-sized scalar algebra. k is the label
    cardinality (5 here), never corpus-proportional."""
    orders = load_table(spark, sf_dir, "orders")
    g = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
    )
    sums = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("x").alias("s_i"),
        F.sum(F.col("x") * F.col("x")).alias("ss_i"),
    )
    n_i, s_i = F.col("n_i"), F.col("s_i")
    terms = sums.select(
        n_i,
        s_i,
        F.round(
            (n_i * F.col("ss_i") - s_i * s_i).cast("double")
            / n_i.cast("double"),
            6,
        )
        .cast("decimal(38,6)")
        .alias("ssw_e"),
    ).localCheckpoint(eager=False)  # two consumers: totals + ssb terms
    tot = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_i").alias("n"),
        F.sum("s_i").alias("s"),
        F.sum("ssw_e").alias("ssw_e"),
    )
    grand = tot.select(
        "k",
        "n",
        "ssw_e",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("m"),
    )
    dm = s_i.cast("double") / n_i - F.col("m")
    ssb = (
        terms.crossJoin(F.broadcast(grand.select("m")))
        .agg(
            F.sum(
                F.round(n_i.cast("double") * dm * dm, 6).cast(
                    "decimal(38,6)"
                )
            ).alias("ssb_e")
        )
    )
    k, n = F.col("k"), F.col("n")
    return (
        grand.crossJoin(F.broadcast(ssb))
        .select(
            k.cast("bigint").alias("k_groups"),
            n.cast("bigint").alias("n_rows"),
            F.round(F.col("ssb_e"), 0).cast("double").alias("ss_between"),
            F.round(F.col("ssw_e"), 0).cast("double").alias("ss_within"),
            F.round(
                (F.col("ssb_e").cast("double") / (k - 1))
                / (F.col("ssw_e").cast("double") / (n - k)),
                6,
            ).alias("f_stat"),
        )
    )


@register(
    "q_grubbs_outlier",
    oracle="""
WITH base AS MATERIALIZED (
  SELECT o_orderkey AS okey, CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
),
stats AS (
  SELECT COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS ss FROM base
),
m AS (
  SELECT n,
    CAST(s AS DOUBLE) / n AS mean,
    SQRT(CAST(n * ss - s * s AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
      AS sd
  FROM stats
),
dev AS (
  SELECT b.okey, ROUND(ABS(CAST(b.x AS DOUBLE) - m.mean), 6) AS d
  FROM base b CROSS JOIN m
),
mx AS (SELECT MAX(d) AS maxdev FROM dev)
SELECT
  CAST(m.n AS BIGINT) AS n_rows,
  ROUND(m.mean, 6) AS mean_price,
  ROUND(m.sd, 6) AS sd_price,
  (SELECT MIN(okey) FROM dev, mx WHERE dev.d = mx.maxdev) AS outlier_key,
  ROUND(mx.maxdev, 6) AS max_abs_dev,
  ROUND(mx.maxdev / m.sd, 6) AS grubbs_g
FROM m CROSS JOIN mx
""",
)
def q_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' outlier statistic on order totals: G = max|x − x̄|/s,
    plus the identity of the most extreme order (deterministic
    lowest-key tiebreak) — the single-most-extreme-value test quality
    monitors run before alerting on a metric spike.

    Exactness: (n, Σx, Σx²) are exact decimal sums; mean and sd are
    single double expressions of them (identical trees both engines);
    per-row |x − mean| is rounded 6 dp so the global MAX and the
    tie-filtered MIN(okey) argmax are engine-identical.

    Scale shape: the 2-column orders scan is pinned and feeds three
    consumers (moment agg, deviation max, argmax lookup) — each a
    map-side-partial hash agg, no window, no sort; the argmax is a
    1-row broadcast semi-filter, never a global ORDER BY."""
    base = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
        .localCheckpoint(eager=False)
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("ss"),
    )
    n = F.col("n")
    m = stats.select(
        n,
        (F.col("s").cast("double") / n).alias("mean"),
        F.sqrt(
            (n * F.col("ss") - F.col("s") * F.col("s")).cast("double")
            / (n.cast("double") * (n - 1))
        ).alias("sd"),
    )
    dev = base.crossJoin(F.broadcast(m.select("mean"))).select(
        "okey",
        F.round(F.abs(F.col("x").cast("double") - F.col("mean")), 6).alias(
            "d"
        ),
    ).localCheckpoint(eager=False)  # two consumers: max + argmax lookup
    mx = dev.agg(F.max("d").alias("maxdev"))
    argmax = (
        dev.join(F.broadcast(mx), dev.d == F.col("maxdev"))
        .agg(F.min("okey").alias("outlier_key"))
    )
    return (
        m.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(argmax))
        .select(
            n.cast("bigint").alias("n_rows"),
            F.round(F.col("mean"), 6).alias("mean_price"),
            F.round(F.col("sd"), 6).alias("sd_price"),
            "outlier_key",
            F.round(F.col("maxdev"), 6).alias("max_abs_dev"),
            F.round(F.col("maxdev") / F.col("sd"), 6).alias("grubbs_g"),
        )
    )


@register(
    "q_levene_variance",
    oracle="""
WITH g AS (
  SELECT o_orderpriority AS grp,
    CAST(o_totalprice AS DECIMAL(18,2)) AS x
  FROM orders
),
means AS (
  SELECT grp, COUNT(*) AS n_i, SUM(x) AS s_i FROM g GROUP BY grp
),
-- |x - group mean| captured as an exact DECIMAL(18,2) per row BEFORE
-- any sum (the q_anova_oneway discipline: double sums are partition-
-- order-dependent; decimal sums are exact in any order)
z AS (
  SELECT g.grp,
    CAST(ROUND(ABS(CAST(g.x AS DOUBLE)
                   - CAST(m.s_i AS DOUBLE) / m.n_i), 2)
      AS DECIMAL(18,2)) AS z
  FROM g JOIN means m ON g.grp = m.grp
),
sums AS (
  SELECT grp, COUNT(*) AS n_i, SUM(z) AS s_i, SUM(z * z) AS ss_i
  FROM z GROUP BY grp
),
terms AS (
  SELECT n_i, s_i,
    CAST(ROUND(
      CAST(n_i * ss_i - s_i * s_i AS DOUBLE) / CAST(n_i AS DOUBLE), 6
    ) AS DECIMAL(38,6)) AS ssw_e
  FROM sums
),
tot AS (
  SELECT COUNT(*) AS k, SUM(n_i) AS n, SUM(s_i) AS s, SUM(ssw_e) AS ssw_e
  FROM terms
),
grand AS (
  SELECT k, n, ssw_e, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m FROM tot
),
ssb AS (
  SELECT
    SUM(CAST(ROUND(
      CAST(t.n_i AS DOUBLE)
        * (CAST(t.s_i AS DOUBLE) / t.n_i - g.m)
        * (CAST(t.s_i AS DOUBLE) / t.n_i - g.m),
      6) AS DECIMAL(38,6))) AS ssb_e
  FROM terms t CROSS JOIN grand g
)
SELECT
  CAST(g.k AS BIGINT) AS k_groups,
  CAST(g.n AS BIGINT) AS n_rows,
  CAST(ROUND(b.ssb_e, 0) AS DOUBLE) AS ss_between,
  CAST(ROUND(g.ssw_e, 0) AS DOUBLE) AS ss_within,
  ROUND(
    (CAST(b.ssb_e AS DOUBLE) / (g.k - 1))
      / (CAST(g.ssw_e AS DOUBLE) / (g.n - g.k)),
    6) AS w_stat
FROM grand g CROSS JOIN ssb b
""",
)
def q_levene_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test (mean-centered form) for EQUALITY OF VARIANCES of
    order value across the five order priorities — the homoscedasticity
    check that decides whether q_anova_oneway's pooled-variance F is
    even valid (classic ANOVA assumes equal group variances; a large W
    says route to Welch instead). W is exactly the one-way ANOVA F
    computed on the absolute deviations z = |x − group mean|.

    Exactness: pass 1 yields exact decimal group sums; the group mean
    is ONE double division; each row's z is rounded to cents and
    captured as DECIMAL(18,2) BEFORE summing (double sums are
    partition-order-dependent, decimal sums are not — the
    q_anova_oneway discipline), then the F-on-z pipeline reuses that
    query's exact sufficient-statistic algebra verbatim.

    Scale shape: TWO passes over one pinned 2-column orders projection
    (pass 1: 5-row means agg; pass 2: z via a BROADCAST join of the
    5-row means, into a 5-row hash agg with map-side partials).
    Everything after the k-row rollup is constant scalar algebra."""
    orders = load_table(spark, sf_dir, "orders")
    g = (
        orders.select(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        )
        # one scan serves both passes (means + deviations)
        .localCheckpoint(eager=False)
    )
    means = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_i0"), F.sum("x").alias("s_i0")
    )
    z = g.join(F.broadcast(means), "grp").select(
        "grp",
        F.round(
            F.abs(
                F.col("x").cast("double")
                - F.col("s_i0").cast("double") / F.col("n_i0")
            ),
            2,
        )
        .cast("decimal(18,2)")
        .alias("z"),
    )
    sums = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("z").alias("s_i"),
        F.sum(F.col("z") * F.col("z")).alias("ss_i"),
    )
    n_i, s_i = F.col("n_i"), F.col("s_i")
    terms = sums.select(
        n_i,
        s_i,
        F.round(
            (n_i * F.col("ss_i") - s_i * s_i).cast("double")
            / n_i.cast("double"),
            6,
        )
        .cast("decimal(38,6)")
        .alias("ssw_e"),
    ).localCheckpoint(eager=False)  # k-row spine, two consumers
    tot = terms.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_i").alias("n"),
        F.sum("s_i").alias("s"),
        F.sum("ssw_e").alias("ssw_e"),
    )
    grand = tot.select(
        "k",
        "n",
        "ssw_e",
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("m"),
    )
    ssb = (
        terms.crossJoin(F.broadcast(grand))
        .select(
            F.round(
                n_i.cast("double")
                * (s_i.cast("double") / n_i - F.col("m"))
                * (s_i.cast("double") / n_i - F.col("m")),
                6,
            )
            .cast("decimal(38,6)")
            .alias("ssb_term")
        )
        .agg(F.sum("ssb_term").alias("ssb_e"))
    )
    return grand.crossJoin(F.broadcast(ssb)).select(
        F.col("k").cast("bigint").alias("k_groups"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(F.col("ssb_e"), 0).cast("double").alias("ss_between"),
        F.round(F.col("ssw_e"), 0).cast("double").alias("ss_within"),
        F.round(
            (F.col("ssb_e").cast("double") / (F.col("k") - 1))
            / (F.col("ssw_e").cast("double") / (F.col("n") - F.col("k"))),
            6,
        ).alias("w_stat"),
    )
