"""Subquery-family relational queries: correlated / scalar subqueries,
EXISTS / NOT EXISTS, IN / NOT IN, derived tables — the TPC-H shapes
(Q2, Q4, Q8, Q9, Q11, Q12, Q13, Q14, Q15, Q16, Q17, Q18, Q19, Q20, Q21,
Q22) adapted to the testdata's reduced star schema (no partsupp, no
commit/receipt dates, no shipmode — see TESTDATA.md; Q12/Q21's
"received after committed" lateness is re-expressed as "shipped more
than N days after the order date").

The reference has none of these (SURVEY.md §2.5: no joins, no
subqueries, no SQL at all); they are part of the engine's declared
relational capability surface (§2.7), expressed as DataFrame plans so
Catalyst plans the decorrelation explicitly:

- correlated scalar subquery  → window min/avg over the correlation key,
  or a broadcast-joined pre-aggregate (no per-row re-scan);
- EXISTS / IN                 → left-semi join;
- NOT EXISTS / NOT IN         → left-anti join;
- uncorrelated scalar         → cross-joined 1-row aggregate (broadcast).

Scale notes (100 TB design):
- broadcast HINTS are pinned only on provably-tiny data (nation/region,
  1-row scalar aggregates). Scale-growing sides — part, supplier,
  customer, per-part pre-aggregates — carry NO hint: Catalyst/AQE
  broadcasts them from size stats while they fit and falls back to
  shuffle joins when they don't. A forced broadcast of a table that
  grows with SF is a driver OOM at 100 TB;
- semi/anti joins shuffle once on the join key; no row explosion
  (semi/anti never duplicate the probe side);
- the scalar aggregates (q11 total, q15 max, q22 avg) collapse to one
  row before the broadcast cross-join — no driver collect.

Numeric discipline per plans.registry: decimal-exact sums cast to
double; thresholds derived from aggregates are computed decimal-first so
both engines filter on bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _disc_price():
    return _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - _dec("l_discount", 3, 2)
    )


# ---------------------------------------------------------------------------
# Q2 shape — correlated min subquery: parts priced at the minimum of
# their type class.
# ---------------------------------------------------------------------------

@register(
    "q2_min_price_parts",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_type, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
ORDER BY p_type, p_partkey
""",
)
def q2_min_price_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_type")
    return (
        part.withColumn("min_price", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("min_price"))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q4 shape — EXISTS: orders with at least one line shipped after the
# order date, counted per priority.
# ---------------------------------------------------------------------------

@register(
    "q4_exists_late_ship",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share: EUROPE suppliers' share of total revenue per
# order year (conditional agg over a 5-way join).
# ---------------------------------------------------------------------------

@register(
    "q8_market_share",
    oracle=f"""
SELECT
  EXTRACT(YEAR FROM o_orderdate) AS o_year,
  CAST(SUM(CASE WHEN r_name = 'EUROPE' THEN {_DISC_PRICE_SQL}
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load_table(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "r_name")
    )
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("r_name") == "EUROPE", dp).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(dp).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 shape — profit by supplier nation and order year.
# ---------------------------------------------------------------------------

@register(
    "q9_profit_by_nation_year",
    oracle=f"""
SELECT
  n_name AS nation,
  EXTRACT(YEAR FROM o_orderdate) AS o_year,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
ORDER BY n_name, o_year DESC
""",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 shape — uncorrelated scalar subquery over an aggregate: nations
# holding more than 8% of total supplier account balance.
# ---------------------------------------------------------------------------

@register(
    "q11_important_balances",
    oracle="""
SELECT n_name AS nation,
  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) > (
  SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) * 0.08
  FROM supplier
)
ORDER BY total_bal DESC, nation
""",
)
def q11_important_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    per_nation = (
        sup.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_dec("s_acctbal")).cast("double").alias("total_bal"))
    )
    threshold = sup.agg(
        (F.sum(_dec("s_acctbal")).cast("double") * F.lit(0.08)).alias("thr")
    )
    return (
        per_nation.join(F.broadcast(threshold))
        .filter(F.col("total_bal") > F.col("thr"))
        .select("nation", "total_bal")
        .orderBy(F.col("total_bal").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# Q12 shape — join + dual conditional counts: per line status, how many
# late-shipped lines belong to high- vs low-priority orders. The
# reference schema has no l_shipmode / commit / receipt dates
# (TESTDATA.md), so the grouping key is l_linestatus and "late" means
# shipped > 60 days after the order date.
#
# Scale note: single shuffle join lineitem⋈orders on orderkey, then a
# partial-aggregated groupBy on a 2-value key — the CASE-sums combine
# map-side, so the final exchange carries ~|distinct keys| rows.
# ---------------------------------------------------------------------------

_HIGH_PRIO = ("1-URGENT", "2-HIGH")


@register(
    "q12_priority_shipments",
    oracle="""
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*_HIGH_PRIO)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q13 shape — outer join + grouped count distribution: how many
# customers have k orders (k = 0 included).
# ---------------------------------------------------------------------------

@register(
    "q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q14 shape — promo revenue percentage (conditional aggregation).
# ---------------------------------------------------------------------------

@register(
    "q14_promo_revenue",
    oracle=f"""
SELECT
  CAST(100.00 AS DOUBLE)
    * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
               ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.00)
                * F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(dp).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — derived table + scalar max subquery: the top supplier(s)
# by shipped revenue in a quarter.
# ---------------------------------------------------------------------------

_REVENUE_VIEW_SQL = f"""
  SELECT l_suppkey AS supplier_no,
    CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
"""


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS ({_REVENUE_VIEW_SQL})
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .join(sup, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape — NOT IN subquery + distinct aggregation: supplier variety
# per part attribute class, excluding one brand and suppliers in debt.
# ---------------------------------------------------------------------------

@register(
    "q16_part_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    indebted = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(indebted, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 shape — correlated avg subquery: revenue from small-quantity
# orders of PROMO parts (decorrelated to a broadcast pre-aggregate).
# ---------------------------------------------------------------------------

@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_type = 'PROMO'
  AND l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part_avg, F.col("ap_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape — IN over a grouped HAVING subquery: large-volume orders.
# ---------------------------------------------------------------------------

@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 140
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape).

    Scale shape (r10 rework): the HAVING subquery's per-order quantity
    total IS the output column — the filtered aggregate rides the join
    as `q` instead of re-joining lineitem and re-aggregating, so
    lineitem is scanned ONCE and the plan has one fact join, not two
    (the oracle keeps the textbook two-scan formulation, proving the
    fusion is semantics-preserving)."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 140)
    )
    orders = load_table(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == F.col("l_orderkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-attribute predicates (pushdown stress).
# ---------------------------------------------------------------------------

@register(
    "q19_disjunctive_revenue",
    oracle=f"""
SELECT CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
     AND l_quantity >= 1 AND l_quantity <= 11)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
     AND l_quantity >= 10 AND l_quantity <= 20)
  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
     AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 shape — nested IN subqueries: suppliers who shipped a large volume
# of STANDARD parts.
# ---------------------------------------------------------------------------

@register(
    "q20_volume_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 500
)
ORDER BY s_suppkey
""",
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    std_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    vol = (
        li.join(std_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 500)
        .select("l_suppkey")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(vol, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 shape — correlated EXISTS + NOT EXISTS self-joins: suppliers who
# were the SOLE late shipper on a multi-supplier finalized order.
# "Late" = shipped > 30 days after the order date (no receipt/commit
# dates in the testdata). The classic single-nation filter is replaced
# by grouping per supplier nation so the supplier→nation join survives
# the adaptation and the result stays non-degenerate at small SF.
#
# Decorrelation (Spark-first): instead of two correlated lineitem
# re-scans per outer row, aggregate lineitem ONCE per order —
# n_suppliers = count(DISTINCT suppkey), n_late_suppliers =
# count(DISTINCT suppkey | late) — and join back. EXISTS(other
# supplier) ≡ n_suppliers > 1; NOT EXISTS(other late supplier), given
# this line is late, ≡ n_late_suppliers = 1. One extra shuffle on
# orderkey replaces two correlated scans; both sides are already
# hash-partitioned on orderkey so AQE coalesces the exchange.
# ---------------------------------------------------------------------------

@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT n_name, s_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY n_name, s_name
ORDER BY numwait DESC, n_name, s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    lines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late", F.col("l_shipdate") > late_cutoff
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_suppliers"
        ),
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return (
        lines.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("po_orderkey"))
        .filter((F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "n_name", "s_name")
    )


# ---------------------------------------------------------------------------
# Q22 shape — uncorrelated scalar avg + NOT EXISTS: rich customers with
# no orders, by market segment.
# ---------------------------------------------------------------------------

@register(
    "q22_idle_rich_customers",
    oracle="""
SELECT c_mktsegment,
  COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
