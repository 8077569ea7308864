"""Extended function-catalog queries: GROUPING SETS, statistical
aggregates, percentiles, array functions, and null-handling scalars.

Statistical aggregates are computed from decimal-exact power sums
(Σx, Σx² as DECIMAL) rather than the built-in stddev/var/corr: the
built-ins fold doubles in partition order, which is not reproducible
across engines (or even across runs); the power-sum formulation is
bit-identical everywhere and algebraically the same quantity. At scale
this is also one pass instead of Welford per-partition + merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


# ---------------------------------------------------------------------------
# GROUPING SETS (cube/rollup's general form; distinct §2.5 capability).
# ---------------------------------------------------------------------------

@register(
    "q_grouping_sets",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  COUNT(*) AS n_rows,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], ["l_returnflag", "l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregates from exact power sums.
# ---------------------------------------------------------------------------

@register(
    "q_stats_aggregates",
    oracle="""
SELECT
  c_mktsegment,
  COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_bal,
  (CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2)))
        AS DOUBLE)
   - CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
     * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
  / (COUNT(*) - 1) AS var_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    s1 = F.sum(_dec("c_acctbal")).cast("double")
    s2 = F.sum(_dec("c_acctbal") * _dec("c_acctbal")).cast("double")
    n = F.count(F.lit(1))
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            n.alias("n"),
            (s1 / n).alias("mean_bal"),
            ((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("var_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_corr_price_qty",
    oracle="""
SELECT
  l_returnflag,
  ROUND(
  (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                       * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
   - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
     * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
  /
  (sqrt(COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                            * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE))
   * sqrt(COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                              * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
            * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)))
  , 6) AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal power sums (one pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = _dec("l_quantity"), _dec("l_extendedprice")
    n = F.count(F.lit(1))
    sq, sp = F.sum(q).cast("double"), F.sum(p).cast("double")
    sqq, spp = F.sum(q * q).cast("double"), F.sum(p * p).cast("double")
    sqp = F.sum(q * p).cast("double")
    corr = (n * sqp - sq * sp) / (
        F.sqrt(n * sqq - sq * sq) * F.sqrt(n * spp - sp * sp)
    )
    # composite double expression → 6-dp rounding absorbs cross-engine
    # ulp drift (house discipline, plans.registry docstring)
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(corr, 6).alias("corr_qty_price"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Percentiles: exact rank-based (discrete), deterministic across engines.
# ---------------------------------------------------------------------------

@register(
    "q_percentiles_disc",
    oracle="""
SELECT
  o_orderpriority,
  quantile_disc(o_totalprice, 0.5) AS p50,
  quantile_disc(o_totalprice, 0.9) AS p90,
  quantile_disc(o_totalprice, 0.99) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_percentiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles: both engines pick an actual data value at
    the lower-rank cut — no interpolation arithmetic to drift.

    Spark's `percentile(frac)` interpolates and DuckDB's quantile_disc
    ranks as ceil(q*n); the exact dual is element at rank
    ceil(q*n) of the sorted values, expressed with sort_array +
    element_at over a collected group. Groups are priority buckets
    (5 groups), so collect stays bounded; at scale use
    approx_percentile and accept approximation."""
    orders = load_table(spark, sf_dir, "orders")
    vals = F.sort_array(F.collect_list("o_totalprice"))

    def disc(frac: float):
        rank = F.ceil(F.size(vals) * F.lit(frac)).cast("int")
        return F.element_at(vals, F.greatest(rank, F.lit(1)))

    return (
        orders.groupBy("o_orderpriority")
        .agg(
            disc(0.5).alias("p50"),
            disc(0.9).alias("p90"),
            disc(0.99).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Array function catalog over the embeddings table.
# ---------------------------------------------------------------------------

@register(
    "q_array_funcs",
    oracle="""
SELECT
  vec_id,
  CAST(embedding[1] AS DOUBLE) AS first_el,
  CAST(embedding[len(embedding)] AS DOUBLE) AS last_el,
  len(list_filter(embedding, x -> x > 0)) AS n_positive,
  CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_min,
  len(embedding[1:8]) AS slice_len
FROM embeddings
ORDER BY vec_id
""",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.element_at(e, 1).cast("double").alias("first_el"),
        F.element_at(e, F.size(e)).cast("double").alias("last_el"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.element_at(F.array_sort(e), 1).cast("double").alias("sorted_min"),
        F.size(F.slice(e, 1, 8)).alias("slice_len"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Null-handling scalars.
# ---------------------------------------------------------------------------

@register(
    "q_null_handling",
    oracle="""
SELECT
  c_custkey,
  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
  CAST(GREATEST(CAST(c_acctbal AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)))
       AS DOUBLE) AS bal_floor,
  CAST(LEAST(CAST(c_acctbal AS DECIMAL(12,2)), CAST(0 AS DECIMAL(12,2)))
       AS DOUBLE) AS bal_cap,
  CASE WHEN c_acctbal IS NULL THEN 'null'
       WHEN c_acctbal < 0 THEN 'debt' ELSE 'credit' END AS bal_class
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
""",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    bal = _dec("c_acctbal")
    zero = F.lit(0).cast("decimal(12,2)")
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_or_other"),
        # cast back to double: a DECIMAL output column reaches pandas as
        # object-of-Decimal on the Spark side but float64 from DuckDB —
        # the driver's dtype-sensitive hash would mismatch
        F.greatest(bal, zero).cast("double").alias("bal_floor"),
        F.least(bal, zero).cast("double").alias("bal_cap"),
        F.when(F.col("c_acctbal").isNull(), "null")
        .when(F.col("c_acctbal") < 0, "debt")
        .otherwise("credit")
        .alias("bal_class"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Approximate sketches — the 100 TB cardinality/quantile path. Sketch
# internals are engine-specific (Spark HLL++ / DuckDB HLL), so there is
# no cross-engine oracle; error bounds vs the exact answers are asserted
# in tests/test_sketches.py.
# ---------------------------------------------------------------------------

@register("q_approx_distinct_users")
def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per event type (rsd 2%) next to the
    exact counts — at 100 TB the sketch is one pass / O(1) memory where
    exact distinct is a full shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


@register("q_approx_percentile_value")
def q_approx_percentile_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna) vs the exact rank-based
    percentile on the same column."""
    ev = load_table(spark, sf_dir, "events")
    vals = F.sort_array(F.collect_list("value"))
    exact_p50 = F.element_at(
        vals, F.greatest(F.ceil(F.size(vals) * 0.5).cast("int"), F.lit(1))
    )
    return ev.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5, 10000).alias("approx_p50"),
        exact_p50.alias("exact_p50"),
    ).orderBy("event_type")


@register(
    "q_ntile_balance_deciles",
    oracle="""
WITH tiled AS (
  SELECT c_mktsegment, c_custkey,
    NTILE(10) OVER (
      PARTITION BY c_mktsegment
      ORDER BY c_acctbal DESC, c_custkey
    ) AS decile,
    CAST(c_acctbal AS DECIMAL(12, 2)) AS bal
  FROM customer
)
SELECT c_mktsegment, decile,
  COUNT(*) AS n_customers,
  CAST(MIN(bal) AS DOUBLE) AS min_bal,
  CAST(MAX(bal) AS DOUBLE) AS max_bal
FROM tiled
GROUP BY c_mktsegment, decile
""",
)
def q_ntile_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment balance deciles via NTILE — the equal-height
    bucketing used for cohort cuts. The ORDER BY carries a unique
    tiebreak (custkey) so tile assignment is total-order deterministic
    across engines."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    return (
        cust.select(
            "c_mktsegment",
            F.ntile(10).over(w).alias("decile"),
            bal.alias("bal"),
        )
        .groupBy("c_mktsegment", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("bal").cast("double").alias("min_bal"),
            F.max("bal").cast("double").alias("max_bal"),
        )
    )


@register(
    "q_price_histogram",
    oracle="""
SELECT bucket,
  COUNT(*) AS n_orders,
  CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
  CAST(MAX(o_totalprice) AS DOUBLE) AS hi
FROM (
  -- width_bucket(v, 0, 600000, 12) spelled out (DuckDB lacks it)
  SELECT o_totalprice,
         CASE WHEN o_totalprice < 0 THEN 0
              WHEN o_totalprice >= 600000 THEN 13
              ELSE CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 END AS bucket
  FROM orders
) t
GROUP BY bucket
ORDER BY bucket
""",
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the distributed
    histogram is just a groupBy on a computed bucket id (map-side
    partial counts, one tiny shuffle; no sort, no driver collect)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_totalprice",
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12)).alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bucket")
    )


@register(
    "q_null_safe_join",
    oracle="""
SELECT
  COALESCE(CAST(e.label AS VARCHAR), '<null>') AS label_a,
  COUNT(*) AS n_pairs
FROM (
  SELECT NULLIF(CAST(json_extract_string(props, '$.k') AS INTEGER) % 5, 0) AS label
  FROM events WHERE event_id % 97 = 0
) e
JOIN (
  SELECT NULLIF(CAST(json_extract_string(props, '$.k') AS INTEGER) % 5, 0) AS label
  FROM events WHERE event_id % 89 = 0
) f
  ON e.label IS NOT DISTINCT FROM f.label
GROUP BY 1
ORDER BY 1
""",
)
def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics audits and
    SCD merges need. Spark plans <=> as a proper hash-join key (no
    fallback to nested-loop), so it shuffles exactly like = . Labels
    are NULLIF-derived so the key mix genuinely contains NULLs."""
    ev = load_table(spark, sf_dir, "events")
    lab = F.nullif(F.get_json_object("props", "$.k").cast("int") % 5, F.lit(0))
    e = ev.filter(F.col("event_id") % 97 == 0).select(lab.alias("label_a"))
    f2 = ev.filter(F.col("event_id") % 89 == 0).select(lab.alias("label_b"))
    return (
        e.join(f2, F.col("label_a").eqNullSafe(F.col("label_b")))
        .groupBy(
            F.coalesce(F.col("label_a").cast("string"), F.lit("<null>")).alias(
                "label_a"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("label_a")
    )


@register(
    "q_weighted_avg_pandas",
    oracle="""
SELECT
  l_returnflag,
  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE)
    / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / 100.0 AS w_avg_price,
  COUNT(*) AS n_lines
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_weighted_avg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price via the grouped-agg pandas UDF tier
    (functions.udaf) — the escape hatch for aggregates Spark's built-ins
    can't express, exercised with fixed-point accumulation so the Arrow
    path still hash-matches the decimal oracle exactly."""
    from flink_template_spark.functions.udaf import count_rows, weighted_mean_cents

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            weighted_mean_cents("price_cents", "qty").alias("w_avg_price"),
            count_rows("qty").alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register("q_hll_mergeable_rollup")
def q_hll_mergeable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting via datasketches HLL
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate): build one
    tiny sketch per (day, event_type) cell, then merge the *sketches* —
    not the data — up to per-type totals. This is the pattern that
    matters at 100 TB: materialize per-bucket sketches once, answer any
    coarser distinct-count rollup by unioning kilobytes, never
    re-scanning rows (approx_count_distinct alone can't be re-rolled
    from saved results). Rows-only check: estimates have no exact SQL
    dual; the error bound vs exact COUNT(DISTINCT) is pinned in
    tests/test_sketches.py."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(
            F.to_date("ts").alias("day"),
            "event_type",
        )
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
        .orderBy("event_type")
    )


def _hll_portable_oracle() -> str:
    from flink_template_spark.operators.sketches_portable import (
        hll_estimate_sql,
        hll_registers_sql,
    )

    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, event_type, user_id FROM events
),
regs AS MATERIALIZED ({hll_registers_sql('base', ['day', 'event_type'], 'user_id')}),
merged AS (
  SELECT event_type, bucket, MAX(r) AS r FROM regs GROUP BY event_type, bucket
),
est AS ({hll_estimate_sql('merged', ['event_type'])}),
exact AS (
  SELECT event_type,
    COUNT(DISTINCT user_id) AS exact_users,
    COUNT(DISTINCT day) AS n_days
  FROM base GROUP BY event_type
)
SELECT est.event_type, est.approx_distinct AS approx_users,
  exact.exact_users, exact.n_days
FROM est JOIN exact ON est.event_type = exact.event_type
ORDER BY est.event_type
"""


@register("q_hll_portable_rollup", oracle=_hll_portable_oracle())
def q_hll_portable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count rollup with the ENGINE-PORTABLE HLL
    (operators.sketches_portable): per-(day, event_type) registers are
    max-merged up to per-type sketches, then estimated — the same
    materialize-once / re-roll-for-free pattern as the datasketches
    path (q_hll_mergeable_rollup), but with every register and the
    final estimate reproduced exactly by the DuckDB oracle. The exact
    COUNT(DISTINCT) rides along so the sketch error is visible in the
    verified output itself."""
    from flink_template_spark.operators.sketches_portable import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.to_date("ts").alias("day"), "event_type", "user_id"
    )
    regs = hll_registers(base, ["day", "event_type"], "user_id")
    merged = hll_merge(regs, ["event_type"])
    est = hll_estimate(merged, ["event_type"]).select(
        "event_type", F.col("approx_distinct").alias("approx_users")
    )
    exact = base.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count_distinct("day").alias("n_days"),
    )
    return est.join(exact, "event_type").orderBy("event_type")


def _cms_oracle() -> str:
    from flink_template_spark.operators.sketches_portable import (
        CMS_D,
        _cms_pos_duckdb,
        cms_counters_sql,
    )

    probe_branches = "\n  UNION ALL\n".join(
        f"  SELECT token, exact_count, {i} AS i, "
        f"{_cms_pos_duckdb(i, 'token')} AS pos FROM top"
        for i in range(CMS_D)
    )
    return f"""
WITH tok AS MATERIALIZED (
  SELECT lang, word AS token FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
  ) WHERE word <> ''
),
counters AS MATERIALIZED ({cms_counters_sql('tok', ['lang'], 'token')}),
merged AS (
  SELECT i, pos, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM counters GROUP BY i, pos
),
top AS MATERIALIZED (
  SELECT token, COUNT(*) AS exact_count FROM tok
  GROUP BY token ORDER BY exact_count DESC, token LIMIT 20
),
probe AS (
{probe_branches}
)
SELECT p.token, p.exact_count, MIN(c.cnt) AS est_count,
  MIN(c.cnt) - p.exact_count AS overestimate
FROM probe p JOIN merged c ON p.i = c.i AND p.pos = c.pos
GROUP BY p.token, p.exact_count
ORDER BY p.exact_count DESC, p.token
"""


@register("q_cms_token_freq", oracle=_cms_oracle())
def q_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency estimation with the engine-portable Count-Min sketch
    (operators.sketches_portable): per-language counter grids are
    SUM-merged into one global sketch (lossless union), then the exact
    top-20 tokens are point-estimated against it — est ≥ exact always
    (CMS never underestimates), and the overestimate column makes the
    collision error visible in verified output. Pure integer arithmetic
    end to end, so build, merge, and lookup are all oracle-exact."""
    from flink_template_spark.operators.sketches_portable import (
        cms_counters,
        cms_lookup,
        cms_merge,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    counters = cms_counters(tok, ["lang"], "token")
    merged = cms_merge(counters, [])
    top = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "token")
        .limit(20)
    )
    est = cms_lookup(merged, top, "token")
    return est.select(
        "token",
        "exact_count",
        "est_count",
        (F.col("est_count") - F.col("exact_count")).alias("overestimate"),
    ).orderBy(F.desc("exact_count"), "token")


_DD_QS = (0.5, 0.9, 0.99)


def _dd_oracle() -> str:
    # the >= 1 filter must match the Spark side's (the sketch domain):
    # without it, a sub-1 price would shift the exact ranks on one side
    exact_branches = "\n  UNION ALL\n".join(
        f"  SELECT CAST({q} AS DOUBLE) AS q, "
        f"CAST(quantile_disc(o_totalprice, {q}) AS DOUBLE) AS exact_price "
        f"FROM orders WHERE o_totalprice >= 1"
        for q in _DD_QS
    )
    return f"""
WITH binned AS (
  SELECT cell, (e * 8 + CAST(FLOOR((v / CAST((CAST(1 AS BIGINT) << e) AS DOUBLE)
                - 1.0) * 8.0) AS BIGINT)) AS idx
  FROM (
    SELECT o_orderpriority AS cell, o_totalprice AS v,
      length(bin(CAST(FLOOR(o_totalprice) AS BIGINT))) - 1 AS e
    FROM orders WHERE o_totalprice >= 1
  )
),
b AS (SELECT cell, idx, COUNT(*) AS cnt FROM binned GROUP BY cell, idx),
merged AS (SELECT idx, CAST(SUM(cnt) AS BIGINT) AS cnt FROM b GROUP BY idx),
cum AS (
  SELECT idx, SUM(cnt) OVER (ORDER BY idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM merged
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, COUNT(*) AS n_buckets FROM merged),
qs AS (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _DD_QS)}]) AS q),
pick AS (
  SELECT q, MIN(idx) AS est_idx
  FROM qs, cum, tot WHERE cum >= CEIL(q * n)
  GROUP BY q
),
est AS (
  SELECT q,
    ROUND(CAST((CAST(1 AS BIGINT) << (est_idx // 8)) AS DOUBLE)
      * (1.0 + (CAST(est_idx % 8 AS DOUBLE) + 0.5) / 8.0), 6) AS est_price
  FROM pick
),
exact AS (
{exact_branches}
)
SELECT e.q, e.est_price, x.exact_price, t.n_buckets
FROM est e JOIN exact x ON e.q = x.q CROSS JOIN tot t
ORDER BY e.q
"""


@register("q_ddsketch_quantiles", oracle=_dd_oracle())
def q_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation, DDSketch-style: values land in
    log-spaced buckets (8 per power of two → ≤ ~6.5 % relative error),
    per-priority bucket grids SUM-merge into one global sketch, and
    quantiles read off the cumulative counts. The bucket index uses
    ONLY integer bit-length (length(bin(floor(v)))) and exact
    power-of-two divisions — no libm anywhere — so sketch and estimate
    replay exactly in DuckDB. Exact disc percentiles ride along so the
    bounded relative error is visible in verified output.

    Scale shape: one map-side-combined shuffle to ≤ a few hundred
    bucket rows per cell; rollups and the quantile read are
    sketch-sized. The exact-comparison side is the two-pass
    range-partitioned global rank (operators.rank_global): exact disc
    percentile q = the row whose global row_number equals ceil(q·n) —
    parallel range sort + a broadcast join against 3 target ranks, no
    value array ever collects into one task.

    Scan sharing (BENCH r4 regression fix): the sketch is binned from
    the SAME ``ranked`` lineage the exact side ranks, so the orders
    parquet feeds ONE range exchange that both consumers reuse
    (ReusedExchange) instead of two independent scans; and every
    broadcast of the ``tot`` totals row uses the identical subtree so
    the broadcast exchange is built once, not three times."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    # One range-partitioned pass over orders carries BOTH the exact
    # rank and the sketch payload (cell); ties in o_totalprice make rn
    # assignment among equal values arbitrary, but every such row
    # carries the same value, so exact_price is deterministic.
    from flink_template_spark.operators.rank_global import with_global_ranks

    ranked = with_global_ranks(
        orders.select(F.col("o_orderpriority").alias("cell"), "o_totalprice"),
        [("o_totalprice", True)],
        row_number_col="rn",
    )
    e = F.length(F.bin(F.floor("o_totalprice").cast("long"))) - 1
    pow2e = F.expr(
        "CAST(shiftleft(1L, CAST(length(bin(CAST(FLOOR(o_totalprice) AS BIGINT))) - 1 AS INT)) AS DOUBLE)"
    )
    sub = F.floor((F.col("o_totalprice") / pow2e - 1.0) * 8.0).cast("long")
    binned = ranked.select(
        "cell", (e.cast("long") * 8 + sub).alias("idx")
    )
    b = binned.groupBy("cell", "idx").agg(F.count(F.lit(1)).alias("cnt"))
    merged = b.groupBy("idx").agg(F.sum("cnt").alias("cnt"))
    # single-partition window BY DESIGN: the input is the MERGED sketch
    # (≤ a few hundred bucket rows regardless of data volume). Spark 4's
    # optimizer folds away any constant partition key, so the WindowExec
    # no-partition WARN is unavoidable plan-side — bench.py scopes that
    # one logger to ERROR (see silence_bounded_window_warns).
    w = W.orderBy("idx").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = merged.select("idx", F.sum("cnt").over(w).alias("cum"))
    tot = merged.agg(
        F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("n_buckets")
    )
    qs = spark.createDataFrame([(float(q),) for q in _DD_QS], "q DOUBLE")
    # broadcast(tot) appears three times below with the IDENTICAL
    # subtree, so Spark builds the broadcast exchange once and reuses
    # it (canonical-plan match); selecting n / n_buckets happens after
    # the join, never on a divergent pre-broadcast projection.
    pick = (
        qs.crossJoin(F.broadcast(cum))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("q")
        .agg(F.min("idx").alias("est_idx"))
    )
    est_e = F.expr("CAST(shiftleft(1L, CAST(est_idx div 8 AS INT)) AS DOUBLE)")
    est = pick.select(
        "q",
        F.round(
            est_e * (1.0 + ((F.col("est_idx") % 8).cast("double") + 0.5) / 8.0), 6
        ).alias("est_price"),
    )
    targets = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        F.greatest(F.ceil(F.col("q") * F.col("n")), F.lit(1))
        .cast("long")
        .alias("rn"),
    )
    exact_rows = ranked.join(F.broadcast(targets), "rn").select(
        "q", F.col("o_totalprice").cast("double").alias("exact_price")
    )
    return (
        exact_rows.join(F.broadcast(est), "q")
        .crossJoin(F.broadcast(tot))
        .select("q", "est_price", "exact_price", "n_buckets")
        .orderBy("q")
    )


@register(
    "q_nested_array_hof",
    oracle="""
WITH nested AS (
  SELECT o_orderkey,
    list_sort(list(struct_pack(
      ln := l_linenumber,
      qty := CAST(l_quantity AS BIGINT),
      rev := CAST(ROUND(l_extendedprice * 100) AS BIGINT)
    ))) AS items
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  WHERE o_orderkey < 2000
  GROUP BY o_orderkey
)
SELECT o_orderkey,
  len(items) AS n_items,
  len(list_filter(items, it -> it.qty > 30)) AS n_big,
  CAST(COALESCE(list_sum(list_transform(list_filter(items, it -> it.qty > 30),
       it -> it.rev)), 0) AS BIGINT) AS big_rev_cents,
  array_to_string(list_transform(items, it -> it.ln), ' ') AS line_numbers
FROM nested
ORDER BY o_orderkey
""",
)
def q_nested_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep nested data through higher-order functions: rows →
    array<struct> (the reference's nested PID shapes, e.g.
    OxygenSensorsData's array-of-struct-of-array,
    ParameterIdData.kt:65-103) → filter/transform/aggregate lambdas —
    all row-local array algebra after the one collect_list shuffle;
    fixed-point cents keep the lambda sums engine-exact. array_sort on
    the (ln, qty, rev) struct gives a canonical element order so
    array-valued output columns hash-match."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.col("l_quantity").cast("long").alias("qty"),
                        F.round(F.col("l_extendedprice") * 100)
                        .cast("long")
                        .alias("rev"),
                    )
                )
            ).alias("items")
        )
    )
    big = F.filter("items", lambda it: it.getField("qty") > 30)
    return nested.select(
        "o_orderkey",
        F.size("items").alias("n_items"),
        F.size(big).alias("n_big"),
        F.aggregate(
            big,
            F.lit(0).cast("long"),
            lambda acc, it: acc + it.getField("rev"),
        ).alias("big_rev_cents"),
        # space-joined string, not an array: the driver canonicalizer
        # cannot lexsort list cells
        F.array_join(
            F.transform("items", lambda it: it.getField("ln").cast("string")),
            " ",
        ).alias("line_numbers"),
    ).orderBy("o_orderkey")


@register(
    "q_map_funcs",
    oracle="""
WITH per AS (
  SELECT l_orderkey,
    map_from_entries(list_sort(list(struct_pack(
      k := l_linestatus, v := cnt)))) AS m
  FROM (
    SELECT l_orderkey, l_linestatus, COUNT(*) AS cnt
    FROM lineitem WHERE l_orderkey < 2000
    GROUP BY l_orderkey, l_linestatus
  )
  GROUP BY l_orderkey
)
SELECT l_orderkey,
  CAST(len(map_keys(m)) AS INT) AS n_statuses,
  array_to_string(list_sort(map_keys(m)), ' ') AS statuses,
  COALESCE(m['F'][1], 0) AS n_f,
  COALESCE(m['O'][1], 0) AS n_o
FROM per
ORDER BY l_orderkey
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (the reference's dynamic ``Map<String, Any?>``
    JSON stage and PID maps, JSONUtil.kt:129-131): build a
    status→count map per order with map_from_entries, read it back with
    element_at / map_keys. Maps never leave as map-typed output columns
    (cross-engine map ordering is unspecified); scalars and sorted key
    arrays are the comparable projection."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    per = (
        li.groupBy("l_orderkey", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("l_orderkey")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(
                    F.col("l_linestatus").alias("k"), F.col("cnt").alias("v")
                )))
            ).alias("m")
        )
    )
    return per.select(
        "l_orderkey",
        F.size(F.map_keys("m")).alias("n_statuses"),
        F.array_join(F.array_sort(F.map_keys("m")), " ").alias("statuses"),
        F.coalesce(F.element_at("m", F.lit("F")), F.lit(0)).alias("n_f"),
        F.coalesce(F.element_at("m", F.lit("O")), F.lit(0)).alias("n_o"),
    ).orderBy("l_orderkey")


@register(
    "q_percentiles_cont",
    oracle="""
SELECT
  o_orderpriority,
  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 6) AS p50,
  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 6) AS p90,
  ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99), 6) AS p99
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_percentiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous (interpolated) percentiles — the percentile_cont dual
    of q_percentiles_disc. Spark's exact `percentile` and DuckDB's
    quantile_cont share the (n−1)·q rank + linear-interpolation
    definition; 6-dp rounding absorbs the one interpolation multiply's
    ulp drift. Same scale posture as disc: bounded groups collect, at
    fact scale switch to approx_percentile."""
    orders = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("double")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile(p, F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile(p, F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile(p, F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q_string_agg",
    oracle="""
SELECT n_name,
  string_agg(c_name, ',' ORDER BY c_name) AS members,
  COUNT(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > 9000
GROUP BY n_name
ORDER BY n_name
""",
)
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): expressed as
    sort_array(collect_list) + concat-join so element order is
    deterministic — an unordered listagg is partition-order-dependent
    and can never hash-match across engines (or across its own runs)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("members"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct counting with SET OPERATIONS (union AND
# intersection estimates) — the capability HLL registers cannot express.
# ---------------------------------------------------------------------------


def _kmv_oracle() -> str:
    from flink_template_spark.operators.sketches_portable import (
        KMV_K,
        KMV_NUM,
        KMV_RANGE,
        kmv_estimate_sql,
        kmv_sketch_sql,
    )

    k = KMV_K
    return f"""
WITH sk AS MATERIALIZED ({kmv_sketch_sql('events', ['event_type'], 'user_id')}),
stats AS MATERIALIZED ({kmv_estimate_sql('sk', ['event_type'])}),
pairs AS MATERIALIZED (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.est AS users_a_est, b.est AS users_b_est,
         LEAST(a.theta, b.theta) AS theta_ab
  FROM stats a JOIN stats b ON a.event_type < b.event_type
),
u AS (
  SELECT p.type_a, p.type_b, s.h
  FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3
),
uk AS (
  SELECT type_a, type_b, COUNT(*) AS n_u,
         MAX(CASE WHEN rn = {k} THEN h END) AS hk
  FROM (
    SELECT type_a, type_b, h,
           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
    FROM u
  ) GROUP BY 1, 2
),
inter AS (
  SELECT sa.event_type AS type_a, sb.event_type AS type_b, COUNT(*) AS cnt
  FROM sk sa
  JOIN sk sb ON sa.h = sb.h AND sa.event_type < sb.event_type
  JOIN pairs p ON p.type_a = sa.event_type AND p.type_b = sb.event_type
  WHERE sa.h < p.theta_ab
  GROUP BY 1, 2
),
du AS MATERIALIZED (
  SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
),
ex AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS exact_intersect
  FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.users_a_est, p.users_b_est,
  CASE WHEN uk.n_u < {k} THEN CAST(uk.n_u AS DOUBLE)
       ELSE {KMV_NUM!r} / CAST(uk.hk AS DOUBLE) END AS union_est,
  CAST(COALESCE(i.cnt, 0) * {KMV_RANGE} AS DOUBLE) / CAST(p.theta_ab AS DOUBLE)
    AS intersect_est,
  CAST(COALESCE(ex.exact_intersect, 0) AS BIGINT) AS exact_intersect
FROM pairs p
JOIN uk ON uk.type_a = p.type_a AND uk.type_b = p.type_b
LEFT JOIN inter i ON i.type_a = p.type_a AND i.type_b = p.type_b
LEFT JOIN ex ON ex.type_a = p.type_a AND ex.type_b = p.type_b
ORDER BY p.type_a, p.type_b
"""


@register("q_kmv_set_ops", oracle=_kmv_oracle())
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix from KMV/theta sketches
    (operators.sketches_portable.kmv_*): per-event-type distinct-user
    sketches, then for every type pair the estimated distinct users of
    each side, of the UNION (merge k smallest, re-estimate), and of the
    INTERSECTION (common retained hashes below min theta) — the set
    algebra HLL cannot do, with the exact intersection riding along so
    the sketch error is visible in verified output. Every estimate is
    one exact-operand IEEE division (zero rounding), so the DuckDB
    oracle matches bit-for-bit. At 100 TB the one full-data shuffle is
    the distinct over (type, hash); everything after runs on ≤ k-row
    sketches per type."""
    from flink_template_spark.operators.sketches_portable import (
        KMV_K,
        KMV_RANGE,
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    k = KMV_K
    events = load_table(spark, sf_dir, "events")
    # localCheckpoint: the sketch (≤ k rows per type) feeds four
    # consumers (stats, both union sides, intersection); same GC-scoped
    # trade as the decontamination shingle table (plans.safety).
    sk = kmv_sketch(events, ["event_type"], "user_id").localCheckpoint()
    stats = kmv_estimate(sk, ["event_type"])
    a = stats.select(
        F.col("event_type").alias("type_a"),
        F.col("est").alias("users_a_est"),
        F.col("theta").alias("__ta"),
    )
    b = stats.select(
        F.col("event_type").alias("type_b"),
        F.col("est").alias("users_b_est"),
        F.col("theta").alias("__tb"),
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "users_a_est",
            "users_b_est",
            F.least("__ta", "__tb").alias("theta_ab"),
        )
    )
    pkeys = ["type_a", "type_b"]
    # union sketch per pair: tag each side's rows with the pair key,
    # then kmv_merge re-selects the k smallest of the merged sets
    ua = pairs.select(*pkeys).join(
        sk.select(F.col("event_type").alias("type_a"), "h"), "type_a"
    )
    ub = pairs.select(*pkeys).join(
        sk.select(F.col("event_type").alias("type_b"), "h"), "type_b"
    )
    usk = kmv_merge(ua.select(*pkeys, "h").unionAll(ub.select(*pkeys, "h")), pkeys)
    # the merged sketch holds <= k rows per pair, so its k-th smallest
    # IS its max — the shared estimator applies unchanged (no inline
    # re-derivation to drift from the per-side estimates)
    u_est = kmv_estimate(usk, pkeys).select(
        *pkeys, F.col("est").alias("union_est")
    )
    inter = (
        sk.select(F.col("event_type").alias("type_a"), "h")
        .join(sk.select(F.col("event_type").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .join(pairs.select(*pkeys, "theta_ab"), pkeys)
        .filter(F.col("h") < F.col("theta_ab"))
        .groupBy(*pkeys)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    du = (
        events.filter(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
    )
    ex = (
        du.select(F.col("event_type").alias("type_a"), "user_id")
        .join(du.select(F.col("event_type").alias("type_b"), "user_id"), "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy(*pkeys)
        .agg(F.count(F.lit(1)).alias("exact_intersect"))
    )
    return (
        pairs.join(u_est, pkeys)
        .join(inter, pkeys, "left")
        .join(ex, pkeys, "left")
        .select(
            *pkeys,
            "users_a_est",
            "users_b_est",
            "union_est",
            (
                (F.coalesce(F.col("cnt"), F.lit(0)) * F.lit(KMV_RANGE)).cast(
                    "double"
                )
                / F.col("theta_ab").cast("double")
            ).alias("intersect_est"),
            F.coalesce(F.col("exact_intersect"), F.lit(0))
            .cast("bigint")
            .alias("exact_intersect"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# ANALYZE-style one-pass column statistics (NDV via KMV)
# ---------------------------------------------------------------------------

_STATS_COLS = [
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_returnflag",
    "l_linestatus",
]


def _table_stats_oracle() -> str:
    from flink_template_spark.operators.sketches_portable import (
        kmv_estimate_sql,
        kmv_sketch_sql,
    )

    branches = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS col, CAST({c} AS VARCHAR) AS val FROM lineitem"
        for c in _STATS_COLS
    )
    return f"""
WITH stacked AS MATERIALIZED (
{branches}
),
sk AS MATERIALIZED ({kmv_sketch_sql('stacked', ['col'], 'val')}),
est AS ({kmv_estimate_sql('sk', ['col'])}),
base AS (
  SELECT col,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(COUNT(*) - COUNT(val) AS BIGINT) AS n_nulls,
    CAST(COUNT(DISTINCT val) AS BIGINT) AS ndv_exact
  FROM stacked GROUP BY col
)
SELECT b.col AS col_name, b.n_rows, b.n_nulls,
  COALESCE(e.est, 0.0) AS ndv_est, b.ndv_exact
FROM base b LEFT JOIN est e ON b.col = e.col
ORDER BY b.col
"""


@register("q_table_stats", oracle=_table_stats_oracle())
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE in one pass: per-column row/null counts and an
    NDV estimate from the portable KMV sketch (exact for
    low-cardinality columns like l_returnflag, k-minimum-values
    estimate for keys), with the exact COUNT(DISTINCT) riding along so
    the sketch error is visible in verified output — the
    cost-based-optimizer statistics sweep every lakehouse runs, as a
    first-class query. ONE scan covers every column (rows stack into
    (col, value) pairs map-side); at 100 TB the alternative — one
    COUNT(DISTINCT) job per column — re-reads the table N_cols times
    and shuffles raw values, while the stacked KMV shuffles at most
    k rows per column past the distinct. Only integer/string columns:
    float→string rendering differs across engines (the repertoire
    trap), so double columns get their stats from the typed paths."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE hash aggregation to the (col, val) grain straight off the
    # explode (guide §2.3: aggregate before you shuffle) — the map-side
    # partial agg collapses duplicate values, so the shuffle, the lazy
    # checkpoint, the md5 hashing in the KMV sketch, and the exact-NDV
    # count all operate on distinct values (~170k rows at sf0.1), not
    # the raw N×6 stacked rows (3.6M). The earlier shape checkpointed
    # the raw explode and ran a COUNT(DISTINCT) shuffle plus a full
    # md5+distinct pass over it — 20× more rows into every consumer.
    grain = (
        li.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("col"),
                            F.col(c).cast("string").alias("val"),
                        )
                        for c in _STATS_COLS
                    ]
                )
            ).alias("s")
        )
        .groupBy("s.col", "s.val")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(F.col("col"), F.col("val"), F.col("cnt"))
        .localCheckpoint(eager=False)
    )
    from flink_template_spark.operators.sketches_portable import (
        kmv_estimate,
        kmv_sketch,
    )

    # kmv_sketch starts with filter-non-null + distinct-hash, so the
    # already-distinct grain rows produce the identical sketch
    est = kmv_estimate(kmv_sketch(grain, ["col"], "val"), ["col"]).select(
        "col", F.col("est").alias("ndv_est")
    )
    # LEFT join + 0-coalesce: an all-NULL column has NO sketch rows
    # (kmv drops NULL items) but is exactly the column a stats sweep
    # must flag — n_rows=N, n_nulls=N, ndv=0, not a vanished row
    # (the cms_lookup sparse-sketch discipline)
    base = grain.groupBy("col").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_nulls"),
        F.count("val").cast("bigint").alias("ndv_exact"),
    )
    return (
        base.join(est, "col", "left")
        .select(
            F.col("col").alias("col_name"),
            "n_rows",
            "n_nulls",
            F.coalesce(F.col("ndv_est"), F.lit(0.0)).alias("ndv_est"),
            "ndv_exact",
        )
        .orderBy("col_name")
    )


_BOOT_R = 32  # bootstrap replicas (half-sample subsampling)


def _bootstrap_ci_oracle() -> str:
    from flink_template_spark.functions.hashing import md5int_duckdb

    # replica r membership = bit r of ONE 60-bit row hash (32 bits of
    # one md5, not 32 md5s — the hash is the scan's dominant cost)
    arms = []
    for r in range(_BOOT_R):
        inc = f"(h >> {r}) & 1 = 0"
        arms.append(
            f"SUM(CASE WHEN {inc} THEN cents END) AS s{r},\n"
            f"  COUNT(CASE WHEN {inc} THEN 1 END) AS n{r}"
        )
    unpivot = "\nUNION ALL ".join(
        f"SELECT o_orderpriority, {r} AS rep, s{r} AS s, n{r} AS n FROM g"
        for r in range(_BOOT_R)
    )
    h60 = md5int_duckdb("CAST(o_orderkey AS VARCHAR)", bits=60)
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority, {h60} AS h,
         CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS cents
  FROM orders
),
g AS (
  SELECT o_orderpriority,
         SUM(cents) AS s_all, COUNT(*) AS n_all,
  {",  ".join(arms)}
  FROM base GROUP BY o_orderpriority
),
reps AS ({unpivot}),
ranked AS (
  SELECT o_orderpriority, rep, s, n,
         CAST(s AS DOUBLE) / CAST(100 * n AS DOUBLE) AS m,
         ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(s AS DOUBLE) / CAST(100 * n AS DOUBLE), rep
         ) AS rk
  FROM reps WHERE n > 0
)
SELECT g.o_orderpriority,
       CAST(g.s_all AS DOUBLE) / CAST(100 * g.n_all AS DOUBLE) AS mean_price,
       lo.m AS ci_lo, hi.m AS ci_hi,
       CAST({_BOOT_R} AS BIGINT) AS n_replicas
FROM g
JOIN ranked lo ON lo.o_orderpriority = g.o_orderpriority AND lo.rk = 2
JOIN ranked hi ON hi.o_orderpriority = g.o_orderpriority
              AND hi.rk = {_BOOT_R} - 1
"""


@register("q_bootstrap_ci", oracle=_bootstrap_ci_oracle())
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bootstrap confidence intervals for the per-priority
    mean order price: 32 half-sample replicas (row r-membership = one
    portable-hash bit of (orderkey, r) — replayable in any engine or
    backfill, no RNG state), per-replica means, and a percentile CI
    from the replicas' order statistics (ranks 2 and R−1 of 32 ≈ a
    90 % interval).

    Scale shape: NO row multiplication — the 32 replicas are 64
    conditional aggregates in the ONE group-by pass (an exploded
    replica index would scan 32× the data), and all 32 memberships are
    BITS of one 60-bit row hash (one md5 per row, not 32 — the r6
    profile showed per-replica hashing dominating the scan); `stack`
    then unpivots the replica-sized result (groups × 32 rows).
    Exactness: prices quantize
    to integer cents before summing (partition-order-exact); each
    replica mean is a single correctly-rounded IEEE division of exact
    integers, and the CI uses ORDER STATISTICS of those means —
    never a float variance, whose summation order would drift across
    engines. Replicas with no rows are filtered identically on both
    sides before ranking (guards the 0/0 ANSI abort; unreachable at
    real group sizes)."""
    from flink_template_spark.functions.hashing import md5int_spark

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint")
    h60 = md5int_spark("CAST(o_orderkey AS STRING)", bits=60)
    base = orders.select(
        "o_orderpriority", F.expr(h60).alias("h"), cents.alias("cents")
    )
    aggs = [
        F.sum("cents").alias("s_all"),
        F.count(F.lit(1)).alias("n_all"),
    ]
    for r in range(_BOOT_R):
        inc = F.expr(f"(h >> {r}) & 1 = 0")
        aggs.append(F.sum(F.when(inc, F.col("cents"))).alias(f"s{r}"))
        aggs.append(F.count(F.when(inc, 1)).alias(f"n{r}"))
    g = base.groupBy("o_orderpriority").agg(*aggs)
    stack_args = ", ".join(f"{r}, s{r}, n{r}" for r in range(_BOOT_R))
    reps = g.select(
        "o_orderpriority",
        "s_all",
        "n_all",
        F.expr(f"stack({_BOOT_R}, {stack_args}) AS (rep, s, n)"),
    ).filter(F.col("n") > 0)
    m = F.col("s").cast("double") / (F.lit(100) * F.col("n")).cast("double")
    wr = W.partitionBy("o_orderpriority").orderBy(m.asc(), "rep")
    ranked = reps.select(
        "o_orderpriority", "s_all", "n_all", m.alias("m"),
        F.row_number().over(wr).alias("rk"),
    )
    lo = ranked.filter(F.col("rk") == 2).select(
        "o_orderpriority", "s_all", "n_all", F.col("m").alias("ci_lo")
    )
    hi = ranked.filter(F.col("rk") == _BOOT_R - 1).select(
        "o_orderpriority", F.col("m").alias("ci_hi")
    )
    return lo.join(hi, "o_orderpriority").select(
        "o_orderpriority",
        (
            F.col("s_all").cast("double")
            / (F.lit(100) * F.col("n_all")).cast("double")
        ).alias("mean_price"),
        "ci_lo",
        "ci_hi",
        F.lit(_BOOT_R).cast("bigint").alias("n_replicas"),
    )


# Null-safe injective row serialization: each field is 'v' || value
# or the bare 'n' sentinel when NULL (no collision: values always get
# the 'v' prefix), so rows differing only in NULL fields hash — and
# therefore fingerprint — differently. Field boundaries stay
# unambiguous for ANY content: doc_id/n_chars are numeric (can never
# contain the '|' separator), text is the LAST field (everything after
# the final separator), and lang — the one free-text interior field —
# is LENGTH-PREFIXED ('v<len>:<lang>'), so a '|' inside lang cannot
# shift a boundary (ADVICE r6: without the prefix, lang='en|v7' with
# n_chars=8 and lang='en' with text='8|…' serialized identically;
# pinned by test_fp_serial_injective_on_pipe_bearing_lang).
def _fp_serial(cast_kw: str) -> str:
    parts = [
        f"COALESCE('v' || CAST(doc_id AS {cast_kw}), 'n')",
        f"COALESCE('v' || CAST(length(lang) AS {cast_kw}) || ':' || lang, 'n')",
        f"COALESCE('v' || CAST(n_chars AS {cast_kw}), 'n')",
        "COALESCE('v' || text, 'n')",
    ]
    return " || '|' || ".join(parts)


@register(
    "q_content_fingerprint",
    oracle=f"""
WITH hx AS (
  SELECT source, md5({_fp_serial("VARCHAR")}) AS hx FROM documents
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(BIT_XOR(CAST('0x' || substr(hx, 1, 15) AS BIGINT)) AS BIGINT)
    AS xor_fp,
  CAST(SUM(CAST('0x' || substr(hx, 1, 8) AS BIGINT)) AS BIGINT) AS sum_fp
FROM hx
GROUP BY source
ORDER BY source
""",
)
def q_content_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free content fingerprints per source: XOR and SUM of
    portable per-row hashes over the canonical row serialization —
    the cheap end-to-end integrity check a 100 TB migration/replication
    runs on BOTH sides (this engine and whatever produced or consumed
    the data) to prove the row MULTISETS match without moving rows.
    XOR alone is blind to duplicated-row PAIRS (x XOR x = 0), so a
    32-bit SUM rider (bigint-overflow-safe to ~2e9 rows per group) and
    the exact count travel with it; a mismatch in any of the three
    localizes corruption to the source partition.

    Scale shape: pure map-side hash + commutative aggregates with
    partial combine — no shuffle wider than |sources|, no sort, no
    collect; XOR/SUM/count all merge, so per-file fingerprints roll up
    to table fingerprints for free."""
    docs = load_table(spark, sf_dir, "documents")
    # ONE md5 per row: both fingerprints slice prefixes of the same
    # projected digest (two md5int calls would hash every row twice —
    # hashing is this operator's dominant cost; r6 review, second pass)
    hexed = docs.select(
        "source", F.md5(F.expr(_fp_serial("STRING"))).alias("hx")
    )
    return (
        hexed.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr(
                "BIT_XOR(CAST(conv(substr(hx, 1, 15), 16, 10) AS BIGINT))"
            )
            .cast("bigint")
            .alias("xor_fp"),
            F.sum(
                F.expr("CAST(conv(substr(hx, 1, 8), 16, 10) AS BIGINT)")
            )
            .cast("bigint")
            .alias("sum_fp"),
        )
        .orderBy("source")
    )


# Candidate functional dependencies for the profiling audit: a mix of
# true keys (must hold), plausible-but-false dependencies (must report
# their violation mass), and a cross-column pair on documents.
_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_orderstatus"),  # key: holds
    ("orders", "o_custkey", "o_orderpriority"),  # false: customers vary
    ("lineitem", "l_orderkey", "l_returnflag"),  # false: per-line flags
    ("customer", "c_custkey", "c_mktsegment"),  # key: holds
    ("documents", "source", "lang"),  # schema question: is a feed monolingual?
]


def _fd_oracle() -> str:
    blocks = []
    for table, det, dep in _FD_CANDIDATES:
        blocks.append(f"""
  SELECT '{table}' AS table_name, '{det}' AS determinant,
         '{dep}' AS dependent,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_keys,
         CAST(MAX(ndep) AS BIGINT) AS max_dependents,
         SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
  FROM (
    SELECT {det}, COUNT(DISTINCT {dep}) AS ndep FROM {table} GROUP BY {det}
  )""")
    union = "\n  UNION ALL\n".join(blocks)
    return f"""
SELECT * FROM (
{union}
)
ORDER BY table_name, determinant, dependent
"""


@register("q_fd_audit", oracle=_fd_oracle())
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: for each candidate A → B, how
    many A-keys map to more than one distinct B (0 violating keys =
    the dependency HOLDS) plus the worst per-key fan-out — the
    schema-discovery primitive behind normalization advice, pipeline
    assertions ("every source is monolingual?"), and join-safety
    checks (a violated FD on the intended lookup key means a lookup
    join duplicates rows). Candidates mix true keys, plausible-but-
    false dependencies, and a real schema question on documents.

    Scale shape: each candidate is one hash aggregation with a
    count_distinct partial (per-key dependent cardinality) followed by
    a 1-row rollup — never a join, never a sort; candidates union into
    one plan and scan only their 2 columns."""
    out = None
    for table, det, dep in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        per_key = t.groupBy(det).agg(F.count_distinct(dep).alias("ndep"))
        violating = F.col("ndep") > 1
        one = per_key.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(violating, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating_keys"),
            F.max("ndep").cast("bigint").alias("max_dependents"),
            (F.sum(F.when(violating, 1).otherwise(0)) == 0).alias("fd_holds"),
        ).select(
            F.lit(table).alias("table_name"),
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            "n_keys",
            "n_violating_keys",
            "max_dependents",
            "fd_holds",
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("table_name", "determinant", "dependent")


# Declarative data-quality expectations: (name, SQL predicate over
# `documents`, max tolerated failure fraction). One literal list drives
# BOTH engines, so the suite definition cannot drift between them.
_EXPECTATIONS = [
    ("doc_id_not_null", "doc_id IS NOT NULL", 0.0),
    ("doc_id_nonnegative", "doc_id >= 0", 0.0),
    ("lang_known", "lang IN ('en','de','fr','es','ja')", 0.0),
    ("n_chars_matches_text", "n_chars = length(text)", 0.0),
    ("text_nonempty", "length(text) > 0", 0.001),
    ("n_chars_sane_upper", "n_chars < 100000", 0.0),
]


def _expectations_oracle() -> str:
    aggs = []
    for name, pred, tol in _EXPECTATIONS:
        aggs.append(
            f"SELECT '{name}' AS check_name,"
            f" CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT) AS n_fail,"
            f" ROUND(CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS DOUBLE)"
            f" / CAST(COUNT(*) AS DOUBLE), 6) AS frac_fail,"
            f" CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS DOUBLE)"
            f" <= {tol} * CAST(COUNT(*) AS DOUBLE) AS passed"
            f" FROM documents"
        )
    union = "\nUNION ALL\n".join(aggs)
    return f"SELECT * FROM (\n{union}\n) ORDER BY check_name"


@register("q_data_expectations", oracle=_expectations_oracle())
def q_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite (the Great-Expectations-style
    ingest gate): every check in _EXPECTATIONS evaluates as a
    CONDITIONAL AGGREGATE over ONE corpus scan — never one job per
    check (the naive N-pass suite reads 100 TB N times; this reads it
    once). Output per check: rows seen, failures, failure fraction,
    and pass/fail against the check's tolerated fraction — the row a
    pipeline's circuit-breaker consumes before promoting a snapshot.

    Implementation: the predicate strings are shared verbatim with the
    oracle; Spark evaluates them all in one hash-agg pass over the
    scan, then a single ``stack`` unpivot turns the 1-row aggregate
    into one row per check — ONE consumer of the agg subtree, so the
    plan carries exactly one corpus scan (a per-check select loop
    re-expanded the aggregate 6× — the multi-consumer double-scan trap
    the r6 audit fixed elsewhere; plan-pinned by
    test_data_expectations_single_scan)."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for name, pred, _tol in _EXPECTATIONS:
        aggs.append(
            F.sum(F.when(F.expr(pred), 0).otherwise(1))
            .cast("bigint")
            .alias(f"fail__{name}")
        )
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', fail__{name}, CAST({tol} AS DOUBLE)"
        for name, _pred, tol in _EXPECTATIONS
    )
    n_fail = F.col("n_fail")
    return (
        one.select(
            "n_rows",
            F.expr(
                f"stack({len(_EXPECTATIONS)}, {stack_args})"
                " AS (check_name, n_fail, tol)"
            ),
        )
        .select(
            "check_name",
            "n_rows",
            n_fail.alias("n_fail"),
            F.round(
                n_fail.cast("double") / F.col("n_rows").cast("double"), 6
            ).alias("frac_fail"),
            (
                n_fail.cast("double")
                <= F.col("tol") * F.col("n_rows").cast("double")
            ).alias("passed"),
        )
        .orderBy("check_name")
    )


def _snapshot_diff_oracle() -> str:
    fp = _fp_serial("VARCHAR")
    return f"""
WITH new_snap AS (
  SELECT source, doc_id, md5({fp}) AS h FROM documents WHERE doc_id % 17 <> 0
),
old_snap AS (
  SELECT source, doc_id, md5({fp}) AS h FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0 THEN substr(text, 1, 10) ELSE text END
             AS text,
           lang, source,
           CASE WHEN doc_id % 11 = 0 THEN length(substr(text, 1, 10))
                ELSE n_chars END AS n_chars
    FROM documents
  ) WHERE doc_id % 13 <> 0
),
joined AS (
  SELECT COALESCE(n.source, o.source) AS source,
    CASE WHEN o.doc_id IS NULL THEN 'added'
         WHEN n.doc_id IS NULL THEN 'removed'
         WHEN n.h <> o.h THEN 'changed'
         ELSE 'unchanged' END AS status
  FROM new_snap n FULL OUTER JOIN old_snap o ON n.doc_id = o.doc_id
)
SELECT source,
  CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
  CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
  CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
  CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unchanged
FROM joined GROUP BY source ORDER BY source
"""


@register("q_snapshot_diff", oracle=_snapshot_diff_oracle())
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff by row fingerprint: classify every doc_id as
    added / removed / changed / unchanged between two corpus versions
    and roll the counts up per source — the migration/replication diff
    a 100 TB promotion runs when q_content_fingerprint's table-level
    XOR/SUM says "something differs" and you need to know WHAT. Rows
    compare by the injective _fp_serial hash (the length-prefixed
    serialization the integrity fingerprints use), so a change in ANY
    field — including NULL transitions and '|'-bearing text — counts
    as changed.

    The "old" snapshot is derived deterministically from the same
    table (drop doc_id%13==0, truncate text for doc_id%11==0; the new
    side drops doc_id%17==0) so both engines diff identical inputs;
    with real snapshots the two sides are just two parquet roots.

    Scale shape: one full-outer equi-join on the id carrying only
    (id, source, 32-hex hash) — never the payload; counts roll up with
    partial combine. At 100 TB both sides prune to (id, hash) columns
    and the join co-partitions on the id."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.expr(_fp_serial("STRING")))
    new_snap = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select("source", "doc_id", fp.alias("h"))
    )
    old_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0, F.substring("text", 1, 10)
        ).otherwise(F.col("text")).alias("text"),
        "lang",
        "source",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.length(F.substring("text", 1, 10)).cast("long"),
        ).otherwise(F.col("n_chars")).alias("n_chars"),
    )
    old_snap = (
        old_docs.filter(F.col("doc_id") % 13 != 0)
        .select("source", "doc_id", fp.alias("h"))
    )
    n = new_snap.alias("n")
    o = old_snap.alias("o")
    joined = n.join(o, F.col("n.doc_id") == F.col("o.doc_id"), "full_outer").select(
        F.coalesce(F.col("n.source"), F.col("o.source")).alias("source"),
        F.when(F.col("o.doc_id").isNull(), "added")
        .when(F.col("n.doc_id").isNull(), "removed")
        .when(F.col("n.h") != F.col("o.h"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        joined.groupBy("source")
        .agg(
            F.sum(F.when(F.col("status") == "added", 1).otherwise(0))
            .cast("bigint")
            .alias("n_added"),
            F.sum(F.when(F.col("status") == "removed", 1).otherwise(0))
            .cast("bigint")
            .alias("n_removed"),
            F.sum(F.when(F.col("status") == "changed", 1).otherwise(0))
            .cast("bigint")
            .alias("n_changed"),
            F.sum(F.when(F.col("status") == "unchanged", 1).otherwise(0))
            .cast("bigint")
            .alias("n_unchanged"),
        )
        .orderBy("source")
    )


# Benford first-digit reference probabilities log10(1 + 1/d), embedded
# as shared 12-dp decimal literals so BOTH engines compare against the
# identical constants (no runtime log10 — the transcendental-free
# discipline).
_BENFORD_P = {
    1: "0.301029995664", 2: "0.176091259056", 3: "0.124938736608",
    4: "0.096910013008", 5: "0.079181246048", 6: "0.066946789631",
    7: "0.057991946978", 8: "0.051152522447", 9: "0.045757490561",
}


def _benford_oracle() -> str:
    p_case = " ".join(
        f"WHEN {d} THEN {p}" for d, p in _BENFORD_P.items()
    )
    return f"""
WITH digits AS (
  -- floor() before the cast: DuckDB's double->bigint cast ROUNDS while
  -- Spark's truncates (floor == truncate for the positive amounts in
  -- scope); without it 0.30*100 = 29.999... yields digit 2 vs 3
  SELECT o_orderpriority AS grp,
    CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                1, 1) AS BIGINT) AS d
  FROM orders WHERE o_totalprice > 0
),
counts AS (
  SELECT grp, d, COUNT(*) AS c FROM digits GROUP BY grp, d
),
tot AS (SELECT grp, SUM(c) AS n FROM counts GROUP BY grp),
-- full 9-digit spine per group: a digit with ZERO observations is the
-- strongest Benford violation and must still get a row
spine AS (
  SELECT t.grp, s.d, t.n FROM tot t,
       (SELECT unnest(range(1, 10)) AS d) s
)
SELECT sp.grp AS o_orderpriority, CAST(sp.d AS BIGINT) AS digit,
  CAST(COALESCE(c.c, 0) AS BIGINT) AS n_obs,
  ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(sp.n AS DOUBLE), 6) AS freq_obs,
  CAST(CASE sp.d {p_case} END AS DOUBLE) AS freq_benford,
  ROUND(abs(CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(sp.n AS DOUBLE)
            - CASE sp.d {p_case} END), 6) AS abs_dev
FROM spine sp LEFT JOIN counts c ON sp.grp = c.grp AND sp.d = c.d
ORDER BY o_orderpriority, digit
"""


@register("q_benford_audit", oracle=_benford_oracle())
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order amounts per priority class:
    observed leading-digit frequencies against the Benford reference —
    the classic fabricated/synthetic-number detector (organic
    multiplicative amounts follow log10(1+1/d); padded, capped, or
    generated values don't, and the per-digit absolute deviations say
    WHICH digits betray it). On this synthetic corpus the deviations
    are themselves the fingerprint of the uniform generator — exactly
    what the audit exists to expose.

    First digits are extracted in INTEGER space (floor(amount × 100)
    as bigint → first character of its decimal rendering) so both
    engines agree for any magnitude — no float log10, no locale
    formatting, and the explicit floor keeps DuckDB's rounding
    double→bigint cast in lockstep with Spark's truncating one. The
    report carries a FULL 9-digit spine per group: a digit with zero
    observations is the strongest violation (abs_dev = its whole
    reference mass) and must not vanish from the audit (r7 review).
    The Benford reference enters as shared 12-dp literals.

    Scale shape: one map-side digit extraction + (group, digit) count
    with partial combine; everything after runs on |groups|×9 rows."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        1,
        1,
    ).cast("bigint")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .groupBy(F.col("o_orderpriority"), digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = counts.groupBy("o_orderpriority").agg(F.sum("c").alias("n"))
    spine = tot.crossJoin(
        F.broadcast(
            orders.sparkSession.createDataFrame(
                [(d,) for d in range(1, 10)], "digit bigint"
            )
        )
    )
    p_map = F.create_map(
        *[x for d, p in _BENFORD_P.items() for x in (F.lit(d), F.expr(p))]
    )
    c = F.coalesce(F.col("c"), F.lit(0))
    freq = c.cast("double") / F.col("n").cast("double")
    bref = p_map[F.col("digit")].cast("double")
    return (
        spine.join(counts, ["o_orderpriority", "digit"], "left")
        .select(
            "o_orderpriority",
            "digit",
            c.cast("bigint").alias("n_obs"),
            F.round(freq, 6).alias("freq_obs"),
            bref.alias("freq_benford"),
            F.round(F.abs(freq - bref), 6).alias("abs_dev"),
        )
        .orderBy("o_orderpriority", "digit")
    )


@register(
    "q_referential_integrity_audit",
    oracle="""
SELECT * FROM (
  SELECT 'lineitem.l_orderkey->orders' AS fk,
    CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_orphans
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
  UNION ALL
  SELECT 'orders.o_custkey->customer',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'supplier.s_nationkey->nation',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
  UNION ALL
  SELECT 'nation.n_regionkey->region',
    CAST(COUNT(*) AS BIGINT),
    CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
)
ORDER BY fk
""",
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit across the whole star schema: for
    every declared FK edge, the row count and the number of orphans
    (child rows whose parent is missing) — the data-quality gate a
    lakehouse ingest runs beside q_fd_audit (functional deps) and
    q_data_expectations (column contracts). All zeros on intact data;
    the oracle's LEFT-JOIN recount keeps the audit itself honest.

    Scale shape: each edge is ONE left join + count — the bounded
    dims (nation, region) broadcast; the five fact-scale edges
    (lineitem×3, orders, customer… any parent that grows with SF)
    shuffle on their keys like any fact join. The seven per-edge
    scalar rows union into one 7-row result; at 100 TB the edges run
    independently (no cross-edge shuffle)."""
    fks = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    # broadcast ONLY the genuinely bounded dims: nation/region are
    # fixed-size at any SF, while part/supplier/customer grow linearly
    # with the corpus — broadcasting those would OOM executors at the
    # scale this audit is written for (r9 review: the docstring's
    # "fact-scale edges shuffle" claim must describe the actual plan)
    small = {"nation", "region"}
    out = None
    for child, ck, parent, pk in fks:
        c = load_table(spark, sf_dir, child).select(ck)
        # no parent-side distinct: PKs are unique by contract, and if a
        # parent ever held duplicate keys the oracle's plain LEFT JOIN
        # multiplies child rows — the audit must see the same blowup,
        # not hide it behind a dedup shuffle (r9 review)
        p = load_table(spark, sf_dir, parent).select(pk)
        if parent in small:
            p = F.broadcast(p)
        row = (
            c.join(p, c[ck] == p[pk], "left")
            .agg(
                F.lit(f"{child}.{ck}->{parent}").alias("fk"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(F.col(pk).isNull().cast("int"))
                .cast("bigint")
                .alias("n_orphans"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk")
