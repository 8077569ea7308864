"""Event-time operators over the ``events`` table (batch expressions of
the streaming surface: SURVEY.md §2.3/§2.7).

- tumbling / sliding / session windows (the batch duals of the
  Structured Streaming versions in ``streaming/``);
- as-of join (sort-merge union trick, ``operators.asof``);
- keyed dedup-keep-first (the deterministic dual of ``dropDuplicates``);
- exact-decimal variance (deterministic cross-engine moments).

Scale notes: every query here is a single hash-shuffle on its grouping
keys; session windows use Spark's native ``session_window`` aggregation
(state-merge based, no per-row UDF); the as-of join is one shuffle +
window, no range explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_template_spark.operators.asof import asof_join
from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


@register(
    "q_events_tumbling_daily",
    oracle="""
SELECT
  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY AS TIMESTAMP)
    AS window_end,
  event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
)
def q_events_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_events_sliding_2d_1d",
    oracle="""
WITH exploded AS (
  SELECT
    unnest([
      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP),
      CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) - INTERVAL 1 DAY AS TIMESTAMP)
    ]) AS window_start,
    value
  FROM events
)
SELECT
  window_start,
  window_start + INTERVAL 2 DAY AS window_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM exploded
GROUP BY 1, 2
""",
)
def q_events_sliding_2d_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_events_session_30m",
    oracle="""
WITH ordered AS (
  SELECT
    user_id,
    CAST(ts AS TIMESTAMP) AS ts,
    value,
    CASE WHEN CAST(ts AS TIMESTAMP)
            - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
          >= INTERVAL 30 MINUTE  -- session_window is [start, last+gap): an exact-gap event starts a NEW session (r9 review)
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT *,
    SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM ordered
)
SELECT
  user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def q_events_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_asof_latest_order_per_event",
    oracle="""
WITH order_snap AS (
  SELECT
    o_custkey,
    o_orderdate,
    arg_max(o_orderkey, o_orderkey) AS o_orderkey,
    CAST(arg_max(o_totalprice, o_orderkey) AS DOUBLE) AS o_totalprice
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT
  e.event_id,
  e.user_id,
  CAST(e.ts AS TIMESTAMP) AS ts,
  s.o_orderkey AS last_orderkey,
  s.o_totalprice AS last_totalprice
FROM events e
ASOF LEFT JOIN order_snap s
  ON e.user_id = s.o_custkey AND CAST(e.ts AS TIMESTAMP) >= s.o_orderdate
""",
)
def q_asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_orderkey", "o_orderkey").alias("last_orderkey"),
            F.max_by("o_totalprice", "o_orderkey")
            .cast("double")
            .alias("last_totalprice"),
        )
        .withColumnRenamed("o_custkey", "user_id")
    )
    return asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["last_orderkey", "last_totalprice"],
    )


@register(
    "q_dedup_events_keep_first",
    oracle="""
SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
       CAST(value AS DOUBLE) AS value
FROM (
  SELECT *,
    ROW_NUMBER() OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id
    ) AS rk
  FROM events
)
WHERE rk = 1
""",
)
def q_dedup_events_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.col("value").cast("double").alias("value"),
        )
    )


@register(
    "q_events_exact_moments",
    oracle="""
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_v,
  CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE)
    AS sum_sq,
  (CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE)
   - CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
     * CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
  / NULLIF(COUNT(*) - 1, 0) AS variance
FROM events
GROUP BY event_type
""",
)
def q_events_exact_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic variance: exact decimal Σx and Σx² then double math —
    identical across engines regardless of partition merge order (a plain
    ``stddev`` is order-sensitive in the last ulp)."""
    events = load_table(spark, sf_dir, "events")
    v = _dec("value")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).cast("double").alias("sum_v"),
        F.sum(v * v).cast("double").alias("sum_sq"),
    )
    return agg.select(
        "event_type",
        "n",
        "sum_v",
        "sum_sq",
        # NULL (not an ANSI abort, not inf) for single-row groups, the
        # var_samp convention — NULLIF mirrors the oracle exactly
        (
            (F.col("sum_sq") - F.col("sum_v") * F.col("sum_v") / F.col("n"))
            / F.nullif((F.col("n") - 1).cast("bigint"), F.lit(0).cast("bigint"))
        ).alias("variance"),
    )


@register(
    "q_funnel_view_click_purchase",
    oracle="""
WITH firsts AS (
  SELECT
    user_id,
    MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END) AS t_view,
    MIN(CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT
  COUNT(*) FILTER (t_view IS NOT NULL) AS n_view,
  COUNT(*) FILTER (t_view IS NOT NULL AND t_click > t_view) AS n_view_click,
  COUNT(*) FILTER (t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click) AS n_full_funnel
FROM firsts
""",
)
def q_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase on first occurrences):
    one shuffle (by user), conditional-min aggregation, then a 1-row
    conditional count — the standard event-analytics funnel at any
    scale."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return firsts.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(
            F.when(
                F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1
            )
        ).alias("n_view_click"),
        F.count(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "q_retention_cohorts",
    oracle="""
WITH base AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
cohorted AS (
  SELECT
    user_id,
    date_trunc('week', MIN(ts) OVER (PARTITION BY user_id)) AS cohort_week,
    date_trunc('week', ts) AS active_week
  FROM base
)
SELECT
  cohort_week,
  CAST(date_diff('week', cohort_week, active_week) AS BIGINT) AS weeks_since,
  COUNT(DISTINCT user_id) AS n_active
FROM cohorted
GROUP BY cohort_week, weeks_since
ORDER BY cohort_week, weeks_since
""",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: cohort = week of first activity;
    count distinct actives per (cohort, weeks-since). Window min per
    user + two-key distinct agg — no self-join."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = W.partitionBy("user_id")
    cohorted = ev.select(
        "user_id",
        # cast to date: Spark's date_trunc returns timestamp, DuckDB's
        # returns date
        F.date_trunc("week", F.min("ts").over(w)).cast("date").alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).cast("date").alias("active_week"),
    )
    weeks_since = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    return (
        cohorted.groupBy("cohort_week", weeks_since.alias("weeks_since"))
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


@register(
    "q_interval_join_attribution",
    oracle="""
SELECT
  p.event_id AS purchase_id,
  p.user_id,
  COUNT(v.event_id) AS n_views_1h
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
 AND CAST(v.ts AS TIMESTAMP) < CAST(p.ts AS TIMESTAMP)
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
""",
)
def q_interval_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch interval join (attribution window): per purchase, count the
    same user's views in the preceding hour. The user_id equi-key keeps
    this a hash/sort-merge join with the time range as a post-join
    filter — never a cross product; at scale both sides partition on
    user_id and the join is bucket-co-locatable. (The streaming dual is
    the stream-stream interval join in streaming.windows.)"""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("v_id"),
        F.col("ts").alias("v_ts"),
    )
    joined = p.join(
        v,
        (p.user_id == v.v_user)
        & (v.v_ts >= p.p_ts - F.expr("INTERVAL 1 HOUR"))
        & (v.v_ts < p.p_ts),
        "left",
    )
    return joined.groupBy("purchase_id", "user_id").agg(
        F.count("v_id").alias("n_views_1h")
    )


@register(
    "q_asof_next_order_per_event",
    oracle="""
WITH order_snap AS (
  SELECT
    o_custkey,
    o_orderdate,
    arg_max(o_orderkey, o_orderkey) AS o_orderkey,
    CAST(arg_max(o_totalprice, o_orderkey) AS DOUBLE) AS o_totalprice
  FROM orders
  GROUP BY o_custkey, o_orderdate
),
nxt AS (
  SELECT
    e.event_id,
    arg_min(s.o_orderkey, s.o_orderdate) AS next_orderkey,
    arg_min(s.o_totalprice, s.o_orderdate) AS next_totalprice
  FROM events e
  JOIN order_snap s
    ON e.user_id = s.o_custkey AND s.o_orderdate >= CAST(e.ts AS TIMESTAMP)
  GROUP BY e.event_id
)
SELECT
  e.event_id,
  e.user_id,
  CAST(e.ts AS TIMESTAMP) AS ts,
  n.next_orderkey,
  n.next_totalprice
FROM events e LEFT JOIN nxt n ON e.event_id = n.event_id
""",
)
def q_asof_next_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event + the customer's NEXT order at or after
    it (lead-time attribution). The oracle is the quadratic
    join+argmin; the engine's plan is the same one-shuffle sort-merge
    as backward as-of with the carry direction flipped."""
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_orderkey", "o_orderkey").alias("next_orderkey"),
            F.max_by("o_totalprice", "o_orderkey")
            .cast("double")
            .alias("next_totalprice"),
        )
        .withColumnRenamed("o_custkey", "user_id")
    )
    return asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["next_orderkey", "next_totalprice"],
        direction="forward",
    )


@register(
    "q_event_transitions",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, event_id,
    LEAD(event_type) OVER (
      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
    ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM ordered
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY from_type, to_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (first-order journey analysis):
    per-user LEAD over event time, then a pair-count aggregation — one
    shuffle on user_id for the window, one partial-agg'd shuffle for
    the counts, with (ts, event_id) as a total order so ties are
    deterministic across engines."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


@register(
    "q_gapfill_interpolate",
    oracle="""
WITH hourly AS (
  SELECT event_type,
    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(h) AS lo, max(h) AS hi FROM hourly
), spine AS (
  SELECT t.event_type, s.h
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
  ) s
), joined AS (
  SELECT spine.event_type, spine.h,
    CAST(epoch(spine.h) / 3600 AS BIGINT) AS x, hourly.v
  FROM spine LEFT JOIN hourly
    ON spine.event_type = hourly.event_type AND spine.h = hourly.h
), ctx AS (
  SELECT event_type, h, x, v,
    last_value(v IGNORE NULLS) OVER w_prev AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER w_prev AS px,
    first_value(v IGNORE NULLS) OVER w_next AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS) OVER w_next AS nx
  FROM joined
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY x
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h AS bucket,
  ROUND(CASE
    WHEN v IS NOT NULL THEN v
    WHEN pv IS NULL THEN nv
    WHEN nv IS NULL THEN pv
    ELSE pv + (nv - pv) * (CAST(x - px AS DOUBLE) / CAST(nx - px AS DOUBLE))
  END, 6) AS value_filled,
  (v IS NULL) AS interpolated
FROM ctx
""",
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with LINEAR interpolation (the
    timeseries-DB `time_bucket_gapfill` + `interpolate` pair): calendar
    spine via sequence(), left join, then prev/next non-null anchors
    from two one-pass window frames (last/first IGNORE NULLS) — no
    self-joins, no UDFs. Edge gaps fall back to the nearest anchor.
    One shuffle per window partition key; the spine is |types| × hours,
    generated, never materialized wide."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("v"))
    )
    bounds = hourly.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    spine = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        (F.unix_timestamp("h") / 3600).cast("long").alias("x"),
        "v",
    )
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    ctx = joined.select(
        "event_type",
        "h",
        "x",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("x")), ignorenulls=True)
        .over(w_prev)
        .alias("px"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("x")), ignorenulls=True)
        .over(w_next)
        .alias("nx"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((F.col("x") - F.col("px")).cast("double")
               / (F.col("nx") - F.col("px")).cast("double"))
        )
    )
    return ctx.select(
        "event_type",
        F.col("h").alias("bucket"),
        F.round(interp, 6).alias("value_filled"),
        F.col("v").isNull().alias("interpolated"),
    )


# ---------------------------------------------------------------------------
# EWMA smoothing (time-series denoising with EXACT cross-engine floats)
# ---------------------------------------------------------------------------

# 24 lags with decay 1/2: every weight w_j = 2^-(j+1) is a POWER OF
# TWO, so each product w_j * x is EXACT (pure exponent shift, mantissa
# untouched) — which is what makes the fold bit-reproducible across
# engines: DuckDB's executor CONTRACTS multiply-add chains (FMA, one
# rounding for a*b+c), Spark's JVM codegen never does, and the two
# only agree when the product needs no rounding at all (measured: at
# decay 3/4 — exact weights but INEXACT products — 1-3 % of rows came
# back one ulp apart). The fold itself is a fixed left-associative
# expression chain (not a list_sum, whose summation order DuckDB does
# not guarantee), the normalizer (a sum of distinct powers of two) is
# exact, and the final division rounds once — smoothed values
# hash-match the oracle UNROUNDED, the priority-sample discipline
# applied to a float recurrence. Tail truncation at 24 lags is 2^-24
# of the weight mass, absorbed by the per-row normalizer (weights of
# PRESENT lags only).
_EWMA_LAGS = 24
_EWMA_WEIGHTS = [2.0 ** -(j + 1) for j in range(_EWMA_LAGS)]
_EWMA_SAMPLE = 25  # emit every 25th row: verifies the chain densely


def _ewma_oracle() -> str:
    num = []
    den = []
    for j, w in enumerate(_EWMA_WEIGHTS):
        lag = "value" if j == 0 else f"lag(value, {j}) OVER w"
        # CAST every literal to DOUBLE: DuckDB parses bare decimal
        # literals as DECIMAL and would fold the denominator in exact
        # decimal arithmetic — an ulp off the Spark double fold
        num.append(f"COALESCE(CAST({w!r} AS DOUBLE) * ({lag}), 0.0)")
        den.append(
            f"(CASE WHEN ({lag}) IS NULL THEN CAST(0.0 AS DOUBLE)"
            f" ELSE CAST({w!r} AS DOUBLE) END)"
        )
    return f"""
SELECT event_type, rn, ewma FROM (
  SELECT event_type,
    CAST(row_number() OVER w AS BIGINT) AS rn,
    CASE WHEN ({" + ".join(den)}) > 0.0
         THEN ({" + ".join(num)}) / ({" + ".join(den)}) END AS ewma
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
WHERE rn % {_EWMA_SAMPLE} = 0
ORDER BY event_type, rn
"""


@register("q_ewma_value", oracle=_ewma_oracle())
def q_ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the event value per
    type (24-lag window, decay 1/2), sampled every 25th row — metric
    denoising / drift smoothing as ONE partitioned-window pass: the 24
    lag expressions share a single (event_type)-keyed sort, no
    self-joins, no state. Every weight is an exact double and the fold
    order is pinned left-associative on both engines, so the smoothed
    floats hash-match the oracle unrounded (see the module constants
    for why power-of-two weights are the ONLY decay immune to DuckDB's
    FMA contraction)."""
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    num = None
    den = None
    for j, wt in enumerate(_EWMA_WEIGHTS):
        lag = F.col("value") if j == 0 else F.lag("value", j).over(w)
        n_term = F.coalesce(F.lit(wt) * lag, F.lit(0.0))
        d_term = F.when(lag.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = n_term if num is None else num + n_term
        den = d_term if den is None else den + d_term
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.row_number().over(w).cast("bigint").alias("rn"),
            # NULL, not an ANSI divide-by-zero abort, when every value
            # in the 24-lag window is NULL (den sums to exactly 0.0) —
            # the nullable-column dual of the var_samp single-row guard
            F.when(den > F.lit(0.0), num / den).alias("ewma"),
        )
        .filter(F.col("rn") % _EWMA_SAMPLE == 0)
        .orderBy("event_type", "rn")
    )


@register(
    "q_event_burstiness",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
mo AS (
  SELECT event_type,
    COUNT(*) AS n_days, SUM(c) AS s1, SUM(c * c) AS s2
  FROM daily GROUP BY event_type
)
SELECT event_type,
  CAST(n_days AS BIGINT) AS n_days,
  CAST(s1 AS BIGINT) AS n_events,
  ROUND(CAST(s1 AS DOUBLE) / n_days, 6) AS mean_daily,
  ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n_days)
        / (n_days - 1) / (CAST(s1 AS DOUBLE) / n_days), 6) AS fano
FROM mo
WHERE n_days > 1 AND s1 > 0
ORDER BY event_type
""",
)
def q_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type burstiness of daily volume: the Fano factor
    (sample variance of daily counts over their mean). ~1 = Poisson
    arrivals; >>1 = bursty traffic (campaign spikes, batch re-ingest,
    scraper storms) — the dispersion diagnostic a pipeline alerting
    system uses to pick thresholds per metric instead of one global
    rule.

    Exactness: daily counts are integers, so n, sum, and sum-of-squares
    are exact bigints; variance and Fano come from a fixed dag of
    IEEE divisions on those exact values — identical bits cross-engine
    before the final rounding, no float accumulation anywhere.

    Scale shape: one (type, day)-keyed count with map-side combine
    (the only corpus-proportional stage) and one type-keyed moment
    aggregate over day rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    mo = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    n = F.col("n_days").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    mean = s1 / F.col("n_days")
    var = (s2 - s1 * F.col("s1") / F.col("n_days")) / (F.col("n_days") - 1)
    return (
        mo.filter((F.col("n_days") > 1) & (F.col("s1") > 0))
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("s1").cast("bigint").alias("n_events"),
            F.round(mean, 6).alias("mean_daily"),
            F.round(var / mean, 6).alias("fano"),
        )
        .orderBy("event_type")
    )


@register(
    "q_event_correlation_matrix",
    oracle="""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT d FROM daily),
types AS (SELECT DISTINCT event_type FROM daily),
grid AS (
  SELECT t.event_type, dd.d, COALESCE(x.c, 0) AS c
  FROM types t CROSS JOIN days dd
  LEFT JOIN daily x ON x.event_type = t.event_type AND x.d = dd.d
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
    COUNT(*) AS n, SUM(a.c) AS sx, SUM(b.c) AS sy,
    SUM(a.c * b.c) AS sxy, SUM(a.c * a.c) AS sxx, SUM(b.c * b.c) AS syy
  FROM grid a JOIN grid b
    ON a.d = b.d AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
  ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
        / (SQRT(CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
           * SQRT(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)),
        6) AS pearson_r
FROM pairs
WHERE (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) > 0
  AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) > 0
ORDER BY type_a, type_b
""",
)
def q_event_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the event types' daily-volume
    series (zero-filled to a common day grid) — the metric-correlation
    matrix an ops team reads to know which signals move together (one
    incident, many alarms) and which are independent checks.

    Exactness: the day grid makes counts integers everywhere, so all
    five co-moments are exact bigint sums; Pearson r is a fixed dag of
    IEEE divisions and sqrts over those exact values — bit-identical
    cross-engine before rounding. Constant (zero-variance) series are
    excluded by the same exact test both sides.

    Scale shape: one (day, type)-keyed count (map-side combinable) is
    the only corpus-proportional stage; the grid and its day-keyed
    self-join are |days| x |types| rows — time-bounded, not
    volume-bounded."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    # bounded intermediates, multi-consumer: pin once (audit discipline)
    daily = daily.localCheckpoint(eager=False)
    days = daily.select("d").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        types.crossJoin(days)
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type", "d", F.coalesce(F.col("c"), F.lit(0)).alias("c")
        )
        .localCheckpoint(eager=False)
    )
    a = grid.select(
        F.col("event_type").alias("type_a"), "d", F.col("c").alias("ca")
    )
    b = grid.select(
        F.col("event_type").alias("type_b"), "d", F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, "d")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.col("ca") * F.col("cb")).alias("sxy"),
            F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
            F.sum(F.col("cb") * F.col("cb")).alias("syy"),
        )
    )
    n = F.col("n")
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx") / n
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy") / n
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy") / n
    return (
        pairs.filter((vx > 0) & (vy > 0))
        .select(
            "type_a",
            "type_b",
            F.col("n").cast("bigint").alias("n_days"),
            F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("pearson_r"),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "q_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
t0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
pts AS (
  SELECT event_type, date_diff('day', d0, d) AS x, c
  FROM daily CROSS JOIN t0
),
slopes AS (
  SELECT a.event_type,
    CAST(b.c - a.c AS DOUBLE) / (b.x - a.x) AS slope
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND b.x > a.x
),
ranked AS (
  SELECT event_type, slope,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
    COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM slopes
)
SELECT event_type,
  CAST(MAX(m) AS BIGINT) AS n_pairs,
  ROUND(AVG(slope), 6) AS ts_slope
FROM ranked
WHERE rk IN ((m + 1) // 2, m // 2 + 1)
GROUP BY event_type
ORDER BY event_type
""",
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of each event type's daily volume: the
    MEDIAN of all pairwise day-to-day slopes — up to ~29% corrupted
    days (outages, backfill spikes) cannot move it, where an OLS slope
    chases every outlier. The estimator a traffic-forecast sanity
    check wants on dirty operational series.

    Exactness: each slope is ONE IEEE division of exact integers
    (count delta over day delta); the median is an order statistic —
    rank by value, average the middle one or two — so no float
    accumulation exists anywhere (the even-count average of two exact
    doubles is a single correctly-rounded add+halve).

    Scale shape: pairwise slopes are quadratic in DAYS (time-bounded),
    never in event volume — the (type, day)-keyed count absorbs the
    corpus; at multi-year horizons the pair join windows per quarter
    with identical semantics. Slope ranking partitions by type."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    t0 = ev.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    pts = daily.crossJoin(F.broadcast(t0)).select(
        "event_type",
        F.datediff(F.col("d"), F.col("d0")).alias("x"),
        "c",
    ).localCheckpoint(eager=False)  # feeds both sides of the pair join
    a = pts.select("event_type", F.col("x").alias("xa"), F.col("c").alias("ca"))
    b = pts.select("event_type", F.col("x").alias("xb"), F.col("c").alias("cb"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("xb") > F.col("xa"))
        .select(
            "event_type",
            (
                (F.col("cb") - F.col("ca")).cast("double")
                / (F.col("xb") - F.col("xa"))
            ).alias("slope"),
        )
    )
    wt = W.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wt.orderBy("slope")).alias("rk"),
        F.count(F.lit(1)).over(wt).alias("m"),
    )
    return (
        ranked.filter(
            (F.col("rk") == F.expr("(m + 1) DIV 2"))
            | (F.col("rk") == F.expr("m DIV 2 + 1"))
        )
        .groupBy("event_type")
        .agg(
            F.max("m").cast("bigint").alias("n_pairs"),
            F.round(F.avg("slope"), 6).alias("ts_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "q_seasonal_residuals",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
keyed AS (
  SELECT event_type, day, n,
    (day - DATE '1970-01-01') % 7 AS dow
  FROM daily
),
profile AS (
  SELECT event_type, dow,
    COUNT(*) AS n_days, SUM(n) AS s, SUM(n * n) AS ss
  FROM keyed GROUP BY 1, 2
)
SELECT k.event_type, k.day, CAST(k.n AS BIGINT) AS volume,
  ROUND(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS dow_mean,
  ROUND((CAST(k.n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
        / sqrt((CAST(n_days AS DOUBLE) * CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n_days AS DOUBLE)
                  * (CAST(n_days AS DOUBLE) - 1.0))), 6) AS z,
  abs((CAST(k.n AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
        / sqrt((CAST(n_days AS DOUBLE) * CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n_days AS DOUBLE)
                  * (CAST(n_days AS DOUBLE) - 1.0)))) >= 1.5 AS is_anomaly
FROM keyed k JOIN profile p
  ON k.event_type = p.event_type AND k.dow = p.dow
WHERE n_days >= 3
  AND (CAST(n_days AS DOUBLE) * CAST(ss AS DOUBLE)
       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) > 0
ORDER BY k.event_type, k.day
""",
)
def q_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted volume anomalies: per event type, build the
    day-of-week profile (mean/stddev of daily volumes per weekday —
    the dominant seasonality of event traffic) and flag days whose
    volume sits far from THEIR weekday's mean in sample-stddev
    units (every day is emitted with its z; is_anomaly flags |z| ≥ 1.5). A Monday spike is judged against Mondays — the
    seasonal-adjustment step q_event_burstiness (Fano) and
    q_theil_sen_trend (trend) deliberately skip, completing the
    volume-monitoring triple.

    Portability: day-of-week is pure integer calendar-free arithmetic
    (days-since-epoch mod 7 — no engine dayofweek(), whose 0/1-based
    Sunday conventions differ); moments are exact bigint sums; the z
    expression is one fixed IEEE dag with a correctly-rounded sqrt
    (the Hellinger discipline), 6-dp rounded. Degenerate profiles
    (under 3 days, zero variance) are excluded in both engines.

    Scale shape: the corpus collapses to the daily table in one
    partial-agg pass; the weekday profile is a second tiny rollup
    (|types|·7 rows) joined back by (type, dow) — never a window over
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = daily.withColumn(
        "dow", F.datediff("day", F.lit("1970-01-01").cast("date")) % 7
    )
    profile = keyed.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("ss"),
    )
    nd = F.col("n_days").cast("double")
    s = F.col("s").cast("double")
    ss = F.col("ss").cast("double")
    var_num = nd * ss - s * s
    mean = s / nd
    z = (F.col("n").cast("double") - mean) / F.sqrt(
        var_num / (nd * (nd - F.lit(1.0)))
    )
    return (
        keyed.join(profile, ["event_type", "dow"])
        .filter((F.col("n_days") >= 3) & (var_num > 0))
        .select(
            "event_type",
            "day",
            F.col("n").cast("bigint").alias("volume"),
            F.round(mean, 6).alias("dow_mean"),
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 1.5).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "q_interval_coverage",
    oracle="""
WITH iv AS (
  -- floor() before the BIGINT casts: DuckDB's double->bigint cast
  -- ROUNDS while Spark's unix_timestamp/cast TRUNCATE
  SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS s,
    CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value * 60) AS BIGINT) AS e
  FROM events WHERE value > 0
),
marked AS (
  SELECT user_id, s, e,
    CASE WHEN s > COALESCE(MAX(e) OVER (
      PARTITION BY user_id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
    THEN 1 ELSE 0 END AS new_block
  FROM iv
),
blocks AS (
  SELECT user_id, s, e,
    SUM(new_block) OVER (PARTITION BY user_id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS block_id
  FROM marked
),
merged AS (
  SELECT user_id, block_id,
    MIN(s) AS bs, MAX(e) AS be, COUNT(*) AS n_iv
  FROM blocks GROUP BY user_id, block_id
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_blocks,
  CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
  CAST(SUM(be - bs) AS BIGINT) AS covered_s,
  CAST(MAX(be - bs) AS BIGINT) AS longest_block_s
FROM merged GROUP BY user_id ORDER BY user_id
""",
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user: every event opens an interval
    [ts, ts + value·60 s]; overlapping intervals merge and the union's
    total covered time, block count, and longest block come back — the
    interval-algebra primitive behind session stitching, SLA uptime,
    machine-utilization, and ad-exposure accounting (naive SUM of
    durations double-counts every overlap; the union does not).

    Algorithm: the classic sweep as pure window algebra — an interval
    starts a NEW block iff its start exceeds the running MAX end of
    everything before it (per user, ordered by start); block ids are
    the running sum of those flags; each block contributes
    max(end) − min(start). All integer-seconds arithmetic.

    Scale shape: per-user windows (user-partitioned, never global) +
    one (user, block) hash-agg + one user rollup, all map-side
    combinable after the single per-user sort — the same
    partitioned-window posture as the telemetry stop detection."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    iv = ev.filter(F.col("value") > 0).select(
        "user_id",
        F.unix_timestamp("ts").alias("s"),
        (F.unix_timestamp("ts") + (F.col("value") * 60).cast("bigint")).alias("e"),
    )
    w = W.partitionBy("user_id").orderBy("s", "e")
    w_prev = w.rowsBetween(W.unboundedPreceding, -1)
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    marked = iv.withColumn(
        "new_block",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0),
    )
    blocks = marked.withColumn("block_id", F.sum("new_block").over(w_run))
    merged = blocks.groupBy("user_id", "block_id").agg(
        F.min("s").alias("bs"), F.max("e").alias("be"),
        F.count(F.lit(1)).alias("n_iv"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.sum("n_iv").cast("bigint").alias("n_intervals"),
            F.sum(F.col("be") - F.col("bs")).cast("bigint").alias("covered_s"),
            F.max(F.col("be") - F.col("bs")).cast("bigint").alias("longest_block_s"),
        )
        .orderBy("user_id")
    )


@register(
    "q_twap_value",
    oracle="""
WITH ordered AS (
  SELECT user_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS s,
    CAST(ROUND(value * 100, 0) AS BIGINT) AS v_q,
    LEAD(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
      PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
    ) AS s_next
  FROM events
),
held AS (
  SELECT user_id, v_q, s_next - s AS dt
  FROM ordered WHERE s_next IS NOT NULL
)
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS n_holds,
  CAST(SUM(dt) AS BIGINT) AS span_s,
  ROUND(CAST(SUM(v_q * dt) AS DOUBLE)
        / (100.0 * CAST(SUM(dt) AS DOUBLE)), 6) AS twap
FROM held
GROUP BY user_id
HAVING SUM(dt) > 0
ORDER BY user_id
""",
)
def q_twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each event's value
    HOLDS until the user's next event and contributes
    value·holding-time; the last observation carries no weight (no
    future to hold over). The standard telemetry/finance correction to
    the naive mean, which over-weights bursts: a sensor emitting 100
    readings in one minute then one reading an hour later is
    mean-dominated by the burst but TWAP-dominated by the hour.

    Exactness: values quantize to integer centi-units BEFORE the
    weighted sum (Σ v_q·Δt is an exact bigint in any partition order);
    TWAP is one final division. The lead window is user-partitioned
    with an (s, event_id) total order — never a global window.

    Scale shape: one per-user sort (the window exchange) + one
    user-keyed aggregate with partial combine; state per user is a
    running pair of bigints."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    ordered = ev.select(
        "user_id",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("bigint").alias("s"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v_q"),
    ).withColumn("s_next", F.lead("s", 1).over(w))
    held = ordered.filter(F.col("s_next").isNotNull()).select(
        "user_id", "v_q", (F.col("s_next") - F.col("s")).alias("dt")
    )
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_holds"),
            F.sum("dt").cast("bigint").alias("span_s"),
            F.round(
                F.sum(F.col("v_q") * F.col("dt")).cast("double")
                / (F.lit(100.0) * F.sum("dt").cast("double")),
                6,
            ).alias("twap"),
        )
        .filter(F.col("span_s") > 0)
        .orderBy("user_id")
    )


@register(
    "q_changepoint_volume",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT event_type, day, n,
    SUM(n) OVER w AS s1,
    COUNT(*) OVER w AS n1,
    SUM(n) OVER (PARTITION BY event_type) AS s_tot,
    COUNT(*) OVER (PARTITION BY event_type) AS n_tot
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cand AS (
  SELECT event_type, day AS split_day, s1, n1,
    s_tot - s1 AS s2, n_tot - n1 AS n2,
    ROUND((CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(n_tot - n1 AS DOUBLE)
           + CAST(s_tot - s1 AS DOUBLE) * CAST(s_tot - s1 AS DOUBLE)
             * CAST(n1 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) * CAST(n_tot - n1 AS DOUBLE)), 6) AS obj
  FROM pre WHERE n_tot - n1 > 0
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
    ORDER BY obj DESC, split_day) AS rk
  FROM cand
)
SELECT event_type, split_day,
  CAST(n1 AS BIGINT) AS days_before,
  CAST(n2 AS BIGINT) AS days_after,
  ROUND(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean_before,
  ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS mean_after,
  ROUND(CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)
        - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS shift
FROM ranked WHERE rk = 1
ORDER BY event_type
""",
)
def q_changepoint_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection per event type: the day boundary
    that best splits the daily-volume series into two level segments —
    argmax of the between-segment sum of squares S₁²/n₁ + S₂²/n₂
    (equivalently: the one-split least-squares fit; the batch
    complement of the streaming CUSUM, answering WHEN the level
    shifted after CUSUM says THAT it did). Output: the split day, both
    segment means, and the shift.

    Determinism: segment sums/counts are exact bigints off one
    partitioned prefix-sum window; the objective is a fixed IEEE dag
    over exact integer inputs, 6-dp rounded before the (obj desc, day)
    argmax — both engines rank identically. The per-type windows are
    day-grid-sized, never event-volume-sized.

    Scale shape: events collapse to the (type, day) grid in one
    partial-agg pass; everything after — prefix sums, objective,
    top-1 — runs on |types|×|days| rows with type-partitioned windows
    and a WindowGroupLimit rank pushdown."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_run = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("event_type")
    pre = daily.select(
        "event_type",
        F.col("day").alias("split_day"),
        F.sum("n").over(w_run).alias("s1"),
        F.count(F.lit(1)).over(w_run).alias("n1"),
        F.sum("n").over(w_all).alias("s_tot"),
        F.count(F.lit(1)).over(w_all).alias("n_tot"),
    )
    s1 = F.col("s1").cast("double")
    s2 = (F.col("s_tot") - F.col("s1")).cast("double")
    n1 = F.col("n1").cast("double")
    n2 = (F.col("n_tot") - F.col("n1")).cast("double")
    cand = pre.filter(F.col("n_tot") - F.col("n1") > 0).withColumn(
        "obj", F.round((s1 * s1 * n2 + s2 * s2 * n1) / (n1 * n2), 6)
    )
    w_rank = W.partitionBy("event_type").orderBy(F.desc("obj"), "split_day")
    return (
        cand.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "split_day",
            F.col("n1").cast("bigint").alias("days_before"),
            (F.col("n_tot") - F.col("n1")).cast("bigint").alias("days_after"),
            F.round(s1 / n1, 6).alias("mean_before"),
            F.round(s2 / n2, 6).alias("mean_after"),
            F.round(s2 / n2 - s1 / n1, 6).alias("shift"),
        )
        .orderBy("event_type")
    )


_AB_CONVERT = "purchase"  # the conversion event
_AB_MIN_PURCHASES = 10  # conversion = at least this many (splits users)


def _ab_oracle() -> str:
    from flink_template_spark.functions.hashing import md5int_duckdb

    arm = f"({md5int_duckdb('CAST(user_id AS VARCHAR)')}) % 2"
    return f"""
WITH users AS (
  SELECT user_id, {arm} AS arm,
    CASE WHEN SUM(CASE WHEN event_type = '{_AB_CONVERT}' THEN 1 ELSE 0 END)
              >= {_AB_MIN_PURCHASES} THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n, SUM(conv) AS k FROM users GROUP BY arm
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
    MAX(CASE WHEN arm = 0 THEN k END) AS k_a,
    MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
    MAX(CASE WHEN arm = 1 THEN k END) AS k_b
  FROM arms
)
SELECT
  CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS k_a,
  CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS k_b,
  ROUND(CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS rate_a,
  ROUND(CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS rate_b,
  ROUND(CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS lift,
  CASE WHEN k_a + k_b = 0 OR k_a + k_b = n_a + n_b THEN 0.0
  ELSE ROUND((CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        / sqrt((CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 - CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
               * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
  END AS z_stat,
  CASE WHEN k_a + k_b = 0 OR k_a + k_b = n_a + n_b THEN FALSE
  ELSE abs((CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE)
       - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      / sqrt((CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 - CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
             * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
    >= 1.959964
  END AS significant_95
FROM wide
"""


@register("q_ab_test_readout", oracle=_ab_oracle())
def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-assign to two arms (the
    portable md5 parity — deterministic, balanced, engine-identical),
    conversion = at least _AB_MIN_PURCHASES (=10) purchase events (a
    threshold that actually splits this corpus' users), and the
    two-proportion
    pooled z-test says whether the arms differ (on this corpus the
    split is a true A/A test, so |z| SHOULD be small — the null
    calibration every experiment platform validates its pipeline
    with). The analysis primitive behind any experimentation stack.

    Float discipline: rates are exact-integer divisions; the pooled
    z is one fixed IEEE dag with a correctly-rounded sqrt (the Wilson/
    Hellinger discipline), 6-dp rounded; the significance compare uses
    the z=1.959964 literal both engines share.

    Scale shape: one user-keyed MAX (conversion flag, partial-agg),
    one 2-row arm rollup, then scalar algebra on a 1-row relation."""
    from flink_template_spark.functions.hashing import md5int_spark

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == _AB_CONVERT, 1).otherwise(0)
            )
            >= _AB_MIN_PURCHASES
        ).cast("int").alias("conv")
    ).select(
        (F.expr(md5int_spark("CAST(user_id AS STRING)")) % 2).alias("arm"),
        "conv",
    )
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("k_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("k_b"),
    )
    na, ka = F.col("n_a").cast("double"), F.col("k_a").cast("double")
    nb, kb = F.col("n_b").cast("double"), F.col("k_b").cast("double")
    ra, rb = ka / na, kb / nb
    pool = (ka + kb) / (na + nb)
    # degenerate-pool guard (ANSI-safe): all-converted or none-converted
    # corpora have zero pooled variance — report z=0, not a 0/0 abort
    degen = (F.col("k_a") + F.col("k_b") == 0) | (
        F.col("k_a") + F.col("k_b") == F.col("n_a") + F.col("n_b")
    )
    z_raw = (rb - ra) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    z = F.when(degen, F.lit(0.0)).otherwise(F.round(z_raw, 6))
    sig = F.when(degen, F.lit(False)).otherwise(F.abs(z_raw) >= 1.959964)
    return wide.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("k_a").cast("bigint").alias("k_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("k_b").cast("bigint").alias("k_b"),
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(rb - ra, 6).alias("lift"),
        z.alias("z_stat"),
        sig.alias("significant_95"),
    )


@register(
    "q_event_markov",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         COUNT(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
  ROUND(CAST(n_trans AS DOUBLE)
        / CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS DOUBLE), 6)
    AS p
FROM trans ORDER BY from_type, to_type
""",
)
def q_event_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type) — the behavioral
    sequence model every product-analytics stack fits first (and the
    label prior a session-sequence training pipeline reports beside its
    corpus). Deterministic ordering: (ts, event_id) tiebreak.

    Scale shape: the LAG runs inside per-user partitions (the natural
    event-log partitioning — no global window); the transition count is
    a hash aggregate with map-side partials; the probability
    normalization windows over the |types|² matrix (≤25 rows here,
    bounded by the event vocabulary, never event volume). One exact
    integer division per cell, 6-dp rounded."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_trans"))
    )
    w_from = W.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(w_from).cast("double"),
            6,
        ).alias("p"),
    ).orderBy("from_type", "to_type")


_RFM_Q = 4  # quartile segmentation


@register(
    "q_rfm_segments",
    oracle=f"""
WITH cust AS (
  SELECT o_custkey AS c,
    MAX(CAST(o_orderdate AS DATE)) AS last_dt,
    COUNT(*) AS freq,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
metrics AS (
  SELECT c, date_diff('day', last_dt, maxd) AS rec_days, freq, mon
  FROM cust CROSS JOIN mx
),
ranked AS (
  SELECT c, mon,
    ROW_NUMBER() OVER (ORDER BY rec_days, c) AS rn_r,
    ROW_NUMBER() OVER (ORDER BY freq, c) AS rn_f,
    ROW_NUMBER() OVER (ORDER BY mon, c) AS rn_m,
    COUNT(*) OVER () AS n
  FROM metrics
)
SELECT
  CAST((rn_r - 1) * {_RFM_Q} // n + 1 AS BIGINT) AS r_quartile,
  CAST((rn_f - 1) * {_RFM_Q} // n + 1 AS BIGINT) AS f_quartile,
  CAST((rn_m - 1) * {_RFM_Q} // n + 1 AS BIGINT) AS m_quartile,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(mon) AS DOUBLE) AS sum_monetary
FROM ranked
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every ordering customer scored into recency /
    frequency / monetary quartiles, reported as the segment histogram
    (the 4×4×4 grid a CRM or a data-curation team reads to pick which
    behavioral strata to sample from). Quartiles are the EXPLICIT
    integer formula (rn-1)*4 DIV n + 1 over a deterministic total order
    (metric, custkey) — NOT the engines' NTILE, whose remainder
    distribution differs from the integer-division bucketing and would
    hash-mismatch; the formula is engine-identical by construction.

    Scale shape: one orders shuffle to the per-customer metric table,
    then ONE two-pass range-partitioned global rank (operators.
    rank_global — no data-sized unpartitioned window) over the three
    metrics EXPLODED to (metric_id, value, c) rows: every metric has
    exactly n rows, so the within-metric row_number is just
    g_rn − (metric_id−1)·n — no per-group offset table at all. One
    rank pass (one range-exchange sampling job, one checkpoint, one
    stats agg) replaces the three sequential rank passes the query
    used through r11 (measured 2.9 → 1.9 s at sf0.1, identical rows).
    Values ride a common DECIMAL(18,2) axis — rec_days (≤ ~10^4) and
    freq (≤ per-customer order count) convert exactly, so per-metric
    ordering is unchanged — and mon stays decimal end-to-end; the
    pivot back to one row per customer is a c-keyed hash agg, then the
    4³-row segment rollup. One cast to double at the output edge."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    orders = load_table(spark, sf_dir, "orders")
    # cust has three consumers (mx, the stacked metric rows, n_tot):
    # pin one materialization (multi-consumer subtree policy)
    cust = (
        orders.groupBy(F.col("o_custkey").alias("c"))
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_dt"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("mon"),
        )
        .localCheckpoint(eager=False)
    )
    # the corpus max date is the max of per-customer last dates —
    # reuses cust's shuffle instead of a second orders scan
    mx = cust.agg(F.max("last_dt").alias("maxd"))
    metrics = cust.crossJoin(F.broadcast(mx)).select(
        "c",
        F.datediff(F.col("maxd"), F.col("last_dt")).alias("rec_days"),
        "freq",
        "mon",
    )
    # one (metric_id, value) row per metric per customer; the decimal
    # cast is exact for all three domains (see docstring) so each
    # metric's (value, c) order is the same total order the three
    # separate ranks used
    stacked = metrics.select(
        "c",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("m"),
                    F.col("rec_days").cast("decimal(18,2)").alias("val"),
                ),
                F.struct(
                    F.lit(2).alias("m"),
                    F.col("freq").cast("decimal(18,2)").alias("val"),
                ),
                F.struct(F.lit(3).alias("m"), F.col("mon").alias("val")),
            )
        ).alias("mv"),
        "mon",
    ).select("c", F.col("mv.m").alias("m"), F.col("mv.val").alias("val"), "mon")
    ranked = with_global_ranks(
        stacked,
        [(F.col("m"), True), (F.col("val"), True)],
        tiebreak=["c"],
        row_number_col="g_rn",
    )
    n_tot = cust.agg(F.count(F.lit(1)).alias("__n"))
    q = _RFM_Q
    # within-metric rank, then quartile; pivot the 3 metric rows back
    # to one row per customer (mon rides every row — MAX is exact)
    per_cust = (
        ranked.crossJoin(F.broadcast(n_tot))
        .select(
            "c",
            "m",
            "mon",
            F.expr(f"(g_rn - (m - 1) * __n - 1) * {q}L DIV __n + 1").alias("qt"),
        )
        .groupBy("c")
        .agg(
            F.max(F.when(F.col("m") == 1, F.col("qt"))).alias("r_quartile"),
            F.max(F.when(F.col("m") == 2, F.col("qt"))).alias("f_quartile"),
            F.max(F.when(F.col("m") == 3, F.col("qt"))).alias("m_quartile"),
            F.max("mon").alias("mon"),
        )
    )
    return (
        per_cust.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("mon").cast("double").alias("sum_monetary"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


_ACF_MAX_LAG = 7


@register(
    "q_volume_acf",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
pairs AS (
  SELECT l.lag, a.x AS x0, b.x AS x1
  FROM daily a
  JOIN lags l ON TRUE
  JOIN daily b ON b.day = a.day + CAST(l.lag AS INT)
)
SELECT CAST(lag AS BIGINT) AS lag,
  CAST(COUNT(*) AS BIGINT) AS n_pairs,
  ROUND(
    (COUNT(*) * CAST(SUM(x0 * x1) AS DOUBLE)
     - CAST(SUM(x0) AS DOUBLE) * CAST(SUM(x1) AS DOUBLE))
    / (sqrt(COUNT(*) * CAST(SUM(x0 * x0) AS DOUBLE)
            - CAST(SUM(x0) AS DOUBLE) * CAST(SUM(x0) AS DOUBLE))
       * sqrt(COUNT(*) * CAST(SUM(x1 * x1) AS DOUBLE)
              - CAST(SUM(x1) AS DOUBLE) * CAST(SUM(x1) AS DOUBLE))),
  6) AS acf
FROM pairs GROUP BY lag ORDER BY lag
""",
)
def q_volume_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily event volume at lags 1..{_ACF_MAX_LAG}
    (Pearson r between the day series and its k-day shift over
    overlapping days) — the periodicity detector behind capacity
    planning and the seasonality check that decides whether
    q_seasonal_residuals' day-of-week model is even warranted (a
    lag-7 peak says yes).

    Scale shape: the event stream collapses to the calendar-bounded
    day grid in one hash agg; the lag alignment is a self-equi-join of
    the DAY table on day+lag fanned out by a {_ACF_MAX_LAG}-row
    broadcast literal — day-grid-sized work end-to-end, never event
    volume. Float discipline: exact integer power sums → the Pearson
    dag with two correctly-rounded sqrts (the q_corr_price_qty
    shape), 6-dp."""
    ev = load_table(spark, sf_dir, "events")
    # both lag sides reference the day grid: pin the (tiny,
    # calendar-bounded) aggregate once instead of scanning events twice
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=False)
    )
    lags = spark.createDataFrame([(k,) for k in range(1, _ACF_MAX_LAG + 1)], "lag int")
    a = daily.select(F.col("day").alias("day0"), F.col("x").alias("x0"))
    b = daily.select(F.col("day").alias("day1"), F.col("x").alias("x1"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("day1") == F.expr("date_add(day0, lag)"))
    )
    n = F.count(F.lit(1))
    s0, s1 = F.sum("x0").cast("double"), F.sum("x1").cast("double")
    s00 = F.sum(F.col("x0") * F.col("x0")).cast("double")
    s11 = F.sum(F.col("x1") * F.col("x1")).cast("double")
    s01 = F.sum(F.col("x0") * F.col("x1")).cast("double")
    acf = (n * s01 - s0 * s1) / (
        F.sqrt(n * s00 - s0 * s0) * F.sqrt(n * s11 - s1 * s1)
    )
    return (
        pairs.groupBy("lag")
        .agg(
            n.cast("bigint").alias("n_pairs"),
            F.round(acf, 6).alias("acf"),
        )
        .select(F.col("lag").cast("bigint").alias("lag"), "n_pairs", "acf")
        .orderBy("lag")
    )


@register(
    "q_cohort_ltv",
    oracle="""
WITH cust AS (
  SELECT o_custkey AS c,
    MIN(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort
  FROM orders GROUP BY o_custkey
),
rev AS (
  SELECT cust.cohort,
    (year(date_trunc('month', CAST(o.o_orderdate AS DATE)))
       - year(cust.cohort)) * 12
    + (month(date_trunc('month', CAST(o.o_orderdate AS DATE)))
       - month(cust.cohort)) AS month_offset,
    COUNT(DISTINCT o.o_custkey) AS n_active,
    SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders o JOIN cust ON o.o_custkey = cust.c
  GROUP BY 1, 2
)
SELECT CAST(cohort AS DATE) AS cohort,
  CAST(month_offset AS BIGINT) AS month_offset,
  CAST(n_active AS BIGINT) AS n_active,
  CAST(revenue AS DOUBLE) AS revenue,
  CAST(SUM(revenue) OVER (PARTITION BY cohort ORDER BY month_offset)
       AS DOUBLE) AS cum_revenue
FROM rev ORDER BY cohort, month_offset
""",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    month, revenue accumulated per months-since-acquisition offset —
    the LTV curve that prices acquisition spend (q_retention_cohorts
    counts WHO comes back; this weighs WHAT they spend). Month offsets
    are exact integer (year·12+month) arithmetic — deliberately not
    months_between, whose fractional semantics differ across engines.

    Scale shape: one orders shuffle to per-customer cohorts, one
    key-partitioned join back (customer key), one hash agg to the
    (cohort × offset) triangle — calendar-bounded, never order-volume;
    the cumulative window partitions per cohort over ≤|months| rows.
    Revenue rides decimal end-to-end; cast to double at the edge."""
    orders = load_table(spark, sf_dir, "orders")
    om = F.date_trunc("month", F.col("o_orderdate").cast("date")).cast("date")
    cust = orders.groupBy(F.col("o_custkey").alias("c")).agg(
        F.min(om).alias("cohort")
    )
    joined = orders.join(cust, orders["o_custkey"] == cust["c"])
    offset = (F.year(om) - F.year("cohort")) * 12 + (
        F.month(om) - F.month("cohort")
    )
    rev = joined.groupBy(
        "cohort", offset.cast("bigint").alias("month_offset")
    ).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_active"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    w = W.partitionBy("cohort").orderBy("month_offset")
    return rev.select(
        "cohort",
        "month_offset",
        "n_active",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    ).orderBy("cohort", "month_offset")


_PATH_TOP = 15


@register(
    "q_event_paths_top",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
    LAG(event_type, 1) OVER w AS p1,
    LAG(event_type, 2) OVER w AS p2
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 AS step1, p1 AS step2, event_type AS step3,
  CAST(COUNT(*) AS BIGINT) AS n_paths
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n_paths DESC, step1, step2, step3
LIMIT {_PATH_TOP}
""",
)
def q_event_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PATH_TOP} three-step behavioral paths (consecutive event
    triples per user) — the path-analysis readout product analytics
    runs beside the first-order Markov matrix (q_event_markov answers
    "what follows X"; this answers "which whole journeys are common",
    the second-order structure a one-step chain cannot see).

    Scale shape: two LAGs in ONE per-user window pass (same partition,
    same order — a single WindowExec), a hash aggregate over the
    ≤|types|³ path table with map-side partials, and a
    TakeOrderedAndProject top-{_PATH_TOP}. Integer counts only."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    return (
        seq.filter(F.col("p2").isNotNull())
        .groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
        .limit(_PATH_TOP)
    )


@register(
    "q_funnel_latency",
    oracle="""
WITH firsts AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
),
lat AS (
  SELECT user_id,
    date_diff('second', t_view, t_purchase) AS sec_to_convert
  FROM firsts
  WHERE t_view IS NOT NULL AND t_purchase > t_view
),
ranked AS (
  SELECT sec_to_convert,
    ROW_NUMBER() OVER (ORDER BY sec_to_convert, user_id) AS rn,
    COUNT(*) OVER () AS n
  FROM lat
)
SELECT CAST(MAX(n) AS BIGINT) AS n_converting,
  CAST(MIN(sec_to_convert) AS BIGINT) AS min_s,
  CAST(MIN(CASE WHEN 2 * rn >= n THEN sec_to_convert END) AS BIGINT)
    AS median_s,
  CAST(MIN(CASE WHEN 10 * rn >= 9 * n THEN sec_to_convert END) AS BIGINT)
    AS p90_s,
  CAST(MAX(sec_to_convert) AS BIGINT) AS max_s
FROM ranked
""",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users whose first purchase
    follows their first view, the seconds between — min / exact lower
    median / exact lower p90 / max (q_funnel_view_click_purchase counts
    WHO converts; this measures HOW LONG conversion takes, the number
    attribution windows and retargeting delays are tuned against).
    Percentiles are rank-SELECTED, never interpolated — exact integers
    on both engines.

    Scale shape: one user-keyed conditional-min aggregation, then the
    two-pass range-partitioned global rank over the (already
    user-collapsed) latency table, one conditional-min rollup to a
    single row."""
    from flink_template_spark.operators.rank_global import with_global_ranks

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("t_view").isNotNull() & (F.col("t_purchase") > F.col("t_view"))
    ).select(
        "user_id",
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
        ).alias("sec_to_convert"),
    )
    # ranked feeds the count AND the final rollup: pin the (user-
    # collapsed, tiny) ranked table once (multi-consumer policy)
    ranked = with_global_ranks(
        lat,
        [(F.col("sec_to_convert"), True)],
        tiebreak=["user_id"],
        row_number_col="rn",
    ).localCheckpoint(eager=False)
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .agg(
            F.max("__n").cast("bigint").alias("n_converting"),
            F.min("sec_to_convert").cast("bigint").alias("min_s"),
            F.min(
                F.when(
                    F.lit(2) * F.col("rn") >= F.col("__n"), F.col("sec_to_convert")
                )
            )
            .cast("bigint")
            .alias("median_s"),
            F.min(
                F.when(
                    F.lit(10) * F.col("rn") >= F.lit(9) * F.col("__n"),
                    F.col("sec_to_convert"),
                )
            )
            .cast("bigint")
            .alias("p90_s"),
            F.max("sec_to_convert").cast("bigint").alias("max_s"),
        )
    )


@register(
    "q_forecast_baselines",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT a.event_type, a.x, b1.x AS f_naive1, b7.x AS f_seasonal7
  FROM daily a
  JOIN daily b1 ON b1.event_type = a.event_type
                AND b1.day = a.day - INTERVAL 1 DAY
  JOIN daily b7 ON b7.event_type = a.event_type
                AND b7.day = a.day - INTERVAL 7 DAY
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_days_eval,
  CAST(SUM(abs(x - f_naive1)) AS BIGINT) AS ae_naive1,
  CAST(SUM(abs(x - f_seasonal7)) AS BIGINT) AS ae_seasonal7,
  CASE WHEN SUM(abs(x - f_naive1)) = 0 THEN NULL
       ELSE ROUND(CAST(SUM(abs(x - f_seasonal7)) AS DOUBLE)
                  / CAST(SUM(abs(x - f_naive1)) AS DOUBLE), 6)
  END AS seasonal_gain
FROM lagged
GROUP BY event_type ORDER BY event_type
""",
)
def q_forecast_baselines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation (the MASE denominator study): per
    event type, total absolute error of the naive-1 forecast
    (yesterday's volume) vs the seasonal-naive-7 forecast (same
    weekday last week) over the days where BOTH references exist.
    seasonal_gain < 1 says weekday seasonality beats persistence — the
    go/no-go any real forecasting model must clear, and the
    denominator MASE scales against. Absolute errors are exact
    integers (counts); one division, NULL (not ±inf — Spark/DuckDB
    disagree on x/0) when the series is naive-1-perfect.

    Calendar discipline (r8 self-review, second pass): the references
    are CALENDAR joins on day−1 / day−7 — a row-offset LAG over the
    observed-day grid silently stops meaning "same weekday last week"
    the moment a type has a zero-event day.

    Scale shape: the event stream collapses to the per-type day grid
    in one hash agg (pinned once — three self-join consumers); the
    calendar alignment is two (type, day)-keyed equi-joins on the
    day-grid table; the rollup is |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
        .localCheckpoint(eager=False)
    )
    b1 = daily.select(
        F.col("event_type").alias("t1"),
        F.col("day").alias("d1"),
        F.col("x").alias("f1"),
    )
    b7 = daily.select(
        F.col("event_type").alias("t7"),
        F.col("day").alias("d7"),
        F.col("x").alias("f7"),
    )
    lagged = daily.join(
        b1,
        (F.col("t1") == F.col("event_type"))
        & (F.col("d1") == F.date_sub(F.col("day"), 1)),
    ).join(
        b7,
        (F.col("t7") == F.col("event_type"))
        & (F.col("d7") == F.date_sub(F.col("day"), 7)),
    )
    ae1 = F.sum(F.abs(F.col("x") - F.col("f1")))
    ae7 = F.sum(F.abs(F.col("x") - F.col("f7")))
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days_eval"),
            ae1.cast("bigint").alias("ae_naive1"),
            ae7.cast("bigint").alias("ae_seasonal7"),
            F.when(ae1 == 0, F.lit(None).cast("double"))
            .otherwise(F.round(ae7.cast("double") / ae1.cast("double"), 6))
            .alias("seasonal_gain"),
        )
        .orderBy("event_type")
    )


@register(
    "q_activity_heatmap",
    oracle="""
WITH cells AS (
  SELECT dayofweek(ts) AS dow, hour(ts) AS hod, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS total FROM cells)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
  CAST(n AS BIGINT) AS n_events,
  ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
FROM cells CROSS JOIN tot
ORDER BY dow, hod
""",
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday × hour activity heatmap (≤7×24 cells with each cell's
    share of total volume) — the traffic-shape readout behind
    capacity planning, maintenance-window picking, and the
    day-of-week profile q_seasonal_residuals models. Calendar parts
    are integer; DuckDB's dayofweek (0=Sunday) is aligned to Spark's
    dayofweek (1=Sunday) via the Spark side's −1.

    Scale shape: one map-side calendar projection + one hash agg with
    map-side partials to ≤168 rows; the total broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hod",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("dow", "hod")
    )


@register(
    "q_volume_percentile_bands",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, x,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x, day) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM daily
)
SELECT event_type,
  CAST(MAX(n) AS BIGINT) AS n_days,
  CAST(MIN(CASE WHEN 10 * rn >= n THEN x END) AS BIGINT) AS p10,
  CAST(MIN(CASE WHEN 2 * rn >= n THEN x END) AS BIGINT) AS p50,
  CAST(MIN(CASE WHEN 10 * rn >= 9 * n THEN x END) AS BIGINT) AS p90
FROM ranked GROUP BY event_type ORDER BY event_type
""",
)
def q_volume_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-volume percentile bands (exact rank-selected
    p10/p50/p90 over each type's day series) — the normal-operating-
    range card an on-call dashboard draws around today's number (the
    banded complement of q_seasonal_residuals' z-scores and
    q_volume_acf's periodicity). Percentiles are SELECTED by integer
    rank arithmetic, never interpolated — exact on both engines.

    Scale shape: the event stream collapses to the per-type day grid
    in one hash agg; the rank windows partition per TYPE over
    calendar-bounded rows (≤|days| per partition — bounded by time,
    not volume); the rollup is |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("x"))
    w = W.partitionBy("event_type").orderBy("x", "day")
    wn = W.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        "x",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def pick(cond):
        return F.min(F.when(cond, F.col("x")))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_days"),
            pick(F.lit(10) * F.col("rn") >= F.col("n")).cast("bigint").alias("p10"),
            pick(F.lit(2) * F.col("rn") >= F.col("n")).cast("bigint").alias("p50"),
            pick(F.lit(10) * F.col("rn") >= F.lit(9) * F.col("n"))
            .cast("bigint")
            .alias("p90"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# round 9: session-quality and anomaly analytics
# ---------------------------------------------------------------------------

_SESSION_ISLANDS_CTE = """
ordered AS (
  SELECT
    user_id, event_id, event_type,
    CAST(ts AS TIMESTAMP) AS ts,
    CASE WHEN CAST(ts AS TIMESTAMP)
            - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          >= INTERVAL 30 MINUTE  -- session_window is [start, last+gap): an exact-gap event starts a NEW session (r9 review)
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      THEN 1 ELSE 0 END AS is_new
  FROM events
), sessions AS (
  SELECT *,
    SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_id
  FROM ordered
)
"""


@register(
    "q_session_bounce_rate",
    oracle=f"""
WITH {_SESSION_ISLANDS_CTE},
per_session AS (
  SELECT
    user_id, session_id,
    FIRST(event_type ORDER BY ts, event_id) AS entry_type,
    COUNT(*) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT
  entry_type,
  CAST(COUNT(*) AS BIGINT) AS n_sessions,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
FROM per_session GROUP BY 1 ORDER BY 1
""",
)
def q_session_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session bounce rate by entry event type: share of 30-minute-gap
    sessions that contain exactly one event, keyed by the session's
    first event type (web-analytics "bounce by landing page").

    Scale shape: the session assignment is Spark's native
    ``session_window`` aggregation (state-merge, one shuffle on
    user_id); the entry type is ``min_by`` over (ts, event_id) INSIDE
    the same aggregate — no second window pass; the rollup is a hash
    agg over the (entry_type)-small session table. The bounce ratio is
    one double division of exact integer counts."""
    events = load_table(spark, sf_dir, "events")
    per_session = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.min_by("event_type", F.struct("ts", "event_id")).alias(
                "entry_type"
            ),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        per_session.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum((F.col("n_events") == 1).cast("int"))
            .cast("bigint")
            .alias("n_bounce"),
        )
        .withColumn(
            "bounce_rate",
            F.col("n_bounce").cast("double") / F.col("n_sessions").cast("double"),
        )
        .orderBy("entry_type")
    )


@register(
    "q_anomaly_days",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
),
stats AS (
  SELECT COUNT(*) AS n_days,
         SUM(n_events) AS sum_n,
         SUM(n_events * n_events) AS sum_sq
  FROM daily
),
ranked AS (
  SELECT day, n_events,
         ROW_NUMBER() OVER (ORDER BY n_events) AS rn
  FROM daily
),
med AS (
  SELECT n_events AS med_n FROM ranked, stats
  WHERE rn = (n_days + 1) // 2
),
dev_ranked AS (
  SELECT ABS(n_events - med_n) AS dev,
         ROW_NUMBER() OVER (ORDER BY ABS(n_events - med_n)) AS rn
  FROM daily, med
),
mad AS (
  SELECT dev AS mad_n FROM dev_ranked, stats
  WHERE rn = (n_days + 1) // 2
)
SELECT
  day,
  CAST(n_events AS BIGINT) AS n_events,
  ROUND(
    (CAST(n_events AS DOUBLE) - CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
    / sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_days AS DOUBLE)
           - (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
             * (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))),
    6) AS zscore,
  ABS(CAST(n_events AS DOUBLE) - CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
    > 2.0 * sqrt(CAST(sum_sq AS DOUBLE) / CAST(n_days AS DOUBLE)
                 - (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE))
                   * (CAST(sum_n AS DOUBLE) / CAST(n_days AS DOUBLE)))
    AS z_out,
  ABS(n_events - med_n) > 3 * mad_n AS mad_out
FROM daily, stats, med, mad
ORDER BY day
""",
)
def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly days by BOTH the classic z-score (pop. mean
    / std) and the robust MAD fence (lower-median, |n − med| > 3·MAD) —
    the agreement/disagreement between the two flags is the analyst
    deliverable (a mean-shifted month drags the z fence but not MAD).

    Cross-engine float discipline: every statistic is computed from
    exact integer sums (Σn, Σn², N, medians of integers); the ONLY
    float ops are divisions, one sqrt (IEEE-exact in both engines) and
    comparisons over identically-parenthesized expression trees.

    Scale shape: one hash agg events→days; everything after operates
    on the bounded post-aggregation day table (≤ a few thousand rows
    at any corpus size — days, not events), where the two
    row_number-median windows are unpartitioned BY DESIGN (documented
    bounded-table pattern, tests/test_plans.py allowlist)."""
    events = load_table(spark, sf_dir, "events")
    # five consumers (stats, ranked, dev_ranked, the med inside mad,
    # the final projection) reference the day table; pin the bounded
    # post-aggregation result once so the corpus-sized events scan
    # happens exactly once, not per re-expanded subtree
    daily = (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n_events").alias("sum_n"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("sum_sq"),
    )
    ranked = daily.withColumn(
        "rn", F.row_number().over(W.orderBy("n_events"))
    ).crossJoin(F.broadcast(stats))
    med = (
        ranked.filter(F.col("rn") == F.floor((F.col("n_days") + 1) / 2))
        .select(F.col("n_events").alias("med_n"))
    )
    dev_ranked = (
        daily.crossJoin(F.broadcast(med))
        .select((F.abs(F.col("n_events") - F.col("med_n"))).alias("dev"))
        .withColumn("rn", F.row_number().over(W.orderBy("dev")))
        .crossJoin(F.broadcast(stats.select("n_days")))
    )
    mad = dev_ranked.filter(
        F.col("rn") == F.floor((F.col("n_days") + 1) / 2)
    ).select(F.col("dev").alias("mad_n"))
    nd = F.col("n_days").cast("double")
    mean = F.col("sum_n").cast("double") / nd
    std = F.sqrt(F.col("sum_sq").cast("double") / nd - mean * mean)
    return (
        daily.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(
                (F.col("n_events").cast("double") - mean) / std, 6
            ).alias("zscore"),
            (
                F.abs(F.col("n_events").cast("double") - mean) > 2.0 * std
            ).alias("z_out"),
            (
                F.abs(F.col("n_events") - F.col("med_n"))
                > 3 * F.col("mad_n")
            ).alias("mad_out"),
        )
        .orderBy("day")
    )


@register(
    "q_weekday_seasonality",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
         COUNT(*) AS n
  FROM events GROUP BY 1
),
wd AS (
  SELECT (d - DATE '1970-01-01') % 7 AS wd_code, SUM(n) AS n_events,
         COUNT(*) AS n_days
  FROM daily GROUP BY 1
),
tot AS (SELECT SUM(n_events) AS total, SUM(n_days) AS total_days FROM wd)
SELECT
  CAST(wd_code AS INT) AS wd_code,
  CASE wd_code WHEN 0 THEN 'thu' WHEN 1 THEN 'fri' WHEN 2 THEN 'sat'
               WHEN 3 THEN 'sun' WHEN 4 THEN 'mon' WHEN 5 THEN 'tue'
               ELSE 'wed' END AS weekday,
  CAST(n_events AS BIGINT) AS n_events,
  ROUND((CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE))
        / (CAST(total AS DOUBLE) / CAST(total_days AS DOUBLE)), 6)
    AS seasonality_index
FROM wd, tot
ORDER BY wd_code
""",
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-weekday seasonality index: mean daily volume on that weekday
    over the all-days mean (index 1.0 = flat week). Weekday is computed
    as epoch-days mod 7 (1970-01-01 = Thursday = code 0) — an integer
    formula identical in both engines, dodging the 1-vs-0-based
    ``dayofweek`` convention mismatch entirely.

    Scale shape: events→days hash agg, then everything is arithmetic
    on a ≤7-row table; the only float ops are two divisions of exact
    integer sums in an identical tree."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    wd = daily.groupBy(
        (
            F.datediff(F.col("d"), F.to_date(F.lit("1970-01-01"))) % 7
        ).alias("wd_code")
    ).agg(F.sum("n").alias("n_events"), F.count(F.lit(1)).alias("n_days"))
    tot = wd.agg(
        F.sum("n_events").alias("total"), F.sum("n_days").alias("total_days")
    )
    names = "thu fri sat sun mon tue wed".split()
    weekday = F.element_at(
        F.array(*[F.lit(n) for n in names]), F.col("wd_code").cast("int") + 1
    )
    return (
        wd.crossJoin(F.broadcast(tot))
        .select(
            F.col("wd_code").cast("int").alias("wd_code"),
            weekday.alias("weekday"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(
                (F.col("n_events").cast("double") / F.col("n_days").cast("double"))
                / (F.col("total").cast("double") / F.col("total_days").cast("double")),
                6,
            ).alias("seasonality_index"),
        )
        .orderBy("wd_code")
    )


@register(
    "q_attribution_last_touch",
    oracle="""
WITH touched AS (
  SELECT
    event_id, event_type, value,
    LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
  FROM events
)
SELECT
  COALESCE(channel, 'direct') AS channel,
  CAST(COUNT(*) AS BIGINT) AS n_purchases,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_value
FROM touched
WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY 1
""",
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's value is
    credited to the same user's most recent PRECEDING non-purchase
    event type (no prior touch → 'direct'), rolled up per channel.

    Scale shape: ONE user-partitioned window pass (last non-purchase
    type via last(..., ignorenulls=True) over rows-preceding) — no
    self-join, no per-purchase range scan; then a hash agg over the
    |channels|-small rollup with a decimal-exact value sum."""
    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touched = events.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("channel"),
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(_dec("value")).cast("double").alias("attributed_value"),
        )
        .orderBy("channel")
    )


@register(
    "q_first_session_conversion",
    oracle=f"""
WITH {_SESSION_ISLANDS_CTE},
per_session AS (
  SELECT
    user_id, session_id,
    MIN(ts) AS session_start,
    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
  FROM sessions GROUP BY 1, 2
),
first_session AS (
  SELECT user_id,
         FIRST(session_start ORDER BY session_start) AS session_start,
         FIRST(has_purchase ORDER BY session_start) AS converted
  FROM per_session GROUP BY user_id
)
SELECT
  CAST((CAST(session_start AS DATE) - DATE '1970-01-01') % 7 AS INT) AS wd_code,
  CAST(COUNT(*) AS BIGINT) AS n_users,
  CAST(SUM(converted) AS BIGINT) AS n_converted,
  CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
FROM first_session
GROUP BY 1 ORDER BY 1
""",
)
def q_first_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-user activation: did the user's FIRST 30-minute session
    contain a purchase? Rolled up by the weekday the first session
    started (epoch-days mod 7, Thursday = 0) — the onboarding-quality
    readout a growth team tracks by launch day.

    Scale shape: native session_window agg (one shuffle on user_id),
    then a per-user min_by over the session table (hash agg, NOT a
    window), then a ≤7-row rollup; one double division of exact
    counts."""
    events = load_table(spark, sf_dir, "events")
    per_session = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "has_purchase"
            ),
        )
    )
    first_session = per_session.groupBy("user_id").agg(
        F.min_by("has_purchase", "session_start").alias("converted"),
        F.min("session_start").alias("session_start"),
    )
    return (
        first_session.groupBy(
            (
                F.datediff(
                    F.col("session_start").cast("date"),
                    F.to_date(F.lit("1970-01-01")),
                )
                % 7
            )
            .cast("int")
            .alias("wd_code")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.col("n_converted").cast("double") / F.col("n_users").cast("double"),
        )
        .orderBy("wd_code")
    )


@register(
    "q_repurchase_hazard",
    oracle="""
WITH purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'purchase'
),
gaps AS (
  SELECT CAST(CAST(ts AS DATE)
              - CAST(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS DATE) AS BIGINT) AS gap_days
  FROM purch
  QUALIFY gap_days IS NOT NULL
),
tot AS (SELECT COUNT(*) AS g FROM gaps),
byday AS (
  SELECT gap_days, COUNT(*) AS c FROM gaps GROUP BY gap_days
),
cum AS (
  SELECT gap_days, c,
    SUM(c) OVER (ORDER BY gap_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS before_d
  FROM byday
  WHERE gap_days <= 30
)
SELECT
  CAST(gap_days AS BIGINT) AS gap_days,
  CAST(c AS BIGINT) AS n_repurchases,
  CAST(g - COALESCE(before_d, 0) AS BIGINT) AS n_at_risk,
  ROUND(CAST(c AS DOUBLE) / CAST(g - COALESCE(before_d, 0) AS DOUBLE), 6)
    AS hazard
FROM cum, tot
ORDER BY gap_days
""",
)
def q_repurchase_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time repurchase hazard (the survival-analysis readout
    retention teams plot): over all consecutive purchase pairs, the
    probability the next purchase lands exactly d days after the last
    GIVEN it hasn't happened yet — hazard(d) = #(gap = d) / #(gap ≥ d),
    for d ≤ 30. Integer counts end-to-end; one double division.

    Scale shape: gaps come from ONE user-partitioned LAG window over
    the purchase subset (filter pushed to the scan); the hazard
    denominator is a prefix sum over the POST-AGGREGATION gap-day
    table (bounded by the day range, ≤ a few thousand rows — the
    documented bounded-window pattern; days > 30 sort after the kept
    prefix, so filtering first is prefix-safe), with the grand total
    as a broadcast scalar."""
    events = load_table(spark, sf_dir, "events")
    purch = events.filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        purch.select(
            F.datediff(
                F.col("ts").cast("date"),
                F.lag(F.col("ts")).over(w).cast("date"),
            )
            .cast("bigint")
            .alias("gap_days")
        )
        .filter(F.col("gap_days").isNotNull())
        .localCheckpoint(eager=False)  # two consumers: total + per-day
    )
    tot = gaps.agg(F.count(F.lit(1)).alias("g"))
    byday = gaps.groupBy("gap_days").agg(F.count(F.lit(1)).alias("c"))
    cum = (
        byday.filter(F.col("gap_days") <= 30)
        .withColumn(
            "before_d",
            F.sum("c").over(
                W.orderBy("gap_days").rowsBetween(W.unboundedPreceding, -1)
            ),
        )
    )
    at_risk = F.col("g") - F.coalesce(F.col("before_d"), F.lit(0))
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("gap_days").cast("bigint").alias("gap_days"),
            F.col("c").cast("bigint").alias("n_repurchases"),
            at_risk.cast("bigint").alias("n_at_risk"),
            F.round(
                F.col("c").cast("double") / at_risk.cast("double"), 6
            ).alias("hazard"),
        )
        .orderBy("gap_days")
    )


@register(
    "q_rolling_wau",
    oracle="""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
SELECT
  CAST(d AS DATE) AS day,
  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS wau
FROM days
JOIN events e ON CAST(e.ts AS DATE) BETWEEN d - 6 AND d
GROUP BY d
ORDER BY d
""",
)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per event day — the DAU/WAU
    engagement metric — computed WITHOUT a per-day distinct or a
    7-way self-join: each user's active days merge into coverage
    intervals (new island when the gap exceeds the window), each
    interval becomes a +1/−1 boundary diff, and WAU(d) is the running
    sum of diffs. The oracle computes the same numbers the naive way
    (day × 7-day distinct join) — hash equality proves the sweep-line
    rewrite exact.

    Scale shape: the 100 TB win IS the rewrite — a naive rolling
    distinct re-touches every event 7× and re-distincts per day;
    here: one (user, day) dedup shuffle, one user-partitioned LAG
    window over user-DAYS (not events), a |days|-bounded diff table,
    and ONE bounded prefix-sum window over the calendar (allowlisted,
    post-aggregation)."""
    events = load_table(spark, sf_dir, "events")
    # TWO consumers reference the user-day table (the islands pipeline
    # and the event-days report filter); pin it so the events scan and
    # the dedup shuffle run exactly once (r9 review — this is what the
    # docstring's "one (user, day) dedup shuffle" promises)
    user_days = (
        events.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    wu = W.partitionBy("user_id").orderBy("day")
    islands = user_days.withColumn(
        "new_island",
        (
            F.coalesce(
                F.datediff(F.col("day"), F.lag("day").over(wu)), F.lit(999)
            )
            > 6
        ).cast("int"),
    ).withColumn(
        "island", F.sum("new_island").over(wu.rowsBetween(W.unboundedPreceding, 0))
    )
    intervals = islands.groupBy("user_id", "island").agg(
        F.min("day").alias("start"),
        F.date_add(F.max("day"), 7).alias("end_excl"),
    )
    event_days = user_days.select("day").distinct()
    # interior event days of an interval are not diff boundaries, so
    # seed every event day with a zero delta — the sweep then emits a
    # running total AT every reporting day, no as-of gap fill needed
    diffs = (
        intervals.select(F.col("start").alias("day"), F.lit(1).alias("delta"))
        .unionByName(
            intervals.select(
                F.col("end_excl").alias("day"), F.lit(-1).alias("delta")
            )
        )
        .unionByName(event_days.select("day", F.lit(0).alias("delta")))
    )
    by_day = diffs.groupBy("day").agg(F.sum("delta").alias("delta"))
    swept = by_day.withColumn(
        "wau",
        F.sum("delta").over(W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        swept.join(event_days, "day", "semi")
        .select(
            F.col("day").cast("date").alias("day"),
            F.col("wau").cast("bigint").alias("wau"),
        )
        .orderBy("day")
    )


@register(
    "q_new_vs_returning",
    oracle="""
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
firsts AS (
  SELECT user_id, MIN(day) AS first_day FROM user_days GROUP BY user_id
)
SELECT
  CAST(ud.day AS DATE) AS day,
  CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_new,
  CAST(SUM(CASE WHEN ud.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_returning,
  ROUND(CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE), 6) AS new_share
FROM user_days ud JOIN firsts f ON ud.user_id = f.user_id
GROUP BY 1 ORDER BY 1
""",
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user mix: a user counts as NEW on
    their first-ever active day, returning after — the acquisition /
    retention composition chart.

    Scale shape: one (user, day) dedup shuffle; first day is a MIN
    inside a second hash agg on user_id and joins back on the same
    key (co-partitioned — AQE reuses the exchange layout); the day
    rollup is |days|-small. Integer counts, one division."""
    events = load_table(spark, sf_dir, "events")
    user_days = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    firsts = user_days.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        user_days.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("bigint")
            .alias("n_new"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("bigint")
            .alias("n_returning"),
            F.round(
                F.sum((F.col("day") == F.col("first_day")).cast("int")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("new_share"),
        )
        .select(
            F.col("day").cast("date").alias("day"),
            "n_new",
            "n_returning",
            "new_share",
        )
        .orderBy("day")
    )


# Staleness tolerance for q_asof_tolerance_join. The synthetic corpus
# puts events ~23 years after the order history (every as-of gap falls
# in ~8200-9100 days), so a realistic days-scale tolerance would make
# one branch vacuous; 8400 days splits the fixture distribution so BOTH
# the matched and the expired branch carry real rows (the behavior test
# asserts that). A real deployment sets this to its freshness SLA.
_ASOF_TOL_DAYS = 8400


@register(
    "q_asof_tolerance_join",
    oracle=f"""
WITH order_snap AS (
  SELECT
    o_custkey,
    o_orderdate,
    arg_max(o_orderkey, o_orderkey) AS o_orderkey,
    CAST(arg_max(o_totalprice, o_orderkey) AS DOUBLE) AS o_totalprice
  FROM orders
  GROUP BY o_custkey, o_orderdate
)
SELECT
  e.event_id,
  e.user_id,
  CAST(e.ts AS TIMESTAMP) AS ts,
  CASE WHEN s.o_orderdate >= CAST(e.ts AS TIMESTAMP) - INTERVAL {_ASOF_TOL_DAYS} DAY
       THEN s.o_orderkey END AS matched_orderkey,
  CASE WHEN s.o_orderdate >= CAST(e.ts AS TIMESTAMP) - INTERVAL {_ASOF_TOL_DAYS} DAY
       THEN s.o_totalprice END AS matched_totalprice,
  CASE WHEN s.o_orderdate >= CAST(e.ts AS TIMESTAMP) - INTERVAL {_ASOF_TOL_DAYS} DAY
       THEN CAST(s.o_orderdate AS TIMESTAMP) END AS matched_date
FROM events e
ASOF LEFT JOIN order_snap s
  ON e.user_id = s.o_custkey AND CAST(e.ts AS TIMESTAMP) >= s.o_orderdate
""",
)
def q_asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE (pandas merge_asof's
    ``tolerance=``): each event gets the user's latest order snapshot
    only if it is at most _ASOF_TOL_DAYS days old — older state is
    considered expired and the match nulls out. The bounded-staleness
    enrichment contract of feature stores and risk lookups.

    Scale shape: identical one-shuffle sort-merge as the plain as-of
    (operators.asof); tolerance is a POST-join null-out of the carried
    payload — the nearest match is by definition the only candidate
    inside any backward window, so no extra join or range explosion.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max_by("o_orderkey", "o_orderkey").alias("matched_orderkey"),
            F.max_by("o_totalprice", "o_orderkey")
            .cast("double")
            .alias("matched_totalprice"),
        )
        .withColumn("matched_date", F.col("o_orderdate"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof_join(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload_cols=["matched_orderkey", "matched_totalprice", "matched_date"],
    )
    fresh = F.col("matched_date") >= F.col("ts") - F.expr(
        f"INTERVAL {_ASOF_TOL_DAYS} DAYS"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("matched_orderkey")).alias("matched_orderkey"),
        F.when(fresh, F.col("matched_totalprice")).alias("matched_totalprice"),
        F.when(fresh, F.col("matched_date")).alias("matched_date"),
    )


_KM_MAX_DAYS = 30


@register(
    "q_kaplan_meier",
    oracle=f"""
WITH purch AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type = 'purchase'
),
mx AS (SELECT CAST(MAX(ts) AS DATE) AS end_d FROM purch),
nxt AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS DATE) AS nd
  FROM purch
),
obs AS (
  SELECT
    CASE WHEN nd IS NULL THEN CAST(end_d - d AS BIGINT)
         ELSE CAST(nd - d AS BIGINT) END AS t,
    CASE WHEN nd IS NULL THEN 0 ELSE 1 END AS died
  FROM nxt CROSS JOIN mx
),
tot AS (SELECT COUNT(*) AS n0 FROM obs),
byday AS (
  SELECT t, SUM(died) AS d_t, COUNT(*) AS leave_t FROM obs GROUP BY t
),
cum AS (
  SELECT t, d_t,
    n0 - COALESCE(SUM(leave_t) OVER (ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_t
  FROM byday CROSS JOIN tot
),
steps AS (
  SELECT t, d_t, n_t,
    CASE WHEN d_t >= n_t THEN 0.0
         ELSE LN(1.0 - CAST(d_t AS DOUBLE) / CAST(n_t AS DOUBLE))
    END AS ln_keep,
    CASE WHEN d_t >= n_t THEN 1 ELSE 0 END AS hit_zero
  FROM cum
  WHERE d_t > 0 AND t <= {_KM_MAX_DAYS}
)
SELECT
  CAST(t AS BIGINT) AS gap_days,
  CAST(d_t AS BIGINT) AS n_deaths,
  CAST(n_t AS BIGINT) AS n_at_risk,
  CASE WHEN MAX(hit_zero) OVER (ORDER BY t) = 1 THEN 0.0
       ELSE ROUND(EXP(SUM(ln_keep) OVER (ORDER BY t)), 6)
  END AS survival
FROM steps
ORDER BY gap_days
""",
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier repurchase survival with RIGHT-CENSORING — the
    estimator q_repurchase_hazard's discrete hazard feeds: each
    consecutive purchase pair is an observed "death" at its gap, and
    each user's LAST purchase is a censored observation that survives
    until the end of the corpus window (without censoring, no-loss KM
    telescopes to 1 - CDF and is not the estimator at all).
    S(d) = prod_(d' <= d) (1 - deaths_d'/at_risk_d'), stepping only at
    death days, with censor-only days still draining the risk set.

    Float discipline: the product is EXP(SUM(LN(1-h))) with an
    identical dag in both engines, rounded 6-dp (sum of <= ~30 libm
    log terms; ulp noise orders below the rounding); the curve's
    hit-zero tail (h = 1: every subject at risk dies) is carried by an
    explicit running-max flag because Spark's LOG(0) is NULL while
    DuckDB's is -inf — the CASE keeps both engines off that edge.

    Scale shape: observations come from ONE user-partitioned LEAD
    window over the purchase subset (filter pushed to the scan); the
    corpus end date is a broadcast scalar; all running quantities
    (risk-set drain, zero flag, log-survival) are prefix windows over
    the POST-AGGREGATION day table — bounded by the calendar day
    range, never data-sized (the documented bounded-window pattern
    shared with q_repurchase_hazard)."""
    events = load_table(spark, sf_dir, "events")
    # pin the filtered purchase projection: TWO consumers (corpus-end
    # max + per-user LEAD window) would otherwise each re-run the
    # events scan+filter — the repo's multi-consumer subtree policy
    purch = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts")
        .localCheckpoint(eager=False)
    )
    mx = purch.agg(F.max("ts").cast("date").alias("end_d"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = purch.select(
        F.col("ts").cast("date").alias("d"),
        F.lead(F.col("ts")).over(w).cast("date").alias("nd"),
    )
    obs = (
        nxt.crossJoin(F.broadcast(mx))
        .select(
            F.when(
                F.col("nd").isNull(), F.datediff(F.col("end_d"), F.col("d"))
            )
            .otherwise(F.datediff(F.col("nd"), F.col("d")))
            .cast("bigint")
            .alias("t"),
            F.when(F.col("nd").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias("died"),
        )
        .localCheckpoint(eager=False)  # two consumers: total + per-day
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n0"))
    byday = obs.groupBy("t").agg(
        F.sum("died").alias("d_t"), F.count(F.lit(1)).alias("leave_t")
    )
    wt = W.orderBy("t")
    cum = byday.crossJoin(F.broadcast(tot)).withColumn(
        "n_t",
        F.col("n0")
        - F.coalesce(
            F.sum("leave_t").over(wt.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    h = F.col("d_t").cast("double") / F.col("n_t").cast("double")
    steps = cum.filter(
        (F.col("d_t") > 0) & (F.col("t") <= _KM_MAX_DAYS)
    ).select(
        "t",
        "d_t",
        "n_t",
        F.when(F.col("d_t") >= F.col("n_t"), F.lit(0.0))
        .otherwise(F.log(F.lit(1.0) - h))
        .alias("ln_keep"),
        F.when(F.col("d_t") >= F.col("n_t"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("hit_zero"),
    )
    return steps.select(
        F.col("t").cast("bigint").alias("gap_days"),
        F.col("d_t").cast("bigint").alias("n_deaths"),
        F.col("n_t").cast("bigint").alias("n_at_risk"),
        F.when(F.max("hit_zero").over(wt) == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum("ln_keep").over(wt)), 6))
        .alias("survival"),
    ).orderBy("gap_days")


_PWR_MDE = 0.02  # absolute minimum detectable effect on the rate
_Z_ALPHA = 1.959964  # two-sided 5% (the q_ab_test_readout literal)
_Z_BETA = 0.841621  # 80% power


@register(
    "q_power_analysis",
    oracle=f"""
WITH conv AS (
  SELECT user_id,
    CASE WHEN SUM(CASE WHEN event_type = '{_AB_CONVERT}' THEN 1 ELSE 0 END)
              >= {_AB_MIN_PURCHASES} THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
base AS (
  SELECT COUNT(*) AS n_users, SUM(converted) AS n_conv FROM conv
),
rates AS (
  SELECT n_users, n_conv,
    CAST(n_conv AS DOUBLE) / n_users AS p1,
    CAST(n_conv AS DOUBLE) / n_users + {_PWR_MDE} AS p2
  FROM base
)
SELECT
  CAST(n_users AS BIGINT) AS n_users_observed,
  ROUND(p1, 6) AS baseline_rate,
  ROUND(p2, 6) AS target_rate,
  CASE WHEN p2 >= 1.0 THEN CAST(NULL AS BIGINT)
       ELSE CAST(CEIL(ROUND(
    (({_Z_ALPHA} * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
      + {_Z_BETA} * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2)))
     * ({_Z_ALPHA} * SQRT(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
        + {_Z_BETA} * SQRT(p1 * (1.0 - p1) + p2 * (1.0 - p2))))
    / ({_PWR_MDE} * {_PWR_MDE}), 6)) AS BIGINT)
  END AS n_per_arm_required
FROM rates
""",
)
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size (power) analysis — the question every
    experiment STARTS with, beside q_ab_test_readout's ending: given
    the corpus' observed conversion rate as baseline, how many users
    per arm detect an absolute +2pp lift at 5% two-sided alpha and
    80% power? Standard two-proportion closed form
    n = (z_a·sqrt(2·pbar·(1-pbar)) + z_b·sqrt(p1(1-p1)+p2(1-p2)))² /
    (p2-p1)², with the z quantiles as shared literals (1.959964 /
    0.841621 — the q_ab_test_readout discipline: constants, not
    engine erf implementations).

    Float discipline: the rate is an exact-integer division; the n
    formula is one fixed IEEE dag with correctly-rounded sqrts; the
    final CEIL is taken on the 6-dp ROUNDED value so a cross-engine
    ulp at an integer boundary cannot flip the reported n. A baseline
    so high the +MDE target reaches 1.0 reports NULL (no achievable
    lift — and sqrt of the negative 1-p2 would otherwise error in
    DuckDB while Spark NaNs). The conversion definition REUSES the
    q_ab_test_readout constants, so the two experiments' semantics
    cannot drift apart.

    Scale shape: one user-keyed hash agg (map-side partials) → a
    1-row rollup → scalar algebra; nothing data-sized leaves the
    first aggregation."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == _AB_CONVERT, 1).otherwise(0)
            )
            >= _AB_MIN_PURCHASES,
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    base = conv.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("converted").alias("n_conv")
    )
    p1 = F.col("n_conv").cast("double") / F.col("n_users")
    p2 = p1 + F.lit(_PWR_MDE)
    pbar = (p1 + p2) / 2.0
    root = F.lit(_Z_ALPHA) * F.sqrt(2.0 * pbar * (1.0 - pbar)) + F.lit(
        _Z_BETA
    ) * F.sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2))
    n_req = F.ceil(F.round((root * root) / (_PWR_MDE * _PWR_MDE), 6)).cast(
        "bigint"
    )
    return base.select(
        F.col("n_users").cast("bigint").alias("n_users_observed"),
        F.round(p1, 6).alias("baseline_rate"),
        F.round(p2, 6).alias("target_rate"),
        F.when(p2 >= 1.0, F.lit(None).cast("bigint"))
        .otherwise(n_req)
        .alias("n_per_arm_required"),
    )


_CUPED_SPLIT = "2024-01-15"  # pre-period / experiment-period boundary


def _cuped_oracle() -> str:
    from flink_template_spark.functions.hashing import md5int_duckdb

    arm = f"({md5int_duckdb('CAST(user_id AS VARCHAR)')}) % 2"
    return f"""
WITH users AS (
  SELECT user_id, {arm} AS arm,
    SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
             THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS x,
    SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
             THEN CAST(value AS DECIMAL(18,6)) ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, COUNT(*) AS n,
    SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM users GROUP BY arm
),
pooled AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
    SUM(sxx) AS sxx, SUM(sxy) AS sxy
  FROM arms
),
theta AS (
  SELECT
    CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      AS th,
    CAST(sx AS DOUBLE) / n AS mx
  FROM pooled
),
per_arm AS (
  SELECT arm, n,
    CAST(sx AS DOUBLE) / n AS max_,
    CAST(sy AS DOUBLE) / n AS may_,
    CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vy,
    CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS vx,
    CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS cxy
  FROM arms
)
SELECT arm,
  CAST(n AS BIGINT) AS n_users,
  ROUND(may_, 6) AS mean_post,
  ROUND(may_ - th * (max_ - mx), 6) AS mean_cuped,
  ROUND(th, 6) AS theta,
  ROUND(vy, 6) AS var_post,
  ROUND(vy - 2 * th * cxy + th * th * vx, 6) AS var_cuped,
  ROUND(1.0 - (vy - 2 * th * cxy + th * th * vx) / vy, 6)
    AS var_reduction
FROM per_arm CROSS JOIN theta
ORDER BY arm
"""


@register("q_cuped_adjustment", oracle=_cuped_oracle())
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the A/B readout: per-user
    pre-period covariate x (event value before _CUPED_SPLIT) and
    experiment-period metric y, θ = cov(x,y)/var(x) POOLED across
    arms, adjusted metric ŷ = y − θ(x − x̄) — the standard
    experimentation-platform technique that shrinks metric variance
    (and so experiment duration) using only pre-experiment data; the
    arm split reuses q_ab_test_readout's portable md5-parity
    assignment, making this an A/A calibration of the adjusted
    estimator.

    Exactness: per-user x/y are exact decimal(18,6) sums; per-arm
    (n, Σx, Σy, Σx², Σxy, Σy²) exact decimals; pooled sums are sums
    of the 2-row arm table; θ, means, variances assemble the exact
    decimals into identical double dags (n·Σab − ΣaΣb numerators),
    rounded 6 dp.

    Scale shape: one events scan, one user-keyed agg (map-side
    partials), one 2-row arm rollup — everything after the user agg
    is constant-sized."""
    from flink_template_spark.functions.hashing import md5int_spark

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_CUPED_SPLIT).cast("timestamp")
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < split, F.col("value").cast("decimal(18,6)")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= split, F.col("value").cast("decimal(18,6)")
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).alias("y"),
        )
        .select(
            (F.expr(md5int_spark("CAST(user_id AS STRING)")) % 2).alias("arm"),
            "x",
            "y",
        )
    )
    # pin: two consumers (pooled θ + per-arm readout) of the 2-row arm
    # table would otherwise each re-run the events scan + user agg
    arms = users.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).localCheckpoint(eager=False)
    pooled = arms.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    )
    n = F.col("n")
    theta = pooled.select(
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("th"),
        (F.col("sx").cast("double") / n).alias("mx"),
    )
    nd = n.cast("double")
    per_arm = arms.select(
        "arm",
        n,
        (F.col("sx").cast("double") / n).alias("max_"),
        (F.col("sy").cast("double") / n).alias("may_"),
        (
            (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            / (nd * n)
        ).alias("vy"),
        (
            (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / (nd * n)
        ).alias("vx"),
        (
            (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (nd * n)
        ).alias("cxy"),
    )
    th = F.col("th")
    var_cuped = (
        F.col("vy") - 2 * th * F.col("cxy") + th * th * F.col("vx")
    )
    return (
        per_arm.crossJoin(F.broadcast(theta))
        .select(
            "arm",
            F.col("n").cast("bigint").alias("n_users"),
            F.round(F.col("may_"), 6).alias("mean_post"),
            F.round(
                F.col("may_") - th * (F.col("max_") - F.col("mx")), 6
            ).alias("mean_cuped"),
            F.round(th, 6).alias("theta"),
            F.round(F.col("vy"), 6).alias("var_post"),
            F.round(var_cuped, 6).alias("var_cuped"),
            F.round(1.0 - var_cuped / F.col("vy"), 6).alias("var_reduction"),
        )
        .orderBy("arm")
    )
