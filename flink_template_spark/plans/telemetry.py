"""Trip-telemetry analytics over the ``events`` table — the batch,
oracle-checkable dual of the reference's per-trip aggregation
(SURVEY.md §2.4, TripAggregatorApplication.kt:58-164):

- A6 path distance: haversine over consecutive GPS points ordered by ts;
- A7 stopped time: maximal consecutive runs below a speed threshold;
- A8/A9 total / moving duration: max(ts)-min(ts), total - stopped.

The testdata has no GPS columns, so (lat, lon, speed) are derived
deterministically from ``value`` with exact IEEE-double arithmetic that
both engines evaluate identically; the analytics underneath are exactly
the reference's. The trip-JSON version of the same aggregation (real
TripStart/TripData events) lives in ``operators.trip_agg`` and is
exercised by the fixture tests.

Scale notes: one shuffle per query (hash by user_id); consecutive-pair
math uses lag windows, not self-joins; run-length detection is the
two-window islands pattern — O(n log n) per key, no explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.geo import haversine_km, haversine_km_sql
from flink_template_spark.plans.registry import register
from flink_template_spark.tables import load_table

# Deterministic synthetic GPS derivation (identical IEEE ops both engines).
_LAT_SQL = "((value % 120.0) / 2.0 - 30.0)"
_LON_SQL = "((value * 1.7) % 300.0 - 150.0)"
_SPEED_STOPPED_SQL = "value < 50.0"


def _with_gps(events: DataFrame) -> DataFrame:
    v = F.col("value")
    return events.select(
        "user_id",
        "ts",
        "event_id",
        ((v % F.lit(120.0)) / F.lit(2.0) - F.lit(30.0)).alias("lat"),
        ((v * F.lit(1.7)) % F.lit(300.0) - F.lit(150.0)).alias("lon"),
        v.alias("speed"),
    )


@register(
    "q_trip_path_distance",
    oracle=f"""
WITH gps AS (
  SELECT
    user_id,
    CAST(ts AS TIMESTAMP) AS ts,
    event_id,
    {_LAT_SQL} AS lat,
    {_LON_SQL} AS lon
  FROM events
), hops AS (
  SELECT
    user_id,
    lat, lon,
    LAG(lat) OVER w AS prev_lat,
    LAG(lon) OVER w AS prev_lon
  FROM gps
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT
  user_id,
  COUNT(*) AS n_points,
  ROUND(SUM(CASE WHEN prev_lat IS NULL THEN 0.0
       ELSE {haversine_km_sql('prev_lat', 'prev_lon', 'lat', 'lon')} END), 6)
    AS distance_km
FROM hops
GROUP BY user_id
""",
)
def q_trip_path_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    gps = _with_gps(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hops = gps.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("prev_lat"),
        F.lag("lon").over(w).alias("prev_lon"),
    )
    hop_km = F.when(F.col("prev_lat").isNull(), F.lit(0.0)).otherwise(
        haversine_km(
            F.col("prev_lat"), F.col("prev_lon"), F.col("lat"), F.col("lon")
        )
    )
    return gps.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_points")).join(
        hops.groupBy("user_id").agg(F.round(F.sum(hop_km), 6).alias("distance_km")),
        "user_id",
    ).select("user_id", "n_points", "distance_km")


@register(
    "q_trip_stopped_time",
    oracle=f"""
WITH speeds AS (
  SELECT
    user_id,
    CAST(ts AS TIMESTAMP) AS ts,
    event_id,
    ({_SPEED_STOPPED_SQL}) AS is_stopped
  FROM events
), flagged AS (
  SELECT *,
    CASE WHEN is_stopped <> COALESCE(LAG(is_stopped) OVER w, NOT is_stopped)
      THEN 1 ELSE 0 END AS boundary
  FROM speeds
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *,
    SUM(boundary) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS run_id
  FROM flagged
), stopped_runs AS (
  SELECT
    user_id,
    run_id,
    epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS run_us,
    COUNT(*) AS run_events
  FROM runs
  WHERE is_stopped
  GROUP BY user_id, run_id
)
SELECT
  user_id,
  COUNT(*) AS n_stopped_runs,
  -- DuckDB SUM(BIGINT) is HUGEINT (-> float64 in pandas); cast back to
  -- BIGINT so the dtype matches Spark's int64 under the driver's hash.
  CAST(SUM(run_us) AS BIGINT) AS stopped_us,
  CAST(SUM(run_events) AS BIGINT) AS stopped_events
FROM stopped_runs
GROUP BY user_id
""",
)
def q_trip_stopped_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length stopped-time (reference A7,
    TripAggregatorApplication.kt:128-141). The reference sums *negative*
    deltas (quirk Q7, ``timeDeltas`` zip-order bug :99-106); we implement
    the intended positive-duration semantics."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    speeds = events.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("value") < 50.0).alias("is_stopped"),
    )
    flagged = speeds.withColumn(
        "boundary",
        F.when(
            F.col("is_stopped")
            != F.coalesce(F.lag("is_stopped").over(w), ~F.col("is_stopped")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("boundary").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    stopped_runs = (
        runs.filter(F.col("is_stopped"))
        .groupBy("user_id", "run_id")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("run_us"),
            F.count(F.lit(1)).alias("run_events"),
        )
    )
    return stopped_runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_stopped_runs"),
        F.sum("run_us").alias("stopped_us"),
        F.sum("run_events").alias("stopped_events"),
    )


@register(
    "q_trip_summary",
    oracle=f"""
WITH gps AS (
  SELECT
    user_id,
    CAST(ts AS TIMESTAMP) AS ts,
    event_id,
    {_LAT_SQL} AS lat,
    {_LON_SQL} AS lon,
    value AS speed,
    ({_SPEED_STOPPED_SQL}) AS is_stopped
  FROM events
), hops AS (
  SELECT user_id,
    CASE WHEN LAG(lat) OVER w IS NULL THEN 0.0
      ELSE {haversine_km_sql('LAG(lat) OVER w', 'LAG(lon) OVER w', 'lat', 'lon')} END
      AS hop_km
  FROM gps
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), flagged AS (
  SELECT *,
    CASE WHEN is_stopped <> COALESCE(LAG(is_stopped) OVER w, NOT is_stopped)
      THEN 1 ELSE 0 END AS boundary
  FROM gps
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT *, SUM(boundary) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flagged
), stopped AS (
  -- CAST: DuckDB SUM(BIGINT) -> HUGEINT -> float64; keep int64 like Spark.
  SELECT user_id, CAST(SUM(run_us) AS BIGINT) AS stopped_us FROM (
    SELECT user_id, run_id, epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS run_us
    FROM runs WHERE is_stopped GROUP BY user_id, run_id
  ) GROUP BY user_id
), totals AS (
  SELECT
    user_id,
    COUNT(*) AS n_events,
    epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS total_us,
    CAST(SUM(CAST(speed AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_speed
  FROM gps GROUP BY user_id
), dist AS (
  SELECT user_id, ROUND(SUM(hop_km), 6) AS distance_km FROM hops GROUP BY user_id
)
SELECT
  t.user_id,
  t.n_events,
  t.total_us,
  COALESCE(s.stopped_us, 0) AS stopped_us,
  t.total_us - COALESCE(s.stopped_us, 0) AS moving_us,
  d.distance_km,
  t.avg_speed
FROM totals t
LEFT JOIN stopped s ON t.user_id = s.user_id
JOIN dist d ON t.user_id = d.user_id
""",
)
def q_trip_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-trip aggregate (reference A1-A9) keyed by user_id:
    total / stopped / moving duration + path distance + mean speed."""
    events = load_table(spark, sf_dir, "events")
    gps = _with_gps(events).withColumn("is_stopped", F.col("speed") < 50.0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")

    hop_km = F.when(F.lag("lat").over(w).isNull(), F.lit(0.0)).otherwise(
        haversine_km(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        )
    )
    hops = gps.select("user_id", hop_km.alias("hop_km"))
    dist = hops.groupBy("user_id").agg(F.round(F.sum("hop_km"), 6).alias("distance_km"))

    flagged = gps.withColumn(
        "boundary",
        F.when(
            F.col("is_stopped")
            != F.coalesce(F.lag("is_stopped").over(w), ~F.col("is_stopped")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("boundary").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    stopped = (
        runs.filter(F.col("is_stopped"))
        .groupBy("user_id", "run_id")
        .agg((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("run_us"))
        .groupBy("user_id")
        .agg(F.sum("run_us").alias("stopped_us"))
    )
    totals = gps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("total_us"),
        (
            F.sum(F.col("speed").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_speed"),
    )
    return (
        totals.join(stopped, "user_id", "left")
        .join(dist, "user_id")
        .select(
            "user_id",
            "n_events",
            "total_us",
            F.coalesce("stopped_us", F.lit(0)).alias("stopped_us"),
            (F.col("total_us") - F.coalesce("stopped_us", F.lit(0))).alias("moving_us"),
            "distance_km",
            "avg_speed",
        )
    )


@register(
    "q_resample_daily_ffill",
    oracle="""
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
span AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS d0,
         date_trunc('day', MAX(ts)) AS d1
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
obs AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM ev)
SELECT g.user_id, COUNT(*) AS n_days,
       CAST(SUM(CASE WHEN o.day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_filled
FROM grid g
LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day
GROUP BY g.user_id
""",
)
def q_resample_daily_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas resampling. The per-user aggregate
    (grid-day count + filled-day count) is a pure function of day
    coverage — independent of pandas' equal-ts tie-breaking — so it IS
    oracle-checkable even though per-row values are not; row-level
    semantics stay golden-tested in tests/test_sql_and_skew."""
    from flink_template_spark.operators.resample import resample_ffill

    events = load_table(spark, sf_dir, "events")
    out = resample_ffill(events, freq="1D")
    return out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("filled").cast("long")).alias("n_filled"),
    ).orderBy("user_id")


@register(
    "q_resample_daily_expr",
    oracle="""
WITH ev AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events
),
daily AS (
  SELECT user_id, day, value FROM (
    SELECT user_id, date_trunc('day', ts) AS day, value,
      ROW_NUMBER() OVER (
        PARTITION BY user_id, date_trunc('day', ts)
        ORDER BY ts DESC, event_id DESC
      ) AS rk
    FROM ev
  ) WHERE rk = 1
),
span AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS d0,
         date_trunc('day', MAX(ts)) AS d1
  FROM ev GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
)
SELECT g.user_id AS user_id, CAST(g.day AS DATE) AS day,
  last_value(d.value IGNORE NULLS) OVER (
    PARTITION BY g.user_id ORDER BY g.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS value,
  d.value IS NULL AS filled
FROM grid g
LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
ORDER BY g.user_id, g.day
""",
)
def q_resample_daily_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-only resample+ffill (oracle-checked; the codegen dual
    of the pandas grouped-map q_resample_daily_ffill)."""
    from flink_template_spark.operators.resample import resample_ffill_expr

    events = load_table(spark, sf_dir, "events")
    return resample_ffill_expr(events).orderBy("user_id", "day")
