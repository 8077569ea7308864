"""Batch per-trip aggregation — the reference's analytical payload
(AggregateFunction at TripAggregatorApplication.kt:58-164, A1-A9 in
SURVEY.md §2.4) as pure DataFrame expressions.

Semantics implemented (intended semantics; reference bugs documented):

- A2/A3: GPS and speed readings collected per trip, ordered by event ts;
  vehicle id from TripStart's vin.
- Q4 (TreeSet ts-dedup, TripAggregation.kt:8-13): events with equal
  timestamps collapse — we keep the first by ingest order (``seq``).
- A6 distance: haversine over consecutive ts-ordered GPS points.
  Reference bugs NOT reproduced: Q6 (lat/lon swap inside haversine) and
  Q3 (km stored in a field named meters) — we compute standard
  haversine and name the column ``distance_km``.
- A7 stopped time: maximal runs of speed < 5 km/h
  (TripAggregatorApplication.kt:132); per-run duration max(ts)-min(ts)
  summed. Q7 (negative deltas) not reproduced — durations are positive.
- A8 total duration: max−min epoch-second over the union of GPS and
  speed timestamps (TripAggregatorApplication.kt:108-118,142-145);
  reference uses epoch *seconds* (Q5) — we keep second granularity.
- A9 moving = total − stopped.
- Q1: TripEnd / TripEvent rows contribute nothing.

Scale: one shuffle (hash by trip_id) for the windows + one for the final
group-by; GPS/speed streams are filtered before the shuffle so only
PID-bearing rows move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.geo import haversine_km

STOPPED_SPEED_KMH = 5


def aggregate_trips(parsed: DataFrame) -> DataFrame:
    """Parsed trip events → one row per trip.

    Output: trip_id, vehicle_id, n_events, distance_km, total_s,
    moving_s, stopped_s.
    """
    # ingest-order tiebreak for the Q4 equal-ts dedup. Deterministic per
    # input split ordering (like the reference's arrival order).
    ev = parsed.withColumn("seq", F.monotonically_increasing_id())

    # --- GPS stream: dedup equal ts (keep first by seq), order, distance.
    gps = ev.filter(F.col("lat").isNotNull()).select(
        "trip_id", "ts", "seq", "lat", "lon"
    )
    w_dedup = W.partitionBy("trip_id", "ts").orderBy("seq")
    gps1 = gps.withColumn("rk", F.row_number().over(w_dedup)).filter(F.col("rk") == 1)
    w_ord = W.partitionBy("trip_id").orderBy("ts")
    hops = gps1.select(
        "trip_id",
        "ts",
        F.when(F.lag("lat").over(w_ord).isNull(), F.lit(0.0))
        .otherwise(
            haversine_km(
                F.lag("lat").over(w_ord),
                F.lag("lon").over(w_ord),
                F.col("lat"),
                F.col("lon"),
            )
        )
        .alias("hop_km"),
    )
    dist = hops.groupBy("trip_id").agg(
        F.sum("hop_km").alias("distance_km"),
        F.min("ts").alias("gps_min_ts"),
        F.max("ts").alias("gps_max_ts"),
    )

    # --- speed stream: dedup equal ts, run-length stopped detection.
    speeds = ev.filter(F.col("speed_kmh").isNotNull()).select(
        "trip_id", "ts", "seq", "speed_kmh"
    )
    sp1 = (
        speeds.withColumn("rk", F.row_number().over(w_dedup))
        .filter(F.col("rk") == 1)
        .withColumn("is_stopped", F.col("speed_kmh") < STOPPED_SPEED_KMH)
    )
    flagged = sp1.withColumn(
        "boundary",
        F.when(
            F.col("is_stopped")
            != F.coalesce(F.lag("is_stopped").over(w_ord), ~F.col("is_stopped")),
            1,
        ).otherwise(0),
    )
    runs = flagged.withColumn(
        "run_id",
        F.sum("boundary").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    stopped = (
        runs.filter(F.col("is_stopped"))
        .groupBy("trip_id", "run_id")
        .agg(
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("run_s")
        )
        .groupBy("trip_id")
        .agg(F.sum("run_s").alias("stopped_s"))
    )
    speed_span = sp1.groupBy("trip_id").agg(
        F.min("ts").alias("sp_min_ts"), F.max("ts").alias("sp_max_ts")
    )

    # --- per-trip base: vehicle id (first TripStart's vin), event count.
    base = ev.groupBy("trip_id").agg(
        F.min_by(
            "vin", F.when(F.col("event_type") == "TripStartRelativeTime", F.col("seq"))
        ).alias("vehicle_id"),
        F.count(F.lit(1)).alias("n_events"),
    )

    # --- A8: duration over the union of GPS-ts and speed-ts spans.
    out = (
        base.join(dist, "trip_id", "left")
        .join(speed_span, "trip_id", "left")
        .join(stopped, "trip_id", "left")
        .select(
            "trip_id",
            "vehicle_id",
            "n_events",
            F.coalesce("distance_km", F.lit(0.0)).alias("distance_km"),
            (
                F.unix_timestamp(
                    F.greatest(F.col("gps_max_ts"), F.col("sp_max_ts"))
                )
                - F.unix_timestamp(F.least(F.col("gps_min_ts"), F.col("sp_min_ts")))
            ).alias("span_s"),
            F.coalesce("stopped_s", F.lit(0)).alias("stopped_s"),
        )
        .select(
            "trip_id",
            "vehicle_id",
            "n_events",
            "distance_km",
            F.coalesce("span_s", F.lit(0)).cast("long").alias("total_s"),
            F.col("stopped_s").cast("long").alias("stopped_s"),
            (F.coalesce("span_s", F.lit(0)) - F.col("stopped_s"))
            .cast("long")
            .alias("moving_s"),
        )
    )
    return out
