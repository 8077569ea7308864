"""Stateful streaming trip sessionization — the Spark-native rebuild of
the reference's windowing core (SURVEY.md §2.3 W3+W4+W5):

reference                                   → here
GlobalWindows per trip id                   → keyed GroupState
ProcessingTimeTrigger(min=10 ms, max=4 s)   → ProcessingTimeTimeout with
  (ProcessingTimeTrigger.kt:9-76)             the same re-arm rule
FIRE_AND_PURGE + clear()                    → emit on timeout + state.remove()
AggregateFunction add/getResult             → buffered state + pandas finalize
  (TripAggregatorApplication.kt:58-164)

Re-arm rule (ProcessingTimeTrigger.kt:30-42): on an element, if there is
no deadline, or the existing deadline is closer than now+min_retention,
register a timer at now+max_retention; otherwise keep the existing
deadline. On timer fire: emit the aggregate and purge (FIRE_AND_PURGE,
:15-24). Late events after a purge re-open a fresh session (W6).

State stays bounded per key (the reference's retention bound, SURVEY.md
§4.1): buffers hold only PID-bearing readings for the active session and
are dropped on every emit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MIN_RETENTION_MS = 10
MAX_RETENTION_MS = 4000
STOPPED_SPEED_KMH = 5

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("trip_id", T.LongType()),
        T.StructField("vehicle_id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("distance_km", T.DoubleType()),
        T.StructField("total_s", T.LongType()),
        T.StructField("moving_s", T.LongType()),
        T.StructField("stopped_s", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.ArrayType(T.LongType())),
        T.StructField("lat", T.ArrayType(T.DoubleType())),
        T.StructField("lon", T.ArrayType(T.DoubleType())),
        T.StructField("speed", T.ArrayType(T.IntegerType())),
        T.StructField("vin", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("deadline_ms", T.LongType()),
    ]
)


def _haversine_km(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    r = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(a))


def _finalize(trip_id: int, st: dict[str, Any]) -> pd.DataFrame:
    """A6-A9 over the buffered session state (intended semantics; see
    operators.trip_agg for the quirk ledger)."""
    # Q4 dedup: first-arrived wins per exact timestamp, per stream.
    gps_seen: dict[int, tuple[float, float]] = {}
    sp_seen: dict[int, int] = {}
    for ts, la, lo, sp in zip(st["ts_us"], st["lat"], st["lon"], st["speed"]):
        if la is not None and ts not in gps_seen:
            gps_seen[ts] = (la, lo)
        if sp is not None and ts not in sp_seen:
            sp_seen[ts] = sp

    gps = sorted(gps_seen.items())
    dist = sum(
        _haversine_km(gps[i - 1][1][0], gps[i - 1][1][1], gps[i][1][0], gps[i][1][1])
        for i in range(1, len(gps))
    )

    sp = sorted(sp_seen.items())
    stopped_us = 0
    run_start = None
    prev_ts = None
    for ts, v in sp:
        if v < STOPPED_SPEED_KMH:
            if run_start is None:
                run_start = ts
            prev_ts = ts
        else:
            if run_start is not None:
                stopped_us += prev_ts - run_start
                run_start = None
    if run_start is not None:
        stopped_us += prev_ts - run_start

    all_ts = [t for t, _ in gps] + [t for t, _ in sp]
    total_s = (max(all_ts) // 1_000_000 - min(all_ts) // 1_000_000) if all_ts else 0
    stopped_s = stopped_us // 1_000_000
    return pd.DataFrame(
        [
            {
                "trip_id": trip_id,
                "vehicle_id": st["vin"],
                "n_events": st["n_events"],
                "distance_km": float(dist),
                "total_s": int(total_s),
                "moving_s": int(total_s - stopped_s),
                "stopped_s": int(stopped_s),
            }
        ]
    )


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trip_id,) = key
    if state.hasTimedOut:
        st = dict(
            zip(
                ["ts_us", "lat", "lon", "speed", "vin", "n_events", "deadline_ms"],
                state.get,
            )
        )
        state.remove()
        yield _finalize(trip_id, st)
        return

    if state.exists:
        ts_us, lat, lon, speed, vin, n_events, deadline_ms = state.get
        ts_us, lat, lon, speed = list(ts_us), list(lat), list(lon), list(speed)
    else:
        ts_us, lat, lon, speed, vin, n_events, deadline_ms = [], [], [], [], None, 0, 0

    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            n_events += 1
            if row.event_type == "TripStartRelativeTime" and vin is None:
                vin = row.vin
            has_gps = row.lat is not None and not pd.isna(row.lat)
            has_speed = row.speed_kmh is not None and not pd.isna(row.speed_kmh)
            if has_gps or has_speed:
                ts_us.append(int(row.ts.value // 1_000))  # pandas ns → us
                lat.append(float(row.lat) if has_gps else None)
                lon.append(float(row.lon) if has_gps else None)
                speed.append(int(row.speed_kmh) if has_speed else None)

    # ProcessingTimeTrigger re-arm rule (ProcessingTimeTrigger.kt:30-42)
    now = state.getCurrentProcessingTimeMs()
    if deadline_ms == 0 or deadline_ms < now + MIN_RETENTION_MS:
        deadline_ms = now + MAX_RETENTION_MS
    state.update((ts_us, lat, lon, speed, vin, n_events, deadline_ms))
    state.setTimeoutDuration(max(int(deadline_ms - now), 1))
    return
    yield  # pragma: no cover — makes this a generator


def sessionize_trips(
    parsed_stream: DataFrame, watermark: str = "3 seconds"
) -> DataFrame:
    """parsed trip-event stream → per-session aggregate rows (append mode,
    emitted when a trip goes quiet for MAX_RETENTION_MS of processing
    time, exactly like the reference's session trigger).

    The 3 s event-time watermark is the reference's W1
    (BoundedOutOfOrdernessTimestampExtractor,
    TripAggregatorApplication.kt:168-174); firing remains purely
    processing-time-driven (the reference's onEventTime is CONTINUE)."""
    return (
        parsed_stream.withWatermark("ts", watermark)
        .groupBy("trip_id")
        .applyInPandasWithState(
            _session_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
