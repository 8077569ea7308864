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
§4.1): buffers hold only PID-bearing readings, deduped by timestamp ON
INSERT (the reference's TreeSet behavior) — state is bounded by the
session's distinct timestamps, not raw event count — and are dropped on
every emit.
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

# Per-stream parallel arrays, already DEDUPED by timestamp (the
# reference's TreeSet semantics, TripAggregation.kt:17-19 / quirk Q4:
# the second insert at an equal timestamp is ignored ON INSERT). State
# is therefore bounded by the session's DISTINCT timestamps, not its
# raw event count — the retention bound of SURVEY.md §4.1 / hard-part 4.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("gps_ts", T.ArrayType(T.LongType())),
        T.StructField("gps_lat", T.ArrayType(T.DoubleType())),
        T.StructField("gps_lon", T.ArrayType(T.DoubleType())),
        T.StructField("sp_ts", T.ArrayType(T.LongType())),
        T.StructField("sp_kmh", T.ArrayType(T.IntegerType())),
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
    """A6-A9 over the session state (already ts-deduped on insert;
    intended semantics — see operators.trip_agg for the quirk ledger)."""
    gps_seen = {
        ts: (la, lo)
        for ts, la, lo in zip(st["gps_ts"], st["gps_lat"], st["gps_lon"])
    }
    sp_seen = dict(zip(st["sp_ts"], st["sp_kmh"]))

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


_STATE_FIELDS = [
    "gps_ts", "gps_lat", "gps_lon", "sp_ts", "sp_kmh",
    "vin", "n_events", "deadline_ms",
]


def _fold(prev: tuple | None, pdfs: Iterator[pd.DataFrame]):
    """Fold a batch of rows into the (possibly existing) session
    buffers. Returns the updated buffers plus the max event-time seen,
    in epoch ms (0 if the batch had no rows). Shared by the
    applyInPandasWithState operator here and the transformWithState
    processor in trip_sessions_v2."""
    if prev is not None:
        gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms = prev
        gps_ts, gps_lat, gps_lon = list(gps_ts), list(gps_lat), list(gps_lon)
        sp_ts, sp_kmh = list(sp_ts), list(sp_kmh)
    else:
        gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh = [], [], [], [], []
        vin, n_events, deadline_ms = None, 0, 0

    max_event_ms = 0
    # membership sets make the Q4 insert-dedup O(1) per event
    gps_known, sp_known = set(gps_ts), set(sp_ts)
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            n_events += 1
            if row.event_type == "TripStartRelativeTime" and vin is None:
                vin = row.vin
            ts = int(row.ts.value // 1_000)  # pandas ns → us
            max_event_ms = max(max_event_ms, ts // 1_000)
            if row.lat is not None and not pd.isna(row.lat) and ts not in gps_known:
                gps_known.add(ts)
                gps_ts.append(ts)
                gps_lat.append(float(row.lat))
                gps_lon.append(float(row.lon))
            if (
                row.speed_kmh is not None
                and not pd.isna(row.speed_kmh)
                and ts not in sp_known
            ):
                sp_known.add(ts)
                sp_ts.append(ts)
                sp_kmh.append(int(row.speed_kmh))
    return (
        gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms,
        max_event_ms,
    )


def _ingest(state: GroupState, pdfs: Iterator[pd.DataFrame]):
    return _fold(state.get if state.exists else None, pdfs)


def _session_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trip_id,) = key
    if state.hasTimedOut:
        st = dict(zip(_STATE_FIELDS, state.get))
        state.remove()
        yield _finalize(trip_id, st)
        return

    (
        gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms, _
    ) = _ingest(state, pdfs)

    # ProcessingTimeTrigger re-arm rule (ProcessingTimeTrigger.kt:30-42)
    now = state.getCurrentProcessingTimeMs()
    if deadline_ms == 0 or deadline_ms < now + MIN_RETENTION_MS:
        deadline_ms = now + MAX_RETENTION_MS
    state.update(
        (gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms)
    )
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


def _session_fn_event_time(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (trip_id,) = key
    if state.hasTimedOut:
        st = dict(zip(_STATE_FIELDS, state.get))
        state.remove()
        yield _finalize(trip_id, st)
        return

    (
        gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms,
        max_event_ms,
    ) = _ingest(state, pdfs)

    # event-time session gap: the deadline only ever moves FORWARD to
    # last-event-time + gap (late rows below the old deadline don't
    # shrink it); fires when the watermark passes it — replay-
    # deterministic, unlike any wall-clock rule.
    deadline_ms = max(deadline_ms, max_event_ms + MAX_RETENTION_MS)
    state.update(
        (gps_ts, gps_lat, gps_lon, sp_ts, sp_kmh, vin, n_events, deadline_ms)
    )
    state.setTimeoutTimestamp(deadline_ms)
    return
    yield  # pragma: no cover — makes this a generator


def sessionize_trips_event_time(
    parsed_stream: DataFrame, watermark: str = "3 seconds"
) -> DataFrame:
    """Watermark-driven sessionization dual: a session closes when event
    time (not wall clock) goes quiet for MAX_RETENTION_MS — i.e. the
    watermark passes last-event + gap. Same state, same finalize, same
    FIRE_AND_PURGE; this is the variant to use when replaying history
    (a backfill at 100 TB replays days of events in minutes of wall
    clock — a processing-time trigger would merge everything into one
    session, the event-time gap reproduces production sessions exactly).
    """
    return (
        parsed_stream.withWatermark("ts", watermark)
        .groupBy("trip_id")
        .applyInPandasWithState(
            _session_fn_event_time,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
