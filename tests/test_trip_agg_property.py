"""Property-based check of the batch trip aggregation (SURVEY.md §5.2):
random event streams through the engine must match an independent
pure-Python model of the intended semantics (Q4 first-arrival equal-ts
dedup, haversine path distance, run-length stopped time, span
durations).
"""

from __future__ import annotations

import json
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_template_spark.operators.trip_agg import STOPPED_SPEED_KMH, aggregate_trips
from flink_template_spark.parse import parse_trip_events


def _hav_km(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = math.radians(lat2 - lat1), math.radians(lon2 - lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * 6371.0 * math.asin(math.sqrt(a))


def _model(events):
    """Pure-python reference: events = [(trip, sec, lat, lon, speed)]."""
    out = {}
    for trip in {e[0] for e in events}:
        evs = [e for e in events if e[0] == trip]
        gps_seen, sp_seen = {}, {}
        for _, sec, lat, lon, speed in evs:
            if lat is not None and sec not in gps_seen:
                gps_seen[sec] = (lat, lon)
            if speed is not None and sec not in sp_seen:
                sp_seen[sec] = speed
        gps = sorted(gps_seen.items())
        dist = sum(
            _hav_km(*gps[i - 1][1], *gps[i][1]) for i in range(1, len(gps))
        )
        sp = sorted(sp_seen.items())
        stopped = 0
        run_start = prev = None
        for sec, v in sp:
            if v < STOPPED_SPEED_KMH:
                run_start = sec if run_start is None else run_start
                prev = sec
            elif run_start is not None:
                stopped += prev - run_start
                run_start = None
        if run_start is not None:
            stopped += prev - run_start
        all_ts = [t for t, _ in gps] + [t for t, _ in sp]
        total = max(all_ts) - min(all_ts) if all_ts else 0
        out[trip] = (len(evs), round(dist, 9), total, stopped, total - stopped)
    return out


event_st = st.tuples(
    st.integers(min_value=1, max_value=3),          # trip id
    st.integers(min_value=0, max_value=120),        # second of hour
    st.one_of(
        st.tuples(
            st.floats(min_value=-80, max_value=80, allow_nan=False),
            st.floats(min_value=-170, max_value=170, allow_nan=False),
        ),
        st.none(),
    ),                                              # (lat, lon) or None
    st.one_of(st.integers(min_value=0, max_value=120), st.none()),  # speed
).map(lambda t: (t[0], t[1], *(t[2] or (None, None)), t[3]))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(event_st, min_size=1, max_size=25))
def test_trip_agg_matches_python_model(spark, events):
    lines = []
    for trip, sec, lat, lon, speed in events:
        pid = {}
        if lat is not None:
            pid["GpsReading"] = {
                "heading": 0.0, "horizontalDilutionOfPrecision": 1.0,
                "latitude": lat, "longitude": lon, "numberOfSatellites": 5,
                "hemisphere": "NorthWest", "fixQuality": "Standard",
            }
        if speed is not None:
            pid["VehicleSpeed"] = speed
        lines.append(
            json.dumps(
                {
                    "body": {
                        "tripNumber": trip,
                        "timestamp": f"2017-09-01T12:{sec // 60:02d}:{sec % 60:02d}-05:00",
                        "type": "TripData",
                        "pidData": pid,
                    }
                }
            )
        )
    raw = spark.createDataFrame([(l,) for l in lines], "value STRING").coalesce(1)
    got = {
        r.trip_id: r for r in aggregate_trips(parse_trip_events(raw)).collect()
    }
    want = _model(events)
    assert set(got) == set(want)
    for trip, (n, dist, total, stopped, moving) in want.items():
        r = got[trip]
        assert r.n_events == n
        assert abs(r.distance_km - dist) < 1e-6
        assert (r.total_s, r.stopped_s, r.moving_s) == (total, stopped, moving)
