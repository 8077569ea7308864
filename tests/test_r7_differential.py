"""Seeded randomized differentials for the round-7 time-series ops:
the Spark plans against brute-force pure-Python references on
adversarially random structures (many users, collisions, ties) — the
corpus oracle checks one dataset; these check the ALGORITHM on shapes
the corpus never produces. Fixed seeds keep CI deterministic."""

from __future__ import annotations

import datetime
import random


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_interval_coverage_matches_brute_union(spark, monkeypatch):
    import flink_template_spark.plans.events_time as ET

    rng = random.Random(7_2024)
    base = datetime.datetime(2024, 1, 1)
    rows, per_user = [], {}
    eid = 0
    for uid in range(25):
        ivs = []
        for _ in range(rng.randint(1, 30)):
            start = rng.randint(0, 5000)
            dur_min = rng.randint(1, 40)  # integer minutes: exact both sides
            rows.append(
                (eid, base + datetime.timedelta(seconds=start), uid, "e",
                 float(dur_min), "{}")
            )
            ivs.append((start, start + dur_min * 60))
            eid += 1
        per_user[uid] = ivs
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: _mk_events(spark, rows))
    got = {r["user_id"]: r for r in ET.q_interval_coverage(spark, "x").collect()}

    for uid, ivs in per_user.items():
        ivs = sorted(ivs)
        blocks = []
        for s, e in ivs:
            if blocks and s <= blocks[-1][1]:
                blocks[-1][1] = max(blocks[-1][1], e)
            else:
                blocks.append([s, e])
        r = got[uid]
        assert r["n_intervals"] == len(ivs), uid
        assert r["n_blocks"] == len(blocks), uid
        assert r["covered_s"] == sum(e - s for s, e in blocks), uid
        assert r["longest_block_s"] == max(e - s for s, e in blocks), uid


def test_twap_matches_brute_weighted_mean(spark, monkeypatch):
    import flink_template_spark.plans.events_time as ET

    rng = random.Random(11_2024)
    base = datetime.datetime(2024, 1, 1)
    rows, per_user = [], {}
    eid = 0
    for uid in range(20):
        evs = []
        used = set()
        for _ in range(rng.randint(2, 25)):
            t = rng.randint(0, 100000)
            if t in used:
                continue  # distinct seconds: sidestep same-second tie order
            used.add(t)
            v = rng.randint(0, 10000) / 100.0  # exact centi-values
            rows.append(
                (eid, base + datetime.timedelta(seconds=t), uid, "e", v, "{}")
            )
            evs.append((t, eid, v))
            eid += 1
        per_user[uid] = evs
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: _mk_events(spark, rows))
    got = {r["user_id"]: r for r in ET.q_twap_value(spark, "x").collect()}

    for uid, evs in per_user.items():
        evs = sorted(evs)  # (t, event_id) total order
        num = den = 0
        for (t0, _, v), (t1, _, _) in zip(evs, evs[1:]):
            vq = round(v * 100)
            num += vq * (t1 - t0)
            den += t1 - t0
        if den == 0:
            assert uid not in got
            continue
        r = got[uid]
        assert r["span_s"] == den
        assert abs(r["twap"] - round(num / (100.0 * den), 6)) < 1e-9, uid


def test_changepoint_is_the_argmax_split(spark, monkeypatch):
    """On random daily series the reported split must dominate every
    other candidate under the exact objective (argmax property — no
    reference implementation can disagree about what 'best' means)."""
    import flink_template_spark.plans.events_time as ET

    rng = random.Random(13_2024)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    eid = 0
    series = {}
    for t, typ in enumerate(["alpha", "beta"]):
        vols = [rng.randint(1, 12) for _ in range(25)]
        series[typ] = vols
        for d, vol in enumerate(vols):
            for _ in range(vol):
                rows.append(
                    (eid, base + datetime.timedelta(days=d, seconds=eid % 999),
                     1, typ, 1.0, "{}")
                )
                eid += 1
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: _mk_events(spark, rows))
    got = {r["event_type"]: r for r in ET.q_changepoint_volume(spark, "x").collect()}

    for typ, vols in series.items():
        n = len(vols)
        tot = sum(vols)

        def obj(k):  # split after day index k (0-based), rounded as the engines do
            s1 = sum(vols[: k + 1])
            n1, n2 = k + 1, n - k - 1
            s2 = tot - s1
            return round((s1 * s1 * n2 + s2 * s2 * n1) / (n1 * n2), 6)

        r = got[typ]
        k_got = (r["split_day"] - base.date()).days
        best = max(obj(k) for k in range(n - 1))
        assert obj(k_got) == best, (typ, k_got)
        # earliest-day tiebreak
        assert k_got == min(k for k in range(n - 1) if obj(k) == best)
        assert r["days_before"] == k_got + 1
