"""Seeded randomized differentials for the round-8 operators: the
Spark plans against brute-force pure-Python references on adversarially
random structures (collisions, ties, dominance chains, skewed weights)
— the corpus oracle checks one dataset; these check the ALGORITHM on
shapes the corpus never produces. Fixed seeds keep CI deterministic."""

from __future__ import annotations

import datetime
import random

import pytest


def test_event_markov_matches_brute_lag(spark, monkeypatch):
    import flink_template_spark.plans.events_time as ET

    rng = random.Random(8_2024)
    base = datetime.datetime(2024, 3, 1)
    types = ["a", "b", "c", "d"]
    rows, seqs = [], {}
    eid = 0
    for uid in range(30):
        n = rng.randint(0, 40)
        evs = []
        for _ in range(n):
            # coarse seconds force ts ties; event_id breaks them
            t = rng.randint(0, 50)
            evs.append((t, eid, rng.choice(types)))
            eid += 1
        evs.sort(key=lambda e: (e[0], e[1]))
        seqs[uid] = [e[2] for e in evs]
        for t, i, ty in evs:
            rows.append(
                (i, base + datetime.timedelta(seconds=t), uid, ty, 0.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    monkeypatch.setattr(ET, "load_table", lambda s, sd, t: df)
    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["p"])
        for r in ET.q_event_markov(spark, "x").collect()
    }
    want: dict[tuple[str, str], int] = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert {k: v[0] for k, v in got.items()} == want
    from_tot: dict[str, int] = {}
    for (a, _), n in want.items():
        from_tot[a] = from_tot.get(a, 0) + n
    for (a, b), (n, p) in got.items():
        assert p == pytest.approx(round(n / from_tot[a], 6), abs=1e-9)


def test_skyline_matches_brute_dominance(spark, monkeypatch):
    import flink_template_spark.plans.windows_analytic as WA

    rng = random.Random(8_1987)
    # heavy ties in BOTH dimensions: the dominance edge cases
    rows = [
        (i, f"part{i}", "B", "T", rng.randint(1, 12), float(rng.randint(1, 25)))
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    monkeypatch.setattr(WA, "load_table", lambda s, sd, t: df)
    got = {r["p_partkey"] for r in WA.q_skyline_parts(spark, "x").collect()}
    want = set()
    for k, _, _, _, sz, pr in rows:
        dominated = any(
            (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
            for k2, _, _, _, sz2, pr2 in rows
            if k2 != k
        )
        if not dominated:
            want.add(k)
    assert got == want


def test_weighted_median_matches_brute(spark, monkeypatch):
    import flink_template_spark.plans.windows_analytic as WA

    rng = random.Random(8_55)
    flags = ["A", "N", "R"]
    rows = []
    for i in range(3000):
        rows.append(
            (
                rng.choice(flags),
                float(rng.randint(1, 80)),  # heavy price ties
                float(rng.randint(1, 9)),
            )
        )
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    monkeypatch.setattr(WA, "load_table", lambda s, sd, t: df)
    got = {
        r["l_returnflag"]: (r["w_total"], r["median_price"])
        for r in WA.q_weighted_median_price(spark, "x").collect()
    }
    for f in flags:
        pw: dict[float, int] = {}
        for flag, p, w in rows:
            if flag == f:
                pw[p] = pw.get(p, 0) + int(w)
        total = sum(pw.values())
        cum, med = 0, None
        for p in sorted(pw):
            cum += pw[p]
            if 2 * cum >= total:
                med = p
                break
        assert got[f] == (total, med), f


def test_basket_pairs_matches_brute_support(spark, monkeypatch):
    import flink_template_spark.plans.datapipe as DP

    rng = random.Random(8_11)
    rows = []
    for o in range(300):
        # small baskets with repeats (the per-order dedup edge)
        basket = [rng.randint(1, 25) for _ in range(rng.randint(1, 6))]
        for p in basket:
            rows.append((o, p))
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    monkeypatch.setattr(DP, "load_table", lambda s, sd, t: df)
    out = DP.q_basket_pairs(spark, "x").collect()

    orders_of: dict[int, set] = {}
    baskets: dict[int, set] = {}
    for o, p in rows:
        baskets.setdefault(o, set()).add(p)
        orders_of.setdefault(p, set()).add(o)
    support: dict[tuple[int, int], int] = {}
    for o, items in baskets.items():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                support[(a, b)] = support.get((a, b), 0) + 1
    kept = sorted(
        ((s, a, b) for (a, b), s in support.items() if s >= DP._BASKET_MINSUP),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: DP._BASKET_TOP]
    assert [(r["part_a"], r["part_b"], r["support"]) for r in out] == [
        (a, b, s) for s, a, b in kept
    ]
    n_orders = len(baskets)
    for r in out:
        lift = round(
            r["support"] * n_orders
            / (len(orders_of[r["part_a"]]) * len(orders_of[r["part_b"]])),
            6,
        )
        assert r["lift"] == pytest.approx(lift, abs=1e-9)
