"""Round-9 second-wave behavior pins (axiom-over-replayed-oracle
discipline — the DuckDB oracle replays a formula bug verbatim; these
assert properties the MATH guarantees, plus brute recounts from the
raw parquet where cheap at sf0.001):

- Kaplan-Meier: survival is non-increasing in (0, 1]; the risk set is
  non-increasing; deaths never exceed the risk set; and the curve
  recomputes exactly (6-dp) from its own (n_deaths, n_at_risk)
  columns — the product identity the estimator is defined by;
- target encoding: every encoded value lies strictly between the
  category's raw mean and the global mean (or equals both when they
  coincide) — the shrinkage direction the smoothing guarantees; the
  global mean recounts from the raw orders table;
- association rules: confidence recounts from a brute basket scan
  (supp(A,B) / supp(A)) for every emitted rule; both directions of a
  pair carry the same support;
- Gini split: gain >= 0 for every feature (splitting never increases
  impurity — concavity of Gini), weighted_gini in [0, 0.5];
- Cramér's V: V in [0, 1] and chi2 >= 0 for every pair;
- PSI: psi >= 0 for every event type ((p-q)·ln(p/q) is pointwise
  non-negative), and n_ref + n_cur recounts the non-null value rows;
- join-cardinality audit: actual_rows equals the EXECUTED join's
  count for every pair (the audit never runs the join; this does).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from flink_template_spark import plans
from flink_template_spark.tables import load_table


def test_kaplan_meier_axioms(spark, sf_dir):
    rows = (
        plans.QUERIES["q_kaplan_meier"](spark, sf_dir)
        .orderBy("gap_days")
        .collect()
    )
    assert rows, "KM curve is empty"
    prev_s, prev_n = 1.0, None
    running = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9, "survival must be non-increasing"
        if prev_n is not None:
            assert r.n_at_risk <= prev_n, "risk set must be non-increasing"
        assert 0 < r.n_deaths <= r.n_at_risk
        # the defining product identity, recomputed from the output
        # (tolerance covers the engine's 6-dp rounding without
        # assuming Python round()'s half-even mode matches HALF_UP)
        running *= 1.0 - r.n_deaths / r.n_at_risk
        assert abs(r.survival - running) <= 5e-7 + 1e-9, (
            f"survival at d={r.gap_days} is not the KM product"
        )
        prev_s, prev_n = r.survival, r.n_at_risk


def test_target_encoding_shrinks_toward_global_mean(spark, sf_dir):
    out = {
        r.category: r
        for r in plans.QUERIES["q_target_encoding"](spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    g = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    ).collect()[0]
    mu = g.mu
    assert out
    for r in out.values():
        lo, hi = sorted((r.raw_mean, mu))
        assert lo - 1e-6 <= r.encoded <= hi + 1e-6, (
            f"{r.category}: encoded {r.encoded} outside "
            f"[raw_mean, global_mean] = [{lo}, {hi}]"
        )
        # with finite smoothing the encoded mean never collapses onto
        # the global mean unless the raw mean already equals it
        if abs(r.raw_mean - mu) > 1e-3:
            assert abs(r.encoded - mu) > 1e-9


def test_assoc_rules_confidence_brute_recount(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                pair[(a, b)] += 1
    rows = plans.QUERIES["q_assoc_rules"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        assert pair[key] == r.support, f"support mismatch for {key}"
        assert item[r.antecedent] == r.cnt_antecedent
        # 6-dp-rounding tolerance (engine HALF_UP vs Python half-even)
        assert abs(r.confidence - r.support / r.cnt_antecedent) <= 5e-7
    # both directions of any pair present in the top list agree on
    # support (directionality only changes the denominator)
    sup = {}
    for r in rows:
        key = tuple(sorted((r.antecedent, r.consequent)))
        assert sup.setdefault(key, r.support) == r.support


def test_gini_split_axioms(spark, sf_dir):
    rows = plans.QUERIES["q_gini_split_scores"](spark, sf_dir).collect()
    assert {r.feature for r in rows} == {"priority", "status", "weekday"}
    for r in rows:
        assert 0.0 <= r.weighted_gini <= 0.5 + 1e-9
        assert r.gini_gain >= -1e-9, (
            f"{r.feature}: splitting increased impurity ({r.gini_gain})"
        )


def test_cramers_v_axioms(spark, sf_dir):
    rows = plans.QUERIES["q_cramers_v_matrix"](spark, sf_dir).collect()
    assert {r.pair for r in rows} == {
        "priority_x_status",
        "priority_x_weekday",
        "status_x_weekday",
    }
    for r in rows:
        assert r.chi2 >= 0.0
        assert r.n_rows_cat >= 2 and r.n_cols_cat >= 2
        assert 0.0 <= r.cramers_v <= 1.0 + 1e-9


def test_psi_nonnegative_and_totals(spark, sf_dir):
    rows = plans.QUERIES["q_psi_value_drift"](spark, sf_dir).collect()
    assert rows
    events = load_table(spark, sf_dir, "events")
    totals = {
        r.event_type: r.n
        for r in events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.psi >= 0.0, f"{r.event_type}: PSI must be non-negative"
        assert r.n_ref + r.n_cur == totals[r.event_type]
        assert r.n_ref > 0 and r.n_cur > 0


def test_join_cardinality_actual_matches_executed_join(spark, sf_dir):
    out = {
        r.join_name: r
        for r in plans.QUERIES["q_join_cardinality_audit"](
            spark, sf_dir
        ).collect()
    }
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    executed = {
        "customer_x_orders": cust.join(
            orders, cust.c_custkey == orders.o_custkey
        ).count(),
        "orders_x_lineitem": orders.join(
            li, orders.o_orderkey == li.l_orderkey
        ).count(),
        "supplier_x_lineitem": supp.join(
            li, supp.s_suppkey == li.l_suppkey
        ).count(),
    }
    assert set(out) == set(executed)
    for name, r in out.items():
        assert r.actual_rows == executed[name], name
        # estimate sanity: the textbook formula from the emitted totals
        est = r.n_left * r.n_right
        assert r.est_rows > 0 and r.est_over_actual > 0
        assert r.est_rows <= est  # dividing by max(ndv) >= 1


def test_psi_constant_reference_value_does_not_throw(spark, tmp_path):
    """ANSI-mode regression pin: a constant-valued reference period
    makes the bin width zero; the explicit vmax = vmin guard must keep
    Spark's ANSI divide off that edge (DuckDB would NULL it — the
    engines would otherwise diverge crash-vs-rows). All rows collapse
    into bin 0 and the PSI comes back NULL — undefined is honest: a
    zero-width reference can't measure drift, and a masked near-zero
    would read "stable" against an arbitrarily drifted current
    period."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 20)), i % 3, "hb", 7.5, "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = plans.QUERIES["q_psi_value_drift"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].event_type == "hb"
    assert out[0].psi is None
    assert out[0].n_ref + out[0].n_cur == 40


def test_cramers_v_single_category_column_yields_null(spark, tmp_path):
    """ANSI-mode regression pin: a single-category column makes
    min(r-1, c-1) zero; V is undefined and must come back NULL (not a
    DIVIDE_BY_ZERO crash) for the pairs involving that column."""
    import datetime as dt

    rows = [
        (
            i,
            i % 7,
            "F",  # single status category
            1000.0 + i,
            dt.datetime(1995, 1, 1 + (i % 25)),
            ["1-URGENT", "2-HIGH", "3-MEDIUM"][i % 3],
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.pair: r
        for r in plans.QUERIES["q_cramers_v_matrix"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["priority_x_status"].cramers_v is None
    assert out["status_x_weekday"].cramers_v is None
    assert out["priority_x_weekday"].cramers_v is not None


def test_bloom_fpr_within_binomial_bound_of_theory(spark, sf_dir):
    """The measured false-positive rate must sit within 4 binomial
    standard errors of the (1-e^(-kn/m))^k theory value — the same
    statistical-pin pattern as the MinHash estimator-error audit."""
    import math

    r = plans.QUERIES["q_bloom_fpr_audit"](spark, sf_dir).collect()[0]
    assert r.n_fp >= 0 and r.n_probe > 0
    theory = (1.0 - math.exp(-(r.n_hashes * r.n_build) / r.m_bits)) ** r.n_hashes
    se = math.sqrt(max(theory * (1 - theory), 1e-12) / r.n_probe)
    assert abs(r.fpr - theory) <= 4 * se + 1e-6, (
        f"fpr {r.fpr} vs theory {theory} exceeds 4 binomial SEs ({se})"
    )


def test_dbscan_labels_brute_recount(spark, sf_dir):
    """Recount every point's eps-neighborhood brutally in Python and
    re-derive core/border/noise; the grid-join classification must
    agree exactly (the oracle replays the same SQL formula — this
    recount is formula-independent)."""
    from flink_template_spark.plans.datapipe import (
        _DBS_EPS,
        _DBS_MINPTS,
        _GEO_SPAN,
    )
    from flink_template_spark.functions.hashing import md5int_spark

    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        (
            F.expr(md5int_spark("concat(CAST(c_custkey AS STRING), 'x')"))
            % _GEO_SPAN
        ).alias("x"),
        (
            F.expr(md5int_spark("concat(CAST(c_custkey AS STRING), 'y')"))
            % _GEO_SPAN
        ).alias("y"),
    ).collect()
    eps2 = _DBS_EPS * _DBS_EPS
    nn = {p.id: 0 for p in pts}
    neigh = {p.id: [] for p in pts}
    for i, a in enumerate(pts):
        for b in pts[i + 1 :]:
            if (a.x - b.x) ** 2 + (a.y - b.y) ** 2 <= eps2:
                nn[a.id] += 1
                nn[b.id] += 1
                neigh[a.id].append(b.id)
                neigh[b.id].append(a.id)
    cores = {i for i, c in nn.items() if c + 1 >= _DBS_MINPTS}
    out = plans.QUERIES["q_dbscan_core_points"](spark, sf_dir).collect()
    assert len(out) == len(pts)
    for r in out:
        assert r.n_neighbors == nn[r.id]
        if r.id in cores:
            want = "core"
        elif any(n in cores for n in neigh[r.id]):
            want = "border"
        else:
            want = "noise"
        assert r.label == want, f"point {r.id}: {r.label} != {want}"


def test_source_lang_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(n_langs) and 1 <= effective_langs <= n_langs —
    the Hill-number sandwich the math guarantees."""
    import math

    rows = plans.QUERIES["q_source_lang_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.lang_entropy <= math.log(r.n_langs) + 1e-9
        assert 1.0 - 1e-6 <= r.effective_langs <= r.n_langs + 1e-6


def test_mann_whitney_u_brute_recount(spark, sf_dir):
    """U1 recounts from its defining pairwise identity
    #(ref > cur) + 0.5·#(ref == cur) — formula-independent of the
    histogram/rank construction both engines share."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    bounds = {}
    for r in ev:
        lo, hi = bounds.get(r.event_type, (r.d, r.d))
        bounds[r.event_type] = (min(lo, r.d), max(hi, r.d))
    mids = {
        t: lo + __import__("datetime").timedelta(days=(hi - lo).days // 2)
        for t, (lo, hi) in bounds.items()
    }
    ref, cur = defaultdict(list), defaultdict(list)
    for r in ev:
        (ref if r.d < mids[r.event_type] else cur)[r.event_type].append(
            r.value
        )
    out = plans.QUERIES["q_mann_whitney_drift"](spark, sf_dir).collect()
    assert out
    for row in out:
        a, b = ref[row.event_type], cur[row.event_type]
        assert (len(a), len(b)) == (row.n_ref, row.n_cur)
        u = sum(
            1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
        )
        assert abs(u - row.u_stat) < 1e-6, row.event_type


def test_mann_whitney_degenerate_types_yield_null_z(spark, tmp_path):
    """ANSI-mode regression pin: a type whose dates collapse to one
    day (empty reference half) and a type whose values are ALL tied
    both make the z denominator 0/0 or sqrt(0); the guard must report
    NULL z (test undefined), never a DIVIDE_BY_ZERO abort, while a
    healthy type still gets a number."""
    import datetime as dt

    rows = []
    # one-day type: mid_d == min(d), so every row is 'cur' (n_ref = 0)
    for i in range(10):
        rows.append((i, dt.datetime(2024, 1, 5), i, "oneday", float(i), "{}"))
    # all-tied type across two halves: variance term collapses to 0
    for i in range(20):
        rows.append(
            (100 + i, dt.datetime(2024, 1, 1 + i), i, "tied", 42.0, "{}")
        )
    # healthy type
    for i in range(40):
        rows.append(
            (
                1000 + i,
                dt.datetime(2024, 1, 1 + (i % 20)),
                i,
                "ok",
                float(i % 7) + (0.5 if i >= 20 else 0.0),
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in plans.QUERIES["q_mann_whitney_drift"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["oneday"].z_score is None and out["oneday"].n_ref == 0
    assert out["tied"].z_score is None
    assert out["ok"].z_score is not None


def test_zipf_fit_sane(spark, sf_dir):
    """Exponent must be positive (frequency is non-increasing in rank,
    so the log-log slope can't be positive) and r² in [0, 1] (it's a
    squared correlation). No Zipf-ness claim: the synthetic corpus has
    a ~31-word near-uniform vocabulary, and the fit HONESTLY reports
    that (exponent ≈ 0.18, r² ≈ 0.06) — which is exactly the
    corpus-health diagnostic working."""
    r = plans.QUERIES["q_zipf_fit"](spark, sf_dir).collect()[0]
    assert r.n_tokens_fit > 10
    assert r.zipf_exponent > 0
    assert 0.0 <= r.r2 <= 1.0 + 1e-9


def test_conformal_coverage_brute_recount(spark, sf_dir):
    """Recount the band and the coverage from the raw rows: lo/hi must
    equal the ceil(q·n)-th smallest calibration value, and coverage
    the exact in-band share of the scoring half."""
    import math

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("ts").cast("date").alias("d"), "value")
        .collect()
    )
    bounds = {}
    for r in ev:
        lo, hi = bounds.get(r.event_type, (r.d, r.d))
        bounds[r.event_type] = (min(lo, r.d), max(hi, r.d))
    import datetime as dt

    mids = {
        t: lo + dt.timedelta(days=(hi - lo).days // 2)
        for t, (lo, hi) in bounds.items()
    }
    ref, cur = defaultdict(list), defaultdict(list)
    for r in ev:
        (ref if r.d < mids[r.event_type] else cur)[r.event_type].append(
            r.value
        )
    from flink_template_spark.plans.quality import _CONF_HI, _CONF_LO

    for row in plans.QUERIES["q_conformal_coverage"](spark, sf_dir).collect():
        vals = sorted(ref[row.event_type])
        n = len(vals)
        lo = vals[max(math.ceil(n * _CONF_LO), 1) - 1]
        hi = vals[max(math.ceil(n * _CONF_HI), 1) - 1]
        assert (lo, hi) == (row.lo, row.hi), row.event_type
        cv = cur[row.event_type]
        inb = sum(1 for v in cv if lo <= v <= hi)
        assert (row.n_ref, row.n_cur) == (n, len(cv))
        assert abs(row.coverage - inb / len(cv)) <= 5e-7


def test_assortativity_in_pearson_range(spark, sf_dir):
    r = plans.QUERIES["q_graph_assortativity"](spark, sf_dir).collect()[0]
    assert r.n_edges > 0
    if r.assortativity is not None:
        assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_conformal_one_day_type_reported_not_dropped(spark, tmp_path):
    """A type whose timeline collapses to one day has no calibration
    half; it must still appear in the report with n_ref = 0 and NULL
    band/coverage (same fixture shape as the Mann-Whitney pin)."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 5), i, "oneday", float(i), "{}")
        for i in range(10)
    ] + [
        (100 + i, dt.datetime(2024, 1, 1 + i % 20), i, "ok", float(i % 9), "{}")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: r
        for r in plans.QUERIES["q_conformal_coverage"](
            spark, str(tmp_path)
        ).collect()
    }
    assert "oneday" in out, "degenerate type silently dropped"
    assert out["oneday"].n_ref == 0 and out["oneday"].coverage is None
    assert out["oneday"].lo is None and out["oneday"].hi is None
    assert out["ok"].coverage is not None


def test_ndcg_bounds_and_pool(spark, sf_dir):
    """NDCG in [0, 1] when any relevant candidate exists (DCG <= ideal
    by construction; 0 is legitimate — relevant items exist but none
    reached the top 10), NULL when the query's label never appears."""
    rows = plans.QUERIES["q_ndcg_eval"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r.n_rel_pool == 0:
            assert r.ndcg is None
        else:
            assert 0.0 <= r.ndcg <= 1.0 + 1e-9, r.query_id


def test_itemsets3_brute_recount(spark, sf_dir):
    """Every emitted triple's support recounts from a brute basket
    scan, and every triple's three sub-pairs are frequent
    (anti-monotonicity)."""
    from itertools import combinations

    li = load_table(spark, sf_dir, "lineitem")
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    pair = defaultdict(int)
    tri = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for a, b in combinations(ps, 2):
            pair[(a, b)] += 1
        for t in combinations(ps, 3):
            tri[t] += 1
    out = plans.QUERIES["q_itemsets_3"](spark, sf_dir).collect()
    assert out, "sf0.001 fixture has frequent triples"
    for r in out:
        t = (r.part_a, r.part_b, r.part_c)
        assert tri[t] == r.support, t
        for sub in combinations(t, 2):
            assert pair[sub] >= 2, f"sub-pair {sub} of {t} not frequent"


def test_power_analysis_formula_recount(spark, sf_dir):
    """n recomputes from the emitted rates with the textbook formula;
    monotonicity: more power for the same MDE needs more users than
    the nominal baseline rate alone would suggest (n > 0, and the
    formula value matches within the 6-dp rounding the CEIL sits on)."""
    import math

    r = plans.QUERIES["q_power_analysis"](spark, sf_dir).collect()[0]
    p1, p2 = r.baseline_rate, r.target_rate
    za, zb = 1.959964, 0.841621
    pbar = (p1 + p2) / 2
    root = za * math.sqrt(2 * pbar * (1 - pbar)) + zb * math.sqrt(
        p1 * (1 - p1) + p2 * (1 - p2)
    )
    approx = root * root / (0.02 * 0.02)
    assert r.n_per_arm_required > 0
    # rates are 6-dp rounded, so allow the error that propagates
    assert abs(r.n_per_arm_required - approx) <= max(2.0, approx * 1e-3)


def test_skipgram_brute_recount(spark, sf_dir):
    """Every emitted pair count recounts from a brute per-doc token
    scan with the same forward window of 2."""
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    cnt = defaultdict(int)
    for row in docs:
        w = row.text.split(" ")
        for i, a in enumerate(w):
            for j in (i + 1, i + 2):
                if j < len(w):
                    cnt[(a, w[j])] += 1
    out = plans.QUERIES["q_skipgram_pairs"](spark, sf_dir).collect()
    assert out
    for r in out:
        assert cnt[(r.w1, r.w2)] == r.n_cooccur, (r.w1, r.w2)


def test_price_elasticity_brute_recount(spark, sf_dir):
    """Per-brand slope recomputes from a brute Python OLS over the
    collected joined rows (same ln transform, same min-obs cut)."""
    import math

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rows = li.join(part, li.l_partkey == part.p_partkey).collect()
    by_brand = defaultdict(list)
    for r in rows:
        if r.l_quantity > 0 and r.l_extendedprice > 0:
            by_brand[r.p_brand].append(
                (math.log(r.l_extendedprice / r.l_quantity),
                 math.log(r.l_quantity))
            )
    from flink_template_spark.plans.relational import _ELA_MIN_LINES

    out = plans.QUERIES["q_price_elasticity"](spark, sf_dir).collect()
    assert out
    for r in out:
        pts = by_brand[r.brand]
        assert len(pts) == r.n_lines and len(pts) >= _ELA_MIN_LINES
        m = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts); sxy = sum(x * y for x, y in pts)
        slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
        assert abs(r.elasticity - slope) < 1e-4, r.brand
        assert r.r2 is not None and 0.0 <= r.r2 <= 1.0 + 1e-9


def test_spearman_brute_recount(spark, sf_dir):
    """rho recomputes from Python ranks with the same (value, okey)
    tiebreak over the collected join."""
    import math

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_acctbal"
    ).collect()
    by_price = sorted(rows, key=lambda r: (r.o_totalprice, r.o_orderkey))
    by_bal = sorted(rows, key=lambda r: (r.c_acctbal, r.o_orderkey))
    rx = {r.o_orderkey: i + 1 for i, r in enumerate(by_price)}
    ry = {r.o_orderkey: i + 1 for i, r in enumerate(by_bal)}
    n = len(rows)
    sx = sy = n * (n + 1) // 2
    sxx = syy = sum(i * i for i in range(1, n + 1))
    sxy = sum(rx[k] * ry[k] for k in rx)
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    rho = num / den
    out = plans.QUERIES["q_spearman_price_balance"](spark, sf_dir).collect()[0]
    assert out.n_orders == n
    assert abs(out.spearman_rho - rho) < 1e-5
