"""Round-8 behavior pins: axiom tests for the new operators (the
axiom-over-replayed-oracle discipline — a DuckDB oracle replays a
formula bug verbatim; these assert properties the MATH guarantees).

- prefix max: the two-pass range-partitioned running max equals the
  naive single-partition window on a seeded random permutation;
- skyline: nothing on the frontier is dominated, everything off the
  frontier is dominated by a frontier member (the definition, checked
  directly against the part table);
- Markov: outgoing probabilities sum to 1 per from-state; transition
  count equals sum over users of (n_events - 1);
- RFM: per-axis quartile populations are balanced to within 1 (the
  integer-division bucketing guarantee) and the segment histogram
  partitions all ordering customers;
- Kneser-Ney: interpolated-KN mass sums EXACTLY to 1 per context over
  the full continuation vocabulary (the normalization the smoothing
  was designed around — catches any discount/backoff formula bug an
  oracle would replay);
- l-diversity: cell census consistent with q_k_anonymity's (same
  quasi-identifier grid).
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_template_spark import plans


def test_global_prefix_max_matches_naive_window(spark):
    from flink_template_spark.operators.rank_global import with_global_prefix_max

    rows = [(i, ((i * 2654435761) % 997) - 500) for i in range(2000)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r["k"]: (r["m_strict"], r["m_incl"])
        for r in with_global_prefix_max(
            with_global_prefix_max(
                df, [(F.col("v"), True), (F.col("k"), True)], "k", out_col="m_strict"
            ),
            [(F.col("v"), True), (F.col("k"), True)],
            "k",
            out_col="m_incl",
            inclusive=True,
        ).collect()
    }
    w = W.orderBy("v", "k")
    naive = {
        r["k"]: (r["m_strict"], r["m_incl"])
        for r in df.select(
            "k",
            F.max("k").over(w.rowsBetween(W.unboundedPreceding, -1)).alias("m_strict"),
            F.max("k")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("m_incl"),
        ).collect()
    }
    assert got == naive


def test_skyline_is_exactly_the_undominated_set(spark, sf_dir):
    from flink_template_spark.tables import load_table

    frontier = {
        r["p_partkey"]: (r["p_retailprice"], r["p_size"])
        for r in plans.QUERIES["q_skyline_parts"](spark, sf_dir).collect()
    }
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominates(a, b):  # a dominates b on (price min, size max)
        return a[0] <= b[0] and a[1] >= b[1] and (a[0] < b[0] or a[1] > b[1])

    front = [(p, s) for (p, s) in frontier.values()]
    for k, price, size in parts:
        dominated = any(dominates(f, (price, size)) for f in front if f != (price, size))
        if k in frontier:
            # frontier members may tie each other but never be strictly
            # dominated by ANY part
            assert not any(
                dominates((p2, s2), (price, size))
                for (k2, p2, s2) in parts
                if k2 != k
            ), k
        else:
            assert dominated, (k, price, size)


def test_markov_rows_are_a_distribution(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_event_markov"](spark, sf_dir).collect()
    by_from: dict[str, list] = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r)
    for frm, rs in by_from.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, frm  # 6-dp rounding slack
    n_trans = sum(r["n_trans"] for r in rows)
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) - 1).alias("t"))
        .agg(F.sum(F.greatest(F.col("t"), F.lit(0))).alias("s"))
        .collect()[0]["s"]
    )
    assert n_trans == per_user


def test_rfm_quartiles_balanced_and_exhaustive(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_rfm_segments"](spark, sf_dir).collect()
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r["n_customers"] for r in rows) == n_cust
    for axis in ("r_quartile", "f_quartile", "m_quartile"):
        per_q: dict[int, int] = {}
        for r in rows:
            per_q[r[axis]] = per_q.get(r[axis], 0) + r["n_customers"]
        assert set(per_q) == {1, 2, 3, 4}
        # (rn-1)*4 DIV n bucketing: populations differ by at most 1
        assert max(per_q.values()) - min(per_q.values()) <= 1, (axis, per_q)


def test_kneser_ney_emitted_probs_recount_and_mass(spark, sf_dir):
    """Two pins tied to the QUERY OUTPUT (r8 self-review: the first
    draft re-derived counts and asserted an identity on its own
    arithmetic, which could not catch a formula bug in the registered
    query):

    1. every emitted p_kn recomputes exactly from independent raw
       pandas counts (catches any discount/backoff bug even if the
       DuckDB oracle replays it);
    2. the recount formula — now PROVEN equal to what the query emits —
       sums to exactly 1 over the full continuation vocabulary for the
       emitted contexts (the KN normalization axiom: seen mass
       (c1 − d·N1+(w1·))/c1 plus backoff λ·ΣPcont closes to 1)."""
    from flink_template_spark.plans.quality import _KN_D
    from flink_template_spark.tables import load_table

    out = plans.QUERIES["q_kneser_ney_bigram"](spark, sf_dir).collect()
    assert out, "query emitted no bigrams at this SF"

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    bc: dict[tuple[str, str], int] = {}
    for r in docs:
        w = r["text"].split(" ")
        for a, b in zip(w, w[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    n_types = len(bc)
    c1: dict[str, int] = {}
    n1p_fwd: dict[str, int] = {}
    n1p_bwd: dict[str, int] = {}
    for (a, b), c in bc.items():
        c1[a] = c1.get(a, 0) + c
        n1p_fwd[a] = n1p_fwd.get(a, 0) + 1
        n1p_bwd[b] = n1p_bwd.get(b, 0) + 1

    def p_kn(a: str, b: str) -> float:
        return max(bc.get((a, b), 0) - _KN_D, 0.0) / c1[a] + (
            (_KN_D * n1p_fwd[a]) / c1[a]
        ) * (n1p_bwd[b] / n_types)

    for r in out:
        assert bc[(r["w1"], r["w2"])] == r["c12"]
        # pin 1: emitted probability == independent recount
        assert round(p_kn(r["w1"], r["w2"]), 6) == pytest.approx(
            r["p_kn"], abs=1e-9
        ), (r["w1"], r["w2"])

    # pin 2: the (emitted-equal) formula closes to exactly 1 over the
    # full continuation vocabulary for each emitted context
    vocab = set(n1p_bwd)
    for w1 in {r["w1"] for r in out}:
        total = sum(p_kn(w1, w2) for w2 in vocab)
        assert total == pytest.approx(1.0, abs=1e-9), w1


def test_l_diversity_cell_census_matches_k_anonymity(spark, sf_dir):
    """Same quasi-identifier grid ⇒ same per-lang cell counts."""
    ld = {
        r["lang"]: r["n_cells"]
        for r in plans.QUERIES["q_l_diversity"](spark, sf_dir).collect()
    }
    ka = {
        r["lang"]: r["n_cells"]
        for r in plans.QUERIES["q_k_anonymity"](spark, sf_dir).collect()
    }
    assert ld == ka


def test_basket_pair_support_recount(spark, sf_dir):
    """The top pair's support, item counts and lift recompute exactly
    from the raw lineitem table (independent path, no window/join
    machinery)."""
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_basket_pairs"](spark, sf_dir).collect()
    if not rows:
        pytest.skip("no pair reaches min support at this SF")
    top = rows[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    orders_of: dict[int, set] = {}
    for r in li:
        orders_of.setdefault(r["l_partkey"], set()).add(r["l_orderkey"])
    sup = len(orders_of[top["part_a"]] & orders_of[top["part_b"]])
    n_orders = len({r["l_orderkey"] for r in li})
    assert sup == top["support"]
    assert len(orders_of[top["part_a"]]) == top["cnt_a"]
    assert len(orders_of[top["part_b"]]) == top["cnt_b"]
    lift = round(sup * n_orders / (top["cnt_a"] * top["cnt_b"]), 6)
    assert lift == pytest.approx(top["lift"], abs=1e-9)
    # and nothing beats the reported top support
    assert all(r["support"] <= top["support"] for r in rows)


def test_edit_distance_pairs_verify(spark, sf_dir):
    """Every reported pair's distance recomputes via Python's DP on the
    same prefixes, and pairs come from the same (lang, bucket) block."""
    from flink_template_spark.plans.text_dedup import (
        _EDIT_BLOCK,
        _EDIT_MAXD,
        _EDIT_PREFIX,
    )
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_edit_distance_pairs"](spark, sf_dir).collect()
    if not rows:
        pytest.skip("no near pairs at this SF")
    docs = {
        r["doc_id"]: (r["lang"], r["n_chars"] // _EDIT_BLOCK, r["text"][:_EDIT_PREFIX])
        for r in load_table(spark, sf_dir, "documents").collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    for r in rows[:10]:
        la, ba, ta = docs[r["id_a"]]
        lb, bb, tb = docs[r["id_b"]]
        assert (la, ba) == (lb, bb)  # same SNM block
        assert lev(ta, tb) == r["dist"] <= _EDIT_MAXD


def test_lang_id_matrix_partitions_the_corpus(spark, sf_dir):
    """Confusion-matrix row sums equal per-lang doc counts (every doc
    gets exactly one guess), and guesses only come from the label set
    (+ 'unknown')."""
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_lang_id_ngram"](spark, sf_dir).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_docs"]
    truth = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_lang == truth
    assert {r["guess"] for r in rows} <= set(truth) | {"unknown"}


def test_volume_acf_is_a_correlation(spark, sf_dir):
    rows = plans.QUERIES["q_volume_acf"](spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == list(range(1, 8))
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0, r
    # overlap can only shrink as the shift grows
    n = [r["n_pairs"] for r in rows]
    assert all(a >= b for a, b in zip(n, n[1:]))


def test_chi2_recounts_from_raw_presence(spark, sf_dir):
    """The top row's chi² recomputes exactly from raw per-doc token
    presence (independent Python path)."""
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_chi2_terms"](spark, sf_dir).collect()
    top = rows[0]
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    n = len(docs)
    a = b = 0
    n_l = 0
    for r in docs:
        present = top["token"] in set(r["text"].split(" "))
        if r["lang"] == top["lang"]:
            n_l += 1
            a += present
        else:
            b += present
    c, d = n_l - a, n - n_l - b
    assert a == top["df_in_lang"]
    num = float(a * d - b * c)
    chi2 = (n * (num / ((a + b) * (c + d)))) * (num / ((a + c) * (b + d)))
    assert round(chi2, 6) == pytest.approx(top["chi2"], abs=1e-9)
    assert all(r["chi2"] >= 0 for r in rows)


def test_weighted_median_mass_property(spark, sf_dir):
    """Exactly the lower weighted median: mass strictly below it is
    < half the total, mass up to and including it is >= half."""
    from flink_template_spark.tables import load_table

    meds = {
        r["l_returnflag"]: (r["median_price"], r["w_total"])
        for r in plans.QUERIES["q_weighted_median_price"](spark, sf_dir).collect()
    }
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", F.col("l_quantity").cast("long").alias("w"))
        .collect()
    )
    for flag, (med, w_total) in meds.items():
        below = sum(r["w"] for r in li if r["l_returnflag"] == flag and r["l_extendedprice"] < med)
        upto = sum(r["w"] for r in li if r["l_returnflag"] == flag and r["l_extendedprice"] <= med)
        total = sum(r["w"] for r in li if r["l_returnflag"] == flag)
        assert total == w_total
        assert 2 * below < total <= 2 * upto, (flag, below, upto, total)


def test_cohort_ltv_triangle_conserves_revenue(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_cohort_ltv"](spark, sf_dir).collect()
    # per cohort: cum_revenue is the running sum of revenue and ends at
    # the cohort's total
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["month_offset"])
        run = 0.0
        for r in rs:
            run += r["revenue"]
            assert run == pytest.approx(r["cum_revenue"], rel=1e-9), (cohort, r)
        # month 0 holds the acquisition order: every cohort has it
        assert rs[0]["month_offset"] == 0
    # the triangle partitions ALL order revenue exactly once
    total = sum(r["revenue"] for r in rows)
    want = (
        load_table(spark, sf_dir, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .collect()[0][0]
    )
    assert total == pytest.approx(want, rel=1e-9)


def test_revenue_concentration_is_a_lorenz_curve(spark, sf_dir):
    rows = plans.QUERIES["q_revenue_concentration"](spark, sf_dir).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - 1.0) < 1e-6
    # integer-division deciles: populations balanced within 1
    sizes = [r["n_customers"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # decile 1 = top spenders: per-customer average revenue nonincreasing
    avgs = [r["revenue"] / r["n_customers"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(avgs, avgs[1:]))


def test_event_paths_recount_from_sequences(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_event_paths_top"](spark, sf_dir).collect()
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r["user_id"], []).append(r["event_type"])
    want: dict[tuple, int] = {}
    for seq in seqs.values():
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            want[(a, b, c)] = want.get((a, b, c), 0) + 1
    kept = sorted(
        ((n, a, b, c) for (a, b, c), n in want.items()),
        key=lambda t: (-t[0], t[1], t[2], t[3]),
    )[: len(rows)]
    assert [
        (r["n_paths"], r["step1"], r["step2"], r["step3"]) for r in rows
    ] == kept


def test_funnel_latency_recounts_and_orders(spark, sf_dir):
    from flink_template_spark.tables import load_table

    row = plans.QUERIES["q_funnel_latency"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    firsts: dict[int, dict] = {}
    for r in ev:
        d = firsts.setdefault(r["user_id"], {})
        if r["event_type"] in ("view", "purchase"):
            k = r["event_type"]
            if k not in d or r["ts"] < d[k]:
                d[k] = r["ts"]
    lats = sorted(
        int(d["purchase"].timestamp()) - int(d["view"].timestamp())
        for d in firsts.values()
        if "view" in d and "purchase" in d and d["purchase"] > d["view"]
    )
    n = len(lats)
    assert row["n_converting"] == n
    assert row["min_s"] == lats[0] and row["max_s"] == lats[-1]
    assert row["median_s"] == lats[(n + 1) // 2 - 1]  # lower median, 1-idx ceil(n/2)
    import math

    assert row["p90_s"] == lats[math.ceil(0.9 * n) - 1]
    assert row["min_s"] <= row["median_s"] <= row["p90_s"] <= row["max_s"]


def test_forecast_baselines_recount(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = {
        r["event_type"]: r
        for r in plans.QUERIES["q_forecast_baselines"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: dict[tuple, int] = {}
    for r in ev:
        daily[(r["event_type"], r["ts"].date())] = (
            daily.get((r["event_type"], r["ts"].date()), 0) + 1
        )
    import datetime

    types = {t for (t, _) in daily}
    for t in types:
        days = {d: x for (tt, d), x in daily.items() if tt == t}
        ev_days = [
            d
            for d in days
            if (d - datetime.timedelta(days=1)) in days
            and (d - datetime.timedelta(days=7)) in days
        ]
        ae1 = sum(
            abs(days[d] - days[d - datetime.timedelta(days=1)]) for d in ev_days
        )
        ae7 = sum(
            abs(days[d] - days[d - datetime.timedelta(days=7)]) for d in ev_days
        )
        r = rows[t]
        assert (r["n_days_eval"], r["ae_naive1"], r["ae_seasonal7"]) == (
            len(ev_days),
            ae1,
            ae7,
        ), t
        if ae1 == 0:
            assert r["seasonal_gain"] is None
        else:
            assert r["seasonal_gain"] == pytest.approx(
                round(ae7 / ae1, 6), abs=1e-9
            )


def test_trimmed_mean_sits_between_and_recounts(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = {
        r["l_returnflag"]: r
        for r in plans.QUERIES["q_trimmed_mean_price"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
    for f, xs in by_flag.items():
        xs.sort()
        n = len(xs)
        t = n * 5 // 100
        kept = xs[t : n - t]
        r = rows[f]
        assert (r["n_rows"], r["n_kept"]) == (n, len(kept))
        want = round(sum(round(x, 2) for x in kept) / len(kept), 6)
        assert r["trimmed_mean"] == pytest.approx(want, abs=1e-4)
        # robustness ordering: between min and max of kept, and the trim
        # moved the estimate toward the median relative to the raw mean
        assert kept[0] <= r["trimmed_mean"] <= kept[-1]


def test_heatmap_partitions_all_events(spark, sf_dir):
    from flink_template_spark.tables import load_table

    rows = plans.QUERIES["q_activity_heatmap"](spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == n_events
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3  # 6-dp rounding
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hod"] <= 23 for r in rows)


def test_volume_bands_recount(spark, sf_dir):
    import math

    from flink_template_spark.tables import load_table

    rows = {
        r["event_type"]: r
        for r in plans.QUERIES["q_volume_percentile_bands"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: dict[tuple, int] = {}
    for r in ev:
        k = (r["event_type"], r["ts"].date())
        daily[k] = daily.get(k, 0) + 1
    by_type: dict[str, list] = {}
    for (t, _), x in daily.items():
        by_type.setdefault(t, []).append(x)
    for t, xs in by_type.items():
        xs.sort()
        n = len(xs)
        r = rows[t]
        assert r["n_days"] == n
        assert r["p10"] == xs[math.ceil(0.1 * n) - 1]
        assert r["p50"] == xs[math.ceil(0.5 * n) - 1]
        assert r["p90"] == xs[math.ceil(0.9 * n) - 1]
        assert r["p10"] <= r["p50"] <= r["p90"]
