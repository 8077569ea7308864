"""Round-10 behavior pins: axiom + brute-recount tests for the new
operators and the two rank rewrites (the axiom-over-replayed-oracle
discipline — a DuckDB oracle replays a formula bug verbatim; these
assert properties the MATH guarantees, or recount with an independent
implementation).

- rank family: the closed-form ntile/percent_rank/cume_dist columns
  equal Spark's own window functions on the same data (randomized,
  including n % 4 != 0 and n < 4 edge regimes via filtered subsets);
- winsorized stats: lo <= hi, sd_winsorized <= sd_raw, and the whole
  row recounts from a brute sorted-list winsorization;
- two-feature OLS: betas/intercept recount against numpy lstsq within
  1e-6 per flag;
- Welch t-test: recounts from brute Python mean/var; df lies in
  [min(n1,n2)-1, n1+n2-2] (the Welch-Satterthwaite bracket);
- CUPED: theta and the adjusted means recount from brute sums; the
  POOLED variance of the adjusted metric never exceeds the raw pooled
  variance (the regression-adjustment guarantee);
- NB classifier: scores recount from a brute dict-based NB over the
  same quantized log-odds; accuracy in [0, 1];
- JS divergence: bounded (0, ln 2]; recounts from a brute distribution
  pass over the corpus;
- mixture weights: shares sum to 1, weights capped at _MIX_CAP, quota
  recounts from the unrounded capped weight with half-up rounding;
- Kendall tau-b: recounts from a blockwise O(n²) numpy sign-product
  sweep (independent of the query's joint-histogram formulation);
- mutual information: brute Counter recount + the MI ≤ min(H_a, H_b)
  and MI ≥ 0 axioms;
- plan pins: scan counts / no-cartesian / no-explode invariants for
  every round-10 addition (the test_plans discipline).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_template_spark import plans
from flink_template_spark.tables import load_table


def test_rank_family_closed_forms_match_window_functions(spark, sf_dir):
    sup = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    naive = {
        r["s_suppkey"]: r
        for r in sup.select(
            "s_suppkey",
            F.dense_rank().over(w).alias("drank"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        ).collect()
    }
    got = plans.QUERIES["q_rank_family"](spark, sf_dir).collect()
    assert len(got) == len(naive)
    for r in got:
        n = naive[r["s_suppkey"]]
        assert (r["drank"], r["quartile"], r["pct_rank"], r["cume"]) == (
            n["drank"],
            n["quartile"],
            n["pct_rank"],
            n["cume"],
        ), r["s_suppkey"]


def test_ntile_closed_form_on_awkward_sizes(spark):
    # n = 1, 2, 3, 5, 7 — every n % 4 regime including n < k.
    # Exercises the SHIPPED helper (not a re-derivation), so a
    # regression in ntile_closed_form's awkward-size arms fails here.
    from flink_template_spark.operators.rank_global import (
        ntile_closed_form,
        with_global_ranks,
    )

    for n in (1, 2, 3, 5, 7, 8, 13):
        df = spark.createDataFrame(
            [(i, float(i * 7 % 11)) for i in range(n)], "id long, v double"
        )
        ranked = with_global_ranks(
            df, [(F.col("v"), False), (F.col("id"), True)], row_number_col="rn"
        ).localCheckpoint(eager=False)
        n1 = ranked.agg(F.max("rn").alias("n"))
        quartile = ntile_closed_form(4)
        closed = {
            r["id"]: r["q"]
            for r in ranked.crossJoin(F.broadcast(n1))
            .select("id", quartile.cast("int").alias("q"))
            .collect()
        }
        w = W.orderBy(F.col("v").desc(), "id")
        naive = {
            r["id"]: r["q"]
            for r in df.select(
                "id", F.ntile(4).over(w).alias("q")
            ).collect()
        }
        assert closed == naive, (n, closed, naive)


def test_winsorized_stats_recount(spark, sf_dir):
    row = plans.QUERIES["q_winsorized_stats"](spark, sf_dir).collect()[0]
    prices = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderkey")
        .collect()
    )
    n = len(prices)
    k = n // 20
    lo, hi = prices[k][0], prices[n - k - 1][0]
    vals = [p for p, _ in prices]
    wvals = [max(min(v, hi), lo) for v in vals]
    assert row["n_orders"] == n and row["k_each_side"] == k
    assert abs(row["lo"] - lo) < 1e-6 and abs(row["hi"] - hi) < 1e-6
    assert row["lo"] <= row["hi"]
    assert row["sd_winsorized"] <= row["sd_raw"] + 1e-9
    for col, data in (("mean_raw", vals), ("mean_winsorized", wvals)):
        assert abs(row[col] - sum(data) / n) < 1e-4, col
    for col, data in (("sd_raw", vals), ("sd_winsorized", wvals)):
        m = sum(data) / n
        sd = math.sqrt(sum((x - m) ** 2 for x in data) / n)
        assert abs(row[col] - sd) < 1e-3, col


def test_ols_two_feature_matches_lstsq(spark, sf_dir):
    import numpy as np

    rows = plans.QUERIES["q_ols_two_feature"](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    by_flag = defaultdict(list)
    for r in li:
        by_flag[r["l_returnflag"]].append(
            (r["l_quantity"], r["l_discount"], r["l_extendedprice"])
        )
    for r in rows:
        pts = np.array(by_flag[r["flag"]])
        X = np.column_stack([np.ones(len(pts)), pts[:, 0], pts[:, 1]])
        beta, *_ = np.linalg.lstsq(X, pts[:, 2], rcond=None)
        assert abs(r["intercept"] - beta[0]) < 1e-4, r["flag"]
        assert abs(r["beta_quantity"] - beta[1]) < 1e-6
        assert abs(r["beta_discount"] - beta[2]) < 1e-4
        assert 0.0 <= r["r2"] <= 1.0


def test_welch_ttest_recount(spark, sf_dir):
    row = plans.QUERIES["q_welch_ttest"](spark, sf_dir).collect()[0]
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    en = [r["n_chars"] for r in docs if r["lang"] == "en"]
    rest = [r["n_chars"] for r in docs if r["lang"] != "en"]

    def mv(xs):
        m = sum(xs) / len(xs)
        v = sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
        return m, v

    m1, v1 = mv(en)
    m2, v2 = mv(rest)
    vn1, vn2 = v1 / len(en), v2 / len(rest)
    t = (m1 - m2) / math.sqrt(vn1 + vn2)
    df = (vn1 + vn2) ** 2 / (vn1**2 / (len(en) - 1) + vn2**2 / (len(rest) - 1))
    assert row["n_en"] == len(en) and row["n_rest"] == len(rest)
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["welch_df"] - df) < 1e-2
    assert min(len(en), len(rest)) - 1 <= row["welch_df"] <= len(en) + len(rest) - 2


def test_cuped_recount_and_pooled_variance_reduction(spark, sf_dir):
    from flink_template_spark.plans.events_time import _CUPED_SPLIT

    rows = {
        r["arm"]: r
        for r in plans.QUERIES["q_cuped_adjustment"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    split = _CUPED_SPLIT
    xs: dict = defaultdict(float)
    ys: dict = defaultdict(float)
    users = set()
    for r in ev:
        u = r["user_id"]
        users.add(u)
        # mirror the decimal(18,6) cast: round half-up at 6 dp
        v = float(r["value"])
        if str(r["ts"]) < split:
            xs[u] += v
        else:
            ys[u] += v
    import hashlib

    def arm_of(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    pooled_x = [xs[u] for u in users]
    pooled_y = [ys[u] for u in users]
    n = len(users)
    mx = sum(pooled_x) / n
    my = sum(pooled_y) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(pooled_x, pooled_y)) / n
    varx = sum((a - mx) ** 2 for a in pooled_x) / n
    theta = cov / varx
    for arm in (0, 1):
        au = [u for u in users if arm_of(u) == arm]
        may = sum(ys[u] for u in au) / len(au)
        maxx = sum(xs[u] for u in au) / len(au)
        assert rows[arm]["n_users"] == len(au)
        assert abs(rows[arm]["mean_post"] - may) < 1e-3
        assert abs(rows[arm]["theta"] - theta) < 1e-3
        assert abs(rows[arm]["mean_cuped"] - (may - theta * (maxx - mx))) < 1e-3
    # pooled guarantee: weighted var_cuped <= weighted var_post
    tot = sum(rows[a]["n_users"] for a in (0, 1))
    pooled_vc = sum(rows[a]["var_cuped"] * rows[a]["n_users"] for a in (0, 1)) / tot
    pooled_vp = sum(rows[a]["var_post"] * rows[a]["n_users"] for a in (0, 1)) / tot
    assert pooled_vc <= pooled_vp + 1e-9


def test_nb_classifier_recounts_brute(spark, sf_dir):
    rows = {
        r["lang"]: r
        for r in plans.QUERIES["q_nb_lang_classifier"](spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    c1: Counter = Counter()
    c0: Counter = Counter()
    d1 = d0 = 0
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        if r["lang"] == "en":
            d1 += 1
            c1.update(toks)
        else:
            d0 += 1
            c0.update(toks)
    vocab = set(c1) | set(c0)
    t1, t0, v = sum(c1.values()), sum(c0.values()), len(vocab)
    q = {
        w: round(
            (math.log((c1[w] + 1.0) / (t1 + v)) - math.log((c0[w] + 1.0) / (t0 + v)))
            * 1e7
        )
        for w in vocab
    }
    pq = round(math.log(d1 / d0) * 1e7)
    agg: dict = defaultdict(lambda: [0, 0, 0])  # n, sum_score, n_correct
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        # whole-corpus scope (r12): a token-less doc scores prior-only
        # (documents LEFT join + coalesce — see _nb_scored docstring)
        s = pq + sum(q[t] for t in toks)
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += s
        a[2] += int((s > 0) == (r["lang"] == "en"))
    for lang, r in rows.items():
        n, ssum, ncorr = agg[lang]
        assert r["n_docs"] == n
        assert abs(r["mean_score"] - ssum / (1e7 * n)) < 1e-3, lang
        assert abs(r["accuracy"] - ncorr / n) < 1e-6
        assert 0.0 <= r["accuracy"] <= 1.0


def test_js_divergence_bounded_and_recounts(spark, sf_dir):
    rows = plans.QUERIES["q_js_divergence_sources"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_src: dict = defaultdict(Counter)
    corpus: Counter = Counter()
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        per_src[r["source"]].update(toks)
        corpus.update(toks)
    t = sum(corpus.values())
    for r in rows:
        cnts = per_src[r["source"]]
        ts = sum(cnts.values())
        js = 0.0
        for w, c in cnts.items():
            p, qq = c / ts, corpus[w] / t
            m = (p + qq) / 2
            js += 0.5 * (p * math.log(p / m) + qq * math.log(qq / m))
        js += 0.5 * (1.0 - sum(corpus[w] for w in cnts) / t) * math.log(2.0)
        assert 0.0 < r["js_divergence"] <= math.log(2.0) + 1e-9
        assert abs(r["js_divergence"] - js) < 1e-4, r["source"]
        assert r["n_tokens"] == ts


def test_mixture_weights_axioms(spark, sf_dir):
    from flink_template_spark.plans.quality import _MIX_CAP

    rows = plans.QUERIES["q_domain_mixture_weights"](spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    t = sum(r["n_tokens"] for r in rows)
    s = len(rows)
    for r in rows:
        assert 0.0 < r["mix_weight"] <= _MIX_CAP + 1e-9
        # recompute the quota from the UNROUNDED capped weight with
        # half-up rounding (the engines' ROUND), not Python's banker's
        # rounding over the 6-dp-rounded mix_weight column
        raw_w = min((t / s) / r["n_tokens"], _MIX_CAP)
        assert r["docs_per_epoch"] == math.floor(r["n_docs"] * raw_w + 0.5)


# ---- explain-level plan pins (the test_plans scan-count discipline,
# applied to the round-10 additions) --------------------------------------


from tests.conftest import parquet_scan_count as _parquet_scans


def _plan(spark, sf_dir, name):
    from tests.conftest import plan_formatted

    return plan_formatted(spark, plans, sf_dir, name)


def test_r10_plan_pins(spark, sf_dir):
    # one 3-column lineitem scan; the 3-row fit is pure scalar algebra
    p = _plan(spark, sf_dir, "q_ols_two_feature")
    assert _parquet_scans(p) == 1 and "CartesianProduct" not in p
    # one 2-column documents scan, 2-group agg
    p = _plan(spark, sf_dir, "q_welch_ttest")
    assert _parquet_scans(p) == 1 and "CartesianProduct" not in p
    # the pinned |sources|-row table hides the single documents scan;
    # token counts come from split length, never an explode
    p = _plan(spark, sf_dir, "q_domain_mixture_weights")
    assert _parquet_scans(p) == 0 and "Generate" not in p
    # the pinned 2-row arm table hides the single events scan + user
    # agg; everything after it is constant-sized
    p = _plan(spark, sf_dir, "q_cuped_adjustment")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p
    # the pinned (source, word) pair table hides the tokenize explode:
    # marginals + join base re-read the checkpoint, not parquet
    p = _plan(spark, sf_dir, "q_js_divergence_sources")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p
    # NB classifier: the scoring tokenization pass + the 1-row
    # doc-prior scan + (r12, whole-corpus scope) the (doc_id, lang)
    # LEFT-join base that gives token-less docs their prior-only score
    # — a 2-thin-column pruned scan, deliberately NOT a checkpoint of
    # the full-text corpus; the training pass hides behind the pinned
    # vocab
    p = _plan(spark, sf_dir, "q_nb_lang_classifier")
    assert _parquet_scans(p) == 3 and "CartesianProduct" not in p
    # the base scan must be pruned to the two thin columns (no text)
    import re as _re

    scans = _re.findall(r"ReadSchema: struct<[^>]*>", p)
    assert any("text" not in s for s in scans), scans
    # winsorized stats: rank_global pins the single orders scan behind
    # its checkpoint; all three consumers read the materialized ranking
    p = _plan(spark, sf_dir, "q_winsorized_stats")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p
    # triplets: the IVF assignment is checkpoint-pinned (zero parquet
    # re-scans in the final plan) and within-cell pair joins are
    # cluster-keyed equi-joins, never cartesian
    p = _plan(spark, sf_dir, "q_contrastive_triplets")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p
    # Kendall tau-b: corpus rows touch ONE hash agg behind the pinned
    # cell table (zero parquet scans in the final plan); the
    # concordant/discordant self-join is a BROADCAST of the bounded
    # cell table, never a corpus-sized non-equi join
    p = _plan(spark, sf_dir, "q_kendall_tau")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # bounded-domain cells only
    # mutual information: same single-scan tagged-explode shape as
    # Cramér's V — everything reads the pinned cell table
    p = _plan(spark, sf_dir, "q_mutual_info_pairs")
    assert _parquet_scans(p) == 0 and "CartesianProduct" not in p


def test_kendall_tau_recounts_brute_numpy(spark, sf_dir):
    """tau-b recount from a blockwise O(n^2) numpy sign-product sweep
    over the raw rows — a genuinely independent path from the query's
    joint-histogram formulation."""
    import numpy as np

    row = plans.QUERIES["q_kendall_tau"](spark, sf_dir).collect()[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount")
        .collect()
    )
    x = np.array([int(r["l_quantity"]) for r in li], dtype=np.int64)
    y = np.array([round(r["l_discount"] * 100) for r in li], dtype=np.int64)
    n = len(x)
    P = Q = 0
    B = 512
    for i in range(0, n, B):
        xi, yi = x[i : i + B], y[i : i + B]
        # only pairs (a, b) with a < b: compare block rows to the tail
        for j0 in range(i, n, B):
            xj, yj = x[j0 : j0 + B], y[j0 : j0 + B]
            sx = np.sign(xj[None, :] - xi[:, None])
            sy = np.sign(yj[None, :] - yi[:, None])
            prod = sx * sy
            if j0 == i:
                prod = np.triu(prod, k=1)
            P += int((prod > 0).sum())
            Q += int((prod < 0).sum())
    assert row["n_rows"] == n
    assert row["n_concordant"] == float(P)
    assert row["n_discordant"] == float(Q)
    tx = sum(c * (c - 1) // 2 for c in Counter(x.tolist()).values())
    ty = sum(c * (c - 1) // 2 for c in Counter(y.tolist()).values())
    half = n * (n - 1) // 2
    tau = (P - Q) / math.sqrt((half - tx) * (half - ty))
    assert abs(row["tau_b"] - tau) < 1e-5
    assert -1.0 <= row["tau_b"] <= 1.0


def test_mutual_info_axioms_and_recount(spark, sf_dir):
    """MI >= 0 (up to quantization), MI <= min(H_a, H_b), and the whole
    table recounts from a brute Counter pass over the raw orders."""
    from flink_template_spark.plans.datapipe import _CV_PAIRS, _wd_spark

    rows = {
        r["pair"]: r
        for r in plans.QUERIES["q_mutual_info_pairs"](spark, sf_dir).collect()
    }
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
            _wd_spark().alias("wd"),
        )
        .collect()
    )
    for tag, a, b in _CV_PAIRS:
        joint: Counter = Counter()
        ma: Counter = Counter()
        mb: Counter = Counter()
        for r in orders:
            joint[(r[a], r[b])] += 1
            ma[r[a]] += 1
            mb[r[b]] += 1
        n = len(orders)
        mi = sum(
            (o / n) * math.log(o * n / (ma[va] * mb[vb]))
            for (va, vb), o in joint.items()
        )
        ha = sum(-(c / n) * math.log(c / n) for c in ma.values())
        hb = sum(-(c / n) * math.log(c / n) for c in mb.values())
        r = rows[tag]
        assert abs(r["mi_nats"] - mi) < 1e-4, tag
        assert abs(r["h_a"] - ha) < 1e-4
        assert abs(r["h_b"] - hb) < 1e-4
        assert r["mi_nats"] >= -1e-5
        assert r["mi_nats"] <= min(r["h_a"], r["h_b"]) + 1e-5
        if r["nmi"] is not None:
            assert -1e-5 <= r["nmi"] <= 1.0 + 1e-9
