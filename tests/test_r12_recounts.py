"""Round-12 independent brute recounts for the generated-oracle sketch
families (VERDICT r11 what's-wrong #1 / next #3).

These queries' DuckDB oracle SQL is GENERATED from the same constants
and formula fragments as the Spark expressions
(functions.hashing / functions.vector), so a mis-derived formula would
be green on the mirrored oracle — exactly how the q_grubbs_outlier sd
bug shipped (caught only by its brute recount, commit ba0ed5c). Every
test here re-derives the result through a THIRD independent path —
hashlib.md5 + pure-Python integer arithmetic + explicit left-fold
float loops — sharing nothing with the SQL generators except the
published constants (seeds/sign matrices are data, not formulas).

Float discipline mirrors the engines exactly where exactness is
claimed (left-to-right folds, half-away-from-zero rounding via
Decimal on the shortest repr — Spark's BigDecimal.valueOf path), and
uses ±1.1e-6 tolerance where only 6-dp-rounded doubles are compared.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from flink_template_spark import plans
from flink_template_spark.tables import load_table


def _md5i(s: str) -> int:
    """First 8 md5 hex chars as int — functions.hashing.md5int_* dual."""
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _rhalf(x: float, dp: int = 0) -> float:
    """Half-away-from-zero rounding on the shortest decimal repr —
    Spark's ROUND (BigDecimal.valueOf) semantics."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _norm(a: list[float]) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def _cos6(a: list[float], b: list[float]) -> float:
    return _rhalf(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _shingles(text: str, n: int = 3) -> set[str]:
    ws = text.split(" ")  # empty tokens kept — both engines keep them
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


@pytest.fixture(scope="module")
def docs_rows(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()


@pytest.fixture(scope="module")
def emb_rows(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def _minhash_sigs(docs_rows) -> dict[int, list[int]]:
    from flink_template_spark.functions.hashing import (
        MERSENNE_P,
        MINHASH_A,
        MINHASH_B,
        NUM_HASHES,
    )

    sigs = {}
    for r in docs_rows:
        hs = {_md5i(s) for s in _shingles(r["text"])}
        if not hs:
            continue  # <3-token docs have no shingles: dropped
        xs = [h % MERSENNE_P for h in hs]
        sigs[r["doc_id"]] = [
            min((MINHASH_A[i] * x + MINHASH_B[i]) % MERSENNE_P for x in xs)
            for i in range(NUM_HASHES)
        ]
    return sigs


def test_minhash_signatures_recount(spark, sf_dir, docs_rows):
    from flink_template_spark.functions.hashing import NUM_HASHES

    want = _minhash_sigs(docs_rows)
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(NUM_HASHES)]
        for r in plans.QUERIES["q_minhash_signatures"](spark, sf_dir).collect()
    }
    assert got == want


def test_minhash_lsh_pairs_recount(spark, sf_dir, docs_rows):
    from flink_template_spark.functions.hashing import (
        LSH_BANDS,
        ROWS_PER_BAND,
    )

    sigs = _minhash_sigs(docs_rows)
    buckets: dict[tuple[int, str], list[int]] = {}
    for did, mh in sigs.items():
        for b in range(LSH_BANDS):
            key = "_".join(
                str(mh[b * ROWS_PER_BAND + r]) for r in range(ROWS_PER_BAND)
            )
            buckets.setdefault((b, key), []).append(did)
    want: dict[tuple[int, int], int] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b2 in ids[i + 1 :]:
                want[(a, b2)] = want.get((a, b2), 0) + 1
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_bands"]
        for r in plans.QUERIES["q_minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    assert got == want


def _simhash_sigs(docs_rows) -> dict[int, int]:
    sigs = {}
    for r in docs_rows:
        cnt: dict[str, int] = {}
        for t in r["text"].split(" "):  # empty tokens kept, as in SQL
            cnt[t] = cnt.get(t, 0) + 1
        s = [0] * 32
        for t, c in cnt.items():
            h = _md5i(t)
            for b in range(32):
                s[b] += c if (h >> b) & 1 else -c
        sigs[r["doc_id"]] = sum(1 << b for b in range(32) if s[b] > 0)
    return sigs


def test_simhash_signatures_recount(spark, sf_dir, docs_rows):
    want = _simhash_sigs(docs_rows)
    got = {
        r["doc_id"]: r["simhash"]
        for r in plans.QUERIES["q_simhash_signatures"](spark, sf_dir).collect()
    }
    assert got == want
    # the scalar-expression dual shares the oracle: must agree too
    got2 = {
        r["doc_id"]: r["simhash"]
        for r in plans.QUERIES["q_simhash_scalar"](spark, sf_dir).collect()
    }
    assert got2 == want


def test_simhash_hamming_pairs_recount(spark, sf_dir, docs_rows):
    sigs = _simhash_sigs(docs_rows)
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            hd = bin(sigs[a] ^ sigs[b]).count("1")
            if hd <= 3:
                want[(a, b)] = hd
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in plans.QUERIES["q_simhash_hamming_pairs"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_cosine_near_dup_exact_recount(spark, sf_dir, emb_rows):
    from flink_template_spark.plans.vectors import NEAR_DUP_THRESHOLD

    ids = sorted(emb_rows)
    want = {}
    for i, a in enumerate(ids):
        if _norm(emb_rows[a]) == 0.0:
            continue
        for b in ids[i + 1 :]:
            if _norm(emb_rows[b]) == 0.0:
                continue
            c = _cos6(emb_rows[a], emb_rows[b])
            if c >= NEAR_DUP_THRESHOLD:
                want[(a, b)] = c
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in plans.QUERIES["q_embedding_near_dup_exact"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1.1e-6, k


def _plane_weight(j: int, i: int) -> float:
    from flink_template_spark.operators.similarity import (
        LCG_A,
        LCG_C,
        LCG_M,
        PLANE_STRIDE,
    )

    return ((LCG_A * (j * PLANE_STRIDE + i) + LCG_C) % LCG_M) / float(
        LCG_M
    ) - 0.5


def test_cosine_near_dup_lsh_recount(spark, sf_dir, emb_rows):
    from flink_template_spark.plans.vectors import (
        LSH_BANDS,
        LSH_BITS,
        NEAR_DUP_THRESHOLD,
    )

    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, v in emb_rows.items():
        for b in range(LSH_BANDS):
            sig = 0
            for m in range(LSH_BITS):
                j = b * LSH_BITS + m
                acc = 0.0
                for i, x in enumerate(v):
                    acc += float(x) * _plane_weight(j, i)
                if _rhalf(acc, 6) >= 0:
                    sig += 1 << m
            buckets.setdefault((b, sig), []).append(vid)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b2 in ids[i + 1 :]:
                cand.add((a, b2))
    want = {}
    for a, b in cand:
        c = _cos6(emb_rows[a], emb_rows[b])
        if c >= NEAR_DUP_THRESHOLD:
            want[(a, b)] = c
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in plans.QUERIES["q_embedding_near_dup_lsh"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1.1e-6, k


def test_cosine_topk_recount(spark, sf_dir, emb_rows):
    q = emb_rows[0]
    scored = sorted(
        (
            (-_cos6(emb_rows[v], q), v)
            for v in emb_rows
            if v != 0 and _norm(emb_rows[v]) > 0
        ),
    )[:10]
    got = plans.QUERIES["q_cosine_topk"](spark, sf_dir).collect()
    assert len(got) == 10
    for row, (negc, vid) in zip(got, scored):
        assert row["vec_id"] == vid
        assert abs(row["cos_sim"] - (-negc)) < 1.1e-6


def test_knn_join_gemm_recount(spark, sf_dir, emb_rows):
    want = {}
    for qid in [v for v in emb_rows if v < 40]:
        qv = emb_rows[qid]
        ranked = sorted(
            (
                (-_cos6(emb_rows[c], qv), c)
                for c in emb_rows
                if c != qid and _norm(emb_rows[c]) > 0
            ),
        )[:4]
        for rank, (negc, cid) in enumerate(ranked, start=1):
            want[(qid, rank)] = (cid, -negc)
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in plans.QUERIES["q_knn_join_gemm"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (cid, c) in want.items():
        assert got[k][0] == cid, k
        assert abs(got[k][1] - c) < 1.1e-6, k


def test_random_projection_recount(spark, sf_dir, emb_rows):
    from flink_template_spark.plans.vectors import _RP_OUT_DIM, _RP_SIGNS

    got = {
        (r["vec_id"], r["j"]): r["proj"]
        for r in plans.QUERIES["q_random_projection"](spark, sf_dir).collect()
    }
    for vid, v in emb_rows.items():
        qs = [int(_rhalf(float(x) * 1e7)) for x in v]
        for j in range(_RP_OUT_DIM):
            s = sum(q * sgn for q, sgn in zip(qs, _RP_SIGNS[j]))
            # exact: integer sum / 1e7 is one correctly-rounded IEEE op
            assert got[(vid, j)] == s / 1e7, (vid, j)


def test_pq_adc_topk_recount(spark, sf_dir, emb_rows):
    """Full pure-Python replay of pq_train(m=4, k=4, n_iter=1) +
    pq_encode + the ADC top-10 — subvector slicing, lowest-id init,
    argmin with lowest-code tiebreak, exact quantized means,
    empty-cluster fallback, and the (d0+d1)+d2+d3 accumulation order
    all re-derived independently of operators.pq."""
    m, k = 4, 4
    d = len(next(iter(emb_rows.values()))) // m

    def sub(v, j):
        return v[j * d : (j + 1) * d]

    def sqd(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (float(x) - float(y)) * (float(x) - float(y))
        return acc

    init_ids = sorted(emb_rows)[:k]
    cb0 = {
        (j, c): sub(emb_rows[vid], j)
        for j in range(m)
        for c, vid in enumerate(init_ids)
    }
    # Lloyd round 1: assign, then exact quantized means
    members: dict[tuple[int, int], list[int]] = {}
    for vid, v in emb_rows.items():
        for j in range(m):
            c = min(range(k), key=lambda c: (sqd(sub(v, j), cb0[(j, c)]), c))
            members.setdefault((j, c), []).append(vid)
    cb1 = {}
    for j in range(m):
        for c in range(k):
            mem = members.get((j, c))
            if not mem:
                cb1[(j, c)] = [float(x) for x in cb0[(j, c)]]
                continue
            cb1[(j, c)] = [
                sum(int(_rhalf(float(sub(emb_rows[vid], j)[p]) * 1e7)) for vid in mem)
                / (1e7 * len(mem))
                for p in range(d)
            ]
    codes = {
        (vid, j): min(
            range(k), key=lambda c: (sqd(sub(v, j), cb1[(j, c)]), c)
        )
        for vid, v in emb_rows.items()
        for j in range(m)
    }
    qv = emb_rows[0]
    qtable = {
        (j, c): sqd(sub(qv, j), cb1[(j, c)])
        for j in range(m)
        for c in range(k)
    }
    adc = {}
    for vid in emb_rows:
        if vid == 0:
            continue
        ds = [qtable[(j, codes[(vid, j)])] for j in range(m)]
        adc[vid] = (ds[0] + ds[1]) + ds[2] + ds[3]
    want = sorted(((_rhalf(v, 6), vid) for vid, v in adc.items()))[:10]
    got = plans.QUERIES["q_pq_adc_topk"](spark, sf_dir).collect()
    assert len(got) == 10
    for row, (dist, vid) in zip(got, want):
        assert row["vec_id"] == vid
        assert abs(row["adc_dist"] - dist) < 1.1e-6, (row, dist, vid)


# ---------------------------------------------------------------------------
# Round-12 wave recounts: the five new eval queries. Scoring itself is
# recounted by test_nb_classifier_recounts_brute (r10); these verify the
# NEW downstream logic (2x2 algebra, threshold sweep, clipping, the
# confident-join rule, the two-pass Levene pipeline) against pure-Python
# re-derivations.
# ---------------------------------------------------------------------------


def test_cohens_kappa_recounts_brute(spark, sf_dir):
    from flink_template_spark.plans.quality import (
        _MCN_LEN_GATE,
        _MCN_TOK_GATE,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "n_chars", "text"
    ).collect()
    bp = ao = bo = ne = 0
    for r in docs:
        ga = r["n_chars"] >= _MCN_LEN_GATE
        gb = len(r["text"].split(" ")) >= _MCN_TOK_GATE
        if ga and gb:
            bp += 1
        elif ga:
            ao += 1
        elif gb:
            bo += 1
        else:
            ne += 1
    n = bp + ao + bo + ne
    po = (bp + ne) / n
    pe = ((bp + ao) * (bp + bo) + (bo + ne) * (ao + ne)) / (n * n)
    kappa = (po - pe) / (1 - pe)
    phi = (bp * ne - ao * bo) / math.sqrt(
        (bp + ao) * (bo + ne) * (bp + bo) * (ao + ne)
    )
    row = plans.QUERIES["q_cohens_kappa_gates"](spark, sf_dir).collect()[0]
    assert (row["n"], row["both_pass"], row["a_only"], row["b_only"],
            row["neither"]) == (n, bp, ao, bo, ne)
    assert abs(row["po"] - po) < 1e-5
    assert abs(row["pe"] - pe) < 1e-5
    assert abs(row["kappa"] - kappa) < 1e-5
    assert abs(row["phi"] - phi) < 1e-5


def _nb_probs(spark, sf_dir):
    """(lang, y, p) per doc off the shared scorer — the scorer itself
    is brute-recounted in test_r10_behavior."""
    from flink_template_spark.plans.quality import _nb_scored

    return [
        (r["lang"], r["y"],
         round(1.0 / (1.0 + math.exp(-r["score_q"] / 1e7)), 6))
        for r in _nb_scored(spark, sf_dir).collect()
    ]


def test_pr_curve_recounts_brute(spark, sf_dir):
    rows = _nb_probs(spark, sf_dir)
    n_pos = sum(y for _, y, _ in rows)
    got = {
        r["threshold_decile"]: r
        for r in plans.QUERIES["q_pr_curve_nb"](spark, sf_dir).collect()
    }
    assert set(got) == set(range(10))
    for k in range(10):
        # predict positive when p >= k/10 — recounted DIRECTLY on p,
        # not via the bucket identity the query exploits
        pp = sum(1 for _, _, p in rows if p >= k / 10)
        tp = sum(y for _, y, p in rows if p >= k / 10)
        r = got[k]
        assert r["n_pred_pos"] == pp and r["tp"] == tp, k
        if pp:
            assert abs(r["prec"] - tp / pp) < 1e-5
        else:
            assert r["prec"] is None
        assert abs(r["recall"] - tp / n_pos) < 1e-5
        if pp:
            assert abs(r["f1"] - 2 * tp / (pp + n_pos)) < 1e-5
            prec, rec = tp / pp, tp / n_pos
            f1_classic = (
                0.0 if prec + rec == 0 else 2 * prec * rec / (prec + rec)
            )
            # the 2tp/(pp+npos) collapse must equal the P/R definition
            assert abs(r["f1"] - f1_classic) < 1e-5


def test_logloss_recounts_brute(spark, sf_dir):
    agg = {}
    for lang, y, p in _nb_probs(spark, sf_dir):
        pc = min(max(p, 1e-6), 1 - 1e-6)
        term = -math.log(pc if y == 1 else 1.0 - pc)
        n, s = agg.get(lang, (0, 0))
        agg[lang] = (n + 1, s + round(term * 1e7))
    got = {
        r["lang"]: r
        for r in plans.QUERIES["q_logloss_nb"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for lang, (n, s) in agg.items():
        assert got[lang]["n_docs"] == n
        assert abs(got[lang]["mean_logloss"] - s / (1e7 * n)) < 1e-5
    # proper-scoring sanity: a perfect gate would read ~0; the clip
    # bounds any doc's term at -ln(1e-6)
    for r in got.values():
        assert 0.0 <= r["mean_logloss"] <= -math.log(1e-6) + 1e-9


def test_label_noise_recounts_brute(spark, sf_dir):
    rows = _nb_probs(spark, sf_dir)
    pqs = [(lang, y, round(p * 1e6)) for lang, y, p in rows]
    s1 = sum(pq for _, y, pq in pqs if y == 1)
    n1 = sum(1 for _, y, _ in pqs if y == 1)
    s0 = sum(1000000 - pq for _, y, pq in pqs if y == 0)
    n0 = sum(1 for _, y, _ in pqs if y == 0)
    agg = {}
    for lang, y, pq in pqs:
        n, sp, to_en, from_en = agg.get(lang, (0, 0, 0, 0))
        to_en += int(y == 0 and pq * n1 >= s1)
        from_en += int(y == 1 and (1000000 - pq) * n0 >= s0)
        agg[lang] = (n + 1, sp + pq, to_en, from_en)
    got = {
        r["lang"]: r
        for r in plans.QUERIES["q_label_noise_candidates"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(agg)
    for lang, (n, sp, to_en, from_en) in agg.items():
        r = got[lang]
        assert r["n_docs"] == n
        assert abs(r["mean_p_en"] - sp / (1e6 * n)) < 1e-5
        assert r["n_noise_to_en"] == to_en, lang
        assert r["n_noise_from_en"] == from_en, lang
    # the flag direction must be cross-class: en-labeled docs can only
    # be noise AWAY from en, others only TOWARD en
    assert got["en"]["n_noise_to_en"] == 0
    assert all(r["n_noise_from_en"] == 0 for l, r in got.items() if l != "en")


def test_levene_recounts_brute(spark, sf_dir):
    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r["o_orderpriority"], []).append(
            float(r["o_totalprice"])
        )
    zs: dict[str, list[float]] = {}
    for g, xs in groups.items():
        mean = sum(xs) / len(xs)  # cents-exact floats: sum is fine here
        zs[g] = [round(abs(x - mean), 2) for x in xs]
    k = len(zs)
    n = sum(len(v) for v in zs.values())
    grand = sum(sum(v) for v in zs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in zs.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in zs.values()
    )
    w = (ssb / (k - 1)) / (ssw / (n - k))
    row = plans.QUERIES["q_levene_variance"](spark, sf_dir).collect()[0]
    assert row["k_groups"] == k and row["n_rows"] == n
    assert abs(row["ss_between"] - ssb) / max(ssb, 1) < 1e-4
    assert abs(row["ss_within"] - ssw) / max(ssw, 1) < 1e-4
    assert abs(row["w_stat"] - w) < 1e-3


def test_auc_nb_gate_recounts_brute(spark, sf_dir):
    """O(n_pos·n_neg) pairwise AUC — the definition, not the rank
    formula the query uses."""
    from flink_template_spark.plans.quality import _nb_scored

    rows = [(r["y"], r["score_q"]) for r in _nb_scored(spark, sf_dir).collect()]
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    num = 0.0
    for p in pos:
        for n in neg:
            num += 1.0 if p > n else (0.5 if p == n else 0.0)
    auc = num / (len(pos) * len(neg))
    row = plans.QUERIES["q_auc_nb_gate"](spark, sf_dir).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert abs(row["auc"] - auc) < 1e-5
    assert abs(row["gini"] - (2 * auc - 1)) < 1e-5


def test_theils_u_recounts_brute(spark, sf_dir):
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "lang"
    ).collect()
    joint = Counter((r["source"], r["lang"]) for r in docs)
    n = sum(joint.values())

    def h(counts):
        return -sum((c / n) * math.log(c / n) for c in counts.values())

    def _m(idx):
        m = Counter()
        for k, c in joint.items():
            m[k[idx]] += c
        return m

    hl, hs, hj = h(_m(1)), h(_m(0)), h(joint)
    row = plans.QUERIES["q_theils_u_lang_source"](spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert abs(row["h_lang"] - hl) < 1e-5
    assert abs(row["h_source"] - hs) < 1e-5
    assert abs(row["h_lang_given_source"] - (hj - hs)) < 1e-5
    assert abs(row["u_lang_given_source"] - (hl - (hj - hs)) / hl) < 1e-5
    assert abs(row["u_source_given_lang"] - (hs - (hj - hl)) / hs) < 1e-5
    # uncertainty coefficients live in [0, 1]
    assert 0.0 <= row["u_lang_given_source"] <= 1.0
    assert 0.0 <= row["u_source_given_lang"] <= 1.0


def test_minhash_jaccard_err_recounts_brute(spark, sf_dir, docs_rows):
    """Third-path replay: candidates from the banded buckets of the
    recounted signatures, estimate = matching components / 16, exact
    Jaccard from raw shingle sets — nothing shared with either engine
    beyond the published constants."""
    from flink_template_spark.functions.hashing import (
        LSH_BANDS,
        NUM_HASHES,
        ROWS_PER_BAND,
    )

    sigs = _minhash_sigs(docs_rows)
    shsets = {r["doc_id"]: _shingles(r["text"]) for r in docs_rows}
    buckets: dict[tuple[int, str], list[int]] = {}
    for did, mh in sigs.items():
        for b in range(LSH_BANDS):
            key = "_".join(
                str(mh[b * ROWS_PER_BAND + r]) for r in range(ROWS_PER_BAND)
            )
            buckets.setdefault((b, key), []).append(did)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b2 in ids[i + 1 :]:
                cand.add((a, b2))
    want = {}
    for a, b in cand:
        est = sum(
            1 for i in range(NUM_HASHES) if sigs[a][i] == sigs[b][i]
        ) / NUM_HASHES
        inter = len(shsets[a] & shsets[b])
        exact = inter / (len(shsets[a]) + len(shsets[b]) - inter)
        want[(a, b)] = (est, exact)
    got = {
        (r["id_a"], r["id_b"]): r
        for r in plans.QUERIES["q_minhash_jaccard_err"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(want)
    for k, (est, exact) in want.items():
        r = got[k]
        assert abs(r["est_jaccard"] - est) < 1.1e-6, k
        assert abs(r["exact_jaccard"] - exact) < 1.1e-6, k
        assert abs(r["abs_err"] - abs(est - exact)) < 2.1e-6, k
    # sketch-quality envelope: mean |err| should sit within ~3 sigma of
    # the binomial sketch bound sqrt(J(1-J)/16) <= 0.125
    errs = [abs(e - x) for e, x in want.values()]
    if errs:
        assert sum(errs) / len(errs) <= 3 * 0.125


def _xy2d(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_layout_recounts_brute(spark, sf_dir):
    from collections import defaultdict

    from flink_template_spark.plans.datapipe import (
        _Z_BITS,
        _Z_PARTS_SHIFT,
        _Z_PRICE_BUCKET,
    )

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity"
    ).collect()
    n = 1 << _Z_BITS
    agg = defaultdict(lambda: [0, None, None, None, None])
    for r in rows:
        qx = math.floor(float(r["l_extendedprice"]) / _Z_PRICE_BUCKET)
        qy = math.floor(float(r["l_quantity"])) - 1
        pid = _xy2d(n, qx, qy) >> _Z_PARTS_SHIFT
        a = agg[pid]
        a[0] += 1
        q, p = r["l_quantity"], r["l_extendedprice"]
        a[1] = q if a[1] is None else min(a[1], q)
        a[2] = q if a[2] is None else max(a[2], q)
        a[3] = p if a[3] is None else min(a[3], p)
        a[4] = p if a[4] is None else max(a[4], p)
    got = {
        r["pid"]: r
        for r in plans.QUERIES["q_hilbert_layout"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for pid, (cnt, mnq, mxq, mnp, mxp) in agg.items():
        r = got[pid]
        assert r["n_rows"] == cnt, pid
        assert (r["min_qty"], r["max_qty"]) == (mnq, mxq), pid
        assert (r["min_price"], r["max_price"]) == (mnp, mxp), pid


def test_hilbert_index_matches_reference_and_adjacency(spark):
    """The unrolled Column expression must equal the classic xy2d
    recipe on the full 16×16 grid, and the curve property must hold:
    consecutive indices are ALWAYS adjacent cells (the locality
    guarantee Morton lacks — this is the reason the query exists)."""
    import pyspark.sql.functions as F

    from flink_template_spark.functions.zorder import hilbert_index

    bits, n = 4, 16
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select(
            "x", "y", hilbert_index(F.col("x"), F.col("y"), bits).alias("d")
        ).collect()
    }
    want = {(x, y): _xy2d(n, x, y) for x, y in pts}
    assert got == want
    assert sorted(want.values()) == list(range(n * n))  # bijection
    inv = {d: xy for xy, d in want.items()}
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = inv[d], inv[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, d


# ---------------------------------------------------------------------------
# Property tests (hypothesis): the round-12 identities on RANDOM inputs,
# not just the fixtures — pure Python vs pure Python, no Spark session.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(-50, 50)),
        min_size=2,
        max_size=60,
    )
)
def test_auc_midrank_identity_property(rows):
    """The doubled-midrank Mann-Whitney formula the AUC query ships
    must equal the pairwise AUC definition on ANY score/label list
    with ties — if either class is empty the formula is out of scope."""
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    if not pos or not neg:
        return
    scores = sorted(s for _, s in rows)
    # midrank2 = 2*rank_min + tie_count - 1 per value
    first = {}
    cnt = {}
    for i, s in enumerate(scores, start=1):
        first.setdefault(s, i)
        cnt[s] = cnt.get(s, 0) + 1
    pm2 = sum(2 * first[s] + cnt[s] - 1 for s in pos)
    n1, n0 = len(pos), len(neg)
    formula = (pm2 - n1 * (n1 + 1)) / (2 * n1 * n0)
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    ) / (n1 * n0)
    assert abs(formula - brute) < 1e-12


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 8), st.data())
def test_hilbert_dfa_matches_xy2d_property(bits, data):
    """The LUT DFA must equal the classic recipe for random points at
    every grid size up to 256x256 (the fixture query only exercises
    bits=6)."""
    from flink_template_spark.functions.zorder import (
        _HILBERT_DIGIT_LUT,
        _HILBERT_STATE_LUT,
    )

    n = 1 << bits
    x = data.draw(st.integers(0, n - 1))
    y = data.draw(st.integers(0, n - 1))
    st_, d = 0, 0
    for i in range(bits - 1, -1, -1):
        inp = 2 * ((x >> i) & 1) + ((y >> i) & 1)
        d = d * 4 + _HILBERT_DIGIT_LUT[st_ * 4 + inp]
        st_ = _HILBERT_STATE_LUT[st_ * 4 + inp]
    assert d == _xy2d(n, x, y)


@settings(max_examples=300, deadline=None)
@given(
    st.integers(0, 200),
    st.integers(0, 200),
    st.integers(0, 200),
    st.integers(0, 200),
)
def test_kappa_phi_bounds_property(bp, ao, bo, ne):
    """Kappa and phi as shipped must respect their textbook envelopes
    on ANY 2x2 table: kappa <= 1, |phi| <= 1, and phi² equals the
    chi²/n of the same table (the phi–chi² identity)."""
    n = bp + ao + bo + ne
    if n == 0:
        return
    pe_num = (bp + ao) * (bp + bo) + (bo + ne) * (ao + ne)
    if n * n != pe_num:  # kappa defined
        kappa = (n * (bp + ne) - pe_num) / (n * n - pe_num)
        assert kappa <= 1 + 1e-12
    m1, m2, m3, m4 = bp + ao, bo + ne, bp + bo, ao + ne
    if min(m1, m2, m3, m4) > 0:
        phi = (bp * ne - ao * bo) / math.sqrt(m1 * m2 * m3 * m4)
        assert -1 - 1e-12 <= phi <= 1 + 1e-12
        # chi² (no continuity correction) of the 2x2 table
        chi2 = n * (bp * ne - ao * bo) ** 2 / (m1 * m2 * m3 * m4)
        assert abs(phi * phi - chi2 / n) < 1e-9


def test_audio_pcm_features_recounts_brute(spark, sf_dir):
    """struct.unpack re-derivation of the s16le statistics — a third
    path beside the numpy mapInPandas kernel and the SQL hex-pair
    oracle."""
    import struct

    from flink_template_spark.multimodal.assets import load_assets

    payloads = {
        r["asset_id"]: bytes(r["payload"])
        for r in load_assets(spark, sf_dir)
        .filter("asset_id < 50")
        .select("asset_id", "payload")
        .collect()
    }
    got = {
        r["asset_id"]: r
        for r in plans.QUERIES["q_audio_pcm_features"](spark, sf_dir).collect()
    }
    want_ids = {a for a, p in payloads.items() if len(p) >= 2}
    assert set(got) == want_ids
    for aid in want_ids:
        p = payloads[aid]
        ns = len(p) // 2
        s = struct.unpack("<" + "h" * ns, p[: ns * 2])
        sum_sq = sum(v * v for v in s)
        zc = sum(
            1 for i in range(1, ns) if (s[i] < 0) != (s[i - 1] < 0)
        )
        peak = max(abs(v) for v in s)
        r = got[aid]
        assert r["n_samples"] == ns, aid
        assert r["n_zero_cross"] == zc, aid
        assert r["peak_abs"] == peak, aid
        assert abs(r["rms"] - math.sqrt(sum_sq / ns)) < 1.1e-6, aid


def test_pcm16_features_edge_payloads(spark):
    """Odd-length payloads drop the trailing byte; a single sample has
    zero crossings; an empty payload yields zeroed stats (the query
    filters them out, but the OPERATOR must not crash)."""
    import pyspark.sql.functions as F

    from flink_template_spark.multimodal.features import pcm16_features

    rows = [
        (0, bytearray([0x01, 0x80])),  # one sample: -32767
        (1, bytearray([0xFF, 0x7F, 0x00, 0x80, 0x05])),  # odd: 2 samples
        (2, bytearray([])),  # empty
        (3, bytearray([0x00, 0x00, 0x01, 0x00, 0xFF, 0xFF])),  # 0, 1, -1
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in pcm16_features(df).collect()}
    assert got[0]["n_samples"] == 1 and got[0]["n_zero_cross"] == 0
    assert got[0]["peak_abs"] == 32767 and got[0]["sum_sq"] == 32767 * 32767
    # 0x7FFF=32767 then 0x8000=-32768: one flip; trailing byte dropped
    assert got[1]["n_samples"] == 2 and got[1]["n_zero_cross"] == 1
    assert got[1]["peak_abs"] == 32768
    assert got[2]["n_samples"] == 0 and got[2]["sum_sq"] == 0
    assert got[2]["peak_abs"] == 0 and got[2]["n_zero_cross"] == 0
    # 0 counts as non-negative: 0 -> 1 no flip, 1 -> -1 one flip
    assert got[3]["n_zero_cross"] == 1


def test_minhash_err_pair_grain_consistent_with_decile_rollup(spark, sf_dir):
    """q_minhash_jaccard_err (pair grain, r12) and
    q_minhash_estimate_error (decile rollup, r9) implement the same
    audit independently — recompute the rollup from the pair rows and
    require agreement, so a drift in either implementation trips
    here."""
    pairs = plans.QUERIES["q_minhash_jaccard_err"](spark, sf_dir).collect()
    rollup = {
        r["j_decile"]: r
        for r in plans.QUERIES["q_minhash_estimate_error"](
            spark, sf_dir
        ).collect()
    }
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    for r in pairs:
        d = min(int(r["exact_jaccard"] * 10), 9)
        a = agg[d]
        a[0] += 1
        a[1] += r["exact_jaccard"]
        a[2] += r["est_jaccard"]
        a[3] += abs(r["est_jaccard"] - r["exact_jaccard"])
    assert set(agg) == set(rollup)
    for d, (n, se, sm, serr) in agg.items():
        r = rollup[d]
        assert r["n_pairs"] == n, d
        assert abs(r["mean_exact"] - se / n) < 2e-6, d
        assert abs(r["mean_est"] - sm / n) < 2e-6, d
        assert abs(r["mean_abs_err"] - serr / n) < 2e-6, d
