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
