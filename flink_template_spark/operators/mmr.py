"""Maximal Marginal Relevance (MMR) diversified re-ranking.

The diversity-aware final stage of a retrieval stack (Carbonell &
Goldstein, SIGIR'98): given a relevance-ranked candidate pool, pick k
results greedily by

    argmax_c  λ·rel(c) − (1−λ)·max_{s ∈ S} sim(c, s)

so near-duplicate hits don't crowd the result list — the SERVE-time
complement of semdedup (which deduplicates the corpus) and of the
facility-location coreset (which maximizes coverage; MMR penalizes
redundancy against what's already picked instead).

Determinism & oracle-exactness (the operators.coreset discipline):
relevance and pairwise similarities are micro-unit-quantized integers
(ROUND(cos·1e6) → bigint), and λ = 0.7 enters as the integer weights
obj = 7·rel_q − 3·maxsim_q (the ×10 scale never changes an argmax), so
each round's argmax (obj desc, id asc) is a total order both engines
replay identically; the DuckDB oracle unrolls the same k rounds as a
CTE chain.

Scale shape: MMR is a SERVE-path operator over an already-shortlisted
pool (top-20 here — the ANN rerank shortlist posture, plans/vectors.py
q_ann_multiprobe_rerank). The pool-pair table is |pool|² by contract,
never corpus-sized; each round is one join + one 1-row argmax collect
(k rows of control-plane data total, like coreset/kmeans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MMR_REL_W = 7  # λ = 0.7 as integer weights: obj = 7·rel − 3·maxsim
MMR_DIV_W = 3


def mmr_select(pool: DataFrame, sims: DataFrame, k: int) -> list[dict]:
    """Run k MMR rounds; returns one dict per round:
    {round, vec_id, rel_q, maxsim_q, obj_q}.

    ``pool``: (vec_id, rel_q) — the shortlisted candidates with
    quantized relevance. ``sims``: (a, b, sim_q) — quantized pairwise
    similarity over the pool (both directions present or symmetric
    construction). Driver-side list BY DESIGN: k 1-row argmax fetches
    over a bounded pool."""
    state = pool.select(
        "vec_id", "rel_q", F.lit(0).cast("bigint").alias("maxsim_q")
    ).localCheckpoint()
    out: list[dict] = []
    chosen: list = []
    for t in range(1, k + 1):
        cand = state
        if chosen:
            cand = cand.filter(~F.col("vec_id").isin(chosen))
        top = (
            cand.select(
                "vec_id",
                "rel_q",
                "maxsim_q",
                (
                    F.lit(MMR_REL_W) * F.col("rel_q")
                    - F.lit(MMR_DIV_W) * F.col("maxsim_q")
                ).alias("obj_q"),
            )
            .orderBy(F.desc("obj_q"), "vec_id")
            .limit(1)
            .collect()
        )
        if not top:
            break  # pool smaller than k
        r = top[0]
        chosen.append(r["vec_id"])
        out.append(
            {
                "round": t,
                "vec_id": r["vec_id"],
                "rel_q": r["rel_q"],
                "maxsim_q": r["maxsim_q"],
                "obj_q": r["obj_q"],
            }
        )
        to_new = sims.filter(F.col("a") == r["vec_id"]).select(
            F.col("b").alias("vec_id"), F.col("sim_q").alias("__s_new")
        )
        state = (
            state.join(to_new, "vec_id", "left")
            .select(
                "vec_id",
                "rel_q",
                F.greatest(
                    F.col("maxsim_q"), F.coalesce(F.col("__s_new"), F.lit(0))
                ).alias("maxsim_q"),
            )
            .localCheckpoint()
        )
    return out


def mmr_sql(k: int) -> str:
    """DuckDB oracle: the identical k rounds unrolled. Expects CTEs
    ``pool(vec_id, rel_q)`` and ``sims(a, b, sim_q)``; emits ms0..ms{k}
    and pick1..pick{k} plus a final ``picks`` CTE with
    (round, vec_id, rel_q, maxsim_q, obj_q)."""
    parts = [
        "ms0 AS MATERIALIZED"
        " (SELECT vec_id, rel_q, CAST(0 AS BIGINT) AS maxsim_q FROM pool)"
    ]
    for t in range(1, k + 1):
        prior = " UNION ALL ".join(
            f"SELECT vec_id FROM pick{i}" for i in range(1, t)
        )
        excl = f"\n  WHERE vec_id NOT IN ({prior})" if t > 1 else ""
        parts.append(
            f"""pick{t} AS MATERIALIZED (
  SELECT vec_id, rel_q, maxsim_q,
         {MMR_REL_W} * rel_q - {MMR_DIV_W} * maxsim_q AS obj_q
  FROM ms{t - 1}{excl}
  ORDER BY obj_q DESC, vec_id LIMIT 1
),
ms{t} AS MATERIALIZED (
  SELECT m.vec_id, m.rel_q,
         GREATEST(m.maxsim_q, COALESCE(s.sim_q, 0)) AS maxsim_q
  FROM ms{t - 1} m
  LEFT JOIN (
    SELECT sims.b AS vec_id, sims.sim_q
    FROM sims JOIN pick{t} ON sims.a = pick{t}.vec_id
  ) s ON m.vec_id = s.vec_id
)"""
        )
    rounds_union = "\n  UNION ALL\n".join(
        f"  SELECT {t} AS round, vec_id, rel_q, maxsim_q, obj_q FROM pick{t}"
        for t in range(1, k + 1)
    )
    return ",\n".join(parts) + f",\npicks AS (\n{rounds_union}\n)"
