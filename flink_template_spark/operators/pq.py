"""Product quantization (PQ) for embedding compression + ADC search —
the memory half of the ANN scale story (IVF routes the search,
PQ shrinks the vectors it scans).

Scale shape:

- training (``pq_train``) runs an L2 Lloyd loop per SUBSPACE on slices
  of the vectors; per round only k×(dim/m) floats reach the driver —
  identical discipline to operators.kmeans;
- encoding (``pq_encode``) is a map-side argmin against broadcast
  codebook literals: dim floats → m small ints, a ~(4·dim)/m× storage
  and shuffle reduction for every downstream consumer;
- search (``pq_adc_topk``) precomputes the query's m×k distance table
  ON THE DRIVER (m·k floats) and scores codes with pure
  ``element_at`` lookups + a fixed sum — whole-stage codegen over the
  compressed table, never touching the original vectors. Top-k via
  TakeOrderedAndProject (per-partition heaps, no global sort).

Training is deterministic by the same discipline as operators.kmeans
(init = first k vectors by id, fixed-point-quantized exact-integer
means, argmin ties → lowest code index), so a bounded Lloyd loop is
SQL-replayable — q_pq_adc_topk carries a full DuckDB oracle;
tests/test_pq.py additionally pins determinism, reconstruction-error
dominance over a degenerate codebook, and ADC↔exact agreement on
separated data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Codebook = list[list[float]]  # k code vectors for one subspace

# fixed-point scale for exact-integer means — ONE source of truth shared
# with operators.kmeans (the vectors.py oracle CTEs hardcode the same
# 1e7 literal; changing it means changing them together)
from flink_template_spark.operators.kmeans import QUANT  # noqa: E402


def _subvec(vec_col: str, j: int, d: int):
    return F.slice(F.col(vec_col), j * d + 1, d)


def _sq_l2(sub, code: list[float]):
    """Squared L2 between a subvector Column and a literal code vector,
    as an unrolled codegen sum (no HOF lambdas; d is small by design).

    The unrolled form trades a few seconds of one-time janino compile
    (k·d terms per argmin) for per-row evaluation that stays inside
    whole-stage codegen — the right side of the trade everywhere the
    expression runs per corpus row (encode/ADC) and acceptable for
    training, which at real scale runs on a sample anyway.

    diff*diff, not diff**2: plain multiplication is the same IEEE
    operation in every engine, whereas pow() is libm-dependent — keeps
    the distances bit-identical to the DuckDB oracle replay."""
    terms = []
    for i, c in enumerate(code):
        diff = F.element_at(sub, i + 1).cast("double") - F.lit(float(c))
        terms.append(diff * diff)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _argmin_code(sub, codebook: Codebook):
    """Index (0-based) of the nearest code; ties → lowest index."""
    dists = F.array(*[_sq_l2(sub, c) for c in codebook])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train(
    vectors: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[Codebook]:
    """L2 Lloyd loop over ALL subspaces at once — one Spark job per
    round (assign codes for every subspace in a single projection, one
    (subspace, code, dim) mean aggregation), not one per subspace.
    Deterministic: init = first k vectors by id; means via fixed-point
    quantization (×1e7 → exact bigint sums, identical in any partition
    order — same discipline as operators.kmeans); an empty cluster
    keeps its previous code vector."""
    dim = len(vectors.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    init_rows = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    codebooks: list[Codebook] = [
        [
            [float(x) for x in row[vec_col][j * d : (j + 1) * d]]
            for row in init_rows
        ]
        for j in range(m)
    ]
    for _ in range(n_iter):
        code_arr = F.array(
            *[
                _argmin_code(_subvec(vec_col, j, d), codebooks[j])
                for j in range(m)
            ]
        )
        ex = vectors.select(
            code_arr.alias("codes"), F.posexplode(vec_col).alias("gp", "x")
        )
        j_col = (F.col("gp") / d).cast("int")
        means = (
            ex.select(
                j_col.alias("j"),
                F.element_at("codes", j_col + 1).alias("code"),
                (F.col("gp") % d).alias("pos"),
                F.round(F.col("x").cast("double") * QUANT, 0)
                .cast("bigint")
                .alias("q"),
            )
            .groupBy("j", "code", "pos")
            .agg(
                (
                    F.sum("q").cast("double")
                    / (F.lit(QUANT) * F.count(F.lit(1)))
                ).alias("mx")
            )
            .collect()
        )
        by_jc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            by_jc.setdefault((r.j, r.code), {})[r.pos] = float(r.mx)
        codebooks = [
            [
                [by_jc[(j, c)][p] for p in range(d)]
                if (j, c) in by_jc
                else codebooks[j][c]
                for c in range(k)
            ]
            for j in range(m)
        ]
    return codebooks


def pq_encode(
    vectors: DataFrame,
    codebooks: list[Codebook],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): m nearest-code indices per vector, map-side only."""
    d = len(codebooks[0][0])
    codes = F.array(
        *[
            _argmin_code(_subvec(vec_col, j, d), cb)
            for j, cb in enumerate(codebooks)
        ]
    )
    return vectors.select(F.col(id_col), codes.alias("codes"))


def pq_decode_expr(codebooks: list[Codebook]):
    """Reconstructed vector from a ``codes`` column (literal lookup)."""
    parts = []
    for j, cb in enumerate(codebooks):
        table = F.array(*[F.array(*[F.lit(x) for x in code]) for code in cb])
        parts.append(F.element_at(table, F.element_at("codes", j + 1) + 1))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[Codebook],
    query: list[float],
    k_results: int = 10,
    id_col: str = "vec_id",
    round_dp: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per-subspace distance
    tables from the raw query (driver-computed m×k floats, broadcast as
    literals), scored with element_at lookups — the compressed scan.

    With ``round_dp`` the score is rounded BEFORE the ordering (ties
    then break on id), making the result set engine-portable: the
    table entries are left-to-right folds of diff*diff, which the SQL
    oracle reproduces, and rounding absorbs the final cross-subspace
    sum's ulp."""
    d = len(codebooks[0][0])
    score = None
    for j, cb in enumerate(codebooks):
        q_sub = query[j * d : (j + 1) * d]
        table = F.array(
            *[
                F.lit(sum((qx - cx) * (qx - cx) for qx, cx in zip(q_sub, code)))
                for code in cb
            ]
        )
        term = F.element_at(table, F.element_at("codes", j + 1) + 1)
        score = term if score is None else score + term
    if round_dp is not None:
        score = F.round(score, round_dp)
    return (
        encoded.select(id_col, score.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k_results)
    )
