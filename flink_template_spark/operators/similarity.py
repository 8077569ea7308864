"""Similarity search over an embedding column (``array<float>``).

Two tiers (SURVEY.md §2.7 north-star):

- ``brute_force_topk``: exact cosine top-k. The query vector is a
  broadcast single-row DataFrame; scoring is a JVM-side expression over
  every row — a full scan, but embarrassingly parallel and shuffle-free
  until the final top-k (which Spark executes as per-partition heaps +
  driver merge via TakeOrderedAndProject). This is the correctness
  baseline at any scale.
- ``ivf_topk``: IVF-style probe. Vectors are pre-assigned to the nearest
  of K centroids (one broadcast join + argmax, no shuffle of the big
  side); a query scores only its own cluster — at 100 TB with K=4096
  this cuts the scan by ~K×. Here centroids are taken deterministically
  (vec_id < K) so the oracle can reproduce the assignment; in production
  they'd come from k-means.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from flink_template_spark.functions.vector import (
    cosine,
    cosine_arrow,
    dot,
    dot_arrow,
    l2_norm,
    valid_vec,
)


def _spread(df: DataFrame) -> DataFrame:
    """Repartition to session parallelism before per-row vector math —
    single-file parquet inputs otherwise run the expensive expressions
    on one core (one input split)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine to the (single-row) query DataFrame.
    Degenerate vectors (zero-norm / NaN / Inf elements) are excluded
    on both sides — see functions.vector.valid_vec."""
    q = query.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        vectors.filter(valid_vec(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            # Arrow exact-fold dual of cosine(): identical raw doubles,
            # rounded HERE in the plan (functions.vector kernel notes)
            F.round(cosine_arrow(F.col(vec_col), F.col("__qvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def centroid_cos_arrow(cvecs: "list[list[float]]", vec_col):
    """ALL centroid cosines per vector in ONE Arrow pass — the blocked
    dual of k per-(vector, centroid) ``cosine_arrow`` pair rows
    (optimization r13, guide §4.2): each corpus vector crosses the
    Python boundary once instead of k times, and no pair rows are ever
    materialized. Bit-exact by the r12 kernel construction — per
    centroid c the dot accumulates dimension-by-dimension from zeros
    (the aggregate(zip_with) left fold), norms fold the same way
    (np.sqrt ≡ JVM sqrt), and cosine divides by (norm_v · norm_c) in
    the same order, so every raw double matches cosine()/cosine_arrow()
    bit-for-bit (pinned by
    tests/test_r13_opt.py::test_ivf_assign_mapside_identical). Rounding
    stays in the Spark plan (r12 kernel discipline). Inputs must be
    valid_vec-filtered (NaN would cross the Arrow NaN→NULL boundary)
    and fixed-width (a width-mismatched vector row yields NULL sims,
    like the zip_with pad → NULL fold)."""
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    C = np.array(cvecs, dtype=np.float64)  # k × d
    k, d = C.shape
    cnorm = np.empty(k)
    for c in range(k):
        acc = 0.0
        for i in range(d):
            acc += C[c, i] * C[c, i]  # l2_norm's exact scalar fold
        cnorm[c] = acc
    cnorm = np.sqrt(cnorm)

    @pandas_udf("array<double>")
    def fn(v: pd.Series) -> pd.Series:
        n = len(v)
        out = [None] * n
        idx = np.flatnonzero(v.notna().to_numpy())
        if len(idx):
            try:
                V = np.array(v.iloc[idx].tolist(), dtype=np.float64)
                if V.ndim != 2 or V.shape[1] != d:
                    raise ValueError
            except (ValueError, TypeError):
                return pd.Series(out, dtype=object)  # off-width → NULL
            nrow = len(idx)
            vacc = np.zeros(nrow)
            for i in range(d):
                x = V[:, i]
                vacc += x * x
            vnorm = np.sqrt(vacc)
            sims = np.empty((nrow, k))
            for c in range(k):
                acc = np.zeros(nrow)
                for i in range(d):
                    acc += V[:, i] * C[c, i]  # dot's exact fold
                sims[:, c] = acc / (vnorm * cnorm[c])
            for p, i in enumerate(idx):
                out[i] = sims[p]
        return pd.Series(out, dtype=object)

    return fn(vec_col)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (rounded
    similarity + centroid id tiebreak for determinism).
    Degenerate vectors/centroids (zero-norm / NaN / Inf) are excluded
    (functions.vector.valid_vec) — every IVF/semdedup/knn-IVF consumer
    inherits the guard from here; consumers whose output is a KEEP-SET
    (semdedup) therefore also exclude them, so pipelines that must not
    lose rows should route df.filter(~valid_vec(col)) separately.
    ``keep_cols`` rides extra input columns through the argmax (the
    ann_index build carries its PQ codes here instead of re-joining
    them on vec_id afterwards — optimization r12).

    Map-side since optimization r13: the centroid set is collected once
    (bounded control-plane, same contract as the previous
    F.broadcast(c) — and as knn_join_gemm's query collect), every
    vector gets its k cosines from ONE Arrow pass
    (:func:`centroid_cos_arrow`), the 6-dp rounding happens in the
    Spark plan (transform + F.round, the same BigDecimal HALF_UP as
    before), and the argmax is array_position(array_max) — first match
    ≡ lowest centroid id on rounded ties, exactly the old window's
    (DESC c_sim, ASC centroid_id) row_number. The per-vector×centroid
    pair rows AND the window's full id-partitioned Exchange+Sort are
    gone; the assignment is a pure projection over the corpus scan."""
    c_rows = (
        centroids.filter(valid_vec(F.col(vec_col)))
        .select(centroid_id, vec_col)
        .collect()
    )
    c_rows.sort(key=lambda r: r[centroid_id])
    base = vectors.filter(valid_vec(F.col(vec_col)))
    if not c_rows:
        # empty/degenerate centroid set -> empty result, like the old
        # crossJoin against an empty broadcast side
        cid_type = centroids.schema[centroid_id].dataType.simpleString()
        return base.select(
            id_col,
            vec_col,
            *[F.col(k) for k in keep_cols],
            F.lit(None).cast(cid_type).alias("cluster"),
        ).filter(F.lit(False))
    cvecs = [[float(x) for x in r[vec_col]] for r in c_rows]
    cid_arr = F.array(*[F.lit(r[centroid_id]) for r in c_rows])
    sims = centroid_cos_arrow(cvecs, vec_col)
    rounded = F.transform(sims, lambda x: F.round(x, 6))
    pick = F.element_at(
        cid_arr, F.array_position(rounded, F.array_max(rounded)).cast("int")
    )
    return base.select(
        id_col,
        vec_col,
        *[F.col(k) for k in keep_cols],
        pick.alias("cluster"),
    )


# target rows per block for the blocked exact pair scan: bounds each
# task's matrices at ~2·TARGET·d·8 bytes while keeping enough block
# pairs for parallelism; block count derives from the corpus size
# IN-PLAN (no eager count job), so the same code is right at any SF
_PAIR_BLOCK_TARGET = 256


def pair_cos_blocked(
    vectors: DataFrame,
    min_raw: float | None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    max_raw: float | None = None,
    score: str = "cos",
) -> DataFrame:
    """(id_a, id_b, raw_cos) for every unordered pair of valid vectors
    with RAW cosine ≥ ``min_raw`` — the blocked exact dual of the
    per-pair fold join (optimization r13, guide §4.2/§2.2).

    The r12 rule was "Arrow loses on pair-join shapes" because the join
    ships two full vectors per PAIR row through the Arrow boundary.
    Blocking restores the win: vectors are grouped into ~equal hash
    blocks (count-derived in-plan scalar → adaptive at any scale), each
    unordered BLOCK pair becomes one task, and each block's matrix
    crosses the boundary once per partner block instead of once per
    pair. Inside the kernel the fold is replayed EXACTLY:

    - dot: acc += A[:,i] * B[:,j-th col], accumulated dimension-by-
      dimension from zeros — the identical IEEE sequence as
      aggregate(zip_with(a, b, x*y), 0.0, +) for every pair at once;
    - norm: acc += x_i·x_i then np.sqrt — identical to l2_norm's fold
      (np.sqrt ≡ JVM sqrt, IEEE-exact);
    - cosine: dot / (norm_a · norm_b) — same multiply, same divide.

    So raw doubles are bit-identical to the fold path (pinned by
    tests/test_r13_opt.py::test_pair_cos_blocked_bit_identical), no
    rounding happens kernel-side (F.round's BigDecimal HALF_UP stays in
    the Spark plan, per the r12 kernel discipline), and NaN can never
    reach the Arrow NaN→NULL boundary (valid_vec admission). Pairs of
    DIFFERENT vector widths yield NULL dots under zip_with (pad → NULL
    fold) and are dropped by any threshold filter — the kernel
    reproduces that by bucketing each block by width and only scoring
    equal-width pairs. ``min_raw`` must carry the caller's rounding
    margin (round(x, 6) ≥ t ⟹ x ≥ t − 5e-7; callers pass t − 1e-6).

    Variants for the other pair-scoring consumers:
    - ``block_col``: use a NATURAL block key (e.g. an IVF cluster)
      instead of hash blocking — pairs are then scored strictly WITHIN
      a block (semdedup / triplet semantics), never across blocks.
    - ``score="dot"``: raw dot instead of cosine (no norm division) —
      the pre-unit-normalized triplet shape.
    - ``max_raw``: keep the LOW tail too — a row survives if raw ≥
      min_raw OR raw ≤ max_raw (the triplet positive/hard-negative
      band pair); pass min_raw=None for a single low tail."""
    import numpy as np

    id_type = vectors.schema[id_col].dataType.simpleString()

    if block_col is None:
        valid = vectors.filter(valid_vec(F.col(vec_col))).select(
            id_col, vec_col
        )
        nbdf = valid.agg(
            F.greatest(
                F.lit(1).cast("int"),
                F.ceil(
                    F.count(F.lit(1)).cast("double")
                    / float(_PAIR_BLOCK_TARGET)
                ).cast("int"),
            ).alias("__nb")
        )
        keyed = valid.crossJoin(F.broadcast(nbdf)).select(
            F.pmod(F.hash(F.col(id_col)), F.col("__nb")).alias("__bk"),
            id_col,
            vec_col,
        )
    else:
        keyed = vectors.filter(valid_vec(F.col(vec_col))).select(
            F.col(block_col).alias("__bk"), id_col, vec_col
        )
    blocks = (
        keyed.groupBy("__bk")
        .agg(F.collect_list(F.struct(id_col, vec_col)).alias("__items"))
        .select(
            "__bk",
            F.transform("__items", lambda x: x[id_col]).alias("ids"),
            F.transform("__items", lambda x: x[vec_col]).alias("vecs"),
        )
    )
    lhs = blocks.select(
        F.col("__bk").alias("bk_a"),
        F.col("ids").alias("ids_a"),
        F.col("vecs").alias("vecs_a"),
    )
    if block_col is not None:
        # natural blocks: within-block pairs only, no block-pair join —
        # the (ids, vecs) row IS the task
        joined = lhs.select(
            "bk_a",
            "ids_a",
            "vecs_a",
            F.col("ids_a").alias("ids_b"),
            F.col("vecs_a").alias("vecs_b"),
            F.col("bk_a").alias("bk_b"),
        )
    else:
        rhs = blocks.select(
            F.col("__bk").alias("bk_b"),
            F.col("ids").alias("ids_b"),
            F.col("vecs").alias("vecs_b"),
        )
        joined = lhs.join(rhs, F.col("bk_a") <= F.col("bk_b"))

    want_cos = score == "cos"

    def _mats(ids, vecs):
        """Width-bucketed (ids, matrix, norms) triples for one block."""
        by_w: dict = {}
        for i, v in zip(ids, vecs):
            by_w.setdefault(len(v), ([], []))
            by_w[len(v)][0].append(i)
            by_w[len(v)][1].append(v)
        out = []
        for w, (bi, bv) in by_w.items():
            M = np.array(bv, dtype=np.float64)
            if want_cos:
                acc = np.zeros(len(bi))
                for i in range(w):
                    x = M[:, i]
                    acc += x * x  # l2_norm's exact fold
                nrm = np.sqrt(acc)
            else:
                nrm = None
            out.append((np.asarray(bi), M, nrm))
        return out

    def gen(batches):
        for pdf in batches:
            o_a, o_b, o_r = [], [], []
            for ids_a, vecs_a, ids_b, vecs_b, same in zip(
                pdf["ids_a"],
                pdf["vecs_a"],
                pdf["ids_b"],
                pdf["vecs_b"],
                (pdf["bk_a"] == pdf["bk_b"]).to_numpy(),
            ):
                for ia, A, na in _mats(ids_a, vecs_a):
                    for ib, B, nb in _mats(ids_b, vecs_b):
                        if A.shape[1] != B.shape[1]:
                            continue  # zip_with pad → NULL dot → dropped
                        acc = np.zeros((len(ia), len(ib)))
                        for i in range(A.shape[1]):
                            # dot's exact fold, all pairs at once
                            acc += A[:, i, None] * B[None, :, i]
                        cos = (
                            acc / (na[:, None] * nb[None, :])
                            if want_cos
                            else acc
                        )
                        if min_raw is None and max_raw is None:
                            mask = np.ones(cos.shape, dtype=bool)
                        else:
                            mask = np.zeros(cos.shape, dtype=bool)
                            if min_raw is not None:
                                mask |= cos >= min_raw
                            if max_raw is not None:
                                mask |= cos <= max_raw
                        if same:
                            mask &= ia[:, None] < ib[None, :]
                        r, c = np.nonzero(mask)
                        if not len(r):
                            continue
                        lo = np.minimum(ia[r], ib[c])
                        hi = np.maximum(ia[r], ib[c])
                        o_a.append(lo)
                        o_b.append(hi)
                        o_r.append(cos[r, c])
            if o_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(o_a),
                        "id_b": np.concatenate(o_b),
                        "raw_cos": np.concatenate(o_r),
                    }
                )

    return joined.mapInPandas(
        gen, schema=f"id_a {id_type}, id_b {id_type}, raw_cos double"
    )


def cosine_near_dup_exact(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "blocked",
) -> DataFrame:
    """All pairs with cosine ≥ threshold — exact O(n²) baseline.

    Correctness reference only: at 100 TB use ``cosine_near_dup_lsh``,
    which explodes candidates only within hash buckets.

    ``impl="blocked"`` (default, optimization r13) scores block pairs
    through :func:`pair_cos_blocked` — bit-identical raw cosines, with
    F.round (BigDecimal HALF_UP, ~1 µs/row over n² pairs the old plan
    paid) applied only to the ≥ threshold−1e-6 survivors; the margin is
    conservative for round-half-up (round(x,6) ≥ t needs x ≥ t−5e-7).
    ``impl="fold"`` keeps the original per-pair JVM fold join — the
    differential pin for the kernel."""
    if impl == "blocked":
        raw = pair_cos_blocked(
            vectors, threshold - 1e-6, id_col=id_col, vec_col=vec_col
        )
        return (
            raw.select(
                "id_a", "id_b", F.round(F.col("raw_cos"), 6).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= threshold)
            .orderBy("id_a", "id_b")
        )
    with_norm = _spread(vectors.filter(valid_vec(F.col(vec_col)))).select(
        id_col, vec_col, l2_norm(F.col(vec_col)).alias("__norm")
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        F.col("__norm").alias("norm_a"),
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        F.col("__norm").alias("norm_b"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster-blocked cosine dominance.

    Assign every vector to its nearest centroid (``ivf_assign``), then
    within each cluster drop any vector that has a LOWER-id neighbor
    with cosine ≥ threshold (deterministic keep-first). Returns the
    kept (id, cluster) rows.

    Scale contract: the pair scoring is per-cluster (natural blocks in
    :func:`pair_cos_blocked`), so cost is quadratic only in the largest
    CELL, never the corpus — with K centroids sized to the corpus
    (K ~ N/target cell size) this is the standard SemDeDup shape.

    Optimization r13: the within-cluster pair join (each pair row
    shipping two vectors + two norms, one Arrow eval + one BigDecimal
    round per pair) became one blocked-kernel task per cluster — raw
    cosines bit-identical (exact-fold kernel), F.round applied only to
    the ≥ threshold−1e-6 survivors. Row-identical by
    tests/test_r13_opt.py::test_semdedup_blocked_identical."""
    assigned = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)
    raw = pair_cos_blocked(
        assigned,
        threshold - 1e-6,
        id_col=id_col,
        vec_col=vec_col,
        block_col="cluster",
    )
    dominated = (
        raw.filter(F.round(F.col("raw_cos"), 6) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return assigned.join(dominated, id_col, "left_anti").select(id_col, "cluster")


# --- LSH (random hyperplane) near-dup -------------------------------------
#
# Deterministic rational hyperplanes from an LCG over the (plane, dim)
# index: every weight is an exact double both engines compute identically,
# so the oracle SQL (generated from the same constants) reproduces the
# bucketing bit-for-bit. Production would draw Gaussian planes; the LSH
# structure (sign bits → banded signatures → bucket self-join → exact
# verify) is identical.

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31
PLANE_STRIDE = 64  # embedding dim in the testdata


def _plane_weight(i: "F.Column", j: int):
    """weight(plane j, dim i) ∈ [-0.5, 0.5), an exact rational."""
    seed = (
        F.lit(LCG_A).cast("bigint") * (F.lit(j * PLANE_STRIDE).cast("bigint") + i)
        + F.lit(LCG_C).cast("bigint")
    ) % F.lit(LCG_M).cast("bigint")
    return seed.cast("double") / F.lit(float(LCG_M)) - F.lit(0.5)


def _plane_weight_sql(i_expr: str, j: int) -> str:
    return (
        f"(CAST((CAST({LCG_A} AS BIGINT) * ({j * PLANE_STRIDE} + {i_expr})"
        f" + {LCG_C}) % {LCG_M} AS DOUBLE) / {float(LCG_M)} - 0.5)"
    )


def _plane_weights(j: int) -> list[float]:
    """Plane j's weights as Python floats — EXACTLY the doubles
    ``_plane_weight`` computes in the JVM: the LCG seed is exact int64
    arithmetic, seed / 2^31 is an exact power-of-two division, and
    − 0.5 is exact, so inlining them as an array literal changes how
    the constants enter the plan, not their bits."""
    return [
        float((LCG_A * (j * PLANE_STRIDE + i) + LCG_C) % LCG_M) / float(LCG_M) - 0.5
        for i in range(PLANE_STRIDE)
    ]


def _plane_dot(vec: "F.Column", j: int):
    # zip_with against the precomputed literal weight array instead of
    # recomputing the 5-op LCG weight per ELEMENT inside the lambda
    # (interpreted HOF eval — guide §1.2 per-task work). Same
    # left-to-right fold, same doubles. Assumes dim == PLANE_STRIDE
    # (the module contract; see PLANE_STRIDE note above).
    from flink_template_spark.functions.vector import lit_doubles

    return F.round(
        F.aggregate(
            F.zip_with(
                vec,
                lit_doubles(_plane_weights(j)),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def plane_dot_sql(vec: str, j: int) -> str:
    return (
        f"ROUND(list_sum(list_transform(range(1, len({vec}) + 1), "
        f"i -> CAST({vec}[i] AS DOUBLE) * {_plane_weight_sql('(i - 1)', j)})), 6)"
    )


def band_signatures(
    vectors: DataFrame,
    n_bands: int = 8,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (vector, band) with the band's sign-bit signature.

    All J = n_bands × bits_per_band hyperplane dots come from ONE
    Arrow-vectorized pass (functions.vector.plane_dots_arrow) instead
    of J interpreted zip_with/aggregate folds per row; the dots column
    is materialized in its own projection so the J sign tests reference
    a single ArrowEvalPython evaluation. Rounding (6 dp) and the sign
    thresholds stay in the Spark plan — raw dots are bit-identical to
    the _plane_dot folds, so bucketing is unchanged."""
    from flink_template_spark.functions.vector import plane_dots_arrow

    n_planes = n_bands * bits_per_band
    weights = [_plane_weights(j) for j in range(n_planes)]
    with_dots = _spread(vectors).select(
        id_col,
        vec_col,
        plane_dots_arrow(F.col(vec_col), weights).alias("__pdots"),
    )
    sigs = []
    for b in range(n_bands):
        sig = F.lit(0)
        for m in range(bits_per_band):
            j = b * bits_per_band + m
            bit = F.round(F.element_at("__pdots", j + 1), 6) >= 0
            sig = sig + F.when(bit, F.lit(2**m)).otherwise(0)
        sigs.append(sig)
    return with_dots.select(
        id_col, vec_col, F.posexplode(F.array(*sigs)).alias("band", "sig")
    )


def cosine_near_dup_lsh(
    vectors: DataFrame,
    threshold: float,
    n_bands: int = 8,
    bits_per_band: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH candidates (same signature in ≥1 band) verified by exact
    cosine — the 100 TB-scale near-dup path: the self-join explodes only
    within (band, signature) buckets, never across the full table.

    Optimization r13: bucket pairs are scored by the blocked exact-fold
    kernel with the (band, sig) bucket as the natural block — one task
    per bucket, raw cosines bit-identical to the fold path, and the
    margin filter (raw ≥ threshold−1e-6, conservative for
    round-half-up) runs INSIDE the kernel. The old plan shipped every
    bucket-collision row (two 64-dim vectors + two norms, ~550 B) into
    a dropDuplicates exchange and BigDecimal-rounded every candidate;
    now the dedup exchange carries only (id, id, double) survivors —
    a pair colliding in several bands scores bit-identically in each,
    so dropDuplicates keeps the same value regardless of which
    duplicate wins. Row-identity pinned by
    tests/test_r13_opt.py::test_near_dup_lsh_blocked_identical (this
    replaces the r12 slim-dedup attempt, which lost by re-attaching
    payloads through statless SMJs — the kernel never detaches them)."""
    bands = band_signatures(
        vectors.filter(valid_vec(F.col(vec_col))),
        n_bands, bits_per_band, id_col, vec_col,
    ).withColumn("__bucket", F.struct("band", "sig"))
    raw = pair_cos_blocked(
        bands,
        threshold - 1e-6,
        id_col=id_col,
        vec_col=vec_col,
        block_col="__bucket",
    )
    return (
        raw.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a", "id_b", F.round(F.col("raw_cos"), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ivf_topk(
    vectors: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe only the query's cluster, then exact top-k inside it.
    The query side carries its own valid_vec guard — ivf_assign only
    filters the corpus/centroid sides, and a degenerate __qvec would
    reach cosine() (ANSI abort on zero norm, NaN pollution otherwise)."""
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    q = query.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("__qid"), F.col(vec_col).alias("__qvec")
    )
    q_cluster = (
        assigned.join(F.broadcast(q), assigned[id_col] == F.col("__qid"))
        .select(F.col("cluster").alias("__qcluster"), "__qid", "__qvec")
    )
    return (
        assigned.join(F.broadcast(q_cluster), assigned.cluster == F.col("__qcluster"))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            id_col,
            F.col("cluster"),
            F.round(cosine_arrow(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def knn_join_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN JOIN: top-k corpus neighbors for EVERY query row
    (brute_force_topk is the single-query special case).

    Output: (query_id, neighbor_id, cos_sim, rank). The query set is
    broadcast, so the corpus is scanned once whatever |Q| is; per-query
    top-k runs as a partitioned window (per-group heap, no global sort).
    Scale: cost is |corpus|×|Q| similarity evaluations — right whenever
    |Q| fits a broadcast (eval sets, probe batches); for corpus×corpus
    scale use knn_join_ivf. Similarities rounded to 1e-6 with neighbor-
    id tiebreak so rankings are reproducible across engines.

    Degenerate vectors (zero-norm / NaN / Inf elements) are EXCLUDED
    from both sides (functions.vector.valid_vec) — the contract
    knn_join_gemm mirrors; without the filter, ANSI mode (the Spark 4
    default) aborts the whole join on a zero-norm row, and a NaN
    similarity would silently rank FIRST in every top-k."""
    q = queries.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        corpus.filter(valid_vec(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_arrow(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-NN JOIN through the IVF grid: both sides are
    assigned to centroid cells (broadcast argmax), the join runs
    per-cell, and top-k is a per-query window inside the matched cells.

    This is the corpus×corpus scale path: per-cell joins are
    sub-quadratic exactly like LSH bucket joins (quadratic only within
    the largest cell), the shuffle is keyed on the cell id, and no side
    needs to broadcast. Recall loss comes only from neighbors living in
    a different cell than the query (bounded in tests against
    knn_join_exact)."""
    c_assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("cluster"),
    )
    scored = (
        c_assigned.join(q_assigned, "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine_arrow(F.col(vec_col), F.col("__qvec")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """knn_join_exact's vectorized dense dual: similarities via ONE
    float64 BLAS GEMM per Arrow batch (mapInPandas) instead of a
    per-pair aggregate fold — the "when Python is unavoidable, make it
    BLAS" tier. The query matrix rides the task closure (|Q| is
    broadcast-bounded by the same contract as knn_join_exact); each
    batch keeps, per query, every candidate whose RAW sim is within a
    4e-6 margin of the batch's k-th best — provably a superset of what
    the final Spark window can rank top-k (Spark's 6-dp rounding moves
    a value by at most 5e-7 + ulp slop, so a candidate more than 2e-6
    below a kept one can never round above it; the margin doubles
    that). The shuffle carries ~k·|Q| candidates per batch, not the
    corpus, and NO rounding happens in numpy at all.

    Numerics: dot and norms are computed separately and divided in the
    same order as functions.vector.cosine; the batch emits RAW sims
    and the 6-dp rounding happens in the Spark plan (F.round), so
    output values carry Spark's exact rounding semantics (BigDecimal
    HALF_UP over the shortest decimal repr — not reproducible in
    vectorized numpy, which is why the batch side must not round).
    Residual divergence vs the fold path is confined to raw sims
    within an ulp of a rounding boundary (BLAS-vs-fold summation
    order). Degenerate vectors (zero-norm / NaN / Inf / NULL) are
    excluded on both sides by the SAME Spark-side valid_vec filter the
    exact path uses (a NULL embedding must not crash the numpy
    conversion, so the guard lives in the plan, not the batch fn); a
    query set with only degenerate rows returns an EMPTY result, like
    the exact path, not an error. Id columns keep their source types
    (query_id from queries, neighbor_id from corpus), mirroring
    knn_join_exact's genericity — nothing coerces ids to int64.
    """
    import numpy as np
    import pandas as pd

    _MARGIN = 4e-6

    qrows = (
        queries.filter(valid_vec(F.col(vec_col)) & F.col(id_col).isNotNull())
        .select(id_col, vec_col)
        .collect()  # bounded: |Q| small by contract
    )
    q_id_type = queries.schema[id_col].dataType.simpleString()
    c_id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {q_id_type}, neighbor_id {c_id_type}, cos_sim double"
    if not qrows:
        # mirror knn_join_exact: degenerate/empty query set -> empty
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.withColumn("rank", F.lit(1).cast("int")).filter(F.lit(False))
    qids = np.array([r[id_col] for r in qrows])
    qmat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if not len(ids):
                continue
            norm = np.sqrt((mat * mat).sum(axis=1))
            sims = (mat @ qmat.T) / (norm[:, None] * qnorm[None, :])
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                keep = ids != qids[j]
                cand = np.flatnonzero(keep)
                if not len(cand):
                    continue
                col = sims[cand, j]
                if len(cand) > k:
                    kth = np.partition(col, len(col) - k)[len(col) - k]
                    cand = cand[col >= kth - _MARGIN]
                out_q.append(np.full(len(cand), qids[j]))
                out_n.append(ids[cand])
                out_s.append(sims[cand, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cos_sim": np.concatenate(out_s),
                    }
                )

    cands = (
        corpus.filter(valid_vec(F.col(vec_col)) & F.col(id_col).isNotNull())
        .select(id_col, vec_col)
        .mapInPandas(gen, out_schema)
        .withColumn("cos_sim", F.round("cos_sim", 6))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return cands.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def binary_hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Binary-embedding k-NN: 1-bit sign quantization → packed-word
    Hamming shortlist → exact cosine rerank.

    Output: (query_id, neighbor_id, hamming, cos_sim, rank ≤ k).

    The production trick this implements: sign-quantized embeddings are
    32× smaller than the float arrays (two bigint words for 64 dims)
    and Hamming distance is two xor+bit_count ALU ops, so the full
    |corpus|×|Q| scan runs over 16-byte codes at a fraction of the
    float-cosine cost; exact math only touches the per-query
    ``shortlist`` survivors, fetched from the vector table by id —
    the same scan-codes/rerank-few shape as the IVF-PQ stack, without
    an index build. Shortlist and final ranks both break ties by
    neighbor id, so results replay exactly in any engine.

    Degenerate vectors are excluded on both sides (the knn_join
    contract — see knn_join_exact): NaN compares ≥ 0 as true in BOTH
    engines so even the sign bits of an invalid vector would agree,
    but its rerank cosine is an ANSI abort or a NaN that outranks
    everything."""
    from flink_template_spark.functions.vector import sign_pack_expr

    half = dim // 2
    p0 = sign_pack_expr(vec_col, 1, half)
    p1 = sign_pack_expr(vec_col, 1 + half, half)
    q = queries.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("query_id"),
        F.expr(p0).alias("q0"),
        F.expr(p1).alias("q1"),
    )
    c = corpus.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(p0).alias("c0"),
        F.expr(p1).alias("c1"),
    )
    ham = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.bit_count(F.expr("q0 ^ c0"))
                + F.bit_count(F.expr("q1 ^ c1"))
            ).cast("bigint").alias("hamming"),
        )
    )
    wham = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    short = ham.withColumn("hrk", F.row_number().over(wham)).filter(
        F.col("hrk") <= shortlist
    )
    # exact math on the shortlist only: join the float vectors back in
    # by id (the code scan above never carries them)
    qv = queries.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    cv = corpus.filter(valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    rr = (
        short.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round(cosine_arrow(F.col("__cvec"), F.col("__qvec")), 6).alias(
                "cos_sim"
            ),
        )
    )
    wrank = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return rr.withColumn("rank", F.row_number().over(wrank)).filter(
        F.col("rank") <= k
    )
