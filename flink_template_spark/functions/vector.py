"""Vector (embedding) Column-expression builders.

Pure Catalyst higher-order functions (zip_with / aggregate / transform)
— the dot product and norms run JVM-side with no Python boundary, which
is what makes brute-force scoring viable as a baseline at scale.

Cross-engine determinism: elements are cast float→double (exact) before
multiplying, folds run left-to-right in both engines, and similarity
outputs are rounded to 6 dp to absorb any residual libm/fold ulp drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


# --- Arrow exact-fold kernels (optimization r12, guide §4.2) ---------------
#
# The HOF builders above evaluate interpreted: ~100+ µs of boxing per
# 64-dim fold, which made the fold — not data volume — the vector
# family's bottleneck (measured: 90k cosines = 1.35 s of a 1.7 s stage).
# These duals hand whole Arrow batches to numpy but keep the EXACT fold
# semantics, so raw doubles are bit-identical to the HOF path and every
# oracle that replays the fold in SQL still hash-matches:
#
# - accumulation runs dimension-by-dimension over the batch
#   (acc += A[:,i] * B[:,i]), i.e. a strict left-to-right fold from 0.0
#   for EVERY row — the same IEEE operation sequence as
#   aggregate(zip_with(...), 0.0, +), just vectorized across rows;
# - np.sqrt and the JVM's Math.sqrt are both IEEE-correctly-rounded;
# - NO rounding happens here — F.round stays in the Spark plan, so
#   output values keep Spark's BigDecimal HALF_UP semantics.
#
# Contract (why every call site sits behind valid_vec(), which all
# cosine-family consumers already do):
#
# - element-level NULLs are not distinguishable from NaN after Arrow's
#   list→numpy conversion (valid_vec drops null-element vectors);
# - a NaN RESULT cannot cross the return boundary: Spark's Arrow
#   serializer maps NaN→NULL for pandas_udf outputs (verified: both
#   float64 and object return dtypes). valid_vec-guarded inputs cannot
#   produce a NaN dot/cosine (finite norms bound every partial), so
#   this is unreachable in practice — but it is the one semantic
#   difference vs the HOF fold (NaN) on adversarial inputs, pinned in
#   tests/test_r12_opt.py.
#
# Whole-NULL rows map to NULL output like the HOF path. Ragged widths
# and non-numeric payloads fall back to an exact per-row Python fold
# that mirrors zip_with's pad-with-NULL semantics (width mismatch →
# NULL).


def _fold_rows_exact(va, vb, want_cosine: bool):
    """Per-row exact fallback: same fold order as the HOF builders."""
    if va is None or vb is None:
        return None
    if len(va) != len(vb):
        return None  # zip_with pads with NULL -> NULL product -> NULL sum
    dt = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(va, vb):
        if x is None or y is None:
            return None
        x = float(x)
        y = float(y)
        dt += x * y
        na += x * x
        nb += y * y
    if not want_cosine:
        return dt
    import math

    denom = math.sqrt(na) * math.sqrt(nb)
    # IEEE division via numpy (Python raises on /0.0): 0/0 -> NaN,
    # nonzero/0 -> +-Inf — the same semantics as the numpy fast path
    # above (e.g. a subnormal vector whose norm underflows to 0 while
    # the dot doesn't gives Inf, not NaN). The whole zero-denominator
    # region is excluded by valid_vec at every call site, and a NaN
    # result is nulled at the Arrow boundary anyway.
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(np.float64(dt) / np.float64(denom))


def _pair_fold_series(a: pd.Series, b: pd.Series, want_cosine: bool) -> pd.Series:
    import numpy as _np

    n = len(a)
    out = [None] * n
    mask = a.notna() & b.notna()
    idx = _np.flatnonzero(mask.to_numpy())
    if len(idx):
        try:
            A = _np.array(a.iloc[idx].tolist(), dtype=_np.float64)
            B = _np.array(b.iloc[idx].tolist(), dtype=_np.float64)
            if A.ndim != 2 or B.ndim != 2 or A.shape[1] != B.shape[1]:
                raise ValueError
        except (ValueError, TypeError):
            av, bv = a.tolist(), b.tolist()
            for i in idx:
                out[i] = _fold_rows_exact(av[i], bv[i], want_cosine)
            return pd.Series(out, dtype=object)
        m = len(idx)
        dt = _np.zeros(m)
        na = _np.zeros(m)
        nb = _np.zeros(m)
        for i in range(A.shape[1]):
            x = A[:, i]
            y = B[:, i]
            dt += x * y
            na += x * x
            nb += y * y
        if want_cosine:
            with _np.errstate(divide="ignore", invalid="ignore"):
                vals = dt / (_np.sqrt(na) * _np.sqrt(nb))
        else:
            vals = dt
        for k, i in enumerate(idx):
            out[i] = float(vals[k])
    return pd.Series(out, dtype=object)


def _make_pair_udf(want_cosine: bool):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def fn(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pair_fold_series(a, b, want_cosine)

    return fn


_DOT_ARROW_UDF = None
_COSINE_ARROW_UDF = None


def dot_arrow(a: Column, b: Column) -> Column:
    """``dot``'s Arrow-vectorized dual — RAW double, bit-identical."""
    global _DOT_ARROW_UDF
    if _DOT_ARROW_UDF is None:
        _DOT_ARROW_UDF = _make_pair_udf(want_cosine=False)
    return _DOT_ARROW_UDF(a, b)


def cosine_arrow(a: Column, b: Column) -> Column:
    """``cosine``'s Arrow-vectorized dual — RAW double, bit-identical."""
    global _COSINE_ARROW_UDF
    if _COSINE_ARROW_UDF is None:
        _COSINE_ARROW_UDF = _make_pair_udf(want_cosine=True)
    return _COSINE_ARROW_UDF(a, b)


def plane_dots_arrow(vec: Column, weights: list[list[float]]) -> Column:
    """All J hyperplane dots of ``vec`` in ONE Arrow pass — the
    vectorized dual of J separate zip_with/aggregate folds against
    literal weight rows (operators.similarity._plane_dot). Returns
    array<double> of RAW dots in plane order; each plane's dot is the
    exact left-to-right fold (acc += V[:,i] * w[j][i] from 0.0), so
    rounding/thresholding in the Spark plan sees identical doubles.
    Same valid_vec contract as the pair kernels; a NULL or off-width
    vector row yields NULL (the HOF fold on a width≠len(w) vector pads
    with NULL and folds to NULL for every plane)."""
    import numpy as _np

    from pyspark.sql.functions import pandas_udf

    wmat = _np.array([[float(x) for x in row] for row in weights], dtype=_np.float64)
    j_planes, dim = wmat.shape

    @pandas_udf("array<double>")
    def fn(v: pd.Series) -> pd.Series:
        n = len(v)
        out = [None] * n
        mask = v.notna()
        idx = _np.flatnonzero(mask.to_numpy())
        if len(idx):
            try:
                V = _np.array(v.iloc[idx].tolist(), dtype=_np.float64)
                if V.ndim != 2 or V.shape[1] != dim:
                    raise ValueError
            except (ValueError, TypeError):
                vv = v.tolist()
                for i in idx:
                    row = vv[i]
                    if row is None or len(row) != dim or any(
                        x is None for x in row
                    ):
                        continue  # stays None, like the padded HOF fold
                    dots = []
                    for j in range(j_planes):
                        acc = 0.0
                        for d in range(dim):
                            acc += float(row[d]) * wmat[j, d]
                        dots.append(acc)
                    out[i] = dots
                return pd.Series(out, dtype=object)
            m = len(idx)
            dots = _np.zeros((m, j_planes))
            for i in range(dim):
                x = V[:, i]
                for j in range(j_planes):
                    dots[:, j] += x * wmat[j, i]
            for k, i in enumerate(idx):
                out[i] = [float(x) for x in dots[k]]
        return pd.Series(out, dtype=object)

    return fn(vec)


# --- DuckDB oracle fragments (same math, 1-based lists) -------------------

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def l2_norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({l2_norm_sql(a)} * {l2_norm_sql(b)}))"


# --- Arrow-vectorized pandas_udf tier -------------------------------------
#
# The expression builders above are the default (JVM-side, codegen).
# This is the engine's scalar pandas_udf surface (SURVEY.md §2.6): the
# same cosine, computed in numpy over Arrow batches — the escape hatch
# for vector math that outgrows Catalyst expressions (e.g. matrix ops,
# quantization) while staying ~100x faster than row-at-a-time Python.


def pandas_cosine_to(query_vec: list[float]):
    """Returns a pandas_udf Column-maker: cosine of each row's embedding
    to a fixed query vector, vectorized with numpy per Arrow batch."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @pandas_udf("double")
    def cos(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.map(lambda a: np.asarray(a, dtype=np.float64)))
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    return cos


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 quantization: per-vector scale = max|x|/127, codes
    = floor(x/scale + 0.5) ∈ [-127, 127]. floor(x + 0.5) instead of
    round() because both engines floor identically on IEEE doubles,
    while round()'s half-case tie-breaking is implementation-defined —
    determinism across engines is part of the storage contract (a
    re-quantization backfill must be byte-identical).

    Returns struct(scale double, codes array<tinyint>). At 100 TB this
    is 4× smaller embedding storage and 4× less shuffle for ANN
    pipelines that tolerate ~0.4% per-element error (scale/254 expected
    |err| ≈ 0.2% of max|x|).

    An all-zero vector gets scale 0 and all-zero codes (a lossless
    round-trip through dequantize) — the CASE guard matters because
    ANSI mode (the Spark 4 default) would otherwise abort the whole
    job on the 0/0 division for one degenerate row. A vector with a
    NaN/Inf element quantizes to NULL — an honest "cannot quantize"
    marker (scale would be NaN/Inf and every dequantized element NaN,
    i.e. a differently-corrupt row with no signal)."""
    scale = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double")))) / F.lit(
        127.0
    )
    codes = F.when(
        scale > 0,
        F.transform(
            vec,
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast(
                "tinyint"
            ),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0).cast("tinyint")))
    quantized = F.struct(scale.alias("scale"), codes.alias("codes"))
    return F.when(finite_vec(vec), quantized)


def dequantize_int8(q: Column) -> Column:
    """codes × scale → array<double> (the lossy inverse)."""
    return F.transform(
        q.getField("codes"),
        lambda c: c.cast("double") * q.getField("scale"),
    )


def lit_doubles(values) -> Column:
    """array<double> literal built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) for x in vec])`` costs a py4j round trip per
    ELEMENT — measured ~0.45 s of pure driver-side DataFrame
    construction per 4×64-dim centroid set in the kmeans loop
    (optimization guide §1: the wall was build time, not compute).
    One ``F.expr`` string is a single round trip; ``repr(float)`` is
    the shortest round-trip decimal, and Spark's ``D``-suffixed literal
    parses it back to the identical IEEE double, so the resulting plan
    is bit-for-bit the old one."""
    vals = [float(v) for v in values]
    if any(v != v or v in (float("inf"), float("-inf")) for v in vals):
        raise ValueError("lit_doubles requires finite values")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def cosine_lit_spark(vec_col: str, values) -> str:
    """Spark-SQL string: ``cosine(vec_col, <literal vector>)`` with the
    literal inlined — the whole expression is ONE py4j/parse round trip
    instead of the dozens the lambda builders cost per centroid (the
    lit_doubles motivation, applied to the full cosine). The SQL lambda
    forms parse to the identical zip_with/aggregate/transform nodes as
    the Column builders, so results are bit-for-bit unchanged."""
    vals = [float(v) for v in values]
    if any(v != v or v in (float("inf"), float("-inf")) for v in vals):
        raise ValueError("cosine_lit_spark requires finite values")
    arr = "array(" + ",".join(f"{v!r}D" for v in vals) + ")"
    dot_ = (
        f"aggregate(zip_with({vec_col}, {arr}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x)"
    )
    norm_v = (
        f"sqrt(aggregate(transform({vec_col}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0.0D, (acc, x) -> acc + x))"
    )
    # the all-literal centroid-norm subtree constant-folds in Catalyst,
    # so writing it as an expression (not a Python-computed literal)
    # costs nothing at runtime and keeps the fold provenance identical
    norm_c = f"sqrt(aggregate(transform({arr}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    return f"({dot_} / ({norm_v} * {norm_c}))"


def lit_ints(values) -> Column:
    """array<int> literal as ONE parsed expression (the integer sibling
    of lit_doubles — same py4j-chatter motivation, same plan bits)."""
    return F.expr("array(" + ",".join(str(int(v)) for v in values) + ")")


def rp_signs(out_dim: int, in_dim: int, seed: int = 1337) -> list[list[int]]:
    """Deterministic ±1 sign matrix for random projection (dense
    Rademacher / Achlioptas'01 JL variant): out_dim rows of in_dim
    signs from a fixed-seed PRNG, so the Spark plan and the DuckDB
    oracle inline the SAME literals (the MINHASH_A/B pattern in
    functions.hashing)."""
    import random

    rng = random.Random(seed)
    return [
        [1 if rng.random() < 0.5 else -1 for _ in range(in_dim)]
        for _ in range(out_dim)
    ]


def nonzero_vec(vec: Column) -> Column:
    """True when the vector has any non-zero element (NaN counts as
    non-zero — use valid_vec for the full corrupt-row guard)."""
    return F.exists(vec, lambda x: x != F.lit(0.0))


def finite_vec(vec: Column) -> Column:
    """True when every element is finite (no NaN, no ±Inf)."""
    return F.forall(
        vec,
        lambda x: ~F.isnan(x.cast("double"))
        & (F.abs(x.cast("double")) < F.lit(float("inf"))),
    )


def valid_vec(vec: Column) -> Column:
    """The cosine-family admission guard: 0 < l2_norm < Inf. Every
    cosine consumer filters on this at entry. A zero-norm vector makes
    the division 0/0, which ANSI mode (the Spark 4 default) turns into
    a job-aborting DIVIDE_BY_ZERO; a NaN/Inf element is worse — no
    abort, but the NaN similarity sorts FIRST under DESC in both Spark
    and DuckDB, so one corrupt row would silently win every top-k. One
    bad row must neither kill nor pollute a 100 TB join; excluded rows
    are recoverable upstream with ``df.filter(~valid_vec(col))``.

    The predicate is on the NORM, not the elements, because elementwise
    checks miss double-precision edge rows: all-subnormal vectors
    (every element < ~1.5e-154) square-underflow to norm 0 and would
    still divide-by-zero, and huge finite elements (~1e155+) overflow
    the norm to Inf and yield NaN sims. Norm NaN (a NaN element) fails
    ``norm < Inf`` under Spark's NaN-is-largest ordering, and a NULL
    vector / NULL element folds the norm to NULL, which a filter drops
    — so the one fold covers every degenerate shape. Oracle note: the
    DuckDB oracle SQL does not repeat this guard — driver testdata
    contains no degenerate vectors (both sides agree exactly there),
    and on dirty corpora the engine's exclusion semantics is the
    contract."""
    norm = l2_norm(vec)
    return (norm > F.lit(0.0)) & (norm < F.lit(float("inf")))


def sign_pack_expr(col: str, lo: int, width: int = 32) -> str:
    """Spark SQL: pack the sign bits of ``width`` consecutive vector
    dimensions (1-based start ``lo``) into one bigint — bit j set when
    element lo+j ≥ 0. Binary (1-bit) embedding quantization: 64 dims
    become two of these words, 32× smaller than the float array, and
    Hamming distance over the words is two xor+bit_count ops.

    Unrolled literal sum, not a HOF fold: it runs once per ROW (not per
    pair), the literals are powers of two so the sum can't overflow
    (max 2^32−1), and the identical text works in both dialects."""
    terms = [
        f"IF(element_at({col}, {lo + j}) >= 0, {1 << j}L, 0L)"
        for j in range(width)
    ]
    return "(" + " + ".join(terms) + ")"


def sign_pack_duckdb(col: str, lo: int, width: int = 32) -> str:
    """DuckDB SQL: the same packed sign word (1-based indexing)."""
    terms = [
        f"(CASE WHEN {col}[{lo + j}] >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(width)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
